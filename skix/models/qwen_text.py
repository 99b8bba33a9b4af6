"""Qwen2-family text tower (Flax, HF-convertible) + byte-level BPE
tokenizer — the reference's image-edit prompt conditioning.

Reference capability: the Qwen-Image-Edit pipeline encodes prompts with
a Qwen2.5-VL tower (image_edit/qwenimage/pipeline_qwenimage_edit_plus.py
:194,287 ``encode_prompt`` → ``_get_qwen_prompt_embeds``: tokenizer →
decoder-only LM → hidden states feed the transformer's text stream).
Qwen2.5-VL's language model IS the Qwen2 decoder architecture — RMSNorm,
SwiGLU MLP, grouped-query attention with rotary embeddings, causal —
so :class:`QwenTextEncoder` implements that family at configurable dims
and :func:`convert_hf_qwen2` consumes the HF ``Qwen2Model`` state-dict
layout (``model.layers.N.self_attn.q_proj…``), parity-tested against a
tiny random ``transformers.Qwen2Model`` (tests/test_qwen_text.py).

TPU-first: the whole prompt encode is one fused program — f32 RMSNorm
epilogues around bf16-able matmuls, rope as precomputed cos/sin tables,
GQA via a head-tile reshape (no repeat_kv materialization), causal mask
folded into one softmax. Prompt lengths are fixed (padded) so every
encode hits one jit cache entry.

:class:`QwenBpeTokenizer` is the matching GPT-2-style byte-level BPE
with Qwen's pre-tokenization regex, loading the public ``vocab.json`` +
``merges.txt`` assets (token-id parity vs ``transformers.Qwen2Tokenizer``
on the same files — the real Qwen vocab is a downloadable data asset;
zero-egress here, the loader is the seam).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        return (x * w).astype(dt)


def _rope_tables(length: int, dim: int, theta: float):
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(length, dtype=np.float32)
    freqs = np.outer(t, inv)                       # (L, dim/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (L, dim) HF layout
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


def _mrope_tables(position_ids, dim: int, theta: float, mrope_section):
    """(3, B, L) position ids → per-sequence (B, L, dim) cos/sin with the
    t/h/w channel sections interleaved (Qwen2.5-VL
    ``apply_multimodal_rotary_pos_emb``: ``split(mrope_section * 2)`` over
    the head dim, section i takes component i % 3)."""
    if mrope_section is None:
        raise ValueError("position_ids (3, B, L) requires mrope_section")
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    pos = jnp.asarray(position_ids, jnp.float32)          # (3, B, L)
    freqs = pos[..., None] * inv[None, None, None]        # (3, B, L, d/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)        # (3, B, L, d)
    cos = jnp.cos(emb)
    sin = jnp.sin(emb)
    sections = list(mrope_section) * 2
    out_c, out_s = [], []
    start = 0
    for i, sec in enumerate(sections):
        out_c.append(cos[i % 3, :, :, start:start + sec])
        out_s.append(sin[i % 3, :, :, start:start + sec])
        start += sec
    return (jnp.concatenate(out_c, axis=-1),
            jnp.concatenate(out_s, axis=-1))              # (B, L, dim)


class QwenBlock(nn.Module):
    hidden: int
    heads: int
    kv_heads: int
    intermediate: int
    rms_eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        """``cos``/``sin``: (L, hd) shared across the batch, or (B, L, hd)
        per-sequence (the M-RoPE path)."""
        B, L, _ = x.shape
        nh, nkv = self.heads, self.kv_heads
        hd = self.hidden // nh
        dt = self.dtype

        h = RMSNorm(self.rms_eps, name="input_layernorm")(x)
        q = nn.Dense(nh * hd, dtype=dt, name="q_proj")(h)
        k = nn.Dense(nkv * hd, dtype=dt, name="k_proj")(h)
        v = nn.Dense(nkv * hd, dtype=dt, name="v_proj")(h)
        q = q.reshape(B, L, nh, hd)
        k = k.reshape(B, L, nkv, hd)
        v = v.reshape(B, L, nkv, hd)
        if cos.ndim == 2:
            cos = cos[None]
            sin = sin[None]
        q = q * cos[:, :, None, :] + _rotate_half(q) * sin[:, :, None, :]
        k = k * cos[:, :, None, :] + _rotate_half(k) * sin[:, :, None, :]
        # GQA without repeat_kv: group the query heads over each kv head
        g = nh // nkv
        q = q.reshape(B, L, nkv, g, hd)
        logits = jnp.einsum("bqngd,bmnd->bngqm", q, k) / np.sqrt(hd)
        logits = logits.astype(jnp.float32) + mask[:, None, None]
        attn = jax.nn.softmax(logits, axis=-1).astype(dt)
        out = jnp.einsum("bngqm,bmnd->bqngd", attn, v)
        out = out.reshape(B, L, nh * hd)
        x = x + nn.Dense(self.hidden, use_bias=False, dtype=dt,
                         name="o_proj")(out)

        h = RMSNorm(self.rms_eps, name="post_attention_layernorm")(x)
        gate = nn.Dense(self.intermediate, use_bias=False, dtype=dt,
                        name="gate_proj")(h)
        up = nn.Dense(self.intermediate, use_bias=False, dtype=dt,
                      name="up_proj")(h)
        down = nn.Dense(self.hidden, use_bias=False, dtype=dt,
                        name="down_proj")(nn.silu(gate) * up)
        return x + down


class QwenTextEncoder(nn.Module):
    """Token ids (B, L) [+ attention mask] → last hidden states
    (B, L, hidden) — the Qwen2 decoder run as a text encoder, exactly how
    the reference pipeline consumes it (hidden states, no LM head)."""

    vocab_size: int = 49408          # CLIP-BPE-sized default; real
    #                                  Qwen2.5 checkpoints use 151936+
    hidden: int = 64
    layers: int = 2
    heads: int = 4
    kv_heads: int = 2
    intermediate: int = 128
    rope_theta: float = 1_000_000.0  # Qwen2.5 default
    rms_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens=None, attention_mask=None,
                 inputs_embeds=None, position_ids=None,
                 mrope_section=None):
        """``position_ids (3, B, L)`` + ``mrope_section`` switch on
        multimodal 3D rope (Qwen2.5-VL `apply_multimodal_rotary_pos_emb`:
        the head-dim rope channels split into t/h/w sections, each
        rotated by its own position component; pure-text rows have all
        three components equal, reducing to 1D rope exactly).
        ``inputs_embeds (B, L, hidden)`` bypasses the embedding table —
        the VL path splices vision embeddings in before calling."""
        if inputs_embeds is None:
            B, L = tokens.shape
            emb = nn.Embed(self.vocab_size, self.hidden, dtype=self.dtype,
                           name="embed_tokens")(tokens)
        else:
            # materialize the table so params are stable across call
            # styles (the converter always provides it)
            nn.Embed(self.vocab_size, self.hidden, dtype=self.dtype,
                     name="embed_tokens")(jnp.zeros((1, 1), jnp.int32))
            emb = inputs_embeds
            B, L = emb.shape[:2]
        hd = self.hidden // self.heads
        if position_ids is None:
            cos, sin = _rope_tables(L, hd, self.rope_theta)
        else:
            cos, sin = _mrope_tables(position_ids, hd, self.rope_theta,
                                     mrope_section)
        causal = jnp.tril(jnp.ones((L, L), bool))[None]       # (1, L, L)
        if attention_mask is not None:
            # padded keys masked out (HF attention_mask semantics)
            causal = causal & jnp.asarray(attention_mask,
                                          bool)[:, None, :]
        bias = jnp.where(causal, 0.0, -1e9)
        h = emb
        for i in range(self.layers):
            h = QwenBlock(self.hidden, self.heads, self.kv_heads,
                          self.intermediate, self.rms_eps, self.dtype,
                          name=f"layers_{i}")(h, cos, sin, bias)
        return RMSNorm(self.rms_eps, name="norm")(h)


# ---------------------------------------------------------------------------
# HF Qwen2 converter
# ---------------------------------------------------------------------------

def convert_hf_qwen2(state_dict, prefix: str = "model.") -> dict:
    """HF ``Qwen2Model.state_dict()`` (or the ``model.``-prefixed slice of
    a ``Qwen2ForCausalLM`` / Qwen2.5-VL language tower) → flax variables
    for :class:`QwenTextEncoder`. Dense kernels transpose (O, I) → (I, O);
    q/k/v carry biases, o/gate/up/down do not (Qwen2 layout)."""

    def np_of(t):
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t)

    sd = {k[len(prefix):] if prefix and k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    params: dict = {
        "embed_tokens": {
            "embedding": jnp.asarray(np_of(sd["embed_tokens.weight"]))},
        "norm": {"weight": jnp.asarray(np_of(sd["norm.weight"]))},
    }
    i = 0
    while f"layers.{i}.input_layernorm.weight" in sd:
        lp = f"layers.{i}"
        blk: dict = {
            "input_layernorm": {"weight": jnp.asarray(
                np_of(sd[f"{lp}.input_layernorm.weight"]))},
            "post_attention_layernorm": {"weight": jnp.asarray(
                np_of(sd[f"{lp}.post_attention_layernorm.weight"]))},
        }
        for name in ("q_proj", "k_proj", "v_proj"):
            blk[name] = {
                "kernel": jnp.asarray(
                    np_of(sd[f"{lp}.self_attn.{name}.weight"]).T),
                "bias": jnp.asarray(
                    np_of(sd[f"{lp}.self_attn.{name}.bias"]))}
        blk["o_proj"] = {"kernel": jnp.asarray(
            np_of(sd[f"{lp}.self_attn.o_proj.weight"]).T)}
        for name in ("gate_proj", "up_proj", "down_proj"):
            blk[name] = {"kernel": jnp.asarray(
                np_of(sd[f"{lp}.mlp.{name}.weight"]).T)}
        params[f"layers_{i}"] = blk
        i += 1
    return {"params": params}


# ---------------------------------------------------------------------------
# Qwen byte-level BPE tokenizer (vocab.json + merges.txt assets)
# ---------------------------------------------------------------------------

# transformers.models.qwen2.tokenization_qwen2.PRETOKENIZE_REGEX, verbatim
PRETOKENIZE_REGEX = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|"
                     r"[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}|"
                     r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|"
                     r"\s+(?!\S)|\s+")


class QwenBpeTokenizer:
    """GPT-2-style byte-level BPE with Qwen's pre-tokenizer — token-id
    parity vs ``transformers.Qwen2Tokenizer`` on the same vocab/merges
    files (no ``</w>`` word markers, unlike the CLIP tokenizer)."""

    def __init__(self, vocab_file, merges_file,
                 eos_token: str = "<|endoftext|>",
                 context_length: int = 64):
        import regex

        from skix.tracking.clip_tokenizer import bytes_to_unicode

        self.encoder = json.loads(
            Path(vocab_file).read_text(encoding="utf-8"))
        self.decoder = {v: k for k, v in self.encoder.items()}
        merges = []
        for i, line in enumerate(
                Path(merges_file).read_text(encoding="utf-8").splitlines()):
            line = line.strip()
            if (i == 0 and line.startswith("#version:")) or not line:
                continue
            merges.append(tuple(line.split()))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.pat = regex.compile(PRETOKENIZE_REGEX)
        self.eos_id = self.encoder.get(eos_token)
        self.context_length = context_length

    @functools.lru_cache(maxsize=8192)
    def _bpe(self, token: str) -> str:
        word = tuple(token)
        if len(word) == 1:
            return token
        while True:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs,
                       key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            a, b = best
            out: List[str] = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == a
                        and word[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
            if len(word) == 1:
                break
        return " ".join(word)

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in self.pat.findall(text):
            tok = "".join(self.byte_encoder[b]
                          for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        return bytearray(self.byte_decoder[c]
                         for c in text).decode("utf-8", errors="replace")

    def __call__(self, texts: Union[str, List[str]],
                 context_length: Optional[int] = None) -> np.ndarray:
        """Batch-encode into fixed (B, L) id slots (eos-padded) plus an
        attention mask: returns ``(ids, mask)``."""
        if isinstance(texts, str):
            texts = [texts]
        L = context_length or self.context_length
        pad = self.eos_id if self.eos_id is not None else 0
        ids = np.full((len(texts), L), pad, np.int32)
        mask = np.zeros((len(texts), L), bool)
        for i, t in enumerate(texts):
            e = self.encode(t)[:L]
            ids[i, :len(e)] = e
            mask[i, :len(e)] = True
        return ids, mask
