"""Text/concept encoder for open-vocabulary prompts (CLIP-family).

Capability parity with the reference's prompt path
(sam3/model/text_encoder_ve.py:253 + tokenizer_ve.py — a CLIP-BPE
tokenizer + causal transformer whose EOT embedding conditions detection).

Offline-buildable design: a **byte-level tokenizer** (no BPE merge table
needed — the 256-byte vocabulary is self-contained) feeding a causal
transformer with learned positions; the prompt embedding is the final
token's projected feature (CLIP's EOT convention). A converter for real
CLIP weights slots in once a merge table/checkpoint is available; the
module interface (text → (prompt_dim,) vector) is what the detector
consumes either way.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.layers import Mlp

_VOCAB = 256 + 2  # bytes + BOS/EOS
_BOS = 256
_EOS = 257


def tokenize(text: str, max_len: int = 32) -> np.ndarray:
    """Byte-level tokens with BOS/EOS, padded with EOS; (max_len,) int32."""
    raw = list(text.lower().strip().encode("utf-8"))[: max_len - 2]
    toks = [_BOS] + raw + [_EOS]
    toks = toks + [_EOS] * (max_len - len(toks))
    return np.asarray(toks, np.int32)


def tokenize_batch(texts, max_len: int = 32) -> np.ndarray:
    return np.stack([tokenize(t, max_len) for t in texts])


class TextEncoder(nn.Module):
    """Causal transformer over byte tokens → (B, out_dim) prompt vectors."""

    vocab: int = _VOCAB
    max_len: int = 32
    dim: int = 128
    depth: int = 2
    num_heads: int = 4
    out_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        B, L = tokens.shape
        emb = nn.Embed(self.vocab, self.dim, name="token_embed")(tokens)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (1, self.max_len, self.dim))
        h = (emb + pos[:, :L]).astype(self.dtype)
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        for i in range(self.depth):
            a = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(h)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                name=f"attn_{i}")
            h = h + attn(a, a, mask=causal)
            m = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(h)
            h = h + Mlp(4 * self.dim, dtype=self.dtype, name=f"mlp_{i}")(m)
        h = nn.LayerNorm(epsilon=1e-5, name="final_norm")(h)
        # EOT pooling: feature at the first EOS position
        is_eos = tokens == _EOS
        first_eos = jnp.argmax(is_eos, axis=1)
        pooled = h[jnp.arange(B), first_eos]
        out = nn.Dense(self.out_dim, use_bias=False,
                       name="text_proj")(pooled.astype(jnp.float32))
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-6)


def encode_texts(model: TextEncoder, variables, texts, max_len: int = 32):
    toks = jnp.asarray(tokenize_batch(texts, max_len))
    from skix.utils.jitapply import apply_model

    return apply_model(model, None, variables, toks)
