"""CLIP text tower + VE text encoder (Flax), weight-compatible with the
reference's open-vocabulary prompt path.

Capability parity with sam3/model/text_encoder_ve.py: pre-LN residual
attention blocks (torch ``nn.MultiheadAttention`` layout), learned
positional embeddings, causal mask, ``ln_final``, optional text
projection, and the ``VETextEncoder`` wrapper (width 1024 / 16 heads /
24 layers / context 32, model_builder.py:488) whose ``resizer`` maps
token features to the detector's d_model. ``convert_ve_text_encoder``
maps the reference state dict name-for-name so converted CLIP weights
reproduce reference activations (random-weight parity test ≤1e-4,
tests/test_clip_text.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class _TorchMHA(nn.Module):
    """Self-attention matching torch nn.MultiheadAttention's parameter
    layout (packed qkv in_proj + out_proj)."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x, attn_bias=None):
        B, L, C = x.shape
        qkv = nn.Dense(3 * C, name="in_proj")(x)  # packed like torch
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.heads

        def heads_first(t):
            return t.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        if attn_bias is not None:
            s = s + attn_bias
        p = nn.softmax(s, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, name="out_proj")(out)


class _ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, attn_bias=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + _TorchMHA(self.width, self.heads, name="attn")(h, attn_bias)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(int(self.width * self.mlp_ratio), name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.width, name="c_proj")(h)


class CLIPTextTower(nn.Module):
    """TextTransformer (text_encoder_ve.py:163): token + positional embed →
    causal transformer → ln_final; returns per-token features and the
    projected pool (argmax-EOT when ``pool_type='argmax'``)."""

    context_length: int = 32
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    mlp_ratio: float = 4.0
    output_dim: Optional[int] = None
    use_ln_post: bool = True
    causal: bool = True
    pool_type: str = "none"  # "none" | "argmax" | "first" | "last"

    @nn.compact
    def __call__(self, tokens):
        B, L = tokens.shape
        embeds = nn.Embed(self.vocab_size, self.width,
                          name="token_embedding")(tokens)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = embeds + pos[:L]
        bias = None
        if self.causal:
            mask = jnp.tril(jnp.ones((L, L), bool))
            bias = jnp.where(mask, 0.0, -jnp.inf)[None, None]
        for i in range(self.layers):
            x = _ResidualAttentionBlock(self.width, self.heads,
                                        self.mlp_ratio,
                                        name=f"resblock_{i}")(x, bias)
        if self.use_ln_post:
            x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        if self.pool_type == "argmax":
            pooled = x[jnp.arange(B), jnp.argmax(tokens, axis=-1)]
        elif self.pool_type == "first":
            pooled = x[:, 0]
        elif self.pool_type == "last":
            pooled = x[:, -1]
        else:
            pooled = x
        if self.output_dim is not None:
            proj = self.param("text_projection",
                              nn.initializers.normal(self.width ** -0.5),
                              (self.width, self.output_dim))
            pooled = pooled @ proj
        return pooled, x, embeds


class VETextEncoder(nn.Module):
    """Text tokens → (attention_mask, resized token memory, input embeds)
    for the VL fusion encoder (text_encoder_ve.py:253 forward contract;
    batch-first here — the torch version transposes for nn.Transformer)."""

    d_model: int = 256
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 32
    vocab_size: int = 49408

    @nn.compact
    def __call__(self, tokens):
        tower = CLIPTextTower(
            context_length=self.context_length, vocab_size=self.vocab_size,
            width=self.width, heads=self.heads, layers=self.layers,
            name="encoder")
        _, text_memory, inputs_embeds = tower(tokens)
        resized = nn.Dense(self.d_model, name="resizer")(text_memory)
        attn_mask = tokens != 0
        return attn_mask, resized, inputs_embeds


def convert_ve_text_encoder(state_dict) -> dict:
    """Reference VETextEncoder torch state dict → flax params pytree."""

    def t(x):
        return jnp.asarray(np.asarray(x.detach().cpu().numpy()
                                      if hasattr(x, "detach") else x))

    p: dict = {"encoder": {}, "resizer": {}}
    enc = p["encoder"]
    enc["token_embedding"] = {
        "embedding": t(state_dict["encoder.token_embedding.weight"])}
    enc["positional_embedding"] = t(
        state_dict["encoder.positional_embedding"])
    i = 0
    while f"encoder.transformer.resblocks.{i}.ln_1.weight" in state_dict:
        pre = f"encoder.transformer.resblocks.{i}."
        blk = {
            "ln_1": {"scale": t(state_dict[pre + "ln_1.weight"]),
                     "bias": t(state_dict[pre + "ln_1.bias"])},
            "ln_2": {"scale": t(state_dict[pre + "ln_2.weight"]),
                     "bias": t(state_dict[pre + "ln_2.bias"])},
            "attn": {
                "in_proj": {
                    "kernel": t(state_dict[pre + "attn.in_proj_weight"]).T,
                    "bias": t(state_dict[pre + "attn.in_proj_bias"])},
                "out_proj": {
                    "kernel": t(state_dict[pre + "attn.out_proj.weight"]).T,
                    "bias": t(state_dict[pre + "attn.out_proj.bias"])},
            },
            "c_fc": {"kernel": t(state_dict[pre + "mlp.c_fc.weight"]).T,
                     "bias": t(state_dict[pre + "mlp.c_fc.bias"])},
            "c_proj": {"kernel": t(state_dict[pre + "mlp.c_proj.weight"]).T,
                       "bias": t(state_dict[pre + "mlp.c_proj.bias"])},
        }
        enc[f"resblock_{i}"] = blk
        i += 1
    if "encoder.ln_final.weight" in state_dict:
        enc["ln_final"] = {"scale": t(state_dict["encoder.ln_final.weight"]),
                           "bias": t(state_dict["encoder.ln_final.bias"])}
    if "encoder.text_projection" in state_dict:
        enc["text_projection"] = t(state_dict["encoder.text_projection"])
    p["resizer"] = {"kernel": t(state_dict["resizer.weight"]).T,
                    "bias": t(state_dict["resizer.bias"])}
    return {"params": p}
