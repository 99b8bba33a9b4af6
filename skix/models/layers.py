"""Transformer building blocks (Flax) shared by the VGGT / ViT model family.

Capability parity with reference vggt/vggt/layers/*: Attention with QK-norm
and 2D RoPE (attention.py:21), pre-LN Block with LayerScale
(block.py:27), MLP (mlp.py), PatchEmbed (patch_embed.py), 2D rotary
embeddings (rope.py:62). The attention inner product runs through the
Pallas flash-attention kernel (skix.ops.attention) instead of
``F.scaled_dot_product_attention``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.ops.attention import flash_attention


# --------------------------------------------------------------------------
# 2D rotary position embedding (reference rope.py:62)
# --------------------------------------------------------------------------
def make_grid_positions(h: int, w: int) -> np.ndarray:
    """(h·w, 2) array of (y, x) patch coordinates (reference PositionGetter)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack([ys.ravel(), xs.ravel()], axis=-1).astype(np.int32)


def _rope_1d(x, positions, base_freq: float):
    """1D rotary embedding on ``x (..., N, d)`` with integer ``positions
    (..., N)``; rotate-half convention of the reference (:129)."""
    d = x.shape[-1]
    exponents = jnp.arange(0, d, 2, dtype=jnp.float32) / d
    inv_freq = 1.0 / (base_freq ** exponents)  # (d/2,)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., N, d/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (..., N, d)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos.astype(x.dtype) + rotated * sin.astype(x.dtype)


def rope_2d(x, pos, base_freq: float = 100.0):
    """2D RoPE: ``x (B, H, N, D)`` (D divisible by 4), ``pos (B, N, 2)``
    (y, x) integer coords. Vertical rotates the first D/2 features with y,
    horizontal the second D/2 with x (reference rope.py:150-176)."""
    D = x.shape[-1]
    half = D // 2
    y = pos[..., 0][:, None, :]  # (B, 1, N) broadcast over heads
    xx = pos[..., 1][:, None, :]
    out_y = _rope_1d(x[..., :half], y, base_freq)
    out_x = _rope_1d(x[..., half:], xx, base_freq)
    return jnp.concatenate([out_y, out_x], axis=-1)


class Mlp(nn.Module):
    hidden_features: int
    out_features: Optional[int] = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.out_features or x.shape[-1]
        h = nn.Dense(self.hidden_features, use_bias=self.use_bias,
                     dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(out, use_bias=self.use_bias, dtype=self.dtype,
                        name="fc2")(h)


class LayerScale(nn.Module):
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_values),
                           (x.shape[-1],))
        return x * gamma


class MultiHeadAttention(nn.Module):
    """Self-attention with optional QK-LayerNorm and 2D RoPE; the core
    matmul runs through the Pallas flash kernel."""

    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = False
    rope_freq: float = -1.0
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    # optional attention-core override (q, k, v) -> out, e.g. a
    # sequence-parallel schedule (skix.parallel.context_parallel) over a
    # mesh axis; defaults to the Pallas flash kernel.
    attn_fn: Optional[Callable] = None
    # static logit bound for the kernel's fixed-max mode (safe with
    # qk_norm: LayerNorm'd q/k bound |s|; skips online-max bookkeeping)
    attn_fixed_max: Optional[float] = None
    # fuse rope into the attention kernel via cos/sin tables — valid only
    # when every batch row shares the same positions (the caller asserts
    # this by opting in; VGGT's aggregator layouts qualify). Measured
    # ~12 ms/pair on VGGT-1B vs XLA-level rope (relayout copies).
    rope_tables: bool = False
    # explicit kernel tile edge (block_q == block_k == attn_block): short
    # self-attention layouts (ViT-Det 24² windows) default to the XLA
    # fallback because S < the default block_q; a single tile sized to S
    # keeps the softmax in VMEM instead of round-tripping the (S, S)
    # score tensor through HBM.
    attn_block: Optional[int] = None
    # fixed-max mode only: ride the softmax partition Σp on the ones-
    # column of the p·V MXU matmul (skix.ops.attention mxu_lsum)
    attn_mxu_lsum: bool = False

    @nn.compact
    def __call__(self, x, pos=None):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
        q = q.transpose(0, 2, 1, 3)  # (B, H, N, hd)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if self.qk_norm:
            q = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="k_norm")(k)
        fuse_rope = (self.rope_freq > 0 and pos is not None
                     and self.rope_tables and self.attn_fn is None)
        if self.rope_freq > 0 and pos is not None and not fuse_rope:
            q = rope_2d(q, pos, self.rope_freq)
            k = rope_2d(k, pos, self.rope_freq)
        blocks = ({} if self.attn_block is None else dict(
            block_q=self.attn_block, block_k_major=self.attn_block,
            block_k=self.attn_block))
        if self.attn_mxu_lsum:
            blocks = dict(blocks, mxu_lsum=True)
        if self.attn_fn is not None:
            out = self.attn_fn(q, k, v)
        elif fuse_rope:
            from skix.ops.attention import rope_2d_tables

            # PRECONDITION: rope_tables mode requires batch-identical
            # positions — the table is built from pos[0] and shared by
            # every row (checked here for concrete inputs; traced inputs
            # are the caller's contract).
            if jax.core.is_concrete(pos):
                # compare on the host side: slicing `pos` here would
                # CREATE a tracer inside an enclosing trace
                pos_np = np.asarray(pos)
                assert np.allclose(pos_np, pos_np[:1]), \
                    "rope_tables=True needs batch-identical positions " \
                    "(the cos/sin table is built from pos[0])"
            cos, sin = rope_2d_tables(pos[0], hd, self.rope_freq)
            out = flash_attention(q, k, v, fixed_max=self.attn_fixed_max,
                                  rope_cos=cos, rope_sin=sin, **blocks)
        else:
            out = flash_attention(q, k, v, fixed_max=self.attn_fixed_max,
                                  **blocks)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, use_bias=self.proj_bias, dtype=self.dtype,
                        name="proj")(out)


class Block(nn.Module):
    """Pre-LN transformer block with LayerScale (reference block.py:27)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    qk_norm: bool = False
    init_values: Optional[float] = None
    rope_freq: float = -1.0
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[Callable] = None
    attn_fixed_max: Optional[float] = None
    rope_tables: bool = False
    attn_block: Optional[int] = None
    attn_mxu_lsum: bool = False

    @nn.compact
    def __call__(self, x, pos=None):
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="norm1")(x)
        h = MultiHeadAttention(self.num_heads, self.qkv_bias, self.proj_bias,
                               self.qk_norm, self.rope_freq, self.ln_eps,
                               self.dtype, attn_fn=self.attn_fn,
                               attn_fixed_max=self.attn_fixed_max,
                               rope_tables=self.rope_tables,
                               attn_block=self.attn_block,
                               attn_mxu_lsum=self.attn_mxu_lsum,
                               name="attn")(h, pos)
        if self.init_values:
            h = LayerScale(self.init_values, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="norm2")(x)
        h = Mlp(int(C * self.mlp_ratio), use_bias=self.ffn_bias,
                dtype=self.dtype, name="mlp")(h)
        if self.init_values:
            h = LayerScale(self.init_values, name="ls2")(h)
        return x + h


class PatchEmbed(nn.Module):
    """Conv patchify ``(B, H, W, 3)`` → ``(B, h·w, C)``."""

    patch_size: int = 14
    embed_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        h = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        B, gh, gw, C = h.shape
        return h.reshape(B, gh * gw, C)


class VisionTransformer(nn.Module):
    """Plain ViT encoder with register tokens — the DINOv2-style patch-embed
    backbone option of the aggregator (reference vision_transformer.py,
    structurally; used when ``patch_embed='vit'``). Returns patch tokens
    only (register/cls stripped), like DINOv2's ``x_norm_patchtokens``."""

    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    init_values: float = 1.0
    # intermediate tap indices (DINOv2 ``get_intermediate_layers``);
    # when set, __call__ returns (final_tokens, [tap_tokens…])
    taps: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        B = images.shape[0]
        x = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                       name="patch_embed")(images)
        P = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        reg = self.param("register_tokens", nn.initializers.zeros,
                         (1, self.num_register_tokens, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, P + 1, self.embed_dim))
        x = x + pos[:, 1:]
        cls_t = jnp.broadcast_to(cls + pos[:, :1], (B, 1, self.embed_dim))
        reg_t = jnp.broadcast_to(reg, (B, self.num_register_tokens,
                                       self.embed_dim))
        x = jnp.concatenate([cls_t, reg_t, x], axis=1)
        taps = []
        want = set(self.taps or ())
        for i in range(self.depth):
            x = Block(self.num_heads, self.mlp_ratio, qk_norm=False,
                      init_values=self.init_values, ln_eps=1e-6,
                      dtype=self.dtype, name=f"block_{i}")(x)
            if i in want:
                taps.append(x[:, 1 + self.num_register_tokens:]
                            .astype(jnp.float32))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.taps:
            # (final normed patch tokens, tapped intermediate patch tokens)
            return x[:, 1 + self.num_register_tokens:], taps
        return x[:, 1 + self.num_register_tokens:]
