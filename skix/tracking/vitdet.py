"""ViT-Det backbone with windowed attention + SimpleFPN neck (Flax).

Capability parity with the reference's SAM3 vision backbone
(sam3/model/vitdet.py:616 ``ViT`` + necks.py:13 ``Sam3DualViTDetNeck``,
built at model_builder.py:73 with img 1008 / patch 14 / embed 1024 /
depth 32 / heads 16 / mlp 4.625 / window 24 / global attention at blocks
(7, 15, 23, 31) / 2D RoPE / ln_pre / no retained cls token / tiled
absolute positions):

- window partition/unpartition are pure reshapes — free layout changes
  under XLA; the 72×72 grid splits into 3×3 windows of 24² tokens and
  every window attends through the same Pallas flash kernel;
- RoPE uses GLOBAL grid coordinates in both window and global blocks (the
  rotation depends only on relative offsets, which windowing preserves);
- the SimpleFPN neck hangs four scale branches (4×, 2×, 1×, 0.5×) off the
  LAST trunk feature, each ending in 1×1 + 3×3 convs to ``d_model``, with
  sine-cosine position maps (necks.py:110-124).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.layers import Block, PatchEmbed, make_grid_positions


def window_partition(x, window_size: int):
    """(B, H, W, C) → (B·nw, ws², C) + padded (Hp, Wp); reshapes only."""
    B, H, W, C = x.shape
    ph = (-H) % window_size
    pw = (-W) % window_size
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size,
                  window_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size * window_size,
                                              C)
    return x, (Hp, Wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    nh, nw = Hp // window_size, Wp // window_size
    B = windows.shape[0] // (nh * nw)
    x = windows.reshape(B, nh, nw, window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _window_positions(gh: int, gw: int, window_size: int) -> np.ndarray:
    """Global (y, x) coords laid out in window-partition order:
    (nw_windows, ws², 2)."""
    ph = (-gh) % window_size
    pw = (-gw) % window_size
    Hp, Wp = gh + ph, gw + pw
    ys, xs = np.meshgrid(np.arange(Hp), np.arange(Wp), indexing="ij")
    pos = np.stack([ys, xs], -1)  # (Hp, Wp, 2)
    pos = pos.reshape(Hp // window_size, window_size, Wp // window_size,
                      window_size, 2).transpose(0, 2, 1, 3, 4)
    return pos.reshape(-1, window_size * window_size, 2).astype(np.int32)


class ViTDetBackbone(nn.Module):
    """Windowed ViT trunk → (B, gh, gw, C) final feature map."""

    img_size: int = 1008
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.625
    window_size: int = 24
    global_att_blocks: Sequence[int] = (7, 15, 23, 31)
    rope_freq: float = 100.0
    ln_pre: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """``images (B, H, W, 3)`` normalized → (B, gh, gw, C)."""
        B, H, W, _ = images.shape
        x = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                       name="patch_embed")(images.astype(self.dtype))
        gh, gw = H // self.patch_size, W // self.patch_size
        # tiled absolute positions (vitdet tile_abs_pos): a pretrain-sized
        # table tiled over the larger grid
        base = self.img_size // self.patch_size
        pos_tab = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, base, base, self.embed_dim))
        reps_h = -(-gh // base)
        reps_w = -(-gw // base)
        pos = jnp.tile(pos_tab, (1, reps_h, reps_w, 1))[:, :gh, :gw]
        x = x.reshape(B, gh, gw, self.embed_dim) + pos.astype(self.dtype)
        if self.ln_pre:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)

        pos_global = jnp.asarray(make_grid_positions(gh, gw))[None]
        pos_win = jnp.asarray(_window_positions(gh, gw, self.window_size))
        BlockCls = nn.remat(Block) if self.remat else Block
        glob = set(self.global_att_blocks)
        for i in range(self.depth):
            blk = BlockCls(self.num_heads, self.mlp_ratio, qk_norm=False,
                           rope_freq=self.rope_freq, dtype=self.dtype,
                           name=f"block_{i}")
            if i in glob:
                t = x.reshape(B, gh * gw, self.embed_dim)
                t = blk(t, jnp.broadcast_to(pos_global,
                                            (B, gh * gw, 2)))
                x = t.reshape(B, gh, gw, self.embed_dim)
            else:
                wins, pad_hw = window_partition(x, self.window_size)
                nw = wins.shape[0] // B
                p = jnp.broadcast_to(pos_win[None], (B, nw, *pos_win.shape[1:]))
                p = p.reshape(wins.shape[0], -1, 2)
                wins = blk(wins, p)
                x = window_unpartition(wins, self.window_size, pad_hw,
                                       (gh, gw))
        return x.astype(jnp.float32)


def sincos_position_map(gh: int, gw: int, dim: int,
                        temperature: float = 10000.0) -> np.ndarray:
    """(gh, gw, dim) sine-cosine 2D position encoding (DETR convention)."""
    half = dim // 2
    ys, xs = np.meshgrid(np.arange(gh, dtype=np.float32) + 0.5,
                         np.arange(gw, dtype=np.float32) + 0.5,
                         indexing="ij")
    dim_t = temperature ** (2 * (np.arange(half // 2)) / half)

    def enc(v):
        f = v[..., None] / dim_t
        return np.stack([np.sin(f), np.cos(f)], -1).reshape(*v.shape, -1)

    return np.concatenate([enc(ys), enc(xs)], axis=-1).astype(np.float32)


class SimpleFPNNeck(nn.Module):
    """Final trunk feature → 4 projected scale levels + sine positions
    (necks.py Sam3DualViTDetNeck, single-neck configuration)."""

    d_model: int = 256
    scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)

    @nn.compact
    def __call__(self, feat) -> Tuple[list, list]:
        """``feat (B, gh, gw, C)`` → (features [(B, h, w, d_model)...],
        positions [(h, w, d_model)...]) ordered per ``scale_factors``."""
        dim = feat.shape[-1]
        outs, poss = [], []
        for si, scale in enumerate(self.scale_factors):
            x = feat
            if scale == 4.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     name=f"s{si}_dconv0")(x)
                x = nn.gelu(x, approximate=False)
                x = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2),
                                     name=f"s{si}_dconv1")(x)
            elif scale == 2.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     name=f"s{si}_dconv0")(x)
            elif scale == 0.5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif scale != 1.0:
                raise NotImplementedError(f"scale {scale}")
            x = nn.Conv(self.d_model, (1, 1), name=f"s{si}_conv1x1")(x)
            x = nn.Conv(self.d_model, (3, 3), padding="SAME",
                        name=f"s{si}_conv3x3")(x)
            outs.append(x)
            poss.append(jnp.asarray(sincos_position_map(
                x.shape[1], x.shape[2], self.d_model)))
        return outs, poss
