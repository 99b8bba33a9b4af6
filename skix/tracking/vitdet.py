"""ViT-Det backbone with windowed attention + SimpleFPN neck (Flax).

Capability parity with the reference's SAM3 vision backbone
(sam3/model/vitdet.py:616 ``ViT`` + necks.py:13 ``Sam3DualViTDetNeck``,
built at model_builder.py:73 with img 1008 / patch 14 / embed 1024 /
depth 32 / heads 16 / mlp 4.625 / window 24 / global attention at blocks
(7, 15, 23, 31) / 2D RoPE / ln_pre / no retained cls token / tiled
absolute positions):

- window partition/unpartition are pure reshapes — free layout changes
  under XLA; the 72×72 grid splits into 3×3 windows of 24² tokens and
  every window attends through a single-tile (block == ws²) Pallas flash
  call with rope fused as cos/sin tables (``window_flash``), keeping the
  (576, 576) score tile in VMEM;
- RoPE rotation depends only on relative coordinate offsets, so window
  blocks use window-LOCAL coordinates (batch-identical → table-fusable)
  with outputs identical to the global-coordinate form;
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


def axial_rope_angles(gh: int, gw: int, head_dim: int,
                      theta: float = 10000.0,
                      scale_pos: float = 1.0) -> np.ndarray:
    """Reference vitdet rope angle table (compute_axial_cis, vitdet.py:41):
    token t at (x = t % gw, y = t // gw); the first head_dim/4 complex
    pairs rotate by x·freqs, the next head_dim/4 by y·freqs. Returns
    ``(gh·gw, head_dim/2)`` angles for interleaved-pair rotation."""
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4)[: head_dim // 4]
                             / head_dim))
    t = np.arange(gh * gw, dtype=np.float32)
    t_x = (t % gw) * scale_pos
    t_y = (t // gw) * scale_pos
    ang_x = np.outer(t_x, freqs)
    ang_y = np.outer(t_y, freqs)
    return np.concatenate([ang_x, ang_y], axis=-1).astype(np.float32)


def apply_rope_interleaved(x, angles):
    """Rotate interleaved complex pairs: ``x (..., N, D)`` viewed as
    ``(..., N, D/2, 2)`` (reference apply_rotary_enc, vitdet.py:68)."""
    shape = x.shape
    xr = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    a, b = xr[..., 0], xr[..., 1]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    out = jnp.stack([a * cos - b * sin, a * sin + b * cos], axis=-1)
    return out.reshape(shape).astype(x.dtype)


def _sam3_rope_attention(q, k, v, angles, block: Optional[int] = None):
    """Attention core with the reference's interleaved axial rope applied
    to q/k (plugged in as ``attn_fn``; angles are static per layout).

    The rope goes through the table + signed-permutation-matmul form
    (skix.ops.attention): fused into the flash kernel on long sequences
    (the 4 global blocks at 1008 px), and applied as einsum@R at the XLA
    level otherwise — both avoid the reshape-pair relayout copies of the
    naive interleaved rotation. ``block`` sizes a single kernel tile to
    the window length so the 24² windows take the Pallas path too."""
    from skix.ops.attention import flash_attention, interleaved_rope_tables

    cos, sin = interleaved_rope_tables(jnp.asarray(angles))
    blocks = ({} if block is None else dict(
        block_q=block, block_k_major=block, block_k=block))
    return flash_attention(q, k, v, rope_cos=cos, rope_sin=sin,
                           rope_rotate="interleaved", **blocks)


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
    # "skix": rope_2d on global grid coords (freq 100). "sam3": the
    # reference's interleaved axial rope with WINDOW-LOCAL coordinates and
    # theta 10000 (vitdet.py:41,68) — weight-compatible with SAM3 ckpts.
    rope_style: str = "skix"
    # pos-embed table grid = pretrain_img_size//patch (vitdet pretrain 336,
    # tiled over the runtime grid); None → img_size
    pretrain_img_size: Optional[int] = None
    ln_pre: bool = True
    remat: bool = False
    # Route the 24²-token window blocks through a single-tile Pallas
    # flash call (block == ws²) with rope fused as cos/sin tables instead
    # of the XLA fallback (which round-trips the (S, S) score tensor
    # through HBM and applies rope as relayout copies). Window rope then
    # uses WINDOW-LOCAL coordinates — numerically identical to global
    # coords because axial-rope logits depend only on coordinate
    # DIFFERENCES, which windowing preserves (q·R(θp_q)ᵀR(θp_k)·k =
    # q·R(θ(p_k−p_q))·k). False = round-2 behavior (parity tests).
    window_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """``images (B, H, W, 3)`` normalized → (B, gh, gw, C)."""
        import functools

        B, H, W, _ = images.shape
        x = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                       name="patch_embed")(images.astype(self.dtype))
        gh, gw = H // self.patch_size, W // self.patch_size
        # tiled absolute positions (vitdet tile_abs_pos / get_abs_pos:175):
        # a pretrain-sized table tiled over the runtime grid
        base = (self.pretrain_img_size or self.img_size) // self.patch_size
        pos_tab = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, base, base, self.embed_dim))
        reps_h = -(-gh // base)
        reps_w = -(-gw // base)
        pos = jnp.tile(pos_tab, (1, reps_h, reps_w, 1))[:, :gh, :gw]
        x = x.reshape(B, gh, gw, self.embed_dim) + pos.astype(self.dtype)
        if self.ln_pre:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)

        hd = self.embed_dim // self.num_heads
        ws = self.window_size
        win_block = ws * ws if self.window_flash else None
        if self.rope_style == "sam3":
            blk_extra_glob = dict(rope_freq=-1.0, attn_fn=functools.partial(
                _sam3_rope_attention,
                angles=jnp.asarray(axial_rope_angles(gh, gw, hd))))
            blk_extra_win = dict(rope_freq=-1.0, attn_fn=functools.partial(
                _sam3_rope_attention,
                angles=jnp.asarray(axial_rope_angles(ws, ws, hd)),
                block=win_block))
        elif self.window_flash:
            # batch-identical positions (global grid for global blocks,
            # window-local for windows — see window_flash) let rope ride
            # the fused-table kernel path in every block. Table-form
            # rope needs rotation PAIRS inside each axis half (head_dim
            # % 4); tiny test configs below that keep XLA-level rope_2d
            # but still take the single-tile kernel.
            tables = hd % 4 == 0
            blk_extra_glob = dict(rope_freq=self.rope_freq,
                                  rope_tables=tables)
            blk_extra_win = dict(rope_freq=self.rope_freq,
                                 rope_tables=tables, attn_block=win_block)
        else:
            blk_extra_glob = blk_extra_win = dict(rope_freq=self.rope_freq)
        pos_global = jnp.asarray(make_grid_positions(gh, gw))[None]
        if self.window_flash and self.rope_style != "sam3":
            pos_win = jnp.asarray(
                make_grid_positions(ws, ws))[None]      # (1, ws², 2) local
        else:
            pos_win = jnp.asarray(_window_positions(gh, gw, ws))
        BlockCls = nn.remat(Block) if self.remat else Block
        glob = set(self.global_att_blocks)
        for i in range(self.depth):
            extra = blk_extra_glob if i in glob else blk_extra_win
            blk = BlockCls(self.num_heads, self.mlp_ratio, qk_norm=False,
                           dtype=self.dtype, name=f"block_{i}", **extra)
            if i in glob:
                t = x.reshape(B, gh * gw, self.embed_dim)
                t = blk(t, jnp.broadcast_to(pos_global,
                                            (B, gh * gw, 2)))
                x = t.reshape(B, gh, gw, self.embed_dim)
            else:
                wins, pad_hw = window_partition(x, ws)
                nw = wins.shape[0] // B
                p = jnp.broadcast_to(pos_win[None], (B, nw, *pos_win.shape[1:]))
                p = p.reshape(wins.shape[0], -1, 2)
                wins = blk(wins, p)
                x = window_unpartition(wins, ws, pad_hw, (gh, gw))
        return x.astype(jnp.float32)


def convert_vitdet_state_dict(sd) -> dict:
    """Reference SAM3 ViT-Det state dict → ViTDetBackbone params
    (use with ``rope_style='sam3'``, matching ``pretrain_img_size``,
    ``ln_pre=True``; builder config model_builder.py:73).

    Mapping: conv patch embed (OIHW→HWIO), sequence pos_embed (cls entry
    dropped, reshaped to the pretrain grid), per-block norm1/norm2,
    packed qkv, proj, mlp fc1/fc2. The rope has no weights (angle tables
    are recomputed); builder ln_post=False and LayerScale disabled."""
    import numpy as np_

    def t(x):
        return jnp.asarray(np_.asarray(x.detach().cpu().numpy()
                                       if hasattr(x, "detach") else x))

    p: dict = {}
    w = t(sd["patch_embed.proj.weight"])  # (C, 3, ph, pw)
    pe = {"proj": {"kernel": jnp.transpose(w, (2, 3, 1, 0))}}
    if "patch_embed.proj.bias" in sd:
        pe["proj"]["bias"] = t(sd["patch_embed.proj.bias"])
    else:  # bias_patch_embed=False → zero bias in the flax conv
        pe["proj"]["bias"] = jnp.zeros(w.shape[0])
    p["patch_embed"] = pe

    pos = t(sd["pos_embed"])  # (1, P(+1), C)
    n = pos.shape[1]
    side = int(np_.sqrt(n))
    if side * side != n:  # cls entry present → drop it
        pos = pos[:, 1:]
        side = int(np_.sqrt(pos.shape[1]))
    p["pos_embed"] = pos.reshape(1, side, side, -1)

    if "ln_pre.weight" in sd:
        p["ln_pre"] = {"scale": t(sd["ln_pre.weight"]),
                       "bias": t(sd["ln_pre.bias"])}

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        pre = f"blocks.{i}."
        p[f"block_{i}"] = {
            "norm1": {"scale": t(sd[pre + "norm1.weight"]),
                      "bias": t(sd[pre + "norm1.bias"])},
            "norm2": {"scale": t(sd[pre + "norm2.weight"]),
                      "bias": t(sd[pre + "norm2.bias"])},
            "attn": {
                "qkv": {"kernel": t(sd[pre + "attn.qkv.weight"]).T,
                        "bias": t(sd[pre + "attn.qkv.bias"])},
                "proj": {"kernel": t(sd[pre + "attn.proj.weight"]).T,
                         "bias": t(sd[pre + "attn.proj.bias"])},
            },
            "mlp": {
                "fc1": {"kernel": t(sd[pre + "mlp.fc1.weight"]).T,
                        "bias": t(sd[pre + "mlp.fc1.bias"])},
                "fc2": {"kernel": t(sd[pre + "mlp.fc2.weight"]).T,
                        "bias": t(sd[pre + "mlp.fc2.bias"])},
            },
        }
        i += 1
    return {"params": p}


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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat) -> Tuple[list, list]:
        """``feat (B, gh, gw, C)`` → (features [(B, h, w, d_model)...],
        positions [(h, w, d_model)...]) ordered per ``scale_factors``."""
        dim = feat.shape[-1]
        outs, poss = [], []
        for si, scale in enumerate(self.scale_factors):
            x = feat.astype(self.dtype)
            if scale == 4.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     dtype=self.dtype,
                                     name=f"s{si}_dconv0")(x)
                x = nn.gelu(x, approximate=False)
                x = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2),
                                     dtype=self.dtype,
                                     name=f"s{si}_dconv1")(x)
            elif scale == 2.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     dtype=self.dtype,
                                     name=f"s{si}_dconv0")(x)
            elif scale == 0.5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif scale != 1.0:
                raise NotImplementedError(f"scale {scale}")
            x = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                        name=f"s{si}_conv1x1")(x)
            x = nn.Conv(self.d_model, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"s{si}_conv3x3")(x)
            outs.append(x.astype(jnp.float32))
            poss.append(jnp.asarray(sincos_position_map(
                x.shape[1], x.shape[2], self.d_model)))
        return outs, poss
