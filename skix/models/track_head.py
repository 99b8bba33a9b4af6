"""VGGT point-track head (reference structure), Flax.

Reference-structure-exact rebuild of vggt/vggt/heads/track_head.py:12
``TrackHead`` + track_modules/: a DPT feature extractor (feature_only,
down_ratio=2, pos_embed=False) feeding the CoTracker/VGGSfM
``BaseTrackerPredictor`` (base_track_predictor.py:17) — correlation
pyramid (blocks.py:137 ``CorrBlock``: per-level avg-pool /2, dot-product
correlation, zero-padded bilinear window sampling), flow sin/cos
embedding (utils.py:90 ``get_2d_embedding``), a 2D sincos positional
embedding sampled at the query points (utils.py:18), the query/ref
token, and the ``EfficientUpdateFormer`` (blocks.py:19) alternating
time attention with virtual-track space attention. The CoTracker blocks'
pre-norm quirk — the residual stream keeps the NORMALIZED input
(modules.py:160 ``x = self.norm1(x)`` before ``x = x + attn``) — is
replicated exactly.

``convert_track_head`` (skix/models/vggt_convert.py) maps the reference
``track_head.*`` state dict 1:1 onto this tree; parity is tested against
the imported reference modules in tests/test_track_head.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.layers import Mlp


# --------------------------------------------------------------------------
# sampling helpers (track_modules/utils.py grid_sample conventions:
# align_corners=True, pixel coords)
# --------------------------------------------------------------------------
def bilinear_sample(fmap, xy, padding: str = "zeros"):
    """``fmap (h, w, C)``, ``xy (..., 2)`` (x, y in feature coords) →
    ``(..., C)`` bilinear samples. ``padding``: ``"zeros"`` masks
    out-of-bounds taps (grid_sample zeros), ``"border"`` clamps taps
    (grid_sample border)."""
    h, w, C = fmap.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(ix, iy):
        v = fmap[jnp.clip(iy, 0, h - 1).astype(jnp.int32),
                 jnp.clip(ix, 0, w - 1).astype(jnp.int32)]
        if padding == "zeros":
            okx = (ix >= 0) & (ix <= w - 1)
            oky = (iy >= 0) & (iy <= h - 1)
            v = v * (okx & oky)[..., None]
        return v

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _bilinear_zero_maps(maps, xy):
    """``maps (..., H, W)`` scalar maps, ``xy (..., K, 2)`` (x, y) →
    ``(..., K)`` zero-padded bilinear samples (one map per leading
    index — the CorrBlock window sampler)."""
    H, W = maps.shape[-2:]
    flat = maps.reshape(*maps.shape[:-2], H * W)
    x = xy[..., 0]
    y = xy[..., 1]
    # grid_sample's normalize/denormalize round-trip multiplies by
    # (size−1)/max(size−1, 1): a size-1 axis collapses every coordinate
    # to pixel 0 (always in-bounds) — utils.py:124 bilinear_sampler
    if W == 1:
        x = jnp.zeros_like(x)
    if H == 1:
        y = jnp.zeros_like(y)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(ix, iy):
        ok = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        idx = (jnp.clip(iy, 0, H - 1).astype(jnp.int32) * W
               + jnp.clip(ix, 0, W - 1).astype(jnp.int32))
        return jnp.take_along_axis(flat, idx, axis=-1) * ok

    top = tap(x0, y0) * (1 - wx) + tap(x0 + 1, y0) * wx
    bot = tap(x0, y0 + 1) * (1 - wx) + tap(x0 + 1, y0 + 1) * wx
    return top * (1 - wy) + bot * wy


def get_2d_embedding(xy, C: int):
    """Sin/cos flow embedding (track_modules/utils.py:90,
    cat_coords=False): interleaved sin/cos per axis at the INCREASING
    frequencies ``arange(0, C, 2) · 1000/C``; returns ``(..., 2C)``."""
    div = jnp.asarray(np.arange(0, C, 2, dtype=np.float32) * (1000.0 / C))
    x = xy[..., 0:1] * div
    y = xy[..., 1:2] * div
    pe_x = jnp.stack([jnp.sin(x), jnp.cos(x)], axis=-1) \
        .reshape(*xy.shape[:-1], C)
    pe_y = jnp.stack([jnp.sin(y), jnp.cos(y)], axis=-1) \
        .reshape(*xy.shape[:-1], C)
    return jnp.concatenate([pe_x, pe_y], axis=-1)


def sincos_pos_embed_2d(dim: int, hh: int, ww: int) -> np.ndarray:
    """2D sincos table (track_modules/utils.py:18): first half encodes
    the x (width) index, second the y — each half = [sin | cos] over
    ``ω_i = 10000^(-i/(dim/4))``. Returns ``(hh, ww, dim)`` numpy."""
    half = dim // 2
    omega = 1.0 / 10000.0 ** (np.arange(half // 2, dtype=np.float64)
                              / (half / 2.0))
    gy, gx = np.meshgrid(np.arange(hh, dtype=np.float64),
                         np.arange(ww, dtype=np.float64), indexing="ij")

    def emb1d(pos):
        out = pos[..., None] * omega
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    return np.concatenate([emb1d(gx), emb1d(gy)],
                          axis=-1).astype(np.float32)


# --------------------------------------------------------------------------
# CoTracker transformer blocks (track_modules/modules.py)
# --------------------------------------------------------------------------
class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention layout (packed in_proj + out_proj) so
    reference weights map 1:1."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in, key_mask=None):
        """``key_mask (B, Lk)`` bool: False keys are excluded from the
        softmax (torch key_padding_mask semantics) — used to keep padded
        query-track slots out of the space attention pool."""
        C, Hh = self.dim, self.num_heads
        hd = C // Hh
        W = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                       (3 * C, C))
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,))
        q = q_in @ W[:C].T + b[:C]
        k = k_in @ W[C:2 * C].T + b[C:2 * C]
        v = v_in @ W[2 * C:].T + b[2 * C:]
        B, Lq, Lk = q.shape[0], q.shape[1], k.shape[1]
        q = q.reshape(B, Lq, Hh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, Hh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, Hh, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits,
                               jnp.finfo(logits.dtype).min)
        att = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, C)
        return nn.Dense(C, name="out_proj")(out)


class AttnBlock(nn.Module):
    """Self-attention block (modules.py:133). NOTE the residual stream
    keeps norm1(x) — faithful to the reference."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + TorchMHA(self.dim, self.num_heads, name="attn")(x, x, x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        return x


class CrossAttnBlock(nn.Module):
    """Cross-attention block (modules.py:173); same pre-norm residual
    quirk, and norm_context is LayerNorm(hidden_size)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, context, context_mask=None):
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        ctx = nn.LayerNorm(epsilon=1e-5, name="norm_context")(context)
        x = x + TorchMHA(self.dim, self.num_heads,
                         name="cross_attn")(x, ctx, ctx,
                                            key_mask=context_mask)
        x = x + Mlp(int(self.dim * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        return x


class EfficientUpdateFormer(nn.Module):
    """Track-update transformer (blocks.py:19): time attention per
    track, interleaved with virtual-track space attention
    (virtual←point cross, virtual self, point←virtual cross)."""

    space_depth: int = 6
    time_depth: int = 6
    input_dim: int = 388
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 130
    mlp_ratio: float = 4.0
    add_space_attn: bool = True
    num_virtual_tracks: int = 64

    @nn.compact
    def __call__(self, x, valid=None):
        """``x (B, N, T, input_dim)`` → ``(B, N, T, output_dim)``.

        ``valid (B, N)`` bool marks REAL point tracks; False slots (the
        fixed-size chunk padding in sfm_tracks.py) are masked out of the
        virtual←point space attention so they cannot perturb real tracks
        (the reference runs exact-size chunks and has no pads)."""
        B, N0, T, _ = x.shape
        x = nn.LayerNorm(epsilon=1e-5, name="input_norm")(x)
        tokens = nn.Dense(self.hidden_size, name="input_transform")(x)
        init_tokens = tokens
        if self.add_space_attn:
            # the reference param is spelled "virual_tracks" (blocks.py:53)
            virt = self.param("virual_tracks", nn.initializers.normal(1.0),
                              (1, self.num_virtual_tracks, 1,
                               self.hidden_size))
            tokens = jnp.concatenate(
                [tokens, jnp.broadcast_to(
                    virt, (B, self.num_virtual_tracks, T,
                           self.hidden_size))], axis=1)
        N = tokens.shape[1]
        nvt = self.num_virtual_tracks

        time_blocks = [AttnBlock(self.hidden_size, self.num_heads,
                                 self.mlp_ratio, name=f"time_blocks_{i}")
                       for i in range(self.time_depth)]
        if self.add_space_attn:
            sv = [AttnBlock(self.hidden_size, self.num_heads,
                            self.mlp_ratio,
                            name=f"space_virtual_blocks_{j}")
                  for j in range(self.space_depth)]
            sp2v = [CrossAttnBlock(self.hidden_size, self.num_heads,
                                   self.mlp_ratio,
                                   name=f"space_point2virtual_blocks_{j}")
                    for j in range(self.space_depth)]
            sv2p = [CrossAttnBlock(self.hidden_size, self.num_heads,
                                   self.mlp_ratio,
                                   name=f"space_virtual2point_blocks_{j}")
                    for j in range(self.space_depth)]

        j = 0
        for i in range(self.time_depth):
            tt = tokens.reshape(B * N, T, -1)
            tt = time_blocks[i](tt)
            tokens = tt.reshape(B, N, T, -1)
            if self.add_space_attn and \
                    (i % (self.time_depth // self.space_depth) == 0):
                st = tokens.transpose(0, 2, 1, 3).reshape(B * T, N, -1)
                pt = st[:, :N - nvt]
                vt = st[:, N - nvt:]
                pt_mask = None
                if valid is not None:
                    pt_mask = jnp.broadcast_to(
                        valid[:, None, :], (B, T, N0)).reshape(B * T, N0)
                vt = sv2p[j](vt, pt, context_mask=pt_mask)
                vt = sv[j](vt)
                pt = sp2v[j](pt, vt)
                st = jnp.concatenate([pt, vt], axis=1)
                tokens = st.reshape(B, T, N, -1).transpose(0, 2, 1, 3)
                j += 1
        if self.add_space_attn:
            tokens = tokens[:, :N - nvt]
        tokens = tokens + init_tokens
        tokens = nn.LayerNorm(epsilon=1e-5, name="output_norm")(tokens)
        return nn.Dense(self.output_dim, name="flow_head",
                        kernel_init=nn.initializers.truncated_normal(
                            0.001))(tokens)


# --------------------------------------------------------------------------
# correlation pyramid (blocks.py:137 CorrBlock)
# --------------------------------------------------------------------------
def corr_pyramid_sample(fmaps, targets, coords, num_levels: int,
                        radius: int):
    """``fmaps (B, S, H, W, C)``, ``targets (B, S, N, C)``,
    ``coords (B, S, N, 2)`` level-0 feature coords → sampled correlation
    windows ``(B, S, N, num_levels · (2r+1)²)``. Each level: avg-pool /2,
    dot-product correlation / √C, zero-padded bilinear window sample at
    ``coords / 2^level + Δ`` (Δ from the reference's meshgrid(d, d, "ij")
    with the axis-0 offset applied to x)."""
    r = radius
    d = np.arange(-r, r + 1, dtype=np.float32)
    dgrid = jnp.asarray(
        np.stack(np.meshgrid(d, d, indexing="ij"), -1).reshape(-1, 2))
    outs = []
    cur = fmaps
    for i in range(num_levels):
        B, S, H, W, C = cur.shape
        corr = jnp.einsum("bsnc,bshwc->bsnhw", targets, cur) / np.sqrt(C)
        pts = coords[..., None, :] / (2.0 ** i) + dgrid
        outs.append(_bilinear_zero_maps(corr, pts))
        if i + 1 < num_levels:
            flat = cur.reshape(B * S, H, W, C)
            flat = nn.avg_pool(flat, (2, 2), strides=(2, 2))
            cur = flat.reshape(B, S, flat.shape[1], flat.shape[2], C)
    return jnp.concatenate(outs, axis=-1)


# --------------------------------------------------------------------------
# tracker predictor (base_track_predictor.py:17)
# --------------------------------------------------------------------------
class BaseTrackerPredictor(nn.Module):
    stride: int = 2
    corr_levels: int = 7
    corr_radius: int = 4
    latent_dim: int = 128
    hidden_size: int = 384
    use_spaceatt: bool = True
    depth: int = 6
    max_scale: int = 518
    predict_conf: bool = True
    iters: int = 4

    @nn.compact
    def __call__(self, query_points, fmaps, iters: Optional[int] = None,
                 down_ratio: int = 1, apply_sigmoid: bool = True,
                 query_valid=None):
        """``query_points (B, N, 2)`` pixel coords, ``fmaps
        (B, S, HH, WW, C)`` channels-last feature maps → (coord_preds
        list per iteration in pixel scale, vis (B, S, N),
        conf (B, S, N)). ``query_valid (B, N)`` masks padded query
        slots out of the space attention."""
        iters = self.iters if iters is None else iters
        B, S, HH, WW, C = fmaps.shape
        N = query_points.shape[1]
        ld = self.latent_dim
        tdim = 3 * ld + 4

        fmaps = nn.LayerNorm(epsilon=1e-5, name="fmap_norm")(fmaps)
        if down_ratio > 1:
            query_points = query_points / float(down_ratio)
        query_points = query_points / float(self.stride)

        coords = jnp.broadcast_to(query_points[:, None], (B, S, N, 2))
        # query descriptors at t=0 (border padding, utils.py:193)
        q_feat = jax.vmap(lambda fm, q: bilinear_sample(
            fm, q, padding="border"))(fmaps[:, 0], coords[:, 0])
        track_feats = jnp.broadcast_to(q_feat[:, None], (B, S, N, ld))
        coords_backup = coords

        corr_mlp = Mlp(self.hidden_size, out_features=ld, name="corr_mlp")
        updateformer = EfficientUpdateFormer(
            space_depth=self.depth if self.use_spaceatt else 0,
            time_depth=self.depth, input_dim=tdim,
            hidden_size=self.hidden_size, output_dim=ld + 2,
            add_space_attn=self.use_spaceatt, name="updateformer")
        query_ref_token = self.param(
            "query_ref_token", nn.initializers.normal(1.0), (1, 2, tdim))
        pos_table = jnp.asarray(sincos_pos_embed_2d(tdim, HH, WW))
        ffeat_norm = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                                  name="ffeat_norm")
        ffeat_updater = nn.Dense(ld, name="ffeat_updater")

        coord_preds = []
        for _ in range(iters):
            coords = jax.lax.stop_gradient(coords)
            fcorrs = corr_pyramid_sample(fmaps, track_feats, coords,
                                         self.corr_levels, self.corr_radius)
            fcorrs_ = fcorrs.transpose(0, 2, 1, 3).reshape(B * N, S, -1)
            fcorrs_ = corr_mlp(fcorrs_)

            flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3) \
                .reshape(B * N, S, 2)
            flows_emb = get_2d_embedding(flows, ld // 2)
            flows_emb = jnp.concatenate(
                [flows_emb, flows / self.max_scale, flows / self.max_scale],
                axis=-1)
            track_feats_ = track_feats.transpose(0, 2, 1, 3) \
                .reshape(B * N, S, ld)
            tinput = jnp.concatenate([flows_emb, fcorrs_, track_feats_],
                                     axis=-1)

            sampled_pos = jax.vmap(lambda q: bilinear_sample(
                pos_table, q, padding="border"))(coords[:, 0])  # (B, N, tdim)
            x = tinput + sampled_pos.reshape(B * N, 1, tdim)
            qr = jnp.concatenate(
                [query_ref_token[:, 0:1],
                 jnp.broadcast_to(query_ref_token[:, 1:2],
                                  (1, S - 1, tdim))], axis=1)
            x = x + qr
            x = x.reshape(B, N, S, tdim)

            delta = updateformer(x, valid=query_valid).reshape(
                B * N, S, ld + 2)
            delta_coords_ = delta[:, :, :2]
            delta_feats_ = delta[:, :, 2:].reshape(B * N * S, ld)

            tf_flat = track_feats_.reshape(B * N * S, ld)
            upd = nn.gelu(ffeat_updater(ffeat_norm(delta_feats_)),
                          approximate=False)
            tf_flat = upd + tf_flat
            track_feats = tf_flat.reshape(B, N, S, ld).transpose(0, 2, 1, 3)

            coords = coords + delta_coords_.reshape(B, N, S, 2) \
                .transpose(0, 2, 1, 3)
            coords = coords.at[:, 0].set(coords_backup[:, 0])
            coord_preds.append(coords * self.stride * down_ratio)

        vis_e = nn.Dense(1, name="vis_predictor")(
            track_feats).reshape(B, S, N)
        if apply_sigmoid:
            vis_e = nn.sigmoid(vis_e)
        conf_e = None
        if self.predict_conf:
            conf_e = nn.Dense(1, name="conf_predictor")(
                track_feats).reshape(B, S, N)
            if apply_sigmoid:
                conf_e = nn.sigmoid(conf_e)
        return coord_preds, vis_e, conf_e


class TrackResult(NamedTuple):
    tracks: jnp.ndarray      # (B, S, N, 2) pixel positions (final iter)
    visibility: jnp.ndarray  # (B, S, N) in [0, 1]
    confidence: Optional[jnp.ndarray] = None


class TrackHead(nn.Module):
    """Reference TrackHead (track_head.py:12): DPT feature extractor
    (feature_only, down_ratio=2, pos_embed=False → (B, S, H/2, W/2,
    ``features``) maps) + BaseTrackerPredictor.

    ``taps``: tuple of 4 aggregator token tensors ``(B, S, P, dim_in)``
    (the VGGT model's ``return_taps`` output); ``img_hw`` is the STATIC
    pixel size the tokens were computed at.
    """

    dim_in: int = 2048
    patch_size: int = 14
    features: int = 128
    iters: int = 4
    predict_conf: bool = True
    stride: int = 2
    corr_levels: int = 7
    corr_radius: int = 4
    hidden_size: int = 384
    img_hw: Tuple[int, int] = (518, 518)
    patch_start_idx: int = 5

    @nn.compact
    def __call__(self, taps, query_points, query_valid=None,
                 iters: Optional[int] = None):
        from skix.models.vggt import DPTHead

        fmaps = DPTHead(
            dim_in=self.dim_in, patch_size=self.patch_size,
            features=self.features, feature_only=True, down_ratio=2,
            name="feature_extractor")(list(taps), self.img_hw,
                                      self.patch_start_idx)
        tracker = BaseTrackerPredictor(
            latent_dim=self.features, predict_conf=self.predict_conf,
            stride=self.stride, corr_levels=self.corr_levels,
            corr_radius=self.corr_radius, hidden_size=self.hidden_size,
            iters=self.iters, name="tracker")
        return tracker(query_points, fmaps, iters=iters,
                       query_valid=query_valid)


def track_points(model: TrackHead, variables, taps, queries) -> TrackResult:
    """Convenience jitted call returning the final-iteration tracks."""
    from skix.utils.jitapply import apply_model

    coords, vis, conf = apply_model(model, None, variables, tuple(taps),
                                    queries)
    return TrackResult(tracks=coords[-1], visibility=vis, confidence=conf)
