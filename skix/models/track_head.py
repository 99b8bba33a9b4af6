"""Point-track head (CoTracker-style iterative refinement), Flax.

Capability parity with the reference VGGT track head
(vggt/vggt/heads/track_head.py + track_modules/ — a CoTracker-family
iterative track refiner over aggregator features; SURVEY.md §2.6).

Design: project per-frame feature maps, sample query descriptors at the
initial points, then run a fixed number of refinement iterations — each
samples a local correlation patch around every (frame, track) estimate,
feeds [correlation, current offset, descriptor similarity] through a
shared MLP-mixer-ish update over the time axis, and emits position deltas
+ visibility logits. All loops static; the whole (S frames × N tracks)
problem is one batched program.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from skix.models.layers import Mlp


def bilinear_sample(fmap, xy):
    """``fmap (h, w, C)``, ``xy (..., 2)`` (x, y in feature coords) →
    ``(..., C)`` bilinear samples (zero padding outside)."""
    h, w, C = fmap.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(ix, iy):
        okx = (ix >= 0) & (ix <= w - 1)
        oky = (iy >= 0) & (iy <= h - 1)
        v = fmap[jnp.clip(iy, 0, h - 1).astype(jnp.int32),
                 jnp.clip(ix, 0, w - 1).astype(jnp.int32)]
        return v * (okx & oky)[..., None]

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


class TrackResult(NamedTuple):
    tracks: jnp.ndarray      # (B, S, N, 2) pixel positions
    visibility: jnp.ndarray  # (B, S, N) in [0, 1]


class TrackHead(nn.Module):
    """``features (B, S, gh, gw, Cin)`` + ``queries (B, N, 2)`` (pixels in
    frame 0) → per-frame track positions + visibility."""

    dim: int = 128
    iters: int = 4
    corr_radius: int = 3
    patch_size: int = 14  # feature stride in pixels
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, queries) -> TrackResult:
        B, S, gh, gw, Cin = features.shape
        N = queries.shape[1]
        r = self.corr_radius
        W2 = (2 * r + 1) ** 2
        fmap = nn.Dense(self.dim, name="feat_proj")(features)
        fmap = fmap / (jnp.linalg.norm(fmap, axis=-1, keepdims=True) + 1e-6)

        q_feat = jax.vmap(  # (B, N, C) descriptors at t=0
            lambda fm, q: bilinear_sample(fm, q / self.patch_size)
        )(fmap[:, 0], queries)

        dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1, dtype=jnp.float32),
                              jnp.arange(-r, r + 1, dtype=jnp.float32),
                              indexing="ij")
        delta = jnp.stack([dx, dy], -1).reshape(-1, 2)  # (W2, 2)

        update = Mlp(2 * self.dim, out_features=self.dim, name="update_mlp")
        temporal = Mlp(2 * self.dim, out_features=self.dim,
                       name="temporal_mlp")
        head = Mlp(self.dim, out_features=3, name="delta_head")

        # init: every frame starts at the query position
        pos = jnp.broadcast_to(queries[:, None], (B, S, N, 2))
        vis_logit = jnp.zeros((B, S, N))

        for _ in range(self.iters):
            grid_pos = pos / self.patch_size  # feature coords

            def corr_one(fm, p, qf):
                # fm (gh,gw,C); p (N,2); qf (N,C) → (N, W2)
                pts = p[:, None, :] + delta[None]  # (N, W2, 2)
                smp = bilinear_sample(fm, pts)     # (N, W2, C)
                return jnp.einsum("nwc,nc->nw", smp, qf)

            corr = jax.vmap(jax.vmap(corr_one, in_axes=(0, 0, None)),
                            in_axes=(0, 0, 0))(fmap, grid_pos, q_feat)
            # (B, S, N, W2)
            inp = jnp.concatenate(
                [corr, pos - queries[:, None], vis_logit[..., None]], axis=-1)
            h = update(inp)  # (B, S, N, dim)
            # temporal mixing: mean over frames per track, concatenated back
            ctx = jnp.mean(h, axis=1, keepdims=True)
            h = temporal(jnp.concatenate(
                [h, jnp.broadcast_to(ctx, h.shape)], axis=-1))
            out = head(h)
            pos = pos + out[..., :2] * self.patch_size
            vis_logit = vis_logit + out[..., 2]

        return TrackResult(tracks=pos, visibility=nn.sigmoid(vis_logit))


def track_points(model: TrackHead, variables, features, queries):
    """Convenience jitted call."""
    from skix.utils.jitapply import apply_model

    return apply_model(model, None, variables, features, queries)
