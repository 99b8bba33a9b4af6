"""Fixed-iteration point-set ICP with bbox gating, under jit.

Capability parity with the reference's ``ICP_with_bbox``
(vggt/multi_view_process.py:427): refine the relative rigid transform
between two point clouds (VGGT point maps of the two views), restricting
correspondences to points inside the person bbox.

TPU-first: nearest-neighbour search is a dense (N, M) distance matrix
argmin per iteration (one matmul-shaped op), the rigid update is the
masked Umeyama solve, and the loop is a fixed-trip ``lax.fori_loop`` —
no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from skix.geometry.rigid import umeyama

_BIG = 1e12


class ICPResult(NamedTuple):
    R: jnp.ndarray        # (3, 3) — maps source → target
    t: jnp.ndarray        # (3,)
    rms: jnp.ndarray      # final inlier RMS distance
    inlier_frac: jnp.ndarray


def bbox_gate_mask(uv, bbox_xyxy):
    """Valid mask for 2D projections inside a bbox. ``uv (N, 2)``."""
    b = jnp.asarray(bbox_xyxy)
    return ((uv[:, 0] >= b[0]) & (uv[:, 0] <= b[2])
            & (uv[:, 1] >= b[1]) & (uv[:, 1] <= b[3]))


def icp(
    source,                 # (N, 3)
    target,                 # (M, 3)
    source_valid=None,      # (N,) bool (e.g. bbox-gated pointmap pixels)
    target_valid=None,      # (M,)
    iterations: int = 10,
    max_corr_dist: float | None = None,
    allow_scale: bool = False,
    R_init=None,
    t_init=None,
) -> ICPResult:
    """Estimate (R, t) aligning ``source`` onto ``target``."""
    source = jnp.asarray(source)
    target = jnp.asarray(target)
    N, M = source.shape[0], target.shape[0]
    sv = jnp.ones(N, bool) if source_valid is None else jnp.asarray(
        source_valid, bool)
    tv = jnp.ones(M, bool) if target_valid is None else jnp.asarray(
        target_valid, bool)
    R0 = jnp.eye(3) if R_init is None else jnp.asarray(R_init)
    t0 = jnp.zeros(3) if t_init is None else jnp.asarray(t_init)

    tgt_masked = jnp.where(tv[:, None], target, _BIG)

    def body(_, carry):
        R, t = carry
        moved = source @ R.T + t
        d2 = jnp.sum((moved[:, None, :] - tgt_masked[None, :, :]) ** 2,
                     axis=-1)
        nn_idx = jnp.argmin(d2, axis=1)
        nn_d = jnp.sqrt(jnp.min(d2, axis=1))
        w = sv.astype(source.dtype)
        if max_corr_dist is not None:
            w = w * (nn_d < max_corr_dist)
        w = w * tv[nn_idx]
        tr = umeyama(target[nn_idx], source, w=w, allow_scale=allow_scale)
        return tr.R * tr.s, tr.t

    R, t = jax.lax.fori_loop(0, iterations, body, (R0, t0))

    moved = source @ R.T + t
    d2 = jnp.sum((moved[:, None, :] - tgt_masked[None, :, :]) ** 2, axis=-1)
    nn_d = jnp.sqrt(jnp.min(d2, axis=1))
    w = sv.astype(source.dtype)
    if max_corr_dist is not None:
        w = w * (nn_d < max_corr_dist)
    rms = jnp.sqrt(jnp.sum(w * nn_d**2) / (jnp.sum(w) + 1e-9))
    return ICPResult(R=R, t=t, rms=rms,
                     inlier_frac=jnp.sum(w) / (jnp.sum(sv) + 1e-9))
