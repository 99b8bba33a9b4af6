"""Euclidean distance transform (EDT) under jit.

TPU-native replacement for the reference's EDT used for temporal mask
disambiguation (sam3/model/edt.py, 173 LoC CPU implementation).

Algorithm: the separable two-pass method of Felzenszwalb–Huttenlocher,
reshaped for a vector machine — each 1-D pass is computed as a dense
min-plus product ``d[i] = min_j (cost[j] + (i−j)²)`` over the axis, which
is O(n²) FLOPs but one fused matmul-shaped op on the VPU/MXU instead of a
sequential lower-envelope scan (the classic O(n) algorithm is
pointer-chasing and serializes; for mask-sized n the dense form wins on
TPU by a wide margin).
"""

from __future__ import annotations

import jax.numpy as jnp

_INF = 1e12


def _edt_1d_sq(cost):
    """cost (..., n) → min_j cost[..., j] + (i−j)² for each i."""
    n = cost.shape[-1]
    idx = jnp.arange(n, dtype=cost.dtype)
    sq = (idx[:, None] - idx[None, :]) ** 2  # (n, n)
    return jnp.min(cost[..., None, :] + sq, axis=-1)


def edt(mask):
    """Squared-free Euclidean distance transform of a bool ``(H, W)`` mask:
    distance from every pixel to the nearest **foreground** pixel
    (0 inside the mask). ``vmap`` over leading axes for batches."""
    mask = jnp.asarray(mask, bool)
    cost = jnp.where(mask, 0.0, _INF)
    d = _edt_1d_sq(cost)                 # along W
    d = _edt_1d_sq(d.swapaxes(-1, -2)).swapaxes(-1, -2)  # along H
    return jnp.sqrt(jnp.clip(d, 0.0, None))


def signed_edt(mask):
    """Positive outside the mask, negative inside (distance to boundary)."""
    mask = jnp.asarray(mask, bool)
    outside = edt(mask)
    inside = edt(jnp.logical_not(mask))
    return jnp.where(mask, -inside, outside)
