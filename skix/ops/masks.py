"""Mask utilities (reference sam3/perflib/masks_ops.py:6,48 parity)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def masks_to_boxes(masks):
    """``(N, H, W)`` bool masks → ``(N, 4)`` xyxy boxes (inclusive-exclusive
    pixel convention: x2/y2 = last index + 1; empty mask → zeros)."""
    masks = jnp.asarray(masks, bool)
    N, H, W = masks.shape
    rows = jnp.any(masks, axis=2)  # (N, H)
    cols = jnp.any(masks, axis=1)  # (N, W)
    yidx = jnp.arange(H)
    xidx = jnp.arange(W)
    y1 = jnp.min(jnp.where(rows, yidx, H), axis=1)
    y2 = jnp.max(jnp.where(rows, yidx + 1, 0), axis=1)
    x1 = jnp.min(jnp.where(cols, xidx, W), axis=1)
    x2 = jnp.max(jnp.where(cols, xidx + 1, 0), axis=1)
    empty = ~jnp.any(rows, axis=1)
    box = jnp.stack([x1, y1, x2, y2], axis=-1).astype(jnp.float32)
    return jnp.where(empty[:, None], 0.0, box)


def mask_iou(a, b):
    """Pairwise IoU of ``a (N,H,W)`` vs ``b (M,H,W)`` bool masks → (N,M)."""
    a = jnp.asarray(a, bool).reshape(a.shape[0], -1)
    b = jnp.asarray(b, bool).reshape(b.shape[0], -1)
    inter = jnp.einsum("np,mp->nm", a.astype(jnp.float32),
                       b.astype(jnp.float32))
    area_a = jnp.sum(a, axis=1)[:, None]
    area_b = jnp.sum(b, axis=1)[None, :]
    return inter / (area_a + area_b - inter + _EPS)
