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


def _component_areas(mask):
    """Per-pixel area of the connected component each pixel belongs to
    (0 outside ``mask``). Labels come from min-label propagation CCL."""
    from skix.ops.connected_components import connected_components

    labels = connected_components(mask)                 # (H, W), −1 = bg
    H, W = labels.shape
    flat = labels.ravel()
    safe = jnp.clip(flat, 0)
    hist = jnp.zeros(H * W, jnp.int32).at[safe].add(
        (flat >= 0).astype(jnp.int32))
    return jnp.where(flat >= 0, hist[safe], 0).reshape(H, W)


def fill_holes_in_mask_scores(mask, max_area: int, fill_holes: bool = True,
                              remove_sprinkles: bool = True):
    """Fill small background holes (→ +0.1) and remove small foreground
    sprinkles (→ −0.1) in a ``(H, W)`` float mask-logit map.

    Reference parity: sam3/model/sam3_tracker_utils.py:369
    ``fill_holes_in_mask_scores`` (cc_torch/Triton union-find CCL there;
    jit-safe min-label-propagation CCL here). Sprinkle removal thresholds
    at ``min(max_area, total_fg_area // 2)`` like the reference so tiny
    objects are never wiped. ``vmap`` over a leading axis for batches."""
    if max_area <= 0:
        return mask
    mask = jnp.asarray(mask)
    if fill_holes:
        bg = mask <= 0
        areas = _component_areas(bg)
        small_bg = bg & (areas <= max_area)
        mask = jnp.where(small_bg, 0.1, mask)
    if remove_sprinkles:
        fg = mask > 0
        thresh = jnp.minimum(jnp.sum(fg, dtype=jnp.int32) // 2, max_area)
        areas = _component_areas(fg)
        small_fg = fg & (areas <= thresh)
        mask = jnp.where(small_fg, -0.1, mask)
    return mask
