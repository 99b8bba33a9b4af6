"""Non-maximum suppression as a fixed-shape XLA program.

TPU-native replacement for the reference's Triton NMS kernel
(sam3/perflib/triton/nms.py:22-130) and its CPU fallback (perflib/nms.py).

Design: the Triton kernel parallelizes a bitmask over box pairs; on TPU the
right shape is a dense O(N²) IoU matrix (one batched VPU/MXU computation)
followed by a sequential greedy sweep as ``lax.fori_loop`` over the
score-sorted boxes — static shapes, no host sync, works under jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def box_iou(a, b):
    """Pairwise IoU of ``a (N,4)`` vs ``b (M,4)`` xyxy boxes → (N, M)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / (union + _EPS)


def nms(boxes, scores, iou_threshold: float = 0.5, score_threshold: float = -jnp.inf):
    """Greedy NMS. ``boxes (N,4)`` xyxy, ``scores (N,)`` →
    ``keep (N,) bool`` aligned with the input order.

    jit-safe: N is static; suppressed boxes are marked, not removed (use
    ``jnp.where(keep)`` host-side or keep as a mask on-device).
    """
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    b_sorted = boxes[order]
    s_sorted = scores[order]
    iou = box_iou(b_sorted, b_sorted)
    valid = s_sorted > score_threshold

    def body(i, state):
        keep, alive = state
        take = alive[i] & valid[i]
        keep = keep.at[i].set(take)
        suppress = take & (iou[i] > iou_threshold)
        alive = alive & jnp.logical_not(suppress.at[i].set(False))
        return keep, alive

    keep_sorted, _ = jax.lax.fori_loop(
        0, N, body, (jnp.zeros(N, bool), jnp.ones(N, bool)))
    # scatter back to input order
    keep = jnp.zeros(N, bool).at[order].set(keep_sorted)
    return keep


def batched_nms(boxes, scores, class_ids, iou_threshold: float = 0.5,
                score_threshold: float = -jnp.inf):
    """Class-aware NMS (torchvision.batched_nms semantics): offset boxes per
    class so cross-class pairs never overlap."""
    boxes = jnp.asarray(boxes)
    class_ids = jnp.asarray(class_ids)
    span = jnp.max(boxes) - jnp.min(boxes) + 1.0
    offset = class_ids.astype(boxes.dtype)[:, None] * span
    return nms(boxes + offset, scores, iou_threshold, score_threshold)
