"""Single-athlete selection + missing-frame interpolation as jnp programs.

Capability parity with the reference's per-frame Python logic:
- person selection priority: same track id → nearest previous center →
  largest area (prepare_dataset/model/yolov11_pose.py:234
  ``_select_person_kpts``, detectron2.py:435 ``_pick_person_by_prev_center``);
- missing-frame fill: copy the next valid frame (boundary: previous)
  (prepare_dataset/utils.py:65 ``process_none``).

TPU-first: detections come as fixed-capacity padded arrays
``(T, N, ...)`` with a validity mask; selection is a ``lax.scan`` carrying
the previous center/track id, and hole-filling is two vectorized scans —
no Python loops, whole clip under one jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_BIG = 1e9


class SelectedSequence(NamedTuple):
    keypoints: jnp.ndarray   # (T, 17, 2)
    scores: jnp.ndarray      # (T, 17)
    boxes: jnp.ndarray       # (T, 4) cxcywh
    valid: jnp.ndarray       # (T,) bool — frame had any detection
    none_index: jnp.ndarray  # (T,) bool mask of missing frames (pre-fill)
    sel_idx: jnp.ndarray     # (T,) int — chosen detection slot per frame
    #                          (gathers per-detection payloads the caller
    #                           holds outside this fn, e.g. seg masks)


def select_person_sequence(
    boxes_cxcywh,       # (T, N, 4)
    keypoints,          # (T, N, 17, 2|3)
    kpt_scores=None,    # (T, N, 17)
    det_valid=None,     # (T, N) bool
    track_ids=None,     # (T, N) int (−1 = none)
) -> SelectedSequence:
    """Pick one athlete per frame for the whole clip in one scan."""
    boxes = jnp.asarray(boxes_cxcywh)
    kpts = jnp.asarray(keypoints)
    if kpts.shape[-1] == 3 and kpt_scores is None:
        kpt_scores = kpts[..., 2]
    kpts = kpts[..., :2]
    T, N = boxes.shape[:2]
    if kpt_scores is None:
        kpt_scores = jnp.ones((T, N, kpts.shape[2]), boxes.dtype)
    kpt_scores = jnp.asarray(kpt_scores)
    if det_valid is None:
        det_valid = jnp.ones((T, N), bool)
    det_valid = jnp.asarray(det_valid, bool)
    if track_ids is None:
        track_ids = jnp.full((T, N), -1, jnp.int32)
    track_ids = jnp.asarray(track_ids, jnp.int32)

    centers = boxes[..., :2]
    areas = boxes[..., 2] * boxes[..., 3]

    def step(carry, inp):
        prev_center, prev_ok, prev_tid = carry
        b, c, a, v, tid = inp
        any_det = jnp.any(v)
        # priority 1: same track id as previous frame
        same_id = v & (tid >= 0) & (tid == prev_tid) & (prev_tid >= 0)
        # priority 2: nearest to previous center
        d = jnp.linalg.norm(c - prev_center, axis=-1)
        d = jnp.where(v, d, _BIG)
        # priority 3: largest area
        a_masked = jnp.where(v, a, -_BIG)
        idx = jnp.where(
            jnp.any(same_id), jnp.argmax(same_id),
            jnp.where(prev_ok & any_det, jnp.argmin(d), jnp.argmax(a_masked)))
        sel_center = c[idx]
        new_center = jnp.where(any_det, sel_center, prev_center)
        new_ok = prev_ok | any_det
        new_tid = jnp.where(any_det, tid[idx], prev_tid)
        return (new_center, new_ok, new_tid), (idx, any_det)

    (_, _, _), (sel_idx, frame_valid) = jax.lax.scan(
        step,
        (jnp.zeros((2,), boxes.dtype), jnp.asarray(False),
         jnp.asarray(-1, jnp.int32)),
        (boxes, centers, areas, det_valid, track_ids))

    tsel = jnp.arange(T)
    out_kpts = kpts[tsel, sel_idx]
    out_scores = kpt_scores[tsel, sel_idx]
    out_boxes = boxes[tsel, sel_idx]
    return SelectedSequence(
        keypoints=out_kpts, scores=out_scores, boxes=out_boxes,
        valid=frame_valid, none_index=jnp.logical_not(frame_valid),
        sel_idx=sel_idx)


def fill_invalid_frames(x, valid):
    """Replace invalid frames with the **next** valid frame's value, falling
    back to the previous valid one at the tail (reference
    ``process_none`` semantics). ``x (T, ...)``, ``valid (T,)`` bool."""
    x = jnp.asarray(x)
    valid = jnp.asarray(valid, bool)

    def fwd(carry, inp):  # forward pass: last valid so far
        xt, vt = inp
        cur = jnp.where(vt, xt, carry)
        return cur, cur

    def bwd(carry, inp):  # backward pass: next valid
        xt, vt = inp
        cur = jnp.where(vt, xt, carry)
        return cur, cur

    x0 = jnp.zeros_like(x[0])
    _, prev_fill = jax.lax.scan(fwd, x0, (x, valid))
    _, next_fill_rev = jax.lax.scan(bwd, x0, (x[::-1], valid[::-1]))
    next_fill = next_fill_rev[::-1]
    has_next = jnp.cumsum(valid[::-1])[::-1] > 0
    shape = (slice(None),) + (None,) * (x.ndim - 1)
    v = valid[shape]
    hn = has_next[shape]
    return jnp.where(v, x, jnp.where(hn, next_fill, prev_fill))
