"""Masklet/track lifecycle as a fixed-capacity ``lax.scan`` over frames.

The reference's SAM3 video tracker manages object ("masklet") lifecycle in
Python dicts with NCCL-sharded per-object state (sam3/model/
sam3_video_base.py:35-80, sam3_video_inference.py: detection NMS, det↔track
IoU association, keep-alive scores, hotstart delay buffer, duplicate
suppression, confirmation status, occlusion-based suppression; SURVEY.md
§2.8/§7.3 flags this as intrinsically sequential/stateful).

TPU-native redesign: **fixed-capacity object slots** (max_objects) in a
struct-of-arrays state; each frame's update is a pure function of
(state, detections) built from masked argmax matching — the whole clip is
ONE ``lax.scan``. The object axis is shardable over a mesh (the reference's
`_get_gpu_id_by_obj_id` object→GPU map becomes a sharded slot axis;
refined-state broadcast becomes an XLA all_gather).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from skix.ops.nms import box_iou

_NEG = -1e9


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    max_objects: int = 16          # fixed slot capacity
    iou_match_threshold: float = 0.3
    det_score_threshold: float = 0.5   # min score to spawn a track
    keep_alive_decay: float = 0.9      # unmatched decay (keep-alive score)
    keep_alive_min: float = 0.2        # kill below this
    max_time_since_update: int = 12    # occlusion tolerance (frames)
    min_hits_to_confirm: int = 3       # hotstart delay before "confirmed"
    duplicate_iou_threshold: float = 0.7
    bbox_momentum: float = 0.7         # matched-box EMA (1 = replace)


class TrackerState(NamedTuple):
    active: jnp.ndarray        # (K,) bool
    confirmed: jnp.ndarray     # (K,) bool
    bbox: jnp.ndarray          # (K, 4) xyxy
    score: jnp.ndarray         # (K,)
    keep_alive: jnp.ndarray    # (K,)
    hits: jnp.ndarray          # (K,) consecutive/total matches
    age: jnp.ndarray           # (K,)
    missing: jnp.ndarray       # (K,) frames since last match
    obj_id: jnp.ndarray        # (K,) stable ids (−1 = free slot)
    next_id: jnp.ndarray       # () next id to assign


def init_tracker_state(cfg: TrackerConfig) -> TrackerState:
    K = cfg.max_objects
    return TrackerState(
        active=jnp.zeros(K, bool),
        confirmed=jnp.zeros(K, bool),
        bbox=jnp.zeros((K, 4), jnp.float32),
        score=jnp.zeros(K, jnp.float32),
        keep_alive=jnp.zeros(K, jnp.float32),
        hits=jnp.zeros(K, jnp.int32),
        age=jnp.zeros(K, jnp.int32),
        missing=jnp.zeros(K, jnp.int32),
        obj_id=jnp.full(K, -1, jnp.int32),
        next_id=jnp.asarray(0, jnp.int32),
    )


def _greedy_match(iou, track_ok, det_ok, thresh, rounds: int):
    """Greedy max-IoU assignment; returns (track→det index or −1)."""
    K, N = iou.shape
    masked = jnp.where(track_ok[:, None] & det_ok[None, :], iou, _NEG)

    def body(_, state):
        masked, assign = state
        flat = jnp.argmax(masked)
        ti, di = flat // N, flat % N
        best = masked[ti, di]
        take = best >= thresh
        assign = jnp.where(take, assign.at[ti].set(di), assign)
        masked = jnp.where(take,
                           masked.at[ti, :].set(_NEG).at[:, di].set(_NEG),
                           masked)
        return masked, assign

    _, assign = jax.lax.fori_loop(
        0, rounds, body, (masked, jnp.full(K, -1, jnp.int32)))
    return assign


def tracker_step(state: TrackerState, det_boxes, det_scores, det_valid,
                 cfg: TrackerConfig):
    """One frame: associate → update → spawn → suppress duplicates.

    ``det_boxes (N, 4)``, ``det_scores (N,)``, ``det_valid (N,) bool``.
    Returns ``(new_state, frame_output)`` where frame_output mirrors the
    slot state after the update.
    """
    K = cfg.max_objects
    det_boxes = jnp.asarray(det_boxes)
    det_scores = jnp.asarray(det_scores)
    det_ok = jnp.asarray(det_valid, bool) & (det_scores > 0)
    N = det_boxes.shape[0]

    iou = box_iou(state.bbox, det_boxes)
    assign = _greedy_match(iou, state.active, det_ok,
                           cfg.iou_match_threshold, rounds=min(K, N))
    matched = assign >= 0
    safe = jnp.clip(assign, 0)
    new_box = det_boxes[safe]
    new_score = det_scores[safe]

    m = cfg.bbox_momentum
    bbox = jnp.where(matched[:, None],
                     m * new_box + (1 - m) * state.bbox, state.bbox)
    score = jnp.where(matched, new_score, state.score)
    keep_alive = jnp.where(matched,
                           jnp.maximum(state.keep_alive, new_score),
                           state.keep_alive * cfg.keep_alive_decay)
    hits = jnp.where(matched, state.hits + 1, state.hits)
    missing = jnp.where(matched, 0, state.missing + 1)
    age = jnp.where(state.active, state.age + 1, state.age)
    confirmed = state.confirmed | (hits >= cfg.min_hits_to_confirm)
    alive = state.active & (missing <= cfg.max_time_since_update) & \
        (keep_alive >= cfg.keep_alive_min)

    # duplicate suppression among surviving tracks: kill the lower
    # keep-alive of any overlapping pair (reference duplicate suppression)
    t_iou = box_iou(bbox, bbox)
    eye = jnp.eye(K, dtype=bool)
    overlap = (t_iou > cfg.duplicate_iou_threshold) & ~eye
    both = alive[:, None] & alive[None, :]
    ka_i = keep_alive[:, None]
    ka_j = keep_alive[None, :]
    idx_i = jnp.arange(K)[:, None]
    idx_j = jnp.arange(K)[None, :]
    loses = overlap & both & ((ka_i < ka_j)
                              | ((ka_i == ka_j) & (idx_i > idx_j)))
    alive = alive & jnp.logical_not(jnp.any(loses, axis=1))

    # spawn: unmatched, confident detections into free slots
    det_taken = jnp.zeros(N, bool).at[safe].max(matched)
    spawnable = det_ok & ~det_taken & (det_scores > cfg.det_score_threshold)
    free = ~alive
    det_rank = jnp.cumsum(spawnable.astype(jnp.int32)) - 1   # rank per det
    free_idx = jnp.where(free, jnp.cumsum(free.astype(jnp.int32)) - 1, K + 1)
    # map: detection with rank r goes to the slot whose free-rank == r
    spawn_slot_of_det = jnp.full(N, -1, jnp.int32)
    # build slot→det mapping via searchsorted-free comparison
    slot_rank = free_idx  # (K,) rank among free slots (K+1 if not free)
    det_for_slot = jnp.argmax(
        (det_rank[None, :] == slot_rank[:, None]) & spawnable[None, :],
        axis=1)
    has_det = jnp.any(
        (det_rank[None, :] == slot_rank[:, None]) & spawnable[None, :],
        axis=1)
    spawn = free & has_det
    sd = jnp.clip(det_for_slot, 0)
    bbox = jnp.where(spawn[:, None], det_boxes[sd], bbox)
    score = jnp.where(spawn, det_scores[sd], score)
    keep_alive = jnp.where(spawn, det_scores[sd], keep_alive)
    hits = jnp.where(spawn, 1, jnp.where(alive, hits, 0))
    missing = jnp.where(spawn, 0, missing)
    age = jnp.where(spawn, 1, age)
    confirmed = jnp.where(spawn, cfg.min_hits_to_confirm <= 1,
                          confirmed & alive)
    new_ids = state.next_id + jnp.cumsum(spawn.astype(jnp.int32)) - 1
    obj_id = jnp.where(spawn, new_ids,
                       jnp.where(alive, state.obj_id, -1))
    active = alive | spawn

    new_state = TrackerState(
        active=active, confirmed=confirmed, bbox=bbox, score=score,
        keep_alive=keep_alive, hits=hits, age=age, missing=missing,
        obj_id=obj_id,
        next_id=state.next_id + jnp.sum(spawn.astype(jnp.int32)))
    out = {
        "active": active, "confirmed": confirmed, "bbox": bbox,
        "score": score, "obj_id": obj_id, "keep_alive": keep_alive,
    }
    return new_state, out


def track_sequence(det_boxes, det_scores, det_valid,
                   cfg: TrackerConfig = TrackerConfig()):
    """Whole-clip tracking: ``det_boxes (T, N, 4)``, ``det_scores (T, N)``,
    ``det_valid (T, N)`` → per-frame slot outputs (dict of (T, K, ...)).
    One jit-able ``lax.scan``."""

    def step(state, inp):
        b, s, v = inp
        return tracker_step(state, b, s, v, cfg)

    _, outs = jax.lax.scan(step, init_tracker_state(cfg),
                           (jnp.asarray(det_boxes), jnp.asarray(det_scores),
                            jnp.asarray(det_valid, bool)))
    return outs
