"""Masklet (mask-level) video propagation — the SAM3 video model.

Capability parity with the reference's per-frame detect→track loop
(prepare_front_results/sam3/model/sam3_video_base.py:151 ``_det_track_one_
frame``, sam3_video_inference.py:1346 detection step):

  detector (masks) → NMS/threshold → det↔track **mask-IoU** association
  (:1160 ``_associate_det_trk``) → keep-alive / hotstart / duplicate
  bookkeeping (:1311 ``_process_hotstart``) → occlusion suppression of
  overlapping masks (:819) → pixelwise non-overlap + shrink suppression
  before memory encoding (sam3_tracking_predictor.py:1332) → per-object
  memory-conditioned propagation (SAM-2 style) → per-frame outputs of
  per-object masks + scores (:935 ``build_outputs``).

TPU-native redesign: the reference manages masklets in Python dicts
sharded over GPUs by an object→GPU map, with gloo broadcasts of the update
plan every frame. Here the whole lifecycle is a **pure function over
fixed-capacity object slots** (struct-of-arrays ``MaskletState``) — one
fused XLA program per frame, no host round-trips; the object axis of the
per-slot memory banks shards over a mesh axis (EP) with XLA collectives
instead of the reference's NCCL all_gathers.

Deviations (documented):
  - fixed slot capacity K = the reference's ``max_num_objects`` (its
    score-ranked drop of over-limit new detections is reproduced by the
    score-ranked spawn into free slots);
  - new same-frame object ids are assigned in score order (the reference
    assigns in detection-index order);
  - duplicate-overlap counts increment at most once per frame per slot
    pair (the reference appends once per overlapping detection, so two
    detections covering the same pair inflate its count within a frame).

Reverse propagation (``MaskletConfig.reverse=True``) follows the
reference's ``reverse`` handling exactly (sam3_video_base.py:1338,1383,
1424: hotstart_diff flips to ``frame_idx + delay`` with a ``<``
comparison; :1417 first-appearer of a duplicate pair becomes the
``max`` over first frames; :1046 the occlusion cmp_op flips gt→lt —
including the reference's quirk that a never-occluded slot's ``-1``
sentinel compares as most-recently-occluded under lt) and the frame
counter decrements.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from skix.ops.masks import fill_holes_in_mask_scores, mask_iou, masks_to_boxes

NO_OBJ_LOGIT = -10.0          # reference NO_OBJ_LOGIT (sam3_video_base.py:887)
_NEVER_OCCLUDED = -1          # reference NEVER_OCCLUDED
_ALWAYS_OCCLUDED = 1 << 20    # reference ALWAYS_OCCLUDED (removed slots)
_BIG = 1 << 20


@dataclasses.dataclass(frozen=True)
class MaskletConfig:
    """Reference ``Sam3VideoBase.__init__`` knobs (sam3_video_base.py:36-80)
    with the same defaults, plus the fixed slot/detection capacities."""

    max_objects: int = 16              # K slots (max_num_objects)
    max_dets: int = 16                 # N detection slots entering the step
    score_threshold_detection: float = 0.5
    det_nms_thresh: float = 0.0        # 0 = NMS disabled (reference default)
    assoc_iou_thresh: float = 0.5      # det↔trk "matched" threshold
    trk_assoc_iou_thresh: float = 0.5  # trk "unmatched" threshold
    new_det_thresh: float = 0.5        # min score to spawn a masklet
    hotstart_delay: int = 0            # 0 = hotstart removal disabled
    hotstart_unmatch_thresh: int = 3
    hotstart_dup_thresh: int = 3
    suppress_unmatched_only_within_hotstart: bool = True
    init_trk_keep_alive: int = 0
    max_trk_keep_alive: int = 8
    min_trk_keep_alive: int = -4
    occlusion_suppress_iou: float = 0.0   # 0 = disabled (reference default)
    decrease_keep_alive_for_empty: bool = False
    confirmation_consecutive_det: int = 3
    shrink_suppress_ratio: float = 0.3    # _suppress_shrinked_masks
    fill_hole_area: int = 16              # fill_holes_in_mask_scores max_area
    # flash-kernel memory attention with exact invalid-slot correction
    # (1.5× the slot scan at 8 obj @512 px on v5e; inference-only)
    dense_memory_attention: bool = True
    # reverse-time propagation: frame counter decrements and the hotstart /
    # duplicate / occlusion comparisons flip (reference ``reverse`` arg)
    reverse: bool = False


class MaskletState(NamedTuple):
    """Fixed-capacity struct-of-arrays masklet bookkeeping (K slots).

    The reference spreads this over ``tracker_metadata`` /
    ``rank0_metadata`` dicts (sam3_video_base.py:1601-1639); here every
    field is a static-shape array so a frame update jits into one program.
    """

    active: jnp.ndarray          # (K,) bool
    obj_id: jnp.ndarray          # (K,) int32, −1 = free slot
    spawn_score: jnp.ndarray     # (K,) f32 — obj_id_to_score (det at spawn)
    first_frame: jnp.ndarray     # (K,) int32 — obj_first_frame_idx
    keep_alive: jnp.ndarray      # (K,) int32 — trk_keep_alive
    unmatched_count: jnp.ndarray  # (K,) int32 — len(unmatched_frame_inds)
    consec_det: jnp.ndarray      # (K,) int32 — consecutive_det_num
    confirmed: jnp.ndarray       # (K,) bool — CONFIRMED status
    last_occluded: jnp.ndarray   # (K,) int32 — obj_id_to_last_occluded
    overlap_count: jnp.ndarray   # (K, K) int32 — overlap_pair_to_frame_inds
    frame_idx: jnp.ndarray       # () int32
    next_id: jnp.ndarray         # () int32


def init_masklet_state(cfg: MaskletConfig,
                       start_frame: int = 0) -> MaskletState:
    """``start_frame``: the global index of the first frame this pass
    visits (reverse passes count DOWN from it)."""
    K = cfg.max_objects
    return MaskletState(
        active=jnp.zeros(K, bool),
        obj_id=jnp.full(K, -1, jnp.int32),
        spawn_score=jnp.zeros(K, jnp.float32),
        first_frame=jnp.zeros(K, jnp.int32),
        keep_alive=jnp.zeros(K, jnp.int32),
        unmatched_count=jnp.zeros(K, jnp.int32),
        consec_det=jnp.zeros(K, jnp.int32),
        confirmed=jnp.zeros(K, bool),
        last_occluded=jnp.full(K, _NEVER_OCCLUDED, jnp.int32),
        overlap_count=jnp.zeros((K, K), jnp.int32),
        frame_idx=jnp.asarray(start_frame, jnp.int32),
        next_id=jnp.asarray(0, jnp.int32),
    )


def masklet_update(state: MaskletState, trk_mask_logits, det_mask_logits,
                   det_scores, det_valid, cfg: MaskletConfig):
    """One frame of masklet lifecycle: associate → bookkeep → suppress →
    spawn. Pure and fixed-shape (jit/scan-safe).

    ``trk_mask_logits (K, h, w)``: per-slot propagated mask logits (from
    the memory tracker; garbage at inactive slots — gated internally).
    ``det_mask_logits (N, h, w)``, ``det_scores (N,)`` post-sigmoid,
    ``det_valid (N,)``: thresholded/NMS'd detections in fixed slots.

    Returns ``(new_state, out)`` where ``out`` carries per-slot
    ``out_mask_logits`` (what the frame reports: occlusion- and
    keep-alive-suppressed), ``mem_mask_logits`` (what memory encoding
    should consume: additionally pixel-non-overlap + shrink suppressed),
    spawn/match/removal flags and ``best_det`` indices.
    """
    K = cfg.max_objects
    N = det_mask_logits.shape[0]
    frame_idx = state.frame_idx
    active = state.active
    det_valid = jnp.asarray(det_valid, bool)

    trk_bin = (trk_mask_logits > 0) & active[:, None, None]
    det_bin = (det_mask_logits > 0) & det_valid[:, None, None]
    iou = mask_iou(det_bin, trk_bin)                      # (N, K)
    pair_ok = det_valid[:, None] & active[None, :]
    iou = jnp.where(pair_ok, iou, 0.0)

    trk_nonempty = jnp.any(trk_bin, axis=(-2, -1))        # (K,)
    # trk "matched" at the strict threshold (unmatched determination,
    # reference _associate_det_trk: trk_is_matched any over dets)
    trk_matched_strict = jnp.any(iou >= cfg.trk_assoc_iou_thresh, axis=0)
    unmatched = active & trk_nonempty & ~trk_matched_strict
    empty_trk = active & ~trk_nonempty

    # det→trk matched matrix at the loose threshold (det_to_matched lists)
    M = (iou >= cfg.assoc_iou_thresh) & pair_ok           # (N, K)
    trk_matched_loose = jnp.any(M, axis=0)                # matched_trks

    # ---- keep-alive (reference _process_hotstart steps 1-2) ----
    ka = state.keep_alive
    ka = jnp.where(trk_matched_loose,
                   jnp.minimum(cfg.max_trk_keep_alive, ka + 1), ka)
    ka = jnp.where(unmatched,
                   jnp.maximum(cfg.min_trk_keep_alive, ka - 1), ka)
    if cfg.decrease_keep_alive_for_empty:
        ka = jnp.where(empty_trk,
                       jnp.maximum(cfg.min_trk_keep_alive, ka - 1), ka)
    unmatched_count = state.unmatched_count + unmatched.astype(jnp.int32)

    # ---- new detections (reference: is_new_det) ----
    is_new = det_valid & (det_scores >= cfg.new_det_thresh) & \
        ~jnp.any(M, axis=1)

    # ---- hotstart removal: unmatched-too-long within the window ----
    # (reverse flips the window: first_frame < frame_idx + delay,
    # reference sam3_video_base.py:1336-1340,1383-1384)
    if cfg.reverse:
        within_hotstart = \
            state.first_frame < (frame_idx + cfg.hotstart_delay)
    else:
        within_hotstart = \
            state.first_frame > (frame_idx - cfg.hotstart_delay)
    removed_unmatch = active & within_hotstart & \
        (unmatched_count >= cfg.hotstart_unmatch_thresh)

    # ---- duplicate bookkeeping: pairs matched to one detection ----
    dup_det = det_valid & (jnp.sum(M, axis=1) >= 2)       # (N,)
    # first-appearer = min first_frame forward, max in reverse
    # (reference :1414-1419); ties break on slot index either way
    ff_key = -state.first_frame if cfg.reverse else state.first_frame
    slot_key = jnp.where(M, ff_key[None, :] * K
                         + jnp.arange(K)[None, :], _BIG)
    earliest = jnp.argmin(slot_key, axis=1)               # (N,) first-appear
    pair_inc = jnp.any(
        dup_det[:, None, None]
        & M[:, None, :]                                    # later slot k
        & (earliest[:, None, None] == jnp.arange(K)[None, :, None])
        & (jnp.arange(K)[None, :, None] != jnp.arange(K)[None, None, :]),
        axis=0)                                            # (K, K) [first, k]
    overlap_count = state.overlap_count + pair_inc.astype(jnp.int32)
    removed_dup = active & within_hotstart & \
        jnp.any(overlap_count >= cfg.hotstart_dup_thresh, axis=0)

    removed = removed_unmatch | removed_dup
    alive = active & ~removed

    # ---- keep-alive output suppression (track continues) ----
    ka_suppressed = jnp.zeros(K, bool)
    if not cfg.suppress_unmatched_only_within_hotstart:
        ka_suppressed = alive & (ka <= 0) & (unmatched_count >= 1)

    # ---- occlusion suppression of overlapping propagated masks ----
    occ_suppressed = jnp.zeros(K, bool)
    if cfg.occlusion_suppress_iou > 0.0:
        locc = jnp.where(removed, _ALWAYS_OCCLUDED, state.last_occluded)
        tiou = mask_iou(trk_bin, trk_bin)
        both = active[:, None] & active[None, :] \
            & ~jnp.eye(K, dtype=bool)
        overlapping = (tiou >= cfg.occlusion_suppress_iou) & both
        # x loses to y if x was occluded more recently than y (and y was
        # ever occluded) — reference :1047-1064; reverse flips the cmp_op
        # (gt→lt, :1046) INCLUDING the reference's sentinel quirk (a
        # never-occluded slot's −1 compares as most-recent under lt)
        recency = (locc[:, None] < locc[None, :]) if cfg.reverse \
            else (locc[:, None] > locc[None, :])
        loses = overlapping & recency \
            & (locc[None, :] > _NEVER_OCCLUDED)
        occ_suppressed = jnp.any(loses, axis=1) & alive
    is_occluded = active & ~trk_nonempty
    last_occluded = jnp.where(is_occluded | occ_suppressed,
                              frame_idx, state.last_occluded)

    # suppressed masks flattened to NO_OBJ before output + memory encoding
    trk_out = jnp.where((occ_suppressed | ~active)[:, None, None],
                        NO_OBJ_LOGIT, trk_mask_logits)

    # ---- memory-encoding masks: pixel non-overlap + shrink suppression
    # (reference _suppress_object_pw_area_shrinkage) ----
    part = jnp.where(alive[:, None, None], trk_out, -jnp.inf)
    winner = jnp.argmax(part, axis=0)                     # (h, w)
    keep_px = winner[None] == jnp.arange(K)[:, None, None]
    nonover = jnp.where(keep_px, trk_out,
                        jnp.minimum(trk_out, NO_OBJ_LOGIT))
    area_before = jnp.maximum(
        jnp.sum(trk_out > 0, axis=(-2, -1)).astype(jnp.float32), 1.0)
    area_after = jnp.sum(nonover > 0, axis=(-2, -1)).astype(jnp.float32)
    shrunk = alive & (area_after / area_before < cfg.shrink_suppress_ratio)
    mem_mask_logits = jnp.where(shrunk[:, None, None],
                                jnp.minimum(trk_out, NO_OBJ_LOGIT), trk_out)

    # ---- spawn score-ranked new detections into free slots ----
    order = jnp.argsort(jnp.where(is_new, -det_scores, jnp.inf))
    ranks = jnp.zeros(N, jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32))
    det_rank = jnp.where(is_new, ranks, _BIG)
    free = ~alive
    free_rank = jnp.where(free, jnp.cumsum(free.astype(jnp.int32)) - 1,
                          _BIG + 1)
    hit = det_rank[None, :] == free_rank[:, None]         # (K, N)
    spawn = free & jnp.any(hit, axis=1)
    spawn_det = jnp.where(spawn, jnp.argmax(hit, axis=1), 0)
    new_ids = state.next_id + jnp.where(free_rank < K, free_rank, 0)

    obj_id = jnp.where(spawn, new_ids,
                       jnp.where(alive, state.obj_id, -1))
    spawn_score = jnp.where(spawn, det_scores[spawn_det],
                            jnp.where(alive, state.spawn_score, 0.0))
    first_frame = jnp.where(spawn, frame_idx, state.first_frame)
    ka = jnp.where(spawn, cfg.init_trk_keep_alive, ka)
    unmatched_count = jnp.where(spawn, 0, unmatched_count)
    last_occluded = jnp.where(spawn, _NEVER_OCCLUDED, last_occluded)

    # confirmation (reference update_masklet_confirmation_status): matched
    # this frame = spawned or det-matched; consecutive count; sticky status
    is_matched = spawn | (alive & trk_matched_loose)
    consec = jnp.where(is_matched,
                       jnp.where(spawn, 1, state.consec_det + 1), 0)
    confirmed = (state.confirmed & alive & ~spawn) | \
        (consec >= cfg.confirmation_consecutive_det)

    # overlap-pair counts reset for freed and (re)spawned slots
    stale = spawn | (~alive & ~spawn)
    overlap_count = jnp.where(stale[:, None] | stale[None, :], 0,
                              overlap_count)

    active_new = alive | spawn

    # per-frame output masks: survivors report the (suppressed) propagated
    # mask, spawns report their detection mask (reference build_outputs
    # parts 1+2); keep-alive-suppressed slots are hidden in the output
    # only (reference suppressed_obj_ids postprocessing)
    out_mask_logits = jnp.where(
        spawn[:, None, None], det_mask_logits[spawn_det],
        jnp.where((alive & ~ka_suppressed)[:, None, None], trk_out,
                  NO_OBJ_LOGIT))
    # memory input for spawns is their det mask (reference add_new_mask)
    mem_mask_logits = jnp.where(spawn[:, None, None],
                                det_mask_logits[spawn_det], mem_mask_logits)

    best_det = jnp.argmax(iou.T, axis=1)                  # (K,) best det/trk
    new_state = MaskletState(
        active=active_new, obj_id=obj_id, spawn_score=spawn_score,
        first_frame=first_frame, keep_alive=ka,
        unmatched_count=unmatched_count, consec_det=consec,
        confirmed=confirmed, last_occluded=last_occluded,
        overlap_count=overlap_count,
        frame_idx=frame_idx + (-1 if cfg.reverse else 1),
        next_id=state.next_id + jnp.sum(spawn.astype(jnp.int32)))
    out = {
        "active": active_new, "obj_id": obj_id, "confirmed": confirmed,
        "spawn": spawn, "spawn_det": spawn_det, "removed": removed,
        "matched": alive & trk_matched_loose, "best_det": best_det,
        "out_mask_logits": out_mask_logits,
        "mem_mask_logits": mem_mask_logits,
        "ka_suppressed": ka_suppressed, "occ_suppressed": occ_suppressed,
        "spawn_score": spawn_score,
    }
    return new_state, out


def track_masklets(det_mask_logits, det_scores, det_valid,
                   cfg: MaskletConfig = MaskletConfig()):
    """Whole-clip mask-IoU tracking WITHOUT a memory tracker: each slot
    carries its last matched detection mask as the propagated mask
    (identity propagation) — the mask-level analog of
    ``lifecycle.track_sequence``. ``det_mask_logits (T, N, h, w)``,
    ``det_scores (T, N)``, ``det_valid (T, N)`` → per-frame slot outputs
    (dict of (T, K, ...)) + carried masks. One jittable ``lax.scan``."""
    K = cfg.max_objects
    h, w = det_mask_logits.shape[-2:]

    def step(carry, inp):
        state, carried = carry
        dm, ds, dv = inp
        new_state, out = masklet_update(state, carried, dm, ds, dv, cfg)
        # carried mask ← matched detection's mask; spawns take theirs
        upd = out["matched"] | out["spawn"]
        src = jnp.where(out["spawn"], out["spawn_det"], out["best_det"])
        carried = jnp.where(upd[:, None, None], dm[src], carried)
        carried = jnp.where(new_state.active[:, None, None], carried,
                            NO_OBJ_LOGIT)
        out["boxes"] = masks_to_boxes(out["out_mask_logits"] > 0)
        return (new_state, carried), out

    carried0 = jnp.full((K, h, w), NO_OBJ_LOGIT, jnp.float32)
    (_, _), outs = jax.lax.scan(
        step, (init_masklet_state(cfg), carried0),
        (jnp.asarray(det_mask_logits), jnp.asarray(det_scores),
         jnp.asarray(det_valid, bool)))
    return outs


# --------------------------------------------------------------------------
# full video model: Sam3Detector + MaskMemoryTracker + masklet lifecycle
# --------------------------------------------------------------------------
def _select_dets(det_boxes_cxcywh, det_score_logits, det_mask_logits,
                 cfg: MaskletConfig, out_hw):
    """Detector outputs (Q queries) → fixed N det slots: sigmoid scores,
    optional box NMS, score-ranked top-N, masks resized to the tracker's
    mask resolution (reference run_backbone_and_detection:333-377)."""
    scores = jax.nn.sigmoid(det_score_logits)             # (Q,)
    if cfg.det_nms_thresh > 0.0:
        from skix.ops.nms import nms

        cx, cy, bw, bh = [det_boxes_cxcywh[:, i] for i in range(4)]
        xyxy = jnp.stack([cx - bw / 2, cy - bh / 2,
                          cx + bw / 2, cy + bh / 2], -1)
        keep = nms(xyxy, scores, iou_threshold=cfg.det_nms_thresh)
        scores = jnp.where(keep, scores, 0.0)
    n = min(cfg.max_dets, scores.shape[0])
    order = jnp.argsort(-scores)[:n]
    sel_scores = scores[order]
    sel_valid = sel_scores > cfg.score_threshold_detection
    sel_masks = det_mask_logits[order]
    sel_masks = jax.image.resize(sel_masks, (n, *out_hw), "bilinear")
    sel_boxes = det_boxes_cxcywh[order]
    return sel_boxes, sel_scores, sel_masks, sel_valid


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _masklet_frame_core(tracker, cfg: MaskletConfig, fill_holes: bool,
                        trk_vars, image_trk, det_boxes, det_score_logits,
                        det_mask_logits, state: MaskletState, banks):
    """One fused frame step given raw detector outputs: tracker trunk →
    per-slot memory propagation → masklet lifecycle → memory writes.
    Static args (tracker module, cfg) key the jit cache — one compile per
    configuration (skix.utils.jitapply convention)."""
    from skix.tracking.memory_tracker import write_conditioning, write_recent

    feats = tracker.apply(trk_vars, image_trk,
                          method=tracker.encode_frame)    # (1, gh, gw, C)
    gh, gw = feats.shape[1], feats.shape[2]

    # per-slot propagation WITHOUT memory write (the reference defers
    # memory encoding until heuristics resolve, sam3_video_base.py:193-197)
    trk_masks, trk_scores = jax.vmap(
        lambda b: tracker.apply(trk_vars, feats, b,
                                cfg.dense_memory_attention,
                                method=tracker.attend_decode))(banks)
    trk_masks = trk_masks[:, 0]                           # (K, gh, gw)
    trk_scores = trk_scores[:, 0]

    dets = _select_dets(det_boxes, det_score_logits, det_mask_logits, cfg,
                        (gh, gw))
    det_boxes_sel, det_scores, det_masks, det_valid = dets
    if fill_holes and cfg.fill_hole_area > 0:
        det_masks = jax.vmap(
            lambda m: fill_holes_in_mask_scores(m, cfg.fill_hole_area))(
            det_masks)
        trk_masks = jax.vmap(
            lambda m: fill_holes_in_mask_scores(m, cfg.fill_hole_area))(
            jnp.where(state.active[:, None, None], trk_masks,
                      NO_OBJ_LOGIT))

    new_state, out = masklet_update(state, trk_masks, det_masks,
                                    det_scores, det_valid, cfg)

    # ---- memory writes (reference _tracker_update_memories +
    # _tracker_add_new_objects): one encoder pass per slot ----
    encoded = jax.vmap(
        lambda m: tracker.apply(trk_vars, feats[0], m,
                                method=tracker.encode_memory))(
        out["mem_mask_logits"])                           # (K, gh, gw, C)

    def write_slot(bank, enc, is_spawn, is_alive):
        # spawn: reset the bank, pin conditioning slot 0
        reset = bank._replace(
            mem=jnp.zeros_like(bank.mem),
            valid=jnp.zeros_like(bank.valid),
            ring_pos=jnp.ones_like(bank.ring_pos))
        spawned = write_conditioning(reset, enc)
        survived = write_recent(bank, enc)
        pick = lambda a, b: jnp.where(is_spawn, a, b)  # noqa: E731
        merged = jax.tree.map(pick, spawned, survived)
        keep = lambda a, b: jnp.where(is_spawn | is_alive, a, b)  # noqa: E731
        return jax.tree.map(keep, merged, bank)

    banks = jax.vmap(write_slot)(banks, encoded, out["spawn"],
                                 out["active"] & ~out["spawn"])

    out["trk_scores"] = jax.nn.sigmoid(trk_scores)
    out["boxes_lowres"] = masks_to_boxes(out["out_mask_logits"] > 0)
    out["det_boxes"] = det_boxes_sel
    return new_state, banks, out


@functools.partial(jax.jit, static_argnums=(1, 2))
def _upsample_masks(logits, out_h: int, out_w: int):
    up = jax.image.resize(logits, (logits.shape[0], out_h, out_w),
                          "bilinear")
    return up > 0


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _full_frame_step(detector, tracker, cfg: MaskletConfig,
                     fill_holes: bool, is_u8: bool, det_size: int,
                     trk_size: int, det_vars, trk_vars, frame, text,
                     state: MaskletState, banks, text_pad=None):
    """prep → detector → tracker/lifecycle/memory as ONE program.

    One dispatch per frame: the 3-dispatch version (prep / detect / core)
    measured 349 ms/frame where the parts sum to 146 ms — each dispatch
    whose arguments depend on the previous call's outputs serializes a
    round-trip through the axon relay (scripts/bench_masklet_video.py).

    ``text_pad (L,)`` bool (True = PAD): the CLIP tower's token validity,
    forwarded to the detector's fusion encoder so PAD embeddings don't
    enter the text memory (Sam3Detector text_pad_mask)."""
    det_in, tin = _prep_frame(frame, is_u8, det_size, trk_size)
    if text_pad is not None:
        det = detector.apply(det_vars, det_in, text[None], text_pad[None])
    else:
        det = detector.apply(det_vars, det_in, text[None])
    return _masklet_frame_core(tracker, cfg, fill_holes, trk_vars, tin,
                               det.boxes_cxcywh[0], det.scores[0],
                               det.mask_logits[0], state, banks)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _scan_frame_chunk(detector, tracker, cfg: MaskletConfig,
                      fill_holes: bool, is_u8: bool, det_size: int,
                      trk_size: int, det_vars, trk_vars, frames, valid,
                      text, state: MaskletState, banks, text_pad=None):
    """C frames as ONE program: ``lax.scan`` over the fused frame step.

    ``valid (C,)`` masks tail padding — an invalid step still computes
    (same program every chunk) but its state/bank updates are discarded,
    so the caller pads the last chunk instead of compiling a second
    program per tail length. Amortizes the per-frame dispatch + readback
    round-trips of :meth:`MaskletVideoModel.propagate` across the chunk.
    """

    def body(carry, inp):
        state, banks = carry
        frame, ok = inp
        ns, nb, out = _full_frame_step(detector, tracker, cfg, fill_holes,
                                       is_u8, det_size, trk_size,
                                       det_vars, trk_vars, frame, text,
                                       state, banks, text_pad=text_pad)
        ns = jax.tree.map(lambda a, b: jnp.where(ok, a, b), ns, state)
        nb = jax.tree.map(lambda a, b: jnp.where(ok, a, b), nb, banks)
        return (ns, nb), out

    (state, banks), outs = jax.lax.scan(body, (state, banks),
                                        (frames, valid))
    return state, banks, outs


@functools.partial(jax.jit, static_argnums=(1, 2))
def _upsample_pack_masks(logits, out_h: int, out_w: int):
    """Upsample + threshold + PACK TO BITS on device: (..., gh, gw)
    logits → (..., ceil(out_h·out_w/8)) uint8. The full-res bool masks
    are 7.4 MB/frame at 720p×8 objects — through the axon relay
    (~26 MB/s measured) that download dominated propagate_clip
    (594 ms/frame vs the 119 ms compute). Packed bits cut the transfer
    8×; :func:`_unpack_masks` restores the EXACT same bool array."""
    lead = logits.shape[:-2]
    up = jax.image.resize(logits, (*lead, out_h, out_w), "bilinear") > 0
    return jnp.packbits(up.reshape(*lead, out_h * out_w), axis=-1)


def _unpack_masks(packed: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side inverse of :func:`_upsample_pack_masks` (exact)."""
    packed = np.asarray(packed)
    flat = np.unpackbits(packed, axis=-1, count=out_h * out_w)
    return flat.reshape(*packed.shape[:-1], out_h, out_w).astype(bool)


def _frame_outputs(out_hw, lowres_hw, mask, logits, boxes_lowres, obj_id,
                   active, confirmed, score, trk_score) -> dict:
    """ONE source for the per-frame session output dict (the streaming
    and chunk-scanned paths must stay byte-identical — session.py routes
    between them on geometry presence). ``boxes_lowres`` are xyxy on the
    logits grid (``lowres_hw``) and scale to ``out_hw`` here. ``logits``
    is None when the caller opted out of the low-res download
    (``include_lowres_logits=False`` — the session drops them, and the
    f32 transfer costs ~0.5 MB/frame through the relay)."""
    lh, lw = lowres_hw
    boxes = np.array(boxes_lowres, np.float32)       # writable copy
    boxes[..., [0, 2]] *= out_hw[1] / lw
    boxes[..., [1, 3]] *= out_hw[0] / lh
    out = {
        "mask": np.asarray(mask),
        "boxes": boxes,
        "obj_id": np.asarray(obj_id),
        "active": np.asarray(active),
        "confirmed": np.asarray(confirmed),
        "score": np.asarray(score),
        "tracker_score": np.asarray(trk_score),
    }
    if logits is not None:
        out["mask_logits_lowres"] = np.asarray(logits)
    return out


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _prep_frame(frame, is_u8: bool, det_size: int, trk_size: int):
    """uint8/float frame → (det input, tracker input), one jitted program
    (eager resize/scale between the two jitted model calls costs a
    per-frame relay dispatch through the axon tunnel — CLAUDE.md)."""
    img = frame.astype(jnp.float32)
    if is_u8:
        img = img / 255.0
    det_in = jax.image.resize(img[None], (1, det_size, det_size, 3),
                              "bilinear")
    tin = det_in if trk_size == det_size else jax.image.resize(
        img[None], (1, trk_size, trk_size, 3), "bilinear")
    return det_in, tin


@functools.partial(jax.jit, static_argnums=0)
def _detect_with_geometry(detector, variables, images, prompt, geometry):
    """Geometry-prompted detector call, jit-cached at module level (the
    per-clip closure-jit pattern recompiles every call — CLAUDE.md)."""
    return detector.apply(variables, images, prompt, **geometry)


class MaskletVideoModel:
    """The integrated SAM3 video model: a promptable detector producing
    masks + a per-object mask-memory tracker + the masklet lifecycle.

    Mirrors the reference ``Sam3VideoBase(detector, tracker)`` composition
    (sam3_video_base.py:35) as a plain class around two jitted programs
    per frame (detector forward; fused tracker/lifecycle step).
    """

    def __init__(self, detector, det_variables, tracker, trk_variables,
                 cfg: MaskletConfig = MaskletConfig(),
                 fill_holes: bool = False, trk_img_size=None):
        self.detector = detector
        self.det_variables = det_variables
        self.tracker = tracker
        self.trk_variables = trk_variables
        self.cfg = cfg
        self.fill_holes = fill_holes
        # tracker input resolution: explicit > tracker.img_size > detector's
        self.trk_img_size = (trk_img_size
                             or getattr(tracker, "img_size", None)
                             or detector.img_size)

    def init_state(self, trk_img_hw, start_frame: int = 0):
        """(state, banks) for a video at the tracker input resolution."""
        import numpy as _np

        gh = trk_img_hw[0]
        gw = trk_img_hw[1]
        # probe the trunk's feature resolution once (host-side, cheap)
        probe = jax.eval_shape(
            lambda v, x: self.tracker.apply(v, x,
                                            method=self.tracker.encode_frame),
            self.trk_variables,
            jax.ShapeDtypeStruct((1, gh, gw, 3), jnp.float32))
        fh, fw, C = probe.shape[1], probe.shape[2], probe.shape[3]
        from skix.tracking.memory_tracker import init_memory

        bank0 = init_memory(self.tracker.mem_slots, fh, fw, C)
        banks = jax.tree.map(
            lambda x: jnp.broadcast_to(
                x[None], (self.cfg.max_objects, *_np.shape(x))).copy(),
            bank0)
        return init_masklet_state(self.cfg, start_frame), banks

    def step(self, frame, prompt_tokens, state, banks, geometry=None,
             text_pad=None):
        """One frame: ``frame (H, W, 3)`` uint8/float, ``prompt_tokens
        (L, d_model)`` from the CLIP tower (or hash smoke embedding).
        ``geometry``: optional fixed-slot point/box prompt dict for THIS
        frame (session ``add_prompt`` path). ``text_pad (L,)`` bool
        (True = PAD) masks CLIP padding tokens out of the detector's
        text memory. Returns (state, banks, device outputs dict)."""
        size = self.detector.img_size
        trk_size = self.trk_img_size
        is_u8 = frame.dtype == np.uint8
        if not geometry:
            # the hot path: ONE dispatch per frame (349 → ~150 ms/frame
            # through the axon relay; see _full_frame_step docstring)
            return _full_frame_step(
                self.detector, self.tracker, self.cfg, self.fill_holes,
                is_u8, size, trk_size, self.det_variables,
                self.trk_variables, jnp.asarray(frame), prompt_tokens,
                state, banks, text_pad=text_pad)
        det_in, tin = _prep_frame(jnp.asarray(frame), is_u8, size, trk_size)
        if text_pad is not None:
            geometry = dict(geometry, text_pad_mask=text_pad[None])
        det = _detect_with_geometry(self.detector, self.det_variables,
                                    det_in, prompt_tokens[None], geometry)
        state, banks, out = _masklet_frame_core(
            self.tracker, self.cfg, self.fill_holes, self.trk_variables,
            tin, det.boxes_cxcywh[0], det.scores[0], det.mask_logits[0],
            state, banks)
        return state, banks, out

    def propagate(self, frames, prompt_tokens, yield_masks_at=None,
                  upload_chunk: int = 32, geometry_by_frame=None,
                  include_lowres_logits: bool = True,
                  start_frame: int = 0, text_pad=None):
        """Stream per-frame outputs over ``frames (T, H, W, 3)``.

        Yields ``{frame_index, outputs}`` where outputs carry per-slot
        ``mask`` ((K, H', W') bool at ``yield_masks_at`` resolution,
        default the video resolution), ``mask_logits_lowres``, ``boxes``
        (xyxy at output resolution), ``obj_id``, ``active``, ``score``
        (spawn det score, reference obj_id_to_score) and ``tracker_score``
        (reference obj_id_to_tracker_score).

        ``geometry_by_frame``: optional {frame_index: fixed-slot geometry
        prompt dict} (the session ``add_prompt`` path) — frames with
        geometry take the decomposed step; all others stay on the fused
        one-dispatch hot path.

        ``include_lowres_logits=False`` skips the per-frame f32 logits
        download (~0.5 MB/frame through the relay) for callers that only
        consume the packed masks (the session predictor).

        ``start_frame``: global index of ``frames[0]`` — the lifecycle's
        frame counter starts there (and counts DOWN under
        ``cfg.reverse``), keeping first-frame/hotstart bookkeeping in
        global terms like the reference. All lifecycle comparisons are
        shift-invariant, so this does not change which masks come out."""
        T, H, W = frames.shape[:3]
        out_hw = (H, W) if yield_masks_at is None else tuple(yield_masks_at)
        state, banks = self.init_state((self.trk_img_size,) * 2,
                                       start_frame=start_frame)
        chunk_dev = None

        def drain(pend):
            t, dev, lowres_hw = pend
            host = jax.device_get(dev)
            yield {
                "frame_index": t,
                "outputs": _frame_outputs(
                    out_hw, lowres_hw, _unpack_masks(host[0], *out_hw),
                    host[1] if include_lowres_logits else None,
                    *host[2:]),
            }

        pending = None   # one-frame lookahead: frame t+1 computes on
        # device while frame t's outputs cross the relay
        for t in range(T):
            # upload frames in chunks and slice on device: per-frame
            # host→device transfers of a 720p frame through the axon
            # relay cost more than the tracker core itself
            # (scripts/bench_masklet_video.py host-vs-device rows)
            if t % upload_chunk == 0:
                chunk_dev = jnp.asarray(frames[t:t + upload_chunk])
            geometry = (geometry_by_frame or {}).get(t)
            state, banks, out = self.step(chunk_dev[t % upload_chunk],
                                          prompt_tokens, state, banks,
                                          geometry=geometry,
                                          text_pad=text_pad)
            logits = out["out_mask_logits"]               # (K, gh, gw)
            dev = (_upsample_pack_masks(logits, *out_hw),
                   logits if include_lowres_logits else jnp.zeros(()),
                   out["boxes_lowres"], out["obj_id"], out["active"],
                   out["confirmed"], out["spawn_score"],
                   out["trk_scores"])
            if pending is not None:
                yield from drain(pending)
            pending = (t, dev, logits.shape[-2:])
        if pending is not None:
            yield from drain(pending)

    def propagate_clip(self, frames, prompt_tokens, yield_masks_at=None,
                       chunk: int = 8, include_lowres_logits: bool = True,
                       start_frame: int = 0, text_pad=None):
        """Chunk-scanned propagation: ``chunk`` frames per dispatch.

        Same per-frame output dicts as :meth:`propagate`, but the frame
        loop runs as a ``lax.scan`` inside one jitted program per chunk
        (:func:`_scan_frame_chunk`) — upload, C frame steps, and ONE
        stacked readback per chunk instead of a dispatch + readback
        round-trip per frame through the relay. The last chunk pads with
        repeated frames and masks them to no-ops (single compiled
        program regardless of T). Geometry prompts are not supported on
        this path — use :meth:`propagate`. ``start_frame`` as in
        :meth:`propagate`."""
        T, H, W = frames.shape[:3]
        out_hw = (H, W) if yield_masks_at is None else tuple(yield_masks_at)
        state, banks = self.init_state((self.trk_img_size,) * 2,
                                       start_frame=start_frame)
        is_u8 = frames.dtype == np.uint8

        def drain(pend):
            s, e, dev, lowres_hw = pend
            # ONE batched device→host pull for the whole chunk (per-key
            # np.asarray would serialize a readback round-trip each)
            host = jax.device_get(dev)
            masks = _unpack_masks(host[0], *out_hw)   # (C, K, H, W)
            for i in range(e - s):
                yield {
                    "frame_index": s + i,
                    "outputs": _frame_outputs(
                        out_hw, lowres_hw, masks[i],
                        host[1][i] if include_lowres_logits else None,
                        *(a[i] for a in host[2:])),
                }

        pending = None   # one-chunk lookahead: the device computes
        # chunk i+1 while the host pulls chunk i over the relay —
        # dispatch is async, device_get overlaps the next chunk's work
        for s in range(0, T, chunk):
            e = min(s + chunk, T)
            fr = frames[s:e]
            if e - s < chunk:
                fr = np.concatenate(
                    [fr, np.repeat(fr[-1:], chunk - (e - s), axis=0)])
            ok = jnp.arange(chunk) < (e - s)
            state, banks, outs = _scan_frame_chunk(
                self.detector, self.tracker, self.cfg, self.fill_holes,
                is_u8, self.detector.img_size, self.trk_img_size,
                self.det_variables, self.trk_variables, jnp.asarray(fr),
                ok, prompt_tokens, state, banks, text_pad=text_pad)
            logits = outs["out_mask_logits"]          # (C, K, gh, gw)
            dev = (_upsample_pack_masks(logits, *out_hw),
                   logits if include_lowres_logits else jnp.zeros(()),
                   outs["boxes_lowres"], outs["obj_id"], outs["active"],
                   outs["confirmed"], outs["spawn_score"],
                   outs["trk_scores"])
            if pending is not None:
                yield from drain(pending)
            pending = (s, e, dev, logits.shape[-2:])
        if pending is not None:
            yield from drain(pending)
