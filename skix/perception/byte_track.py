"""ByteTrack for the 2D-detection stream — fixed-slot Kalman tracking.

Reference capability: ultralytics ``mode="track"`` with
``tracker_type: bytetrack`` drives YOLOv11Pose
(prepare_dataset/model/yolov11_pose.py:173-183), configured by
configs/prepare_dataset.yaml:45-58 (the defaults below are those
values), and person selection prefers the same-track-id detection
(yolov11_pose.py:241-269 → :mod:`skix.perception.selection` priority 1).

TPU-native redesign (original implementation, no upstream code):

- **fixed K slots** in a struct-of-arrays :class:`ByteTrackState`; the
  whole clip is ONE ``lax.scan`` (:func:`track_sequence_ids`);
- an 8-dim XYAH(+velocity) Kalman filter per slot, ``vmap``-ed — the
  SORT-family filter: position noise ∝ h/20, velocity ∝ h/160, closed
  form 8×8 predict / 4×4 solve update;
- ByteTrack's three associations in order: (1) high-score detections vs
  the tracked+lost pool on IoU cost, optionally score-fused
  (``fuse_score``: sim = IoU·score), gate ``match_thresh``; (2)
  low-score detections vs the remaining *tracked* slots, gate 0.5; (3)
  remaining high detections vs unconfirmed tracks, gate 0.7 — matched
  unconfirmed tracks activate, unmatched ones are removed;
- greedy fixed-round assignment by default (identical to Hungarian
  whenever each row's best match is unambiguous — the 1-3 athletes this
  pipeline tracks); ``exact_match=True`` switches every stage to the
  on-device Bertsekas auction LAP with the exact
  ``lap.lapjv(cost_limit=...)`` semantics ultralytics uses;
- lost tracks retire after ``track_buffer`` frames; duplicate
  tracked/lost pairs above IoU 0.85 resolve to the older track
  (ByteTrack ``remove_duplicate_stracks``).

Track ids are emitted only for ACTIVATED tracks (ByteTrack reports
unconfirmed tracks nowhere); the output is the ``(T, N)`` det→track-id
map ``selection.select_person_sequence(track_ids=...)`` consumes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from skix.ops.nms import box_iou

_NEG = -1e9
_WP = 1.0 / 20      # Kalman position std weight (SORT/ByteTrack)
_WV = 1.0 / 160     # Kalman velocity std weight


@dataclasses.dataclass(frozen=True)
class ByteTrackConfig:
    """Defaults = the reference's bytetrack block
    (configs/prepare_dataset.yaml:45-58)."""

    max_tracks: int = 16
    track_high_thresh: float = 0.25   # first-association score split
    track_low_thresh: float = 0.1     # second-association floor
    new_track_thresh: float = 0.25    # spawn gate for unmatched dets
    track_buffer: int = 30            # lost-track retirement (frames)
    match_thresh: float = 0.8         # first-association cost gate
    fuse_score: bool = True           # sim = IoU·score in stage 1
    second_match_thresh: float = 0.5  # ByteTrack hardcodes these two
    unconfirmed_match_thresh: float = 0.7
    exact_match: bool = False         # auction LAP = lap.lapjv semantics


class ByteTrackState(NamedTuple):
    mean: jnp.ndarray       # (K, 8) Kalman mean (xyah + velocities)
    cov: jnp.ndarray        # (K, 8, 8)
    tracked: jnp.ndarray    # (K,) bool — matched on the previous frame
    lost: jnp.ndarray       # (K,) bool — unmatched but inside the buffer
    activated: jnp.ndarray  # (K,) bool — emits its id
    missing: jnp.ndarray    # (K,) frames since last match
    age: jnp.ndarray        # (K,) frames since activation
    score: jnp.ndarray      # (K,)
    obj_id: jnp.ndarray     # (K,) stable ids (−1 = free)
    next_id: jnp.ndarray    # ()
    frame: jnp.ndarray      # () frame counter


def xyxy_to_xyah(b):
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    return jnp.stack([(b[..., 0] + b[..., 2]) / 2,
                      (b[..., 1] + b[..., 3]) / 2,
                      w / jnp.maximum(h, 1e-6), h], -1)


def xyah_to_xyxy(m):
    h = m[..., 3]
    w = m[..., 2] * h
    return jnp.stack([m[..., 0] - w / 2, m[..., 1] - h / 2,
                      m[..., 0] + w / 2, m[..., 1] + h / 2], -1)


def _kalman_initiate(z):
    """Measurement (4,) xyah → (mean (8,), cov (8, 8))."""
    h = z[3]
    mean = jnp.concatenate([z, jnp.zeros(4, z.dtype)])
    std = jnp.stack([2 * _WP * h, 2 * _WP * h, 1e-2, 2 * _WP * h,
                     10 * _WV * h, 10 * _WV * h, 1e-5, 10 * _WV * h])
    return mean, jnp.diag(std * std)


def _kalman_predict(mean, cov):
    h = mean[3]
    F = jnp.eye(8).at[:4, 4:].set(jnp.eye(4))
    std = jnp.stack([_WP * h, _WP * h, 1e-2, _WP * h,
                     _WV * h, _WV * h, 1e-5, _WV * h])
    return F @ mean, F @ cov @ F.T + jnp.diag(std * std)


def _kalman_update(mean, cov, z):
    h = mean[3]
    R = jnp.diag(jnp.stack([_WP * h, _WP * h, 1e-1, _WP * h]) ** 2)
    S = cov[:4, :4] + R                       # H P Hᵀ with H = [I₄ 0]
    gain = jnp.linalg.solve(S, cov[:4, :]).T  # (8, 4)
    mean2 = mean + gain @ (z - mean[:4])
    cov2 = cov - gain @ cov[:4, :]
    return mean2, cov2


def init_byte_track_state(cfg: ByteTrackConfig) -> ByteTrackState:
    K = cfg.max_tracks
    return ByteTrackState(
        mean=jnp.zeros((K, 8), jnp.float32),
        cov=jnp.tile(jnp.eye(8, dtype=jnp.float32)[None], (K, 1, 1)),
        tracked=jnp.zeros(K, bool), lost=jnp.zeros(K, bool),
        activated=jnp.zeros(K, bool),
        missing=jnp.zeros(K, jnp.int32), age=jnp.zeros(K, jnp.int32),
        score=jnp.zeros(K, jnp.float32),
        obj_id=jnp.full(K, -1, jnp.int32),
        next_id=jnp.asarray(0, jnp.int32),
        frame=jnp.asarray(0, jnp.int32))


def _greedy_match(sim, row_ok, col_ok, thresh, rounds: int):
    """Greedy max-similarity assignment → row→col index or −1."""
    K, N = sim.shape
    masked = jnp.where(row_ok[:, None] & col_ok[None, :], sim, _NEG)

    def body(_, st):
        masked, assign = st
        flat = jnp.argmax(masked)
        ti, di = flat // N, flat % N
        take = masked[ti, di] >= thresh
        assign = jnp.where(take, assign.at[ti].set(di), assign)
        masked = jnp.where(take,
                           masked.at[ti, :].set(_NEG).at[:, di].set(_NEG),
                           masked)
        return masked, assign

    _, assign = jax.lax.fori_loop(
        0, rounds, body, (masked, jnp.full(K, -1, jnp.int32)))
    return assign


def _exact_match(sim, row_ok, col_ok, thresh, rounds: int = 0):
    """Exact LAP with a cost limit — the semantics of ultralytics'
    ``lap.lapjv(1 − sim, extend_cost=True, cost_limit=1 − thresh)``,
    solved on device by the Bertsekas auction (`skix.tracking.matcher.
    auction_assign`). Every track may instead stay unmatched at cost
    ``1 − thresh``; by a pairwise-exchange argument the optimum then
    never matches a pair whose cost exceeds the limit, so the gate
    emerges from the cost structure rather than masking. `rounds` is
    ignored (signature-compatible with :func:`_greedy_match`)."""
    from skix.tracking.matcher import auction_assign

    K, N = sim.shape
    big = jnp.float32(2.0)  # dominated by any real cost (≤1) or gate
    cost = jnp.where(col_ok[None, :], 1.0 - sim, big)        # (K, N)
    dummy = jnp.where(jnp.eye(K, dtype=bool), 1.0 - thresh, big)
    full = jnp.concatenate([cost.T, dummy], axis=0)          # (N+K, K)
    col_of_row = auction_assign(full, row_ok)                # (N+K,)
    rows = jnp.arange(N + K, dtype=jnp.int32)
    real = (col_of_row >= 0) & (rows < N)
    # invert row→track into track→det (each track holds ≤ 1 row)
    assign = jnp.full(K, -1, jnp.int32).at[
        jnp.clip(col_of_row, 0)].max(jnp.where(real, rows, -1))
    return assign


def _det_taken(assign, N):
    safe = jnp.clip(assign, 0)
    return jnp.zeros(N, bool).at[safe].max(assign >= 0)


def motion_grid(H: int, W: int, stride: int = 16):
    """The (y_idx, x_idx) sample grid :func:`fit_global_motion` expects —
    exposed so callers can subsample the flow volume HOST-side and ship
    only ~1/stride² of it to the device (a 300-frame 1080p flow is ~5 GB
    dense; the stride-16 samples are ~19 MB)."""
    ys = np.clip(np.arange(0, H, stride) + stride // 2, 0, H - 1)
    xs = np.clip(np.arange(0, W, stride) + stride // 2, 0, W - 1)
    return np.meshgrid(ys, xs, indexing="ij")


def fit_global_motion(points, flows):
    """Least-squares affine fit: ``points (n, 2)`` full-resolution (x, y)
    sample coords, ``flows (T-1, n, 2)`` their (dx, dy) flow vectors →
    ``(T-1, 2, 3)`` affine ``M = [A | b]`` mapping frame-t coords to
    frame-t+1 coords."""
    points = jnp.asarray(points, jnp.float32)
    P = jnp.concatenate([points, jnp.ones_like(points[:, :1])], -1)
    G = P.T @ P + 1e-6 * jnp.eye(3)

    def one(d):
        tgt = points + d
        M = jnp.linalg.solve(G, P.T @ tgt)                # (3, 2)
        return M.T                                        # (2, 3)

    return jax.vmap(one)(jnp.asarray(flows, jnp.float32))


def estimate_global_motion(flow, stride: int = 16):
    """Per-pair affine camera motion from dense optical flow (the
    BoT-SORT ``gmc_method: sparseOptFlow`` role, reference
    configs/prepare_dataset.yaml:78 — here fit on the RAFT flow the
    pipeline already computes, denser than sparse corners).

    ``flow (T-1, 2, H, W)`` (dx, dy per pixel) → ``(T-1, 2, 3)``
    affines, least squares over a ``stride``-subsampled grid. Convenience
    wrapper over :func:`fit_global_motion`; pipelines with host-resident
    flow should subsample with :func:`motion_grid` first and jit only
    the fit."""
    flow = jnp.asarray(flow, jnp.float32)
    H, W = flow.shape[-2:]
    gy, gx = motion_grid(H, W, stride)
    points = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1),
                         jnp.float32)
    flows = flow[:, :, gy, gx].reshape(flow.shape[0], 2, -1)
    return fit_global_motion(points, flows.transpose(0, 2, 1))


def _apply_gmc(mean, cov, warp):
    """BoT-SORT ``multi_gmc``: transform Kalman state by the camera
    warp ``[A | b]`` — positions/velocities rotate by A, h scales by
    √|det A|, and the covariance conjugates by the same block map."""
    A = warp[:, :2]
    b = warp[:, 2]
    s = jnp.sqrt(jnp.abs(jnp.linalg.det(A)))
    M = jnp.zeros((8, 8))
    M = M.at[0:2, 0:2].set(A).at[2, 2].set(1.0).at[3, 3].set(s)
    M = M.at[4:6, 4:6].set(A).at[6, 6].set(1.0).at[7, 7].set(s)
    shift = jnp.zeros(8).at[0:2].set(b)
    mean2 = jnp.einsum("ij,kj->ki", M, mean) + shift[None]
    cov2 = jnp.einsum("ij,kjl,ml->kim", M, cov, M)
    return mean2, cov2


def byte_track_step(state: ByteTrackState, boxes_xyxy, scores, valid,
                    cfg: ByteTrackConfig, warp=None):
    """One frame. ``boxes_xyxy (N, 4)``, ``scores (N,)``, ``valid (N,)``.
    ``warp (2, 3)`` optionally maps previous-frame coords into this
    frame (BoT-SORT camera-motion compensation) and is applied to every
    occupied slot before association. Returns ``(new_state,
    det_ids (N,) int32)``."""
    K = cfg.max_tracks
    boxes_xyxy = jnp.asarray(boxes_xyxy, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    valid = jnp.asarray(valid, bool)
    N = boxes_xyxy.shape[0]
    rounds = min(K, N)

    occupied = state.tracked | state.lost
    if warp is not None:
        gmean, gcov = _apply_gmc(state.mean, state.cov,
                                 jnp.asarray(warp, jnp.float32))
        state = state._replace(
            mean=jnp.where(occupied[:, None], gmean, state.mean),
            cov=jnp.where(occupied[:, None, None], gcov, state.cov))
    # ByteTrack zeroes the vh velocity of non-tracked tracks pre-predict
    mean0 = jnp.where((occupied & ~state.tracked)[:, None],
                      state.mean.at[:, 7].set(0.0), state.mean)
    pmean, pcov = jax.vmap(_kalman_predict)(mean0, state.cov)
    pmean = jnp.where(occupied[:, None], pmean, state.mean)
    pcov = jnp.where(occupied[:, None, None], pcov, state.cov)
    pred_boxes = xyah_to_xyxy(pmean[:, :4])

    high = valid & (scores >= cfg.track_high_thresh)
    low = valid & (scores >= cfg.track_low_thresh) & ~high

    iou = box_iou(pred_boxes, boxes_xyxy)                     # (K, N)
    match = _exact_match if cfg.exact_match else _greedy_match

    # stage 1: activated tracked + lost vs high detections
    pool1 = (state.tracked & state.activated) | state.lost
    sim1 = iou * scores[None, :] if cfg.fuse_score else iou
    a1 = match(sim1, pool1, high, 1.0 - cfg.match_thresh, rounds)
    taken = _det_taken(a1, N)

    # stage 2: remaining activated-tracked vs low detections (IoU only)
    rem = state.tracked & state.activated & (a1 < 0)
    a2 = match(iou, rem, low & ~taken,
               1.0 - cfg.second_match_thresh, rounds)
    taken = taken | _det_taken(a2, N)

    # stage 3: unconfirmed tracks vs remaining high detections (score-
    # fused like stage 1 — ultralytics fuses BOTH IoU-cost associations)
    unconf = state.tracked & ~state.activated
    a3 = match(sim1, unconf, high & ~taken,
               1.0 - cfg.unconfirmed_match_thresh, rounds)
    taken = taken | _det_taken(a3, N)

    assign = jnp.where(a1 >= 0, a1, jnp.where(a2 >= 0, a2, a3))
    matched = assign >= 0
    safe = jnp.clip(assign, 0)

    z = xyxy_to_xyah(boxes_xyxy)[safe]
    umean, ucov = jax.vmap(_kalman_update)(pmean, pcov, z)
    mean = jnp.where(matched[:, None], umean, pmean)
    cov = jnp.where(matched[:, None, None], ucov, pcov)
    score = jnp.where(matched, scores[safe], state.score)

    # lifecycle: matched → tracked(+activated); unmatched tracked →
    # lost; unmatched unconfirmed → removed; lost beyond buffer → removed
    missing = jnp.where(matched, 0, state.missing + occupied)
    still_lost = (occupied & ~matched & ~unconf
                  & (missing <= cfg.track_buffer))
    removed = occupied & ~matched & ~still_lost
    tracked = matched
    lost = still_lost
    activated = (state.activated | matched) & ~removed
    age = jnp.where(occupied & ~removed, state.age + 1, 0)

    # duplicate suppression: a tracked/lost PAIR over IoU 0.85 resolves
    # to the older track (remove_duplicate_stracks operates between the
    # tracked and lost lists ONLY — tracked tracks crossing each other
    # must never suppress one another)
    cur_boxes = xyah_to_xyxy(mean[:, :4])
    dup = box_iou(cur_boxes, cur_boxes) > 0.85
    both = ((tracked[:, None] & lost[None, :])
            | (lost[:, None] & tracked[None, :]))
    dup = dup & both & ~jnp.eye(K, dtype=bool)
    idx = jnp.arange(K)
    younger = (age[:, None] < age[None, :]) | (
        (age[:, None] == age[None, :]) & (idx[:, None] > idx[None, :]))
    kill = jnp.any(dup & younger, axis=1)
    tracked = tracked & ~kill
    lost = lost & ~kill
    activated = activated & ~kill

    alive = tracked | lost
    obj_id = jnp.where(alive, state.obj_id, -1)

    # spawn: unmatched, high detections above new_track_thresh into free
    # slots (activated immediately only on the clip's first frame)
    spawnable = high & ~taken & (scores >= cfg.new_track_thresh)
    free = ~alive
    det_rank = jnp.cumsum(spawnable.astype(jnp.int32)) - 1
    slot_rank = jnp.where(free, jnp.cumsum(free.astype(jnp.int32)) - 1,
                          K + 1)
    pair = (det_rank[None, :] == slot_rank[:, None]) & spawnable[None, :]
    det_for_slot = jnp.argmax(pair, axis=1)
    spawn = free & jnp.any(pair, axis=1)
    sd = jnp.clip(det_for_slot, 0)
    smean, scov = jax.vmap(_kalman_initiate)(xyxy_to_xyah(boxes_xyxy)[sd])
    mean = jnp.where(spawn[:, None], smean, mean)
    cov = jnp.where(spawn[:, None, None], scov, cov)
    score = jnp.where(spawn, scores[sd], score)
    tracked = tracked | spawn
    first_frame = state.frame == 0
    activated = jnp.where(spawn, first_frame, activated)
    missing = jnp.where(spawn, 0, missing)
    age = jnp.where(spawn, 1, age)
    new_ids = state.next_id + jnp.cumsum(spawn.astype(jnp.int32)) - 1
    obj_id = jnp.where(spawn, new_ids, obj_id)

    # det→track-id emission: activated matches + first-frame spawns
    emit_id = jnp.where(tracked & activated, obj_id, -1)
    det_ids = jnp.full(N, -1, jnp.int32)
    det_ids = det_ids.at[safe].max(jnp.where(matched, emit_id, -1))
    det_ids = det_ids.at[sd].max(jnp.where(spawn, emit_id, -1))

    new_state = ByteTrackState(
        mean=mean, cov=cov, tracked=tracked, lost=lost,
        activated=activated, missing=missing, age=age, score=score,
        obj_id=obj_id,
        next_id=state.next_id + jnp.sum(spawn.astype(jnp.int32)),
        frame=state.frame + 1)
    return new_state, det_ids


def track_sequence_ids(boxes_xyxy, scores, valid,
                       cfg: ByteTrackConfig = ByteTrackConfig(),
                       motion=None):
    """Whole-clip tracking: ``boxes_xyxy (T, N, 4)``, ``scores (T, N)``,
    ``valid (T, N)`` → ``(T, N)`` int32 det→track-id map (−1 = no track).
    One jit-able ``lax.scan``.

    ``motion (T-1, 2, 3)``: optional per-pair camera warps (frame t →
    t+1, see :func:`estimate_global_motion`) — supplying them is the
    BoT-SORT configuration (``tracker_type: botsort`` with
    ``with_reid: False``, the reference's setting)."""
    T = jnp.asarray(boxes_xyxy).shape[0]
    if motion is None:
        warps = None
    else:
        ident = jnp.eye(2, 3, dtype=jnp.float32)[None]
        warps = jnp.concatenate(
            [ident, jnp.asarray(motion, jnp.float32)], axis=0)[:T]

    def step(state, inp):
        if warps is None:
            b, s, v = inp
            return byte_track_step(state, b, s, v, cfg)
        b, s, v, w = inp
        return byte_track_step(state, b, s, v, cfg, warp=w)

    xs = (jnp.asarray(boxes_xyxy, jnp.float32),
          jnp.asarray(scores, jnp.float32), jnp.asarray(valid, bool))
    if warps is not None:
        xs = xs + (warps,)
    _, ids = jax.lax.scan(step, init_byte_track_state(cfg), xs)
    return ids
