"""Joint-angle biomechanics + turn segmentation.

Capability parity with reference angle/main.py:
- 15-joint MHR-70 target subset (UNITY_MHR70_MAPPING, :34-51);
- 8 ∠(a,b,c) joint angles (ANGLE_DEFS :55-64, angle_deg :738);
- signed upper/lower-body tilt vs vertical (:663);
- torso–knee angle (:784), L–R knee difference (:820), elbow horizontal
  distance from the body midline (:875);
- turn segmentation: facing heading from the hip (fallback shoulder) line ×
  up axis, ground-plane atan2(fx, fz) (:150); NaN-fill + unwrap +
  moving-average smooth; angular-velocity sign changes as boundaries, gated
  by min_turn_frames=12 and min_heading_change_deg=8 (:202).

TPU-first: all per-frame loops become masked ``(T, …)`` array programs; the
angle/tilt/heading series compute in one jit. Segment extraction (variable
turn count) runs host-side on the tiny 1-D heading series — it's a report,
not a hot path.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

_EPS = 1e-9

# MHR-70 joint ids of interest (reference angle/main.py:34-51).
UNITY_MHR70_MAPPING = {
    1: "Bone_Eye_L", 2: "Bone_Eye_R",
    5: "Upperarm_L", 6: "Upperarm_R",
    7: "lowerarm_l", 8: "lowerarm_r",
    9: "Thigh_L", 10: "Thigh_R",
    11: "calf_l", 12: "calf_r",
    13: "Foot_L", 14: "Foot_R",
    41: "Hand_R", 62: "Hand_L",
    69: "neck_01",
}
TARGET_IDS = tuple(UNITY_MHR70_MAPPING.keys())
ID_TO_INDEX = {jid: i for i, jid in enumerate(TARGET_IDS)}
# identity mapping for full 70-joint arrays (joint id == array index)
ID_TO_INDEX_FULL = {jid: jid for jid in TARGET_IDS}


def mapping_for(num_joints: int) -> dict:
    """Pick the id→index map by array layout: 15-joint target subset or the
    full MHR-70 array."""
    if num_joints >= 70:
        return ID_TO_INDEX_FULL
    if num_joints == len(TARGET_IDS):
        return ID_TO_INDEX
    raise ValueError(
        f"cannot infer MHR joint layout for J={num_joints}; pass id_to_index")

# ∠(a,b,c) triplets in MHR-70 ids (vertex = b); reference :55-64.
ANGLE_DEFS: Dict[str, Tuple[int, int, int]] = {
    "knee_l": (9, 11, 13),
    "knee_r": (10, 12, 14),
    "elbow_l": (5, 7, 62),
    "elbow_r": (6, 8, 41),
    "shoulder_l": (69, 5, 7),
    "shoulder_r": (69, 6, 8),
    "hip_l": (69, 9, 11),
    "hip_r": (69, 10, 12),
}


def _idx(jid: int, id_to_index=None) -> int:
    m = ID_TO_INDEX if id_to_index is None else id_to_index
    return m[jid]


def _get(kpts, jid, id_to_index=None):
    return kpts[..., _idx(jid, id_to_index), :]


def _valid(v):
    return jnp.all(jnp.isfinite(v), axis=-1)


def _unit(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(n < _EPS, 1.0, n)


def joint_angle_deg(a, b, c):
    """Angle ∠ABC in degrees, batched over leading axes; masked NaN-free:
    degenerate (zero-length) limbs yield 0 contribution via caller masks."""
    ba = a - b
    bc = c - b
    na = jnp.linalg.norm(ba, axis=-1)
    nc = jnp.linalg.norm(bc, axis=-1)
    denom = na * nc
    cos_t = jnp.sum(ba * bc, axis=-1) / jnp.where(denom < _EPS, 1.0, denom)
    ang = jnp.degrees(jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)))
    return jnp.where(denom < _EPS, jnp.nan, ang)


def compute_angles(kpts, id_to_index=None, angle_defs=None):
    """All ANGLE_DEFS series at once: ``kpts (T, J, 3)`` → dict of (T,)."""
    kpts = jnp.asarray(kpts)
    defs = ANGLE_DEFS if angle_defs is None else angle_defs
    out = {}
    for name, (ai, bi, ci) in defs.items():
        a = _get(kpts, ai, id_to_index)
        b = _get(kpts, bi, id_to_index)
        c = _get(kpts, ci, id_to_index)
        ok = _valid(a) & _valid(b) & _valid(c)
        out[name] = jnp.where(ok, joint_angle_deg(a, b, c), jnp.nan)
    return out


def _centers(kpts, id_to_index=None):
    pelvis = 0.5 * (_get(kpts, 9, id_to_index) + _get(kpts, 10, id_to_index))
    shoulder = 0.5 * (_get(kpts, 5, id_to_index) + _get(kpts, 6, id_to_index))
    knee = 0.5 * (_get(kpts, 11, id_to_index) + _get(kpts, 12, id_to_index))
    return pelvis, shoulder, knee


def _lateral_and_forward(kpts, up_axis, id_to_index=None):
    """Per-frame left→right unit vector (hips, fallback shoulders) and the
    forward direction (cross with up, orientation per up-axis sign —
    reference :190-205)."""
    hip_l, hip_r = _get(kpts, 9, id_to_index), _get(kpts, 10, id_to_index)
    sho_l, sho_r = _get(kpts, 5, id_to_index), _get(kpts, 6, id_to_index)
    hips_ok = _valid(hip_l) & _valid(hip_r)
    lr = jnp.where(hips_ok[..., None], hip_r - hip_l, sho_r - sho_l)
    ok = hips_ok | (_valid(sho_l) & _valid(sho_r))
    lr_u = _unit(lr)
    up = jnp.asarray(up_axis, kpts.dtype)
    up_u = up / (jnp.linalg.norm(up) + _EPS)
    fwd = jnp.where(up[1] < 0,
                    _unit(jnp.cross(jnp.broadcast_to(up_u, lr_u.shape), lr_u)),
                    _unit(jnp.cross(lr_u, jnp.broadcast_to(up_u, lr_u.shape))))
    return lr_u, fwd, up_u, ok


def compute_tilt_angles(kpts, up_axis=(0.0, 1.0, 0.0), id_to_index=None):
    """Signed upper/lower-body tilt (deg, forward +) — reference :663."""
    kpts = jnp.asarray(kpts)
    pelvis, shoulder, knee = _centers(kpts, id_to_index)
    lr_u, fwd, up_u, ok = _lateral_and_forward(kpts, up_axis, id_to_index)

    def tilt(v):
        v_proj = v - jnp.sum(v * lr_u, axis=-1, keepdims=True) * lr_u
        v_u = _unit(v_proj)
        cos_t = jnp.clip(jnp.sum(v_u * up_u, axis=-1), -1.0, 1.0)
        theta = jnp.degrees(jnp.arccos(cos_t))
        sign = jnp.where(jnp.sum(v_u * fwd, axis=-1) >= 0, 1.0, -1.0)
        good = ok & _valid(v) & (jnp.linalg.norm(v_proj, axis=-1) > _EPS)
        return jnp.where(good, theta * sign, jnp.nan)

    return {"tilt_upper": tilt(shoulder - pelvis),
            "tilt_lower": tilt(knee - pelvis)}


def compute_torso_knee_angle(kpts, id_to_index=None):
    """∠(shoulder-center, pelvis, knee-center) — reference :784."""
    kpts = jnp.asarray(kpts)
    pelvis, shoulder, knee = _centers(kpts, id_to_index)
    ok = _valid(pelvis) & _valid(shoulder) & _valid(knee)
    return {"torso_knee_angle": jnp.where(
        ok, joint_angle_deg(shoulder, pelvis, knee), jnp.nan)}


def compute_knee_difference(kpts, id_to_index=None):
    """Left − right knee angle (deg) — reference :820."""
    angles = compute_angles(kpts, id_to_index,
                            {"l": ANGLE_DEFS["knee_l"], "r": ANGLE_DEFS["knee_r"]})
    return {"knee_diff_lr": angles["l"] - angles["r"]}


def compute_elbow_distance(kpts, id_to_index=None):
    """Horizontal (XZ-plane) elbow distance from the pelvis midline —
    reference :875."""
    kpts = jnp.asarray(kpts)
    pelvis, _, _ = _centers(kpts, id_to_index)
    out = {}
    for name, jid in (("elbow_distance_l", 7), ("elbow_distance_r", 8)):
        e = _get(kpts, jid, id_to_index)
        d = jnp.sqrt((e[..., 0] - pelvis[..., 0]) ** 2
                     + (e[..., 2] - pelvis[..., 2]) ** 2)
        out[name] = jnp.where(_valid(e) & _valid(pelvis), d, jnp.nan)
    return out


def compute_facing_heading(kpts, up_axis=(0.0, 1.0, 0.0), id_to_index=None):
    """Ground-plane heading (deg) = atan2(forward_x, forward_z) —
    reference :150."""
    kpts = jnp.asarray(kpts)
    _, fwd, _, ok = _lateral_and_forward(kpts, up_axis, id_to_index)
    heading = jnp.degrees(jnp.arctan2(fwd[..., 0], fwd[..., 2]))
    return jnp.where(ok, heading, jnp.nan)


# --------------------------------------------------------------------------
# Turn segmentation (host-side tail on a 1-D series)
# --------------------------------------------------------------------------
def _fill_nan_linear(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    ok = np.isfinite(x)
    if not ok.any():
        return x
    idx = np.arange(len(x))
    return np.interp(idx, idx[ok], x[ok])


def _smooth_1d(x: np.ndarray, window: int) -> np.ndarray:
    if window <= 1 or len(x) < 2:
        return x
    kernel = np.ones(window) / window
    ok = np.isfinite(x).astype(np.float64)
    num = np.convolve(np.where(np.isfinite(x), x, 0.0), kernel, "same")
    den = np.convolve(ok, kernel, "same")
    out = np.full_like(x, np.nan)
    m = den > 0
    out[m] = num[m] / den[m]
    return out


def detect_turn_segments(
    heading_deg,
    min_turn_frames: int = 12,
    min_heading_change_deg: float = 8.0,
) -> List[Dict[str, float]]:
    """Angular-velocity zero-crossing turn segmentation (reference :202).

    Input: (T,) heading series (NaNs allowed). Output: list of turn dicts
    {turn_id, start_frame, end_frame, num_frames, heading_change_deg,
    direction}.
    """
    h = np.asarray(heading_deg, np.float64)
    T = h.shape[0]
    if T == 0 or np.sum(np.isfinite(h)) < 5:
        return []
    h = _fill_nan_linear(h)
    h = np.degrees(np.unwrap(np.radians(h)))
    h = _smooth_1d(h, 11)
    vel = _smooth_1d(np.gradient(h), 9)

    sign_change = np.where(vel[:-1] * vel[1:] < 0)[0] + 1
    boundaries = [0]
    for i in sign_change:
        if i - boundaries[-1] >= min_turn_frames:
            boundaries.append(int(i))
    if T - 1 - boundaries[-1] >= 1:
        boundaries.append(T - 1)
    elif boundaries[-1] != T - 1:
        boundaries[-1] = T - 1
    if len(boundaries) < 2:
        return []

    turns = []
    tid = 1
    for s, e in zip(boundaries[:-1], boundaries[1:]):
        if e - s + 1 < min_turn_frames:
            continue
        delta = float(h[e] - h[s])
        if abs(delta) < min_heading_change_deg:
            continue
        turns.append({
            "turn_id": float(tid),
            "start_frame": float(s),
            "end_frame": float(e),
            "num_frames": float(e - s + 1),
            "heading_change_deg": delta,
            "direction": 1.0 if delta > 0 else -1.0,
        })
        tid += 1
    return turns


def compute_all_series(kpts, up_axis=(0.0, 1.0, 0.0), id_to_index=None):
    """All biomechanics series for one clip (reference _compute_all_series
    :633): joint angles, tilts, torso–knee, knee diff, elbow distances,
    heading + detected turns. The joint layout (15-subset vs full MHR-70)
    is auto-detected when ``id_to_index`` is None."""
    if id_to_index is None:
        id_to_index = mapping_for(int(np.asarray(kpts).shape[1]))
    series: Dict[str, np.ndarray] = {}
    series.update({k: np.asarray(v) for k, v in
                   compute_angles(kpts, id_to_index).items()})
    series.update({k: np.asarray(v) for k, v in
                   compute_tilt_angles(kpts, up_axis, id_to_index).items()})
    series.update({k: np.asarray(v) for k, v in
                   compute_torso_knee_angle(kpts, id_to_index).items()})
    series.update({k: np.asarray(v) for k, v in
                   compute_knee_difference(kpts, id_to_index).items()})
    series.update({k: np.asarray(v) for k, v in
                   compute_elbow_distance(kpts, id_to_index).items()})
    heading = np.asarray(compute_facing_heading(kpts, up_axis, id_to_index))
    series["heading_deg"] = heading
    turns = detect_turn_segments(heading)
    return series, turns
