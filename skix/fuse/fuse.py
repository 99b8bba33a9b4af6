"""Confidence-weighted cross-view fusion, vectorized over whole clips.

Capability parity with two reference fusion families:

1. **fuse/** (MHR-70 route, reference fuse/fuse.py + fuse/main_raw.py):
   Kabsch-align right→left (main_raw.py:48), per-joint quality from bone
   deviation / temporal delta / 2D sanity (fuse.py:180,224,124), 2-way
   softmax weights (fuse.py:93), weighted mean with single-view fallback
   (fuse.py:289), geometric-mean confidence combine q=√(c₁·c₂)
   (main_raw.py:230), adaptive EMA smoothing (fuse.py:329 — implemented in
   skix.geometry.smoothing).

2. **VideoPose3D/fuse** (H36M no-extrinsics route, VideoPose3D/fuse/fuse.py):
   pelvis-origin + pelvis–neck-scale normalization (:19), Umeyama on 6
   torso joints (:16,101), τ-gated per-joint weighted average (:57).

TPU-first: the reference loops frames in Python over NaN dicts; here every
step is a masked array op over ``(T, J, ...)`` under one jit. Missing
joints are ``valid`` masks; NaN never enters compute.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from skix.geometry.rigid import umeyama
from skix.geometry.skeletons import H36M, H36M_TORSO
from skix.geometry.smoothing import adaptive_ema

_EPS = 1e-9


def _finite(x):
    return jnp.all(jnp.isfinite(x), axis=-1)


def softmax2(qa, qb):
    """2-way softmax weights from quality scores (reference fuse.py:93)."""
    m = jnp.maximum(qa, qb)
    ea = jnp.exp(qa - m)
    eb = jnp.exp(qb - m)
    s = ea + eb + _EPS
    return ea / s, eb / s


# --------------------------------------------------------------------------
# No-GT per-joint quality scores
# --------------------------------------------------------------------------
def incidence_matrix(num_joints: int, edges) -> np.ndarray:
    """(J, E) 0/1 joint-edge incidence (static, host-side)."""
    inc = np.zeros((num_joints, len(edges)), np.float32)
    for e, (a, b) in enumerate(edges):
        inc[a, e] = 1.0
        inc[b, e] = 1.0
    return inc


def q_from_bone_deviation(X, edges, med_lens, valid=None):
    """q_bone(j) = −mean over incident edges of |len(e) − median(e)|.

    ``X (T,J,3)``; ``edges`` static list of (a,b); ``med_lens (E,)``.
    Joints with no valid incident edge get −100 (weak info), invalid joints
    −1e9 — reference fuse.py:180 semantics.
    """
    X = jnp.asarray(X)
    J = X.shape[-2]
    edges = np.asarray(edges)
    inc = jnp.asarray(incidence_matrix(J, edges))
    if valid is None:
        valid = _finite(X)
    valid = jnp.asarray(valid, bool)
    a, b = edges[:, 0], edges[:, 1]
    L = jnp.linalg.norm(X[..., a, :] - X[..., b, :], axis=-1)  # (T,E)
    edge_ok = (valid[..., a] & valid[..., b]
               & jnp.isfinite(jnp.asarray(med_lens))[None, :])
    dev = jnp.where(edge_ok, jnp.abs(L - jnp.asarray(med_lens)[None, :]), 0.0)
    cnt = jnp.einsum("je,te->tj", inc, edge_ok.astype(X.dtype))
    dev_sum = jnp.einsum("je,te->tj", inc, dev)
    q = -(dev_sum / (cnt + _EPS))
    q = jnp.where(cnt > 0, q, -100.0)
    return jnp.where(valid, q, -1e9)


def median_bone_lengths(X, edges, valid=None):
    """Per-edge median bone length over a clip (reference fuse.py
    estimate_bone_median_lengths). Invalid frames are excluded via a masked
    median (sort with +inf padding)."""
    X = jnp.asarray(X)
    edges = np.asarray(edges)
    if valid is None:
        valid = _finite(X)
    a, b = edges[:, 0], edges[:, 1]
    L = jnp.linalg.norm(X[..., a, :] - X[..., b, :], axis=-1)  # (T,E)
    ok = jnp.asarray(valid, bool)[..., a] & jnp.asarray(valid, bool)[..., b]
    big = jnp.where(ok, L, jnp.inf)
    srt = jnp.sort(big, axis=0)
    n = jnp.sum(ok, axis=0)
    lo = jnp.clip((n - 1) // 2, 0)
    hi = jnp.clip(n // 2, 0)
    T = L.shape[0]
    gather = lambda idx: jnp.take_along_axis(srt, idx[None, :].clip(0, T - 1), axis=0)[0]
    med = 0.5 * (gather(lo) + gather(hi))
    return jnp.where(n > 0, med, jnp.nan)


def q_from_temporal(X_prev, X_curr, beta: float = 1.0, valid_prev=None,
                    valid_curr=None):
    """q_temp(j) = −β‖x_t − x_{t−1}‖; no previous → 0 for valid current,
    −1e9 for invalid (reference fuse.py:224)."""
    X_prev = jnp.asarray(X_prev)
    X_curr = jnp.asarray(X_curr)
    vp = _finite(X_prev) if valid_prev is None else jnp.asarray(valid_prev, bool)
    vc = _finite(X_curr) if valid_curr is None else jnp.asarray(valid_curr, bool)
    d = jnp.linalg.norm(jnp.where((vp & vc)[..., None], X_curr - X_prev, 0.0), axis=-1)
    q = jnp.where(vp & vc, -beta * d, 0.0)
    return jnp.where(vc, q, -1e9)


def q_2d_sanity(U2d, width: int, height: int, valid=None):
    """0 if finite and in-bounds else −50 (reference fuse.py:124)."""
    U2d = jnp.asarray(U2d)
    v = _finite(U2d) if valid is None else jnp.asarray(valid, bool)
    inb = ((U2d[..., 0] >= 0) & (U2d[..., 0] < width)
           & (U2d[..., 1] >= 0) & (U2d[..., 1] < height))
    return jnp.where(v & inb, 0.0, -50.0)


def combine_q(q_bone, q_temp=None, q_sanity=None, w_bone: float = 1.0,
              w_temp: float = 0.3, w_san: float = 0.2):
    q = w_bone * q_bone
    if q_temp is not None:
        q = q + w_temp * q_temp
    if q_sanity is not None:
        q = q + w_san * q_sanity
    return q


def body_side_bias(left_mask, right_mask, bias_val: float = 1.0):
    """Soft prior: +bias for left-side joints, −bias for right-side
    (reference fuse.py:42). Masks are static (J,) bool arrays."""
    left_mask = jnp.asarray(left_mask, bool)
    right_mask = jnp.asarray(right_mask, bool)
    return jnp.where(left_mask, bias_val, jnp.where(right_mask, -bias_val, 0.0))


# --------------------------------------------------------------------------
# Rigid alignment + per-joint fusion
# --------------------------------------------------------------------------
def align_right_to_left(left, right, valid_left=None, valid_right=None,
                        allow_scale: bool = True):
    """Per-frame Umeyama of right→left over jointly-valid joints
    (reference fuse/main_raw.py:48 _kabsch_rigid_align /
    bundle_adjustment/fuse/fuse.py:96 rigid_transform_3D).

    ``left, right (T,J,3)`` → aligned right ``(T,J,3)``.
    """
    left = jnp.asarray(left)
    right = jnp.asarray(right)
    vl = _finite(left) if valid_left is None else jnp.asarray(valid_left, bool)
    vr = _finite(right) if valid_right is None else jnp.asarray(valid_right, bool)
    w = (vl & vr).astype(left.dtype)

    def one(L, R_, ww):
        tr = umeyama(jnp.where(ww[:, None] > 0, L, 0.0),
                     jnp.where(ww[:, None] > 0, R_, 0.0),
                     w=ww, allow_scale=allow_scale)
        return tr.apply(R_)

    return jax.vmap(one)(left, right, w)


def fuse_two_views(Xl, Xr, q_l, q_r, valid_l=None, valid_r=None):
    """Per-joint softmax-weighted mean with single-view fallback
    (reference fuse.py:289 fuse_frame_3d, vectorized over the clip).

    Returns ``(fused (T,J,3), fused_valid (T,J))``.
    """
    Xl = jnp.asarray(Xl)
    Xr = jnp.asarray(Xr)
    vl = _finite(Xl) if valid_l is None else jnp.asarray(valid_l, bool)
    vr = _finite(Xr) if valid_r is None else jnp.asarray(valid_r, bool)
    wl, wr = softmax2(jnp.asarray(q_l), jnp.asarray(q_r))
    Xl0 = jnp.where(vl[..., None], Xl, 0.0)
    Xr0 = jnp.where(vr[..., None], Xr, 0.0)
    both = (wl[..., None] * Xl0 + wr[..., None] * Xr0) / (
        wl[..., None] + wr[..., None] + _EPS)
    fused = jnp.where((vl & vr)[..., None], both,
                      jnp.where(vl[..., None], Xl0, Xr0))
    return fused, vl | vr


class FusedSequence(NamedTuple):
    fused: jnp.ndarray      # (T, J, 3) raw fused
    smoothed: jnp.ndarray   # (T, J, 3) EMA-smoothed
    valid: jnp.ndarray      # (T, J)
    conf_l: jnp.ndarray     # (T, J) left-view confidence used
    conf_r: jnp.ndarray     # (T, J)


def fuse_sequence(
    left,
    right,
    conf_l=None,
    conf_r=None,
    valid_l=None,
    valid_r=None,
    align: bool = True,
    allow_scale: bool = True,
    ema_alpha: float = 0.7,
    ema_alpha_min: float = 0.45,
    ema_alpha_max: float = 0.92,
    ema_speed_gain: float = 0.25,
    alpha_joint=None,
) -> FusedSequence:
    """The full raw-fusion pipeline of reference fuse/main_raw.py:161:
    align right→left, geometric-mean confidence combine q=√(c_l·c_r) per
    view pair, softmax fuse, adaptive-EMA smooth. One jit-able program.
    """
    left = jnp.asarray(left)
    right = jnp.asarray(right)
    vl = _finite(left) if valid_l is None else jnp.asarray(valid_l, bool)
    vr = _finite(right) if valid_r is None else jnp.asarray(valid_r, bool)
    r_al = align_right_to_left(left, right, vl, vr, allow_scale) if align else right
    cl = jnp.ones(vl.shape, left.dtype) if conf_l is None else jnp.asarray(conf_l)
    cr = jnp.ones(vr.shape, left.dtype) if conf_r is None else jnp.asarray(conf_r)
    # quality = log-domain scores from confidences (softmax2(log c) ≡
    # normalized confidences)
    q_l = jnp.log(jnp.clip(cl, 1e-6))
    q_r = jnp.log(jnp.clip(cr, 1e-6))
    fused, fv = fuse_two_views(jnp.where(vl[..., None], left, 0.0),
                               jnp.where(vr[..., None], r_al, 0.0),
                               q_l, q_r, vl, vr)
    smoothed = adaptive_ema(
        fused, alpha=ema_alpha, alpha_joint=alpha_joint,
        alpha_min=ema_alpha_min, alpha_max=ema_alpha_max,
        speed_gain=ema_speed_gain, valid=fv)
    return FusedSequence(fused=fused, smoothed=smoothed, valid=fv,
                         conf_l=cl, conf_r=cr)


# --------------------------------------------------------------------------
# H36M no-extrinsics route (VideoPose3D/fuse)
# --------------------------------------------------------------------------
def center_scale_h36m(X):
    """Pelvis origin + pelvis–neck scale normalization
    (reference VideoPose3D/fuse/fuse.py:19). ``X (..., 17, 3)``."""
    X = jnp.asarray(X)
    pelvis = X[..., H36M["PEL"], :]
    neck = X[..., H36M["NECK"], :]
    Xc = X - pelvis[..., None, :]
    s = jnp.linalg.norm(neck - pelvis, axis=-1)
    s = jnp.where(s > 1e-8, s, 1.0)
    return Xc / s[..., None, None], s


def fuse_pose_no_extrinsics(
    left_3d,
    right_3d,
    tau: float | jnp.ndarray = 0.08,
    allow_scale: bool = False,
    wL: Optional[jnp.ndarray] = None,
    wR: Optional[jnp.ndarray] = None,
):
    """No-extrinsics two-view H36M fusion, whole clip at once
    (reference VideoPose3D/fuse/fuse.py:101):

    per frame — normalize both views (pelvis origin, pelvis–neck scale),
    Umeyama right→left on the 6 torso joints, per-joint τ-gate: distance
    > τ → pick higher-weight view; else weighted average — then the output
    stays in the normalized left-view frame.

    ``left_3d, right_3d (T,17,3)``; ``wL, wR (T,17)`` optional weights.
    Returns ``(fused (T,17,3), diag dict)``.
    """
    L = jnp.asarray(left_3d)
    R = jnp.asarray(right_3d)
    if L.ndim == 2:
        L = L[None]
        R = R[None]
    T, J = L.shape[0], L.shape[1]
    wL = jnp.ones((T, J), L.dtype) if wL is None else jnp.broadcast_to(jnp.asarray(wL), (T, J))
    wR = jnp.ones((T, J), L.dtype) if wR is None else jnp.broadcast_to(jnp.asarray(wR), (T, J))
    tau_v = jnp.broadcast_to(jnp.asarray(tau, L.dtype), (J,))

    Ln, _ = center_scale_h36m(L)
    Rn, _ = center_scale_h36m(R)
    torso = np.asarray(H36M_TORSO)

    def one(Lf, Rf):
        tr = umeyama(Lf[torso], Rf[torso], allow_scale=allow_scale)
        return tr.apply(Rf)

    R_al = jax.vmap(one)(Ln, Rn)
    d = jnp.linalg.norm(Ln - R_al, axis=-1)  # (T,J)
    w_sum = wL + wR + _EPS
    avg = (wL[..., None] * Ln + wR[..., None] * R_al) / w_sum[..., None]
    pick_left = (wL >= wR)[..., None]
    gated = jnp.where(pick_left, Ln, R_al)
    fused = jnp.where((d > tau_v[None, :])[..., None], gated, avg)
    diag = {
        "mean_disagreement": jnp.mean(d),
        "gated_fraction": jnp.mean((d > tau_v[None, :]).astype(L.dtype)),
        "per_frame_disagreement": jnp.mean(d, axis=-1),
    }
    return fused, diag
