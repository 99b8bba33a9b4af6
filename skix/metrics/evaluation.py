"""GT-based and GT-free sequence evaluation.

Capability parity with:
- reference metrics/unity_data_compare.py (per-frame/per-joint MPJPE vs
  Unity GT, before/after-fusion improvement reports :190-304);
- reference metrics/true_data_compare.py (GT-free: temporal jitter/accel
  :242, bone-length CV :264, mean confidence, fused-vs-single table :303);
- reference VideoPose3D/fuse/fuse_eval.py:141 (bone std/CV, L/R symmetry,
  fused-vs-input distances, temporal jerk).

All jnp, clip-at-once.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from skix.metrics.losses import mpjpe, per_joint_error

_EPS = 1e-9


# --------------------------------------------------------------------------
# GT-free temporal metrics
# --------------------------------------------------------------------------
def temporal_metrics(X, valid=None) -> dict:
    """Jitter (mean first-difference speed) and acceleration (mean second
    difference) per reference true_data_compare.py:242."""
    X = jnp.asarray(X)
    vel = X[1:] - X[:-1]
    acc = X[2:] - 2 * X[1:-1] + X[:-2]
    if valid is not None:
        valid = jnp.asarray(valid, bool)
        v_ok = (valid[1:] & valid[:-1])[..., None]
        a_ok = (valid[2:] & valid[1:-1] & valid[:-2])[..., None]
        vel = jnp.where(v_ok, vel, 0.0)
        acc = jnp.where(a_ok, acc, 0.0)
        # plain mean over valid joint-frames, consistent with the unmasked
        # branch and reference compute_temporal_metrics
        # (true_data_compare.py:243): v_ok/a_ok are (T-1, J, 1) so their sum
        # already counts one entry per joint-frame norm.
        nv = jnp.sum(v_ok) + _EPS
        na = jnp.sum(a_ok) + _EPS
        jitter = jnp.sum(jnp.linalg.norm(vel, axis=-1)) / nv
        accel = jnp.sum(jnp.linalg.norm(acc, axis=-1)) / na
    else:
        jitter = jnp.mean(jnp.linalg.norm(vel, axis=-1))
        accel = jnp.mean(jnp.linalg.norm(acc, axis=-1))
    return {"jitter": jitter, "accel": accel}


def bone_length_cv(X, bones, valid=None):
    """Mean coefficient of variation of bone lengths over time
    (reference true_data_compare.py:264; lower = more rigid skeleton)."""
    X = jnp.asarray(X)
    bones = np.asarray(bones)
    L = jnp.linalg.norm(X[:, bones[:, 0]] - X[:, bones[:, 1]], axis=-1)  # (T,B)
    if valid is not None:
        valid = jnp.asarray(valid, bool)
        ok = valid[:, bones[:, 0]] & valid[:, bones[:, 1]]
        n = jnp.sum(ok, axis=0) + _EPS
        mean = jnp.sum(jnp.where(ok, L, 0.0), axis=0) / n
        var = jnp.sum(jnp.where(ok, (L - mean) ** 2, 0.0), axis=0) / n
    else:
        mean = jnp.mean(L, axis=0)
        var = jnp.var(L, axis=0)
    cv = jnp.sqrt(var) / (mean + _EPS)
    return jnp.mean(cv)


def symmetry_error(X, symmetric_bones):
    """Mean relative L/R bone-length asymmetry (reference
    fuse_eval.py family). ``symmetric_bones``: ((l_i,l_j),(r_i,r_j)) pairs."""
    X = jnp.asarray(X)
    errs = []
    for (li, lj), (ri, rj) in symmetric_bones:
        ll = jnp.linalg.norm(X[..., li, :] - X[..., lj, :], axis=-1)
        lr = jnp.linalg.norm(X[..., ri, :] - X[..., rj, :], axis=-1)
        errs.append(jnp.abs(ll - lr) / (0.5 * (ll + lr) + _EPS))
    return jnp.mean(jnp.stack(errs))


def eval_fused_sequence(fused, left, right, bones, symmetric_bones,
                        valid=None) -> dict:
    """GT-free fusion report (reference VideoPose3D/fuse/fuse_eval.py:141):
    bone CV, symmetry, fused-vs-input distances, jerk."""
    fused = jnp.asarray(fused)
    rep = {
        "bone_cv": bone_length_cv(fused, bones, valid),
        "symmetry": symmetry_error(fused, symmetric_bones),
        "dist_to_left": jnp.mean(jnp.linalg.norm(fused - left, axis=-1)),
        "dist_to_right": jnp.mean(jnp.linalg.norm(fused - right, axis=-1)),
    }
    rep.update(temporal_metrics(fused, valid))
    return rep


# --------------------------------------------------------------------------
# GT-based comparison (Unity protocol)
# --------------------------------------------------------------------------
def before_after_fusion_report(
    gt,
    left=None,
    right=None,
    fused=None,
    smoothed=None,
    valid: Optional[jnp.ndarray] = None,
) -> dict:
    """MPJPE of every available stage output vs GT, plus %-improvement of
    fusion over the best single view (reference
    metrics/unity_data_compare.py:190-304)."""
    out: dict = {}
    singles = []
    for name, x in (("left", left), ("right", right)):
        if x is not None:
            e = float(mpjpe(x, gt, valid))
            out[f"mpjpe_{name}"] = e
            singles.append(e)
    for name, x in (("fused", fused), ("smoothed", smoothed)):
        if x is not None:
            out[f"mpjpe_{name}"] = float(mpjpe(x, gt, valid))
            out[f"per_joint_{name}"] = np.asarray(
                jnp.mean(per_joint_error(x, gt), axis=0))
    if singles and fused is not None:
        best = min(singles)
        out["improvement_pct"] = 100.0 * (best - out["mpjpe_fused"]) / (best + _EPS)
    return out
