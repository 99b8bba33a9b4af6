"""Pose-error losses/metrics (MPJPE family).

Semantics match reference VideoPose3D/common/loss.py:11-88 (mpjpe, weighted
mpjpe, Procrustes-aligned p-mpjpe, scale-normalized n-mpjpe, velocity error),
implemented in jnp (batched, jit/grad-safe; the reference's p_mpjpe is
numpy-only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def mpjpe(pred, gt, valid=None):
    """Mean per-joint position error: mean ‖pred − gt‖ over all joints.

    ``valid``: optional bool mask broadcastable to ``pred.shape[:-1]``.
    """
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    d = jnp.linalg.norm(pred - gt, axis=-1)
    if valid is None:
        return jnp.mean(d)
    valid = jnp.broadcast_to(jnp.asarray(valid, bool), d.shape)
    return jnp.sum(jnp.where(valid, d, 0.0)) / (jnp.sum(valid) + _EPS)


def weighted_mpjpe(pred, gt, w):
    """Per-joint weighted MPJPE (reference loss.py w_mpjpe)."""
    d = jnp.linalg.norm(jnp.asarray(pred) - jnp.asarray(gt), axis=-1)
    return jnp.mean(jnp.asarray(w) * d)


def _procrustes_align_batch(pred, gt):
    """Similarity-align each (J,3) pred onto gt: returns aligned pred.
    Closed-form Umeyama per sample (the math of reference loss.py p_mpjpe)."""
    mu_p = jnp.mean(pred, axis=-2, keepdims=True)
    mu_g = jnp.mean(gt, axis=-2, keepdims=True)
    pc = pred - mu_p
    gc = gt - mu_g
    norm_p = jnp.sqrt(jnp.sum(pc**2, axis=(-2, -1), keepdims=True)) + _EPS
    norm_g = jnp.sqrt(jnp.sum(gc**2, axis=(-2, -1), keepdims=True)) + _EPS
    pc_n = pc / norm_p
    gc_n = gc / norm_g
    H = jnp.einsum("...ji,...jk->...ik", pc_n, gc_n)  # (3,3)
    U, S, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.ones(H.shape[:-2] + (3,)).at[..., -1].set(jnp.sign(det))
    R = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)  # maps pred→gt
    trace = jnp.sum(S * D, axis=-1)[..., None, None]
    scale = trace * norm_g / norm_p
    return scale * jnp.einsum("...ji,...kj->...ki", R, pc) + mu_g


def p_mpjpe(pred, gt):
    """Procrustes-aligned MPJPE over ``(..., J, 3)`` (protocol #2)."""
    aligned = _procrustes_align_batch(jnp.asarray(pred), jnp.asarray(gt))
    return jnp.mean(jnp.linalg.norm(aligned - gt, axis=-1))


def n_mpjpe(pred, gt):
    """Scale-normalized MPJPE: optimal per-sample scale on pred
    (reference loss.py n_mpjpe)."""
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    num = jnp.sum(pred * gt, axis=(-2, -1), keepdims=True)
    den = jnp.sum(pred * pred, axis=(-2, -1), keepdims=True) + _EPS
    return mpjpe(pred * num / den, gt)


def mean_velocity_error(pred, gt, axis: int = 0):
    """MPJVE: mean per-joint velocity (first-difference) error
    (reference loss.py mean_velocity_error)."""
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    vp = jnp.diff(pred, axis=axis)
    vg = jnp.diff(gt, axis=axis)
    return jnp.mean(jnp.linalg.norm(vp - vg, axis=-1))


def per_joint_error(pred, gt):
    """(..., J) per-joint errors — the per-joint report columns of
    reference metrics/unity_data_compare.py:93."""
    return jnp.linalg.norm(jnp.asarray(pred) - jnp.asarray(gt), axis=-1)
