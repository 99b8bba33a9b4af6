"""Fusion confidence models, batched over whole clips.

Reference semantics (fuse/confidence.py):
- weak-perspective reprojection confidence: fit ``u ≈ s·X·M + t`` with
  orthonormal M (SVD of the 3×2 cross-covariance, :9), confidence
  ``exp(−err²/2σ_px²)`` (:63, σ_px = 12 default);
- cross-view consistency: canonicalize both views (pelvis origin, hip
  x-axis, hip→shoulder y, hip-width scale, :112), confidence
  ``exp(−d²/2σ_3d²)`` on canonical distance (:178, σ_3d = 0.08).

TPU-first: the reference fits per frame in Python with NaN dicts; here one
``vmap`` over the clip with explicit validity masks (invalid joints get
weight 0 in the fit and confidence 0 out).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def _finite_mask(x):
    return jnp.all(jnp.isfinite(x), axis=-1)


def fit_weak_perspective(X3d, U2d, w=None):
    """Weighted weak-perspective fit for one frame.

    ``X3d (J,3)``, ``U2d (J,2)``, ``w (J,)`` → (s, M(3,2), t(2,)).
    M has orthonormal columns (from the SVD of the weighted 3×2
    cross-covariance); s is the constrained least-squares scale.
    """
    X3d = jnp.asarray(X3d)
    U2d = jnp.asarray(U2d)
    J = X3d.shape[0]
    if w is None:
        w = jnp.ones((J,), X3d.dtype)
    w = jnp.asarray(w, X3d.dtype)
    wn = w / (jnp.sum(w) + _EPS)
    mu_x = jnp.sum(wn[:, None] * X3d, axis=0)
    mu_u = jnp.sum(wn[:, None] * U2d, axis=0)
    Xc = X3d - mu_x
    Uc = U2d - mu_u
    C = jnp.einsum("ji,j,jk->ik", Xc, wn, Uc)  # (3,2)
    U_svd, S, Vt = jnp.linalg.svd(C, full_matrices=True)
    M = U_svd[:, :2] @ Vt
    denom = jnp.sum(wn[:, None] * Xc * Xc)
    s = jnp.sum(S) / jnp.where(denom < 1e-12, 1e-12, denom)
    t = mu_u - s * (mu_x @ M)
    return s, M, t


def weakpersp_reproj_confidence(X3d, U2d, valid=None, sigma_px: float = 12.0):
    """Per-joint confidence from a weak-perspective fit.

    ``X3d (T,J,3)``, ``U2d (T,J,2)``, ``valid (T,J)`` bool →
    ``(conf (T,J), err_px (T,J))``. Invalid joints: conf 0, excluded from
    the fit.
    """
    X3d = jnp.asarray(X3d)
    U2d = jnp.asarray(U2d)
    if valid is None:
        valid = _finite_mask(X3d) & _finite_mask(U2d)
    w = jnp.asarray(valid, X3d.dtype)

    def one(X, U, ww):
        s, M, t = fit_weak_perspective(X, U, ww)
        Uhat = s * (X @ M) + t
        err = jnp.linalg.norm(Uhat - U, axis=-1)
        return err

    err = jax.vmap(one)(X3d, U2d, w)
    sig2 = max(float(sigma_px), _EPS) ** 2
    conf = jnp.exp(-(err**2) / (2.0 * sig2))
    conf = jnp.where(valid, conf, 0.0)
    return conf, jnp.where(valid, err, jnp.inf)


def canonicalize_pose_3d(
    X,
    root_idx: int,
    left_hip_idx: int,
    right_hip_idx: int,
    left_shoulder_idx: int,
    right_shoulder_idx: int,
    scale_mode: str = "hip",
):
    """Canonical frame per pose: pelvis origin, hip-line x, hip→shoulder y,
    right-handed z; hip-width (or torso-height) scale.

    ``X (..., J, 3)`` → ``(Xc (..., J, 3), ok (...,))`` where ``ok`` flags a
    well-conditioned canonicalization (finite key joints, non-degenerate
    scale). Batched over arbitrary leading axes.
    """
    X = jnp.asarray(X)
    root = X[..., root_idx, :]
    X0 = X - root[..., None, :]
    Lh = X0[..., left_hip_idx, :]
    Rh = X0[..., right_hip_idx, :]
    Ls = X0[..., left_shoulder_idx, :]
    Rs = X0[..., right_shoulder_idx, :]
    mid_hip = 0.5 * (Lh + Rh)
    mid_sh = 0.5 * (Ls + Rs)

    def norml(v):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.where(n < _EPS, 1.0, n), n[..., 0]

    x_axis, nx = norml(Rh - Lh)
    y_raw, ny = norml(mid_sh - mid_hip)
    z_axis, nz = norml(jnp.cross(x_axis, y_raw))
    y_axis, _ = norml(jnp.cross(z_axis, x_axis))
    R = jnp.stack([x_axis, y_axis, z_axis], axis=-2)  # world→canonical rows
    Xr = jnp.einsum("...ij,...nj->...ni", R, X0)
    if scale_mode == "hip":
        s = jnp.linalg.norm(Rh - Lh, axis=-1)
    elif scale_mode == "torso":
        s = jnp.linalg.norm(mid_sh - mid_hip, axis=-1)
    else:
        raise ValueError("scale_mode must be 'hip' or 'torso'")
    ok = (
        jnp.all(jnp.isfinite(jnp.stack([root, Lh, Rh, Ls, Rs], -2)), axis=(-2, -1))
        & (s > _EPS) & (nx > _EPS) & (ny > _EPS) & (nz > _EPS)
    )
    Xc = Xr / jnp.where(s < _EPS, 1.0, s)[..., None, None]
    return Xc, ok


def crossview_consistency_confidence(
    X_a,
    X_b,
    root_idx: int,
    left_hip_idx: int,
    right_hip_idx: int,
    left_shoulder_idx: int,
    right_shoulder_idx: int,
    sigma_3d: float = 0.08,
    scale_mode: str = "hip",
    valid_a=None,
    valid_b=None,
):
    """Per-joint cross-view agreement confidence.

    ``X_a, X_b (T,J,3)`` → ``(conf (T,J), dist (T,J))``. Frames whose
    canonicalization is degenerate contribute confidence 0.
    """
    X_a = jnp.asarray(X_a)
    X_b = jnp.asarray(X_b)
    idx = (root_idx, left_hip_idx, right_hip_idx, left_shoulder_idx,
           right_shoulder_idx)
    Xa_c, ok_a = canonicalize_pose_3d(X_a, *idx, scale_mode=scale_mode)
    Xb_c, ok_b = canonicalize_pose_3d(X_b, *idx, scale_mode=scale_mode)
    va = _finite_mask(X_a) if valid_a is None else jnp.asarray(valid_a, bool)
    vb = _finite_mask(X_b) if valid_b is None else jnp.asarray(valid_b, bool)
    valid = va & vb & ok_a[..., None] & ok_b[..., None]
    dist = jnp.linalg.norm(jnp.where(valid[..., None], Xa_c - Xb_c, 0.0), axis=-1)
    sig2 = max(float(sigma_3d), _EPS) ** 2
    conf = jnp.where(valid, jnp.exp(-(dist**2) / (2.0 * sig2)), 0.0)
    return conf, jnp.where(valid, dist, jnp.inf)
