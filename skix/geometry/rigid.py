"""Rigid / similarity alignment: Umeyama & Kabsch with validity masks.

The reference implements this family at least four times
(VideoPose3D/fuse/fuse.py:31 ``_umeyama``, VideoPose3D/fuse/fuse_check.py:24,
bundle_adjustment/fuse/fuse.py:96 ``rigid_transform_3D``, fuse/main_raw.py:48
``_kabsch_rigid_align``). Here: one masked, batched, jit/vmap-safe
implementation. Convention matches the reference: find (s, R, t) such that
``s · R @ Y + t ≈ X`` (align Y/right/source onto X/left/target).

Missing joints are handled with weight masks instead of NaN branching —
a weight of 0 removes a point from the estimate, keeping shapes static for
XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS = 1e-9


class RigidTransform(NamedTuple):
    s: jnp.ndarray  # scalar scale
    R: jnp.ndarray  # (3,3)
    t: jnp.ndarray  # (3,)

    def apply(self, y):
        y = jnp.asarray(y)
        return self.s * jnp.einsum("ij,...j->...i", self.R, y) + self.t


def umeyama(x, y, w=None, allow_scale: bool = False) -> RigidTransform:
    """Weighted Umeyama: (s, R, t) minimizing Σ wᵢ‖s·R yᵢ + t − xᵢ‖².

    ``x, y: (N, 3)``; ``w: (N,)`` nonneg weights (0 drops a point). With
    ``allow_scale=False`` this is weighted Kabsch (s=1). Reflections are
    corrected via the det sign (same fix as reference fuse.py:43-45).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    if w is None:
        w = jnp.ones((n,), dtype=x.dtype)
    w = jnp.asarray(w, x.dtype)
    wsum = jnp.sum(w) + _EPS
    wn = w / wsum
    mu_x = jnp.sum(wn[:, None] * x, axis=0)
    mu_y = jnp.sum(wn[:, None] * y, axis=0)
    xc = x - mu_x
    yc = y - mu_y
    # cross-covariance Σ = Yᵀ W X (maps Y-space to X-space)
    sigma = jnp.einsum("ni,n,nj->ij", yc, wn, xc)
    U, S, Vt = jnp.linalg.svd(sigma)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.asarray([1.0, 1.0, jnp.sign(det)], x.dtype))
    # R maps y→x:  R = (U D Vt)ᵀ = V D Uᵀ
    R = (U @ D @ Vt).T
    if allow_scale:
        var_y = jnp.sum(wn * jnp.sum(yc * yc, axis=-1))
        s = jnp.sum(S * jnp.diag(D)) / (var_y + _EPS)
    else:
        s = jnp.asarray(1.0, x.dtype)
    t = mu_x - s * (R @ mu_y)
    return RigidTransform(s=s, R=R, t=t)


def kabsch(x, y, w=None) -> RigidTransform:
    """Rigid (no-scale) special case."""
    return umeyama(x, y, w=w, allow_scale=False)


def rigid_validity(tr: RigidTransform, x, y, w=None) -> dict:
    """Validity report for an estimated transform — the semantics of the
    reference's ``check_rigid_validity`` (VideoPose3D/fuse/fuse_check.py:85):
    orthonormality, determinant, residuals, pairwise-distance preservation.
    Returns a dict of jnp scalars (jit-safe)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    if w is None:
        w = jnp.ones((n,), x.dtype)
    w = jnp.asarray(w, x.dtype)
    wn = w / (jnp.sum(w) + _EPS)
    R = tr.R
    ortho_err = jnp.linalg.norm(R @ R.T - jnp.eye(3, dtype=x.dtype))
    det = jnp.linalg.det(R)
    resid = jnp.sqrt(jnp.sum(wn * jnp.sum((tr.apply(y) - x) ** 2, axis=-1)))
    # pairwise-distance preservation (scale-adjusted)
    dx = jnp.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
    dy = jnp.linalg.norm(y[:, None, :] - y[None, :, :], axis=-1) * tr.s
    ww = wn[:, None] * wn[None, :]
    pd_err = jnp.sqrt(jnp.sum(ww * (dx - dy) ** 2) / (jnp.sum(ww) + _EPS))
    return {
        "ortho_error": ortho_err,
        "det": det,
        "rms_residual": resid,
        "pairwise_dist_rms": pd_err,
    }


def procrustes_align(pred, gt):
    """Per-sample Procrustes alignment of ``pred`` onto ``gt`` (both (J,3)),
    with scale — used by P-MPJPE (reference VideoPose3D/common/loss.py
    p_mpjpe). Returns aligned pred."""
    tr = umeyama(gt, pred, allow_scale=True)
    return tr.apply(pred)
