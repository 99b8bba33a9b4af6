"""Multi-view DLT triangulation as batched linear algebra.

The reference triangulates per frame in a Python loop with
``cv2.triangulatePoints`` (triangulation/triangulate.py:60). Here the whole
clip is one vmapped SVD/eigh batch under jit: ``(T, J)`` points × ``C`` views
→ ``(T, J, 3)`` in a single XLA program, with weights for invalid/missing
observations (static shapes, mask-based).

Supports ≥2 views (the reference's two-view path is the C=2 case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def projection_matrix(K, R, t):
    """``P = K [R|t]`` → (3,4). Batched over leading axes."""
    K = jnp.asarray(K)
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return K @ Rt


def _dlt_single(uv, P, w):
    """One 3D point from C views.

    uv: (C, 2) pixel observations; P: (C, 3, 4); w: (C,) weights.
    Solves A x = 0 with rows  w·(u·p3 − p1), w·(v·p3 − p2)  via the
    eigenvector of AᵀA with smallest eigenvalue (equivalent to the SVD the
    DLT classically uses, but eigh on the 4×4 normal matrix is far cheaper
    and batches perfectly on TPU).
    """
    u = uv[:, 0:1]
    v = uv[:, 1:2]
    r1 = u * P[:, 2, :] - P[:, 0, :]  # (C, 4)
    r2 = v * P[:, 2, :] - P[:, 1, :]
    A = jnp.concatenate([r1, r2], axis=0)  # (2C, 4)
    ww = jnp.concatenate([w, w], axis=0)[:, None]
    A = A * ww
    M = A.T @ A  # (4, 4) normal matrix
    evals, evecs = jnp.linalg.eigh(M)
    X = evecs[:, 0]  # smallest eigenvalue
    return X[:3] / jnp.where(jnp.abs(X[3]) < _EPS, _EPS, X[3])


def triangulate_dlt(uv, P, w=None):
    """Triangulate ``(..., C, 2)`` observations with ``(C, 3, 4)`` cameras →
    ``(..., 3)``. ``w``: optional ``(..., C)`` per-view weights
    (0 = ignore view)."""
    uv = jnp.asarray(uv)
    P = jnp.asarray(P)
    if w is None:
        w = jnp.ones(uv.shape[:-1], uv.dtype)
    w = jnp.asarray(w, uv.dtype)
    batch = uv.shape[:-2]
    C = uv.shape[-2]
    flat_uv = uv.reshape(-1, C, 2)
    flat_w = w.reshape(-1, C)
    X = jax.vmap(_dlt_single, in_axes=(0, None, 0))(flat_uv, P, flat_w)
    return X.reshape(*batch, 3)


def triangulate_sequence(kpts_a, kpts_b, K, R, t, w_a=None, w_b=None,
                         dist=None, K_b=None):
    """Two-view clip triangulation (the reference's main path).

    ``kpts_a/kpts_b: (T, J, 2)`` pixel keypoints in view A (reference:
    ``P1 = K [I|0]``) and view B (``P2 = K_b [R|t]``, reference
    triangulation/triangulate.py:60-69). ``K_b`` defaults to ``K`` (the
    reference's same-camera rig); pass the right camera's intrinsics
    when the two videos have different resolutions/zoom. ``w_*``: (T, J)
    confidence weights. Returns ``(T, J, 3)`` points in view-A camera
    coordinates.
    """
    kpts_a = jnp.asarray(kpts_a)
    kpts_b = jnp.asarray(kpts_b)
    if K_b is None:
        K_b = K
    if dist is not None:
        kpts_a = undistort_points(kpts_a, K, dist)
        kpts_b = undistort_points(kpts_b, K_b, dist)
    P1 = projection_matrix(K, jnp.eye(3, dtype=kpts_a.dtype), jnp.zeros(3, kpts_a.dtype))
    P2 = projection_matrix(K_b, R, t)
    P = jnp.stack([P1, P2], axis=0)  # (2, 3, 4)
    uv = jnp.stack([kpts_a, kpts_b], axis=-2)  # (T, J, 2views, 2)
    if w_a is None and w_b is None:
        w = None
    else:
        wa = jnp.ones(kpts_a.shape[:-1], kpts_a.dtype) if w_a is None else jnp.asarray(w_a)
        wb = jnp.ones(kpts_b.shape[:-1], kpts_b.dtype) if w_b is None else jnp.asarray(w_b)
        w = jnp.stack([wa, wb], axis=-1)
    return triangulate_dlt(uv, P, w)


def undistort_points(uv, K, dist, iters: int = 8):
    """Iteratively invert the rational distortion model (cv2.undistortPoints
    semantics, fixed-point iteration — jit-safe fixed trip count).

    Returns pixel coordinates re-projected through K with zero distortion,
    as used by the reference's undistort→re-triangulate triage
    (triangulation/postprocess.py:71).
    """
    from skix.geometry.camera import distort_rational

    uv = jnp.asarray(uv)
    K = jnp.asarray(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xd = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)

    def body(_, xn):
        # xd = distort(xn) ⇒ xn ← xd − (distort(xn) − xn)
        return xn - (distort_rational(xn, dist) - xd)

    xn = jax.lax.fori_loop(0, iters, body, xd)
    return jnp.stack([xn[..., 0] * fx + cx, xn[..., 1] * fy + cy], axis=-1)


def positive_depth_mask(X, R, t):
    """Cheirality: is each point in front of both cameras?  X in view-A
    coords; second camera (R, t). Used by the post-triage gating
    (reference triangulation/postprocess.py:126)."""
    X = jnp.asarray(X)
    z1 = X[..., 2]
    z2 = (jnp.einsum("ij,...j->...i", jnp.asarray(R), X) + jnp.asarray(t))[..., 2]
    return (z1 > 0) & (z2 > 0)
