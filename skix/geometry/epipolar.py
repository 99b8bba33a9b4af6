"""Two-view epipolar geometry: essential matrix, RANSAC, pose recovery.

The reference estimates per-frame relative camera pose with
``cv2.findEssentialMat`` (RANSAC) + ``cv2.recoverPose`` in a Python loop over
frames (triangulation/camera_position/camera_position.py:88-242). That is a
data-dependent iterative algorithm; the TPU-native redesign is:

- a **fixed-round, vmapped hypothesis RANSAC**: draw S minimal 8-point
  samples up front with ``jax.random``, fit all S essential matrices in one
  batched eigendecomposition, score all hypotheses against all points with
  the Sampson distance in one einsum, argmax inliers, then refit on the
  winning inlier set — no data-dependent control flow, everything jits;
- cheirality (``recoverPose``) as a batched positive-depth vote over the 4
  (R, t) decompositions of E.

The whole clip's frames batch through this under one ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def normalize_points(uv, K):
    """Pixels → normalized camera coords with K⁻¹ (no distortion)."""
    uv = jnp.asarray(uv)
    K = jnp.asarray(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def _eight_point(x1, x2, w):
    """Weighted 8-point algorithm on normalized coords.

    x1, x2: (N, 2); w: (N,) weights. Returns E (3, 3) with singular values
    projected to (1, 1, 0).
    """
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    ones = jnp.ones_like(u1)
    # rows of the epipolar constraint x2ᵀ E x1 = 0
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # (N, 9)
    A = A * w[:, None]
    M = A.T @ A
    _, evecs = jnp.linalg.eigh(M)
    e = evecs[:, 0]
    E = e.reshape(3, 3)
    # enforce essential structure
    U, S, Vt = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype)) @ Vt
    return E


def sampson_distance(E, x1, x2):
    """First-order geometric error of the epipolar constraint; (N,)."""
    ones = jnp.ones((*x1.shape[:-1], 1), x1.dtype)
    p1 = jnp.concatenate([x1, ones], axis=-1)  # (N, 3)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = p1 @ E.T  # = (E @ p1ᵀ)ᵀ, (N, 3)
    Etx2 = p2 @ E  # (N, 3)
    num = jnp.sum(p2 * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / (den + _EPS)


def decompose_essential(E):
    """E → (R1, R2, t̂): the two rotations and unit translation."""
    U, _, Vt = jnp.linalg.svd(E)
    # make proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


def _depths(R, t, x1, x2):
    """Linear two-view depth along each ray (mid-point style); returns
    (z1, z2) per point for the cheirality vote."""
    # triangulate in closed form: z1 * x1h and camera-2 point z2 * x2h with
    # z2 x2h = R (z1 x1h) + t  → solve 2 unknowns per point by least squares
    ones = jnp.ones((*x1.shape[:-1], 1), x1.dtype)
    x1h = jnp.concatenate([x1, ones], axis=-1)  # (N, 3)
    x2h = jnp.concatenate([x2, ones], axis=-1)
    Rx1 = x1h @ R.T  # (N, 3)
    # [Rx1, -x2h] [z1, z2]ᵀ = -t
    a11 = jnp.sum(Rx1 * Rx1, axis=-1)
    a12 = -jnp.sum(Rx1 * x2h, axis=-1)
    a22 = jnp.sum(x2h * x2h, axis=-1)
    b1 = -jnp.sum(Rx1 * t, axis=-1)
    b2 = jnp.sum(x2h * t, axis=-1)
    det = a11 * a22 - a12 * a12
    z1 = (b1 * a22 - a12 * b2) / (det + _EPS)
    z2 = (a11 * b2 - a12 * b1) / (det + _EPS)
    return z1, z2


class RelativePose(NamedTuple):
    R: jnp.ndarray          # (3, 3)
    t: jnp.ndarray          # (3,) unit-norm (scale to baseline outside)
    E: jnp.ndarray          # (3, 3)
    inliers: jnp.ndarray    # (N,) bool
    num_inliers: jnp.ndarray  # scalar int


def recover_pose(E, x1, x2, w=None):
    """Choose the (R, t) among the 4 decompositions of E with the most
    points in front of both cameras (cv2.recoverPose semantics, batched)."""
    R1, R2, t = decompose_essential(E)
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])
    if w is None:
        w = jnp.ones(x1.shape[0], x1.dtype)

    def vote(R, tt):
        z1, z2 = _depths(R, tt, x1, x2)
        return jnp.sum(w * ((z1 > 0) & (z2 > 0)))

    votes = jax.vmap(vote)(cands_R, cands_t)
    best = jnp.argmax(votes)
    return cands_R[best], cands_t[best]


def estimate_relative_pose(
    uv1,
    uv2,
    K,
    key=None,
    num_hypotheses: int = 256,
    inlier_threshold_px: float = 2.0,
    weights=None,
) -> RelativePose:
    """Full RANSAC essential-matrix + pose pipeline for one frame pair.

    ``uv1, uv2: (N, 2)`` pixel correspondences; ``weights: (N,)`` optional
    confidence (0 excludes a point — used for the kpt+bbox weighted-union
    method, reference camera_position_kpt_bbox.py:178). jit/vmap-safe: all
    loops are fixed-size.
    """
    uv1 = jnp.asarray(uv1)
    uv2 = jnp.asarray(uv2)
    K = jnp.asarray(K)
    N = uv1.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    if weights is None:
        weights = jnp.ones((N,), uv1.dtype)
    weights = jnp.asarray(weights, uv1.dtype)

    x1 = normalize_points(uv1, K)
    x2 = normalize_points(uv2, K)

    # pixel threshold → normalized-coords threshold (Sampson is squared)
    f_mean = 0.5 * (K[0, 0] + K[1, 1])
    thr = (inlier_threshold_px / f_mean) ** 2

    # --- hypothesis generation: (S, 8) index samples, weighted by validity
    logits = jnp.where(weights > 0, 0.0, -1e9)
    keys = jax.random.split(key, num_hypotheses)

    def sample_idx(k):
        return jax.random.categorical(k, logits, shape=(8,))

    samples = jax.vmap(sample_idx)(keys)  # (S, 8)

    def fit(idx):
        return _eight_point(x1[idx], x2[idx], jnp.ones((8,), x1.dtype))

    Es = jax.vmap(fit)(samples)  # (S, 3, 3)

    # --- score all hypotheses
    def score(E):
        d = sampson_distance(E, x1, x2)
        inl = (d < thr) & (weights > 0)
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(score)(Es)
    best = jnp.argmax(counts)
    best_inl = inls[best]

    # --- refit on inliers (weighted least squares over all points)
    w_refit = jnp.where(best_inl, weights, 0.0)
    E = _eight_point(x1, x2, w_refit)
    d = sampson_distance(E, x1, x2)
    final_inl = (d < thr) & (weights > 0)
    R, t = recover_pose(E, x1, x2, w=final_inl.astype(x1.dtype))
    return RelativePose(R=R, t=t, E=E, inliers=final_inl,
                        num_inliers=jnp.sum(final_inl))


def scale_translation_to_baseline(t, baseline_m: float):
    """Scale a unit translation to a known stereo baseline (reference
    triangulation/camera_position/camera_position.py:110, 20 m default)."""
    t = jnp.asarray(t)
    return t / (jnp.linalg.norm(t) + _EPS) * baseline_m
