"""Rotation representations: quaternions, rotation vectors (exp/log map), 6D.

jnp, batched over leading axes, jit/vmap/grad-safe (Taylor guards at θ→0 so
gradients through the LM bundle-adjustment solver stay finite).

Quaternion conventions match reference VideoPose3D/common/quaternion.py
(w, x, y, z ordering); rotvec ↔ matrix is the SO(3) exponential map used in
place of the reference's scipy least_squares rotvec parametrization
(reference VideoPose3D/slove_rt_from_3d.py:104-244).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


# --------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# --------------------------------------------------------------------------
def qrot(q, v):
    """Rotate vectors ``v: (..., 3)`` by quaternions ``q: (..., 4)``."""
    q = jnp.asarray(q)
    v = jnp.asarray(v)
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qinverse(q):
    """Conjugate of a unit quaternion."""
    q = jnp.asarray(q)
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmul(a, b):
    """Hamilton product ``a ⊗ b`` for ``(..., 4)`` quaternions."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_matrix(q):
    """Unit quaternion ``(..., 4)`` → rotation matrix ``(..., 3, 3)``."""
    w, x, y, z = (q[..., i] for i in range(4))
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


# --------------------------------------------------------------------------
# Rotation vector (axis-angle) ↔ matrix: SO(3) exp/log
# --------------------------------------------------------------------------
def _hat(v):
    """Skew-symmetric matrix of ``v: (..., 3)`` → ``(..., 3, 3)``."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(*v.shape[:-1], 3, 3)


def rotvec_to_matrix(rv):
    """Exponential map: rotation vector ``(..., 3)`` → matrix ``(..., 3, 3)``.

    Rodrigues with Taylor fallbacks near θ=0 so the expression is smooth and
    autodiff-safe (needed inside the LM solver's Jacobians).
    """
    rv = jnp.asarray(rv)
    theta2 = jnp.sum(rv * rv, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(θ)/θ and (1−cos θ)/θ² with series guards
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2.clip(1e-16))
    K = _hat(rv)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rv.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def matrix_to_quat(R):
    """Rotation matrix ``(..., 3, 3)`` → unit quaternion ``(..., 4)`` (w,x,y,z).

    Shepperd's method: compute all four case-candidates and select by the
    largest diagonal term — branchless, stable at every angle (including π),
    so it vectorizes under vmap with no precision cliffs.
    """
    R = jnp.asarray(R)
    m = lambda i, j: R[..., i, j]
    tr = m(0, 0) + m(1, 1) + m(2, 2)

    def cand(s4, a, b, c, order):
        s = 2.0 * jnp.sqrt(jnp.clip(s4, _EPS))
        vals = [s * 0.25, a / s, b / s, c / s]
        out = [None] * 4
        for pos, idx in enumerate(order):
            out[idx] = vals[pos]
        return jnp.stack(out, axis=-1)

    q0 = cand(1.0 + tr, m(2, 1) - m(1, 2), m(0, 2) - m(2, 0), m(1, 0) - m(0, 1),
              (0, 1, 2, 3))
    q1 = cand(1.0 + m(0, 0) - m(1, 1) - m(2, 2),
              m(2, 1) - m(1, 2), m(0, 1) + m(1, 0), m(0, 2) + m(2, 0),
              (1, 0, 2, 3))
    q2 = cand(1.0 + m(1, 1) - m(0, 0) - m(2, 2),
              m(0, 2) - m(2, 0), m(0, 1) + m(1, 0), m(1, 2) + m(2, 1),
              (2, 0, 1, 3))
    q3 = cand(1.0 + m(2, 2) - m(0, 0) - m(1, 1),
              m(1, 0) - m(0, 1), m(0, 2) + m(2, 0), m(1, 2) + m(2, 1),
              (3, 0, 1, 2))
    scores = jnp.stack(
        [1.0 + tr,
         1.0 + m(0, 0) - m(1, 1) - m(2, 2),
         1.0 + m(1, 1) - m(0, 0) - m(2, 2),
         1.0 + m(2, 2) - m(0, 0) - m(1, 1)],
        axis=-1,
    )
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cases, 4)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def matrix_to_rotvec(R):
    """Log map: rotation matrix ``(..., 3, 3)`` → rotation vector ``(..., 3)``
    via quaternion extraction (stable at θ→0 and θ→π)."""
    q = matrix_to_quat(R)
    w = q[..., 0]
    xyz = q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    # rv = θ · axis;  axis = xyz/n;  for small n, xyz ≈ axis·θ/2 ⇒ scale → 2
    small = n < 1e-6
    scale = jnp.where(small, 2.0, theta / jnp.where(small, 1.0, n))
    return xyz * scale[..., None]


# --------------------------------------------------------------------------
# 6D rotation representation (Zhou et al.; used by SAM-3D-Body-style heads —
# reference sam_3d_body geometry utils)
# --------------------------------------------------------------------------
def rot6d_to_matrix(x):
    """Continuous 6D representation ``(..., 6)`` → rotation matrix via
    Gram–Schmidt."""
    x = jnp.asarray(x)
    a1, a2 = x[..., :3], x[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / (jnp.linalg.norm(a2p, axis=-1, keepdims=True) + _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2).swapaxes(-1, -2)


def matrix_to_rot6d(R):
    """Rotation matrix → 6D (first two columns, row-major flattened)."""
    R = jnp.asarray(R)
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)
