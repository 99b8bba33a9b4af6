"""Camera models: screen normalization, world↔camera, distortion projection.

Semantics match the reference so outputs are numerically comparable:
- ``normalize_screen_coordinates`` / ``image_coordinates``:
  reference VideoPose3D/common/camera.py:14-25 ([0,w]→[-1,1], aspect kept).
- ``project_to_2d_h36m``: the H36M radial(k1..k3)+tangential(p1,p2) model,
  reference common/camera.py:37-69 (clamped normalized coords).
- ``project_points``: pinhole K[R|t] projection with optional OpenCV
  rational distortion, the vectorized (T,C,J) form of reference
  bundle_adjustment/loss.py:17 and triangulation/reproject.py:49.

Everything is jnp, batched over arbitrary leading axes, jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from skix.geometry.rotations import qinverse, qrot


def normalize_screen_coordinates(x, w, h):
    """Map pixel coords ``(..., 2)`` from [0,w]×[0,h] to [-1,1]×[-h/w,h/w]."""
    x = jnp.asarray(x)
    offs = jnp.asarray([1.0, h / w], dtype=x.dtype)
    return x / w * 2.0 - offs


def image_coordinates(x, w, h):
    """Inverse of :func:`normalize_screen_coordinates`."""
    x = jnp.asarray(x)
    offs = jnp.asarray([1.0, h / w], dtype=x.dtype)
    return (x + offs) * w / 2.0


def world_to_camera(x, q, t):
    """World → camera with orientation quaternion ``q (4,)`` and position
    ``t (3,)`` (reference common/camera.py:28)."""
    x = jnp.asarray(x)
    qi = jnp.broadcast_to(qinverse(q), (*x.shape[:-1], 4))
    return qrot(qi, x - t)


def camera_to_world(x, q, t):
    x = jnp.asarray(x)
    qq = jnp.broadcast_to(jnp.asarray(q), (*x.shape[:-1], 4))
    return qrot(qq, x) + t


def project_to_2d_h36m(x, camera_params):
    """H36M distortion projection.

    ``x: (..., 3)`` camera-space points; ``camera_params: (..., 9)`` =
    (fx, fy, cx, cy, k1, k2, k3, p1, p2), broadcastable to x's batch shape.
    """
    x = jnp.asarray(x)
    cp = jnp.asarray(camera_params)
    while cp.ndim < x.ndim:
        cp = cp[..., None, :]
    f, c, k, p = cp[..., :2], cp[..., 2:4], cp[..., 4:7], cp[..., 7:9]
    xx = jnp.clip(x[..., :2] / x[..., 2:], -1.0, 1.0)
    r2 = jnp.sum(xx * xx, axis=-1, keepdims=True)
    radial = 1.0 + jnp.sum(
        k * jnp.concatenate([r2, r2**2, r2**3], axis=-1), axis=-1, keepdims=True
    )
    tan = jnp.sum(p * xx, axis=-1, keepdims=True)
    xxx = xx * (radial + tan) + p * r2
    return f * xxx + c


def project_linear(x, camera_params):
    """Linear pinhole projection (fx, fy, cx, cy only) —
    reference common/camera.py:71."""
    x = jnp.asarray(x)
    cp = jnp.asarray(camera_params)
    while cp.ndim < x.ndim:
        cp = cp[..., None, :]
    f, c = cp[..., :2], cp[..., 2:4]
    xx = jnp.clip(x[..., :2] / x[..., 2:], -1.0, 1.0)
    return f * xx + c


def distort_rational(xn, dist):
    """OpenCV distortion on normalized coords ``xn: (..., 2)``.

    ``dist``: length-0/4/5/8/12/14 coefficient vector
    (k1,k2,p1,p2[,k3[,k4,k5,k6[,s1..s4[,τx,τy]]]]) — the rational model the
    reference uses for the DJI Osmo (triangulation/main.py:66, 14 coefs; thin
    prism s, tilt τ supported as zero-extended).
    """
    xn = jnp.asarray(xn)
    d = jnp.zeros(14, dtype=xn.dtype).at[: len(dist)].set(jnp.asarray(dist, xn.dtype))
    k1, k2, p1, p2, k3, k4, k5, k6 = d[0], d[1], d[2], d[3], d[4], d[5], d[6], d[7]
    s1, s2, s3, s4 = d[8], d[9], d[10], d[11]
    u, v = xn[..., 0], xn[..., 1]
    r2 = u * u + v * v
    r4, r6 = r2 * r2, r2 * r2 * r2
    num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
    radial = num / den
    ud = u * radial + 2.0 * p1 * u * v + p2 * (r2 + 2.0 * u * u) + s1 * r2 + s2 * r4
    vd = v * radial + p1 * (r2 + 2.0 * v * v) + 2.0 * p2 * u * v + s3 * r2 + s4 * r4
    return jnp.stack([ud, vd], axis=-1)


def project_points(X, K, R, t, dist=None):
    """World points → pixels through ``K [R|t]``.

    ``X: (..., 3)``; ``K: (3,3)`` or batched ``(..., 3,3)``; ``R: (..., 3,3)``;
    ``t: (..., 3)``. Returns ``(..., 2)`` pixel coordinates. This is the
    single projection primitive shared by triangulation reprojection checks
    and the BA residuals (reference implements it at least 3 times).
    """
    X = jnp.asarray(X)
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    z = Xc[..., 2:3]
    xn = Xc[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    if dist is not None:
        xn = distort_rational(xn, dist)
    K = jnp.asarray(K)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    u = fx[..., None] * xn[..., 0] + cx[..., None] if fx.ndim else fx * xn[..., 0] + cx
    v = fy[..., None] * xn[..., 1] + cy[..., None] if fy.ndim else fy * xn[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


def camera_center(R, t):
    """Camera center ``C = -Rᵀ t`` (reference two_view.py camera-center logs)."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    return -jnp.einsum("...ji,...j->...i", R, t)


def reprojection_error(X, uv_obs, K, R, t, dist=None, valid=None):
    """Per-point pixel reprojection error ``(...,)`` with optional validity
    mask; the post-hoc check the reference logs after every geometric step
    (triangulation/reproject.py:203, bundle_adjustment/run.py:158)."""
    uv = project_points(X, K, R, t, dist)
    err = jnp.linalg.norm(uv - uv_obs, axis=-1)
    if valid is not None:
        err = jnp.where(valid, err, 0.0)
    return err
