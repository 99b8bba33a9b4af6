"""Temporal smoothing: EMA (plain + adaptive), Savitzky–Golay, moving average.

TPU-first design: the reference smooths with per-frame Python loops over NaN
dicts (fuse/fuse.py:329 ``temporal_smooth_ema``, triangulation/postprocess.py:54
``smooth_skeleton`` via scipy savgol). Here EMA is a single ``lax.scan`` and
Savitzky–Golay is a depthwise convolution with analytically-derived
coefficients — both jit into one fused XLA program over the whole clip.

Missing data is a ``valid`` mask, not NaN: the scan carries the last valid
value forward, matching the reference's NaN-aware carry-forward semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ema(x, alpha: float, valid=None):
    """Plain EMA over axis 0: ``y_t = α x_t + (1−α) y_{t−1}``.

    ``x: (T, ...)``; ``valid: (T, ...)`` bool broadcastable to x (invalid
    frames carry the previous smoothed value forward).
    """
    x = jnp.asarray(x)
    if valid is None:
        valid = jnp.ones(x.shape, bool)
    valid = jnp.broadcast_to(jnp.asarray(valid, bool), x.shape)

    def step(y_prev, inp):
        xt, vt = inp
        y = alpha * xt + (1.0 - alpha) * y_prev
        y = jnp.where(vt, y, y_prev)
        return y, y

    y0 = jnp.where(valid[0], x[0], 0.0)
    _, ys = jax.lax.scan(step, y0, (x[1:], valid[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)


def adaptive_ema(
    x,
    alpha: float = 0.7,
    alpha_joint=None,
    alpha_min: float = 0.45,
    alpha_max: float = 0.92,
    speed_gain: float = 0.25,
    valid=None,
):
    """Adaptive per-joint, speed-aware EMA over a ``(T, J, 3)`` sequence.

    Semantics of reference fuse/fuse.py:329 ``temporal_smooth_ema``:
    - ``alpha_joint (J,)``: per-joint base α (core joints smoother ×0.85,
      limbs ×1.0, endpoints ×1.15 in the reference's defaults), clipped to
      [alpha_min, alpha_max];
    - per-step speed adaptation ``α_t = clip(α_j + gain·‖x_t − y_{t−1}‖)``;
    - validity carry-forward: invalid current → hold previous; invalid
      previous + valid current → reset to current.

    ``valid: (T, J)`` bool. Returns ``(T, J, 3)``.
    """
    x = jnp.asarray(x)
    T, J = x.shape[0], x.shape[1]
    if alpha_joint is None:
        alpha_joint = jnp.full((J,), alpha, x.dtype)
    alpha_joint = jnp.clip(jnp.asarray(alpha_joint, x.dtype), alpha_min, alpha_max)
    if valid is None:
        valid = jnp.ones((T, J), bool)
    valid = jnp.asarray(valid, bool)

    def step(carry, inp):
        y_prev, prev_ok = carry
        xt, vt = inp
        speed = jnp.linalg.norm(xt - y_prev, axis=-1)
        a = jnp.clip(alpha_joint + speed_gain * speed, alpha_min, alpha_max)
        y_both = a[:, None] * xt + (1.0 - a)[:, None] * y_prev
        both = vt & prev_ok
        y = jnp.where(both[:, None], y_both,
                      jnp.where(vt[:, None], xt, y_prev))
        ok = vt | prev_ok
        return (y, ok), y

    y0 = jnp.where(valid[0][:, None], x[0], 0.0)
    (_, _), ys = jax.lax.scan(step, (y0, valid[0]), (x[1:], valid[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)


def savgol_coeffs(window: int, polyorder: int, deriv: int = 0) -> np.ndarray:
    """Savitzky–Golay FIR coefficients (host-side, static)."""
    if window % 2 != 1:
        raise ValueError("window must be odd")
    half = window // 2
    import math

    pos = np.arange(-half, half + 1, dtype=np.float64)
    A = pos[:, None] ** np.arange(polyorder + 1)[None, :]
    # pseudo-inverse row `deriv` gives the convolution weights
    coeffs = np.linalg.pinv(A)[deriv] * math.factorial(deriv)
    return coeffs.astype(np.float64)


def savgol_smooth(x, window: int = 11, polyorder: int = 3):
    """Savitzky–Golay smoothing along axis 0 of ``x: (T, ...)`` as a single
    feature-wise convolution (XLA-fused; replaces scipy.signal.savgol_filter
    in reference triangulation/postprocess.py:54). Edge handling: 'interp'-free
    symmetric reflection padding."""
    x = jnp.asarray(x)
    T = x.shape[0]
    if T < window:
        return x
    coeffs = jnp.asarray(savgol_coeffs(window, polyorder)[::-1].copy(), x.dtype)
    flat = x.reshape(T, -1)  # (T, F)
    half = window // 2
    padded = jnp.concatenate([flat[1:half + 1][::-1], flat, flat[-half - 1:-1][::-1]], axis=0)
    # conv per feature: (N=1, C=F, W=T+2*half) with depthwise kernel
    F = flat.shape[1]
    lhs = padded.T[None]  # (1, F, T+2h)
    rhs = jnp.tile(coeffs[None, None, :], (F, 1, 1))  # (F, 1, W)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        feature_group_count=F,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[0].T.reshape(x.shape)


def moving_average(x, window: int):
    """Centered moving average along axis 0 (reference angle/main.py heading
    smoothing)."""
    x = jnp.asarray(x)
    T = x.shape[0]
    half = window // 2
    flat = x.reshape(T, -1)
    padded = jnp.concatenate(
        [jnp.repeat(flat[:1], half, 0), flat, jnp.repeat(flat[-1:], window - half - 1, 0)], axis=0
    )
    csum = jnp.cumsum(jnp.concatenate([jnp.zeros_like(flat[:1]), padded], axis=0), axis=0)
    out = (csum[window:] - csum[:-window]) / window
    return out.reshape(x.shape)


def velocity(x):
    """First difference along time: (T, ...) → (T-1, ...)."""
    x = jnp.asarray(x)
    return x[1:] - x[:-1]


def jerk_metric(x):
    """Mean second-difference magnitude — temporal-jitter metric used by the
    GT-free evaluation (reference metrics/true_data_compare.py:242)."""
    x = jnp.asarray(x)
    acc = x[2:] - 2 * x[1:-1] + x[:-2]
    return jnp.mean(jnp.linalg.norm(acc, axis=-1))
