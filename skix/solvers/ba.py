"""Multi-view bundle adjustment: the 5 reference losses + LM/Adam solvers.

Loss semantics match reference bundle_adjustment/loss.py (vectorized (T,C,J)
projection :17, confidence-weighted reprojection :90, camera-center temporal
smoothness :103, baseline regularizer :109, 12-bone length consistency :134
with BONES :118, pose temporal smoothness :153) and the intended
hyperparameters of configs/vggt.yaml:43-53 (modes pose_only / pose_cam_t /
full). The reference defines these losses but its optimizer loop is dead
code (`run_local_ba` undefined — SURVEY.md §2.5); here the solve actually
runs, under ``jit``, as either

- ``method="lm"``   — matrix-free Levenberg–Marquardt (skix.solvers.lm), or
- ``method="adam"`` — optax Adam over the summed losses (the reference's
  intended 10k-iteration schedule), as a ``lax.scan``.

Rotations are optimized in rotation-vector form via the exact SO(3) exp map
(autodiff-safe, see skix.geometry.rotations).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from skix.geometry.rotations import matrix_to_rotvec, rotvec_to_matrix
from skix.geometry.skeletons import COCO_BONES_12
from skix.solvers.lm import levenberg_marquardt

_EPS = 1e-9


def project_tcj(X, R, t, K):
    """World joints ``(T, J, 3)`` through per-camera ``R (C,3,3) | (T,C,3,3)``,
    ``t (C,3) | (T,C,3)``, ``K (C,3,3)`` → pixels ``(T, C, J, 2)``.

    The vectorized form of reference bundle_adjustment/loss.py:17
    ``project_points`` (z clamped at 1e-6, linear intrinsics).
    """
    X = jnp.asarray(X)
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    K = jnp.asarray(K)
    if K.ndim == 2:  # shared intrinsics → broadcast over cameras
        C = R.shape[0] if R.ndim == 3 else R.shape[1]
        K = jnp.broadcast_to(K, (C, 3, 3))
    if R.ndim == 3:  # (C,3,3) static cameras
        Xc = jnp.einsum("cij,tnj->tcni", R, X) + t[None, :, None, :]
    else:  # (T,C,3,3) per-frame cameras
        Xc = jnp.einsum("tcij,tnj->tcni", R, X) + t[:, :, None, :]
    z = jnp.clip(Xc[..., 2:3], 1e-6)
    xy = Xc[..., :2] / z
    fx = K[..., 0, 0][None, :, None]
    fy = K[..., 1, 1][None, :, None]
    cx = K[..., 0, 2][None, :, None]
    cy = K[..., 1, 2][None, :, None]
    return jnp.stack([xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1)


def camera_centers(R, t):
    """C = −Rᵀt, shape of t."""
    return -jnp.einsum("...ji,...j->...i", jnp.asarray(R), jnp.asarray(t))


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Weights/hyperparams (defaults = reference configs/vggt.yaml:43-53)."""

    w_reproj: float = 1.0
    w_cam_smooth: float = 0.1
    w_baseline: float = 0.01
    w_bone: float = 0.1
    w_temporal: float = 0.1
    mode: str = "full"            # pose_only | pose_cam_t | full
    method: str = "lm"            # lm | adam
    max_steps: int = 50           # LM outer steps
    cg_iters: int = 30
    adam_iters: int = 2000
    adam_lr: float = 1e-2         # reference's intended lr
    bones: tuple = COCO_BONES_12


def ba_loss_terms(X, rvec, tvec, K, x2d, conf2d, cfg: BAConfig,
                  ref_bone_len=None):
    """The five scalar loss terms, reference-weighted. Returns a dict."""
    R = rotvec_to_matrix(rvec)
    pred = project_tcj(X, R, tvec, K)
    d2 = jnp.sum((pred - x2d) ** 2, axis=-1)
    reproj = cfg.w_reproj * jnp.sum(conf2d * d2) / (jnp.sum(conf2d) + 1e-6)

    C = camera_centers(R, tvec)
    if C.ndim == 3:  # (T,C,3): per-frame cameras → temporal smoothness
        cam_smooth = cfg.w_cam_smooth * jnp.mean((C[1:] - C[:-1]) ** 2)
        Cb = C
    else:
        cam_smooth = jnp.asarray(0.0, X.dtype)
        Cb = C[None]
    if Cb.shape[1] >= 2:
        baseline = jnp.linalg.norm(Cb[:, 0] - Cb[:, 1], axis=-1)
        base_mean = jax.lax.stop_gradient(jnp.mean(baseline))
        baseline_reg = cfg.w_baseline * jnp.mean((baseline - base_mean) ** 2)
    else:
        baseline_reg = jnp.asarray(0.0, X.dtype)

    import numpy as _np

    bones = _np.asarray(cfg.bones, dtype=_np.int64).reshape(-1, 2)
    if len(bones):
        seg = X[:, bones[:, 0], :] - X[:, bones[:, 1], :]
        L = jnp.linalg.norm(seg, axis=-1)  # (T, B)
        ref = (jax.lax.stop_gradient(jnp.mean(L, axis=0, keepdims=True))
               if ref_bone_len is None
               else jnp.asarray(ref_bone_len)[None, :])
        bone = cfg.w_bone * jnp.mean((L - ref) ** 2)
    else:
        bone = jnp.asarray(0.0, X.dtype)

    temporal = (cfg.w_temporal * jnp.mean((X[1:] - X[:-1]) ** 2)
                if X.shape[0] >= 2 else jnp.asarray(0.0, X.dtype))
    return {
        "reprojection": reproj,
        "camera_smooth": cam_smooth,
        "baseline_reg": baseline_reg,
        "bone_length": bone,
        "pose_temporal": temporal,
    }


def _residual_blocks(X, rvec, tvec, K, x2d, conf2d, cfg: BAConfig,
                     ref_bone_len=None):
    """Least-squares residual vector whose ½‖r‖² ≈ Σ loss terms (so LM and
    Adam optimize the same objective)."""
    R = rotvec_to_matrix(rvec)
    pred = project_tcj(X, R, tvec, K)
    w_r = jnp.sqrt(2.0 * cfg.w_reproj * conf2d / (jnp.sum(conf2d) + 1e-6))
    r_reproj = (w_r[..., None] * (pred - x2d)).ravel()

    parts = [r_reproj]
    C = camera_centers(R, tvec)
    if C.ndim == 3:
        d = C[1:] - C[:-1]
        parts.append(jnp.sqrt(2.0 * cfg.w_cam_smooth / d.size) * d.ravel())
        Cb = C
    else:
        Cb = C[None]
    if Cb.shape[1] >= 2:
        baseline = jnp.linalg.norm(Cb[:, 0] - Cb[:, 1], axis=-1)
        base_mean = jax.lax.stop_gradient(jnp.mean(baseline))
        parts.append(jnp.sqrt(2.0 * cfg.w_baseline / baseline.size)
                     * (baseline - base_mean).ravel())

    import numpy as _np

    bones = _np.asarray(cfg.bones, dtype=_np.int64).reshape(-1, 2)
    if len(bones):  # point clouds (SfM tracks) set bones=() — no skeleton
        seg = X[:, bones[:, 0], :] - X[:, bones[:, 1], :]
        L = jnp.linalg.norm(seg + _EPS, axis=-1)
        ref = (jax.lax.stop_gradient(jnp.mean(L, axis=0, keepdims=True))
               if ref_bone_len is None
               else jnp.asarray(ref_bone_len)[None, :])
        parts.append(jnp.sqrt(2.0 * cfg.w_bone / L.size) * (L - ref).ravel())

    if X.shape[0] >= 2:  # temporal smoothness needs ≥2 frames
        dX = X[1:] - X[:-1]
        parts.append(jnp.sqrt(2.0 * cfg.w_temporal / dX.size) * dX.ravel())
    return jnp.concatenate(parts)


import functools


@functools.lru_cache(maxsize=64)
def _cached_residual(cfg: BAConfig, shapes: tuple, frozen_names: tuple,
                     ref_is_none: bool):
    """One residual function object per (config, shape signature) — the
    same object across bundle_adjust calls, so jitted solvers cache."""
    import numpy as _np

    sizes = [(k, shp, int(_np.prod(shp))) for k, shp in shapes]

    def fn(flat, frozen_vals, K, x2d, conf2d, rbl):
        p = {}
        i = 0
        for k, shp, n in sizes:
            p[k] = flat[i:i + n].reshape(shp)
            i += n
        p.update(dict(zip(frozen_names, frozen_vals)))
        return _residual_blocks(p["X"], p["rvec"], p["tvec"], K, x2d,
                                conf2d, cfg,
                                None if ref_is_none else rbl)

    return fn


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _adam_run(residual_fn, iters: int, lr: float, flat0, args):
    import optax

    def loss_fn(flat):
        r = residual_fn(flat, *args)
        return 0.5 * jnp.vdot(r, r).real

    opt = optax.adam(lr)
    state = opt.init(flat0)

    def body(carry, _):
        f, s = carry
        loss, g = jax.value_and_grad(loss_fn)(f)
        upd, s = opt.update(g, s)
        return (optax.apply_updates(f, upd), s), loss

    (f, _), losses = jax.lax.scan(body, (flat0, state), None, length=iters)
    return f, losses[0], loss_fn(f)


class BAResult(NamedTuple):
    X: jnp.ndarray            # (T, J, 3) refined joints
    R: jnp.ndarray            # (C, 3, 3) or (T, C, 3, 3)
    t: jnp.ndarray            # (C, 3) or (T, C, 3)
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray
    losses: dict              # final loss-term breakdown


def bundle_adjust(
    X_init,
    R_init,
    t_init,
    K,
    x2d,
    conf2d=None,
    cfg: Optional[BAConfig] = None,
    ref_bone_len=None,
) -> BAResult:
    """Refine joints and/or cameras against 2D observations.

    ``X_init (T,J,3)``; ``R_init (C,3,3)|(T,C,3,3)``; ``t_init`` matching;
    ``K (C,3,3)``; ``x2d (T,C,J,2)``; ``conf2d (T,C,J)`` (None → ones).
    Mode (cfg.mode): pose_only = joints only; pose_cam_t = joints +
    translations; full = joints + rotations + translations.
    """
    cfg = cfg or BAConfig()
    X_init = jnp.asarray(X_init)
    R_init = jnp.asarray(R_init)
    t_init = jnp.asarray(t_init)
    K = jnp.asarray(K)
    x2d = jnp.asarray(x2d)
    if conf2d is None:
        conf2d = jnp.ones(x2d.shape[:-1], x2d.dtype)
    conf2d = jnp.asarray(conf2d)
    rvec_init = matrix_to_rotvec(R_init)

    free = {"X": X_init}
    frozen = {}
    if cfg.mode in ("pose_cam_t", "full"):
        free["tvec"] = t_init
    else:
        frozen["tvec"] = t_init
    if cfg.mode == "full":
        free["rvec"] = rvec_init
    else:
        frozen["rvec"] = rvec_init
    if cfg.mode not in ("pose_only", "pose_cam_t", "full"):
        raise ValueError(f"unknown BA mode {cfg.mode!r}")

    flat0, unravel = ravel_pytree(free)

    # CACHEABLE residual: data flows through args (not a fresh closure per
    # call), and the function object is lru_cached on (cfg, static shape
    # signature) — repeated solves hit the jit cache instead of paying a
    # full recompile (~4 s/call through the remote-compile tunnel).
    shapes = tuple(sorted((k, tuple(v.shape)) for k, v in free.items()))
    frozen_names = tuple(sorted(frozen))
    residual_fn = _cached_residual(cfg, shapes, frozen_names,
                                   ref_bone_len is None)
    frozen_vals = tuple(frozen[k] for k in frozen_names)
    rbl = (jnp.zeros(len(cfg.bones)) if ref_bone_len is None
           else jnp.asarray(ref_bone_len))
    args = (frozen_vals, K, x2d, conf2d, rbl)

    def assemble(flat):
        p = dict(unravel(flat))
        p.update(frozen)
        return p

    if cfg.method == "lm":
        res = levenberg_marquardt(residual_fn, flat0, args,
                                  max_steps=cfg.max_steps,
                                  cg_iters=cfg.cg_iters)
        flat_final, init_cost, final_cost, iters = (
            res.x, res.initial_cost, res.cost, res.iterations)
    elif cfg.method == "adam":
        flat_final, init_cost, final_cost = _adam_run(
            residual_fn, cfg.adam_iters, cfg.adam_lr, flat0, args)
        iters = jnp.asarray(cfg.adam_iters)
    else:
        raise ValueError(f"unknown BA method {cfg.method!r}")

    p = assemble(flat_final)
    terms = ba_loss_terms(p["X"], p["rvec"], p["tvec"], K, x2d, conf2d, cfg,
                          ref_bone_len)
    return BAResult(
        X=p["X"], R=rotvec_to_matrix(p["rvec"]), t=p["tvec"],
        initial_cost=init_cost, final_cost=final_cost, iterations=iters,
        losses=terms,
    )
