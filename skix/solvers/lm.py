"""Matrix-free Levenberg–Marquardt under ``jit``.

TPU-first design: classic BA libraries (Ceres/g2o) build sparse Jacobians and
factorize with Schur complements on the CPU. On TPU the efficient shape is
**matrix-free Gauss–Newton**: Jacobian-vector products via ``jax.jvp`` and
vector-Jacobian products via ``jax.vjp`` (each costs ~one residual
evaluation, all batched matmuls), with a fixed-iteration conjugate-gradient
inner solve of the damped normal equations

    (JᵀJ + λ·diag(JᵀJ)) δ = −Jᵀr

and a ``lax.while_loop`` trust-region λ schedule. No data-dependent shapes;
the whole solve is one XLA program.

This is the working replacement for the reference's *dead* BA optimizer
(`run_local_ba` is referenced at vggt/multi_view_process.py:321-353,553 but
never defined; see SURVEY.md §2.5/§2.6).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    x: jnp.ndarray           # final parameters (flat)
    cost: jnp.ndarray        # final ½‖r‖²
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray  # accepted + rejected steps taken
    lam: jnp.ndarray         # final damping


def _cg_solve(matvec: Callable, b, x0, iters: int):
    """Fixed-iteration conjugate gradient for SPD ``matvec``."""

    def body(_, state):
        x, r, p, rs = state
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = rs / jnp.where(denom <= 0, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        beta = rs_new / jnp.where(rs <= 0, 1e-30, rs)
        p = r + beta * p
        return x, r, p, rs_new

    r0 = b - matvec(x0)
    state = (x0, r0, r0, jnp.vdot(r0, r0))
    x, _, _, _ = jax.lax.fori_loop(0, iters, body, state)
    return x


def _estimate_jtj_diag(residual_fn: Callable, x, probes: int):
    """Hutchinson estimate of ``diag(JᵀJ)``: E[v ⊙ JᵀJv] over Rademacher
    probes ``v`` (matrix-free; ~2·probes residual evaluations)."""
    key = jax.random.PRNGKey(17)
    vs = jax.random.rademacher(key, (probes, x.size),
                               dtype=x.dtype).reshape((probes,) + x.shape)
    _, vjp = jax.vjp(residual_fn, x)

    def one(v):
        _, jv = jax.jvp(residual_fn, (x,), (v,))
        return v * vjp(jv)[0]

    return jnp.mean(jax.vmap(one)(vs), axis=0)


@partial(jax.jit, static_argnums=(0, 3, 4, 10))
def levenberg_marquardt(
    residual_fn: Callable,
    x0,
    args: tuple = (),
    max_steps: int = 50,
    cg_iters: int = 30,
    init_lambda: float = 1e-3,
    lambda_up: float = 3.0,
    lambda_down: float = 3.0,
    rtol: float = 1e-8,
    damping_scale=None,
    diag_probes: int = 8,
) -> LMResult:
    """Minimize ``½‖residual_fn(x, *args)‖²`` over a flat parameter vector.

    ``residual_fn``: (flat params, *args) → flat residuals (any static
    shape). ``args`` is a DYNAMIC pytree: pass observation data through it
    (instead of closing over it) so repeated solves with the same residual
    function and shapes hit the jit cache instead of recompiling.
    Jacobian products are taken with jvp/vjp; JᵀJ is never materialized.

    Damping is Marquardt-scaled, ``(JᵀJ + λ·diag(JᵀJ))δ = −Jᵀr``: BA
    parameter vectors mix meters (t, X) and radians (rotvec), where
    identity damping conditions the step badly. ``damping_scale`` supplies
    the diagonal explicitly; when ``None`` it is re-estimated each step
    from ``diag_probes`` Hutchinson probes (floored so zero-column
    parameters still receive identity damping).
    """
    x0 = jnp.asarray(x0)

    def rfn(x):
        return residual_fn(x, *args)

    def cost_of(x):
        r = rfn(x)
        return 0.5 * jnp.vdot(r, r).real

    def step(state):
        x, lam, cost, it, done = state
        r = rfn(x)
        _, vjp = jax.vjp(rfn, x)
        g = vjp(r)[0]  # Jᵀ r

        if damping_scale is None:
            diag = _estimate_jtj_diag(rfn, x, diag_probes)
        else:
            diag = jnp.asarray(damping_scale, x.dtype)
        diag = jnp.maximum(diag, 1e-6 * jnp.max(diag) + 1e-12)

        def matvec(v):
            _, jv = jax.jvp(rfn, (x,), (v,))
            jtjv = vjp(jv)[0]
            return jtjv + lam * diag * v

        delta = _cg_solve(matvec, -g, jnp.zeros_like(x), cg_iters)
        x_new = x + delta
        new_cost = cost_of(x_new)
        improved = new_cost < cost
        x = jnp.where(improved, x_new, x)
        lam = jnp.where(improved, lam / lambda_down, lam * lambda_up)
        lam = jnp.clip(lam, 1e-12, 1e12)
        rel_impr = (cost - new_cost) / (cost + 1e-30)
        done = improved & (rel_impr < rtol)
        cost = jnp.where(improved, new_cost, cost)
        return x, lam, cost, it + 1, done

    def cond(state):
        _, _, _, it, done = state
        return (it < max_steps) & jnp.logical_not(done)

    c0 = cost_of(x0)
    x, lam, cost, it, _ = jax.lax.while_loop(
        cond, step, (x0, jnp.asarray(init_lambda, x0.dtype), c0,
                     jnp.asarray(0), jnp.asarray(False)))
    return LMResult(x=x, cost=cost, initial_cost=c0, iterations=it, lam=lam)
