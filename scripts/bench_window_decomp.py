"""Decompose the single-tile window-attention cost (VERDICT-r4 #3).

The detector's 28 window blocks (9 windows x 16 heads x 576 tokens,
D=64) run at ~7 TF/s through the single-tile kernel — 18x off the MXU
roofline (~62 us dense / ~93 us with the D=64 score underfill, observed
~1.69 ms/block). This script times LOCAL kernel variants that delete or
relocate one piece of the per-head chain at a time, to locate the cost:

  full        exact production chain (rope + max + exp2 + sum + pV + div)
  norope      full minus the fused-rope table matmuls
  fixedmax    row-max reduce replaced by a constant (still exact softmax
              math when no overflow): deletes one 576-wide LANE reduce
  mxulsum     sum(p) rides a ones-column of the p.V matmul (V padded to
              128 lanes): deletes the second LANE reduce
  both        fixedmax + mxulsum: no lane reductions at all
  bf16exp     exp2 computed in bf16 (half VPU element width)
  nosoftmax   p = s (no max/exp/sum/div): pure MXU + stores floor
  scoresonly  only q.kT + a cheap cast-store (no pV): score-matmul floor

Each variant is timed as a 20-deep scan chain with a device-dependent
readback (the axon relay returns early from block_until_ready).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_window_decomp.py
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from skix.ops.attention import rope_2d_tables, _rot_matrix

_LOG2E = math.log2(math.e)


def make_kernel(variant: str, sm_scale: float, G: int, with_rope: bool):
    def kernel(q_ref, k_ref, v_ref, *refs):
        idx = 0
        if with_rope:
            cos_ref, sin_ref, r_ref = refs[idx:idx + 3]
            idx += 3
        o_ref = refs[idx]
        for g in range(G):
            q_raw = q_ref[0, g]
            k_raw = k_ref[0, g]
            v = v_ref[0, g]
            if with_rope:
                R = r_ref[...].astype(q_raw.dtype)
                cos = cos_ref[...]
                sin = sin_ref[...]
                qrot = jax.lax.dot(q_raw, R,
                                   preferred_element_type=jnp.float32)
                q32 = q_raw.astype(jnp.float32) * cos + qrot * sin
                q = (q32 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
                krot = jax.lax.dot(k_raw, R,
                                   preferred_element_type=jnp.float32)
                k = (k_raw.astype(jnp.float32) * cos
                     + krot * sin).astype(k_raw.dtype)
            else:
                q = (q_raw.astype(jnp.float32)
                     * (sm_scale * _LOG2E)).astype(q_raw.dtype)
                k = k_raw
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if variant == "scoresonly":
                o_ref[0, g] = s[:, :64].astype(o_ref.dtype)
                continue
            if variant == "nosoftmax":
                p = s
                acc = jax.lax.dot(p.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32)
                o_ref[0, g] = acc.astype(o_ref.dtype)
                continue
            if variant in ("fixedmax", "both"):
                m = jnp.full((s.shape[0], 1), 8.0 * _LOG2E, jnp.float32)
            else:
                m = jnp.max(s, axis=1, keepdims=True)
            if variant == "bf16exp":
                p = jnp.exp2((s - m).astype(jnp.bfloat16)) \
                    .astype(jnp.float32)
            else:
                p = jnp.exp2(s - m)
            if variant in ("mxulsum", "both"):
                # ones column at lane 64 of a 128-lane V: sum(p) rides
                # the p.V contraction on the MXU
                vw = jnp.zeros((v.shape[0], 128), v.dtype)
                vw = vw.at[:, :64].set(v)
                vw = vw.at[:, 64].set(jnp.asarray(1.0, v.dtype))
                accw = jax.lax.dot(p.astype(v.dtype), vw,
                                   preferred_element_type=jnp.float32)
                acc = accw[:, :64]
                l = accw[:, 64:65]
            else:
                l = jnp.sum(p, axis=1, keepdims=True)
                acc = jax.lax.dot(p.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32)
            o_ref[0, g] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(
                o_ref.dtype)
    return kernel


def run_variant(variant, q, k, v, cos, sin, G=8, with_rope=True,
                iters=20):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    sm_scale = 1.0 / math.sqrt(D)
    kernel = make_kernel(variant, sm_scale, G, with_rope)
    in_specs = [pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0))] * 3
    operands = [q, k, v]
    if with_rope:
        R = jnp.asarray(_rot_matrix(D, "interleaved"))
        operands += [cos.astype(jnp.float32), sin.astype(jnp.float32), R]
        in_specs += [pl.BlockSpec((S, D), lambda b, h: (0, 0)),
                     pl.BlockSpec((S, D), lambda b, h: (0, 0)),
                     pl.BlockSpec((D, D), lambda b, h: (0, 0))]
    call = pl.pallas_call(
        kernel, grid=(B, H // G), in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")))

    @jax.jit
    def chain(q, k, v):
        def body(c, _):
            (out,) = call(c, *operands[1:])
            return c + out.astype(c.dtype) * 1e-3, ()
        c, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(c)

    val = float(chain(q, k, v))  # compile + sync
    t0 = time.perf_counter()
    val = float(chain(q, k, v))
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, val


def main():
    B, H, S, D = 9, 16, 576, 64
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, S, D),
                                 jnp.bfloat16) for i in range(3))
    pos = np.stack(np.meshgrid(np.arange(24), np.arange(24),
                               indexing="ij"), -1).reshape(-1, 2)
    cos, sin = rope_2d_tables(jnp.asarray(pos), D, 100.0)
    flops = 4.0 * B * H * S * S * D

    print(f"window shape B={B} H={H} S={S} D={D}  "
          f"{flops/1e9:.1f} GFLOP/block", flush=True)
    ref = None
    for variant in ("full", "norope", "fixedmax", "mxulsum", "both",
                    "bf16exp", "nosoftmax", "scoresonly"):
        wr = variant != "norope"
        try:
            ms, val = run_variant(variant, q, k, v, cos, sin,
                                  with_rope=wr)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:11s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        if variant == "full":
            ref = val
        drift = abs(val - ref) / (abs(ref) + 1e-9) if ref else float("nan")
        print(f"{variant:11s} {ms:7.3f} ms/block  x28 = {28*ms:6.1f} "
              f"ms/frame  {flops/ms*1e3/1e12:5.1f} TF/s  "
              f"(drift vs full {drift:.2e})", flush=True)


if __name__ == "__main__":
    main()
