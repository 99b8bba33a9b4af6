"""Interleaved A/B: production single-tile kernel vs pre-transposed-K
(NN-dot) variant — settles whether ktrans2's apparent win survives
same-process interleaved repetition (cross-run noise is +-15%).

A = the repo's _flash_forward_single_tile (NT dot, in-kernel k relayout)
B = ktrans2: k fed (D, S) + cos/sin fed both ways, zero in-kernel
    transposes (rope on k computed in transposed form)

3 interleaved repetitions each, median reported.
"""

import math
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import skix.ops.attention as A
from skix.ops.attention import rope_2d_tables, _rot_matrix

_LOG2E = math.log2(math.e)


def make_b_call(S, D, G, sm_scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, kt_ref, v_ref, cos_ref, sin_ref, cost_ref,
               sint_ref, r_ref, o_ref):
        cos = cos_ref[...]
        sin = sin_ref[...]
        cosT = cost_ref[...]
        sinT = sint_ref[...]
        for g in range(G):
            q_raw = q_ref[0, g]
            k_t = kt_ref[0, g]
            Rb = r_ref[...].astype(q_raw.dtype)
            qrot = jax.lax.dot(q_raw, Rb,
                               preferred_element_type=jnp.float32)
            q32 = q_raw.astype(jnp.float32) * cos + qrot * sin
            q = (q32 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
            krot_t = jax.lax.dot_general(
                Rb, k_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            kt = (k_t.astype(jnp.float32) * cosT
                  + krot_t * sinT).astype(k_t.dtype)
            s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0, g],
                              preferred_element_type=jnp.float32)
            o_ref[0, g] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(
                o_ref.dtype)

    def build(B, H, dtype):
        return pl.pallas_call(
            kernel, grid=(B, H // G),
            in_specs=[
                pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((1, G, D, S), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((S, D), lambda b, h: (0, 0)),
                pl.BlockSpec((S, D), lambda b, h: (0, 0)),
                pl.BlockSpec((D, S), lambda b, h: (0, 0)),
                pl.BlockSpec((D, S), lambda b, h: (0, 0)),
                pl.BlockSpec((D, D), lambda b, h: (0, 0))],
            out_specs=[pl.BlockSpec((1, G, S, D),
                                    lambda b, h: (b, h, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((B, H, S, D), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")))
    return build


def main():
    Bb, H, S, D = 9, 16, 576, 64
    G = 8
    iters = 20
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                 (Bb, H, S, D), jnp.bfloat16)
               for i in range(3))
    pos = np.stack(np.meshgrid(np.arange(24), np.arange(24),
                               indexing="ij"), -1).reshape(-1, 2)
    cos, sin = rope_2d_tables(jnp.asarray(pos), D, 100.0)
    sm_scale = 1.0 / math.sqrt(D)
    tile = dict(block_q=S, block_k_major=S, block_k=S)

    @jax.jit
    def chain_a(q, k, v):
        def body(c, _):
            out = A.flash_attention(c, k, v, rope_cos=cos, rope_sin=sin,
                                    rope_rotate="interleaved", **tile)
            return c + out.astype(c.dtype) * 1e-3, ()
        c, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(c)

    bcall = make_b_call(S, D, G, sm_scale)(Bb, H, q.dtype)
    cosf = cos.astype(jnp.float32)
    sinf = sin.astype(jnp.float32)
    R = jnp.asarray(_rot_matrix(D, "interleaved"))

    @jax.jit
    def chain_b(q, k, v):
        def body(c, _):
            kt = k.swapaxes(-1, -2)  # honest per-block transpose cost
            (out,) = bcall(c, kt, v, cosf, sinf, cosf.T, sinf.T, R)
            return c + out.astype(c.dtype) * 1e-3, ()
        c, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(c)

    va = float(chain_a(q, k, v))
    vb = float(chain_b(q, k, v))
    print(f"parity |A-B|/|A| = {abs(va-vb)/abs(va):.2e}", flush=True)

    times = {"A": [], "B": []}
    for rep in range(3):
        for name, fn in (("A", chain_a), ("B", chain_b)):
            t0 = time.perf_counter()
            _ = float(fn(q, k, v))
            ms = (time.perf_counter() - t0) / iters * 1e3
            times[name].append(ms)
            print(f"rep{rep} {name} {ms:7.3f} ms/block", flush=True)
    ma = statistics.median(times["A"])
    mb = statistics.median(times["B"])
    print(f"median A {ma:.3f}  B {mb:.3f}  B/A {mb/ma:.3f}  "
          f"(x28: {28*ma:.1f} vs {28*mb:.1f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
