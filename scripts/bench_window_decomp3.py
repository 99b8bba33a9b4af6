"""Round 3: is the window-attention wall the in-kernel k transpose?

Rounds 1-2 (bench_window_decomp{,2}.py): scoresonly == full == 1.6
ms/block and even the XLA einsum floor is ~1.5 ms — so the cost is in
HOW the score matmul is fed, not softmax/pV. The NT dot
(contraction on both operands' LANE dims) makes Mosaic relayout k
(576, 64) -> (64, 576) on the VPU per head per cell; lane<->sublane
transposes at this size are O(10 us) each x 8 heads x 18 cells ~ the
whole observed cost. Variants:

  full      production NT chain (baseline)
  ktrans2   k fed (D, S) + cos/sin fed BOTH ways: ZERO in-kernel
            transposes (rope for k computed in transposed form)
  bdot      one dot_general with a G-head batch dim (NT) - does Mosaic
            lower batched dots better than an unrolled loop?
  ktrans2nr ktrans2 without rope (isolates the rope-combine cost)
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from skix.ops.attention import rope_2d_tables, _rot_matrix

_LOG2E = math.log2(math.e)


def softmax_pv(s, v, o_ref, g):
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
    o_ref[0, g] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def make_kernel(variant, sm_scale, G):
    if variant in ("ktrans2", "ktrans2nr"):
        def kernel(q_ref, kt_ref, v_ref, cos_ref, sin_ref, cost_ref,
                   sint_ref, r_ref, o_ref):
            cos = cos_ref[...]
            sin = sin_ref[...]
            cosT = cost_ref[...]
            sinT = sint_ref[...]
            R = r_ref[...]
            for g in range(G):
                q_raw = q_ref[0, g]                       # (S, D)
                k_t = kt_ref[0, g]                        # (D, S)
                if variant == "ktrans2":
                    Rb = R.astype(q_raw.dtype)
                    qrot = jax.lax.dot(q_raw, Rb,
                                       preferred_element_type=jnp.float32)
                    q32 = q_raw.astype(jnp.float32) * cos + qrot * sin
                    q = (q32 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
                    # rope in transposed form: R^T k_t, combine with the
                    # pre-transposed tables — no VPU transpose anywhere
                    krot_t = jax.lax.dot_general(
                        Rb, k_t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (D, S)
                    kt = (k_t.astype(jnp.float32) * cosT
                          + krot_t * sinT).astype(k_t.dtype)
                else:
                    q = (q_raw.astype(jnp.float32)
                         * (sm_scale * _LOG2E)).astype(q_raw.dtype)
                    kt = k_t
                s = jax.lax.dot_general(
                    q, kt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # NN dot
                softmax_pv(s, v_ref[0, g], o_ref, g)
        return kernel

    def kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, r_ref, o_ref):
        cos = cos_ref[...]
        sin = sin_ref[...]
        R = r_ref[...].astype(q_ref.dtype)

        def rope_pair(q_raw, k_raw):
            qrot = jax.lax.dot(q_raw, R,
                               preferred_element_type=jnp.float32)
            q32 = q_raw.astype(jnp.float32) * cos + qrot * sin
            q = (q32 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
            krot = jax.lax.dot(k_raw, R,
                               preferred_element_type=jnp.float32)
            k = (k_raw.astype(jnp.float32) * cos
                 + krot * sin).astype(k_raw.dtype)
            return q, k

        if variant == "bdot":
            q, k = rope_pair(q_ref[0], k_ref[0])   # (G, S, D) batched rope
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (G, S, S)
            for g in range(G):
                softmax_pv(s[g], v_ref[0, g], o_ref, g)
            return
        for g in range(G):
            q, k = rope_pair(q_ref[0, g], k_ref[0, g])
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            softmax_pv(s, v_ref[0, g], o_ref, g)
    return kernel


def run_variant(variant, q, k, v, cos, sin, iters=20):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    sm_scale = 1.0 / math.sqrt(D)
    G = 8
    kernel = make_kernel(variant, sm_scale, G)
    R = jnp.asarray(_rot_matrix(D, "interleaved"))
    cosf = cos.astype(jnp.float32)
    sinf = sin.astype(jnp.float32)
    qspec = pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0))
    tabspec = pl.BlockSpec((S, D), lambda b, h: (0, 0))
    if variant in ("ktrans2", "ktrans2nr"):
        operands_tail = [cosf, sinf, cosf.T, sinf.T, R]
        in_specs = [qspec,
                    pl.BlockSpec((1, G, D, S), lambda b, h: (b, h, 0, 0)),
                    qspec, tabspec, tabspec,
                    pl.BlockSpec((D, S), lambda b, h: (0, 0)),
                    pl.BlockSpec((D, S), lambda b, h: (0, 0)),
                    pl.BlockSpec((D, D), lambda b, h: (0, 0))]
        kk = k.swapaxes(-1, -2)
        transpose_in_chain = True
    else:
        operands_tail = [cosf, sinf, R]
        in_specs = [qspec, qspec, qspec, tabspec, tabspec,
                    pl.BlockSpec((D, D), lambda b, h: (0, 0))]
        kk = k
        transpose_in_chain = False
    call = pl.pallas_call(
        kernel, grid=(B, H // G), in_specs=in_specs,
        out_specs=[qspec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")))

    @jax.jit
    def chain(q, k_orig, v):
        def body(c, _):
            if transpose_in_chain:
                # pay the XLA transpose inside the loop — the honest cost
                # a production caller would pay per block
                kt = k_orig.swapaxes(-1, -2)
                (out,) = call(c, kt, v, *operands_tail)
            else:
                (out,) = call(c, k_orig, v, *operands_tail)
            return c + out.astype(c.dtype) * 1e-3, ()
        c, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(c)

    val = float(chain(q, k, v))
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
    print(f"window shape B={B} H={H} S={S} D={D}", flush=True)
    ref = None
    for variant in ("full", "ktrans2", "bdot", "ktrans2nr"):
        try:
            ms, val = run_variant(variant, q, k, v, cos, sin)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:9s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
            continue
        if ref is None:
            ref = val
        drift = abs(val - ref) / (abs(ref) + 1e-9)
        print(f"{variant:9s} {ms:7.3f} ms/block  x28 = {28*ms:6.1f} "
              f"ms/frame  {flops/ms*1e3/1e12:5.1f} TF/s  "
              f"(drift vs full {drift:.2e})", flush=True)


if __name__ == "__main__":
    main()
