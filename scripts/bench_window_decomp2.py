"""Round 2 of the window-attention decomposition (VERDICT-r4 #3).

Round 1 (bench_window_decomp.py) showed the QK^T score matmuls alone
cost the whole 1.6 ms/block (scoresonly == full): softmax and p.V are
fully hidden behind them, and the per-head (576,64)x(64,576) NT matmul
runs at ~3.8 TF/s. This round varies HOW the scores are produced:

  full        production chain (baseline)
  sbf16       score tile in bf16 (halves MXU->VMEM store + VPU width)
  ktrans      K fed pre-transposed (G, D, S): NN dot, no in-kernel
              k relayout
  kt+sbf16    both
  g16bf16     bf16 scores let G=16 fit VMEM (one cell per batch elem)
  dpack       two heads' scores from ONE (576,128)x(128,1152) block-diag
              matmul: full contraction fill, half the matmul count
  floorx      XLA einsum of the same score work (the matmul floor)
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from skix.ops.attention import rope_2d_tables, _rot_matrix

_LOG2E = math.log2(math.e)


def rope_qk(q_raw, k_raw, cos, sin, R, sm_scale):
    qrot = jax.lax.dot(q_raw, R, preferred_element_type=jnp.float32)
    q32 = q_raw.astype(jnp.float32) * cos + qrot * sin
    q = (q32 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
    krot = jax.lax.dot(k_raw, R, preferred_element_type=jnp.float32)
    k = (k_raw.astype(jnp.float32) * cos + krot * sin).astype(k_raw.dtype)
    return q, k


def softmax_pv(s, v, o_ref, g):
    m = jnp.max(s.astype(jnp.float32), axis=1, keepdims=True)
    p = jnp.exp2(s.astype(jnp.float32) - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
    o_ref[0, g] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def make_kernel(variant, sm_scale, G):
    def kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, r_ref, o_ref):
        cos = cos_ref[...]
        sin = sin_ref[...]
        if variant == "dpack":
            R = r_ref[...].astype(q_ref.dtype)
            for g in range(0, G, 2):
                q0, k0 = rope_qk(q_ref[0, g], k_ref[0, g], cos, sin, R,
                                 sm_scale)
                q1, k1 = rope_qk(q_ref[0, g + 1], k_ref[0, g + 1], cos,
                                 sin, R, sm_scale)
                S, D = q0.shape
                qc = jnp.concatenate([q0, q1], axis=1)        # (S, 2D)
                z = jnp.zeros_like(k0)
                kc = jnp.concatenate(
                    [jnp.concatenate([k0, z], axis=1),
                     jnp.concatenate([z, k1], axis=1)], axis=0)  # (2S, 2D)
                s2 = jax.lax.dot_general(
                    qc, kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (S, 2S)
                softmax_pv(s2[:, :S], v_ref[0, g], o_ref, g)
                softmax_pv(s2[:, S:], v_ref[0, g + 1], o_ref, g + 1)
            return
        for g in range(G):
            R = r_ref[...].astype(q_ref.dtype)
            if variant in ("ktrans", "kt+sbf16"):
                # k arrives (D, S): rope it in transposed form
                k_raw_t = k_ref[0, g]                          # (D, S)
                q_raw = q_ref[0, g]
                qrot = jax.lax.dot(q_raw, R,
                                   preferred_element_type=jnp.float32)
                q32 = q_raw.astype(jnp.float32) * cos + qrot * sin
                q = (q32 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
                krot_t = jax.lax.dot_general(
                    R, k_raw_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (D, S)
                k_t = (k_raw_t.astype(jnp.float32) * cos.T
                       + krot_t * sin.T).astype(k_raw_t.dtype)
                s = jax.lax.dot_general(
                    q, k_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=(
                        jnp.bfloat16 if variant == "kt+sbf16"
                        else jnp.float32))
            else:
                q, k = rope_qk(q_ref[0, g], k_ref[0, g], cos, sin, R,
                               sm_scale)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=(
                        jnp.bfloat16 if variant in ("sbf16", "g16bf16")
                        else jnp.float32))
            softmax_pv(s, v_ref[0, g], o_ref, g)
    return kernel


def run_variant(variant, q, k, v, cos, sin, iters=20):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    sm_scale = 1.0 / math.sqrt(D)
    G = 16 if variant == "g16bf16" else 8
    kernel = make_kernel(variant, sm_scale, G)
    R = jnp.asarray(_rot_matrix(D, "interleaved"))
    kk = k.swapaxes(-1, -2) if variant in ("ktrans", "kt+sbf16") else k
    kspec = (pl.BlockSpec((1, G, D, S), lambda b, h: (b, h, 0, 0))
             if variant in ("ktrans", "kt+sbf16")
             else pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0)))
    call = pl.pallas_call(
        kernel, grid=(B, H // G),
        in_specs=[pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0)),
                  kspec,
                  pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0)),
                  pl.BlockSpec((S, D), lambda b, h: (0, 0)),
                  pl.BlockSpec((S, D), lambda b, h: (0, 0)),
                  pl.BlockSpec((D, D), lambda b, h: (0, 0))],
        out_specs=[pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")))
    cosf = cos.astype(jnp.float32)
    sinf = sin.astype(jnp.float32)

    @jax.jit
    def chain(q, kk, v):
        def body(c, _):
            (out,) = call(c, kk, v, cosf, sinf, R)
            return c + out.astype(c.dtype) * 1e-3, ()
        c, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(c)

    val = float(chain(q, kk, v))
    t0 = time.perf_counter()
    val = float(chain(q, kk, v))
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, val


def run_floorx(q, k, iters=20):
    """XLA floor: the score matmuls alone at identical shapes."""
    @jax.jit
    def chain(q, k):
        def body(c, _):
            s = jnp.einsum("bhqd,bhkd->bhqk", c, k,
                           preferred_element_type=jnp.float32)
            # fold back to q's shape so iterations chain
            return c + s[..., :64].astype(c.dtype) * 1e-3, ()
        c, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(c)

    val = float(chain(q, k))
    t0 = time.perf_counter()
    val = float(chain(q, k))
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
    for variant in ("full", "sbf16", "ktrans", "kt+sbf16", "g16bf16",
                    "dpack"):
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
    ms, _ = run_floorx(q, k)
    print(f"floorx    {ms:7.3f} ms/block (score matmuls only, XLA)  "
          f"{flops/2/ms*1e3/1e12:5.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
