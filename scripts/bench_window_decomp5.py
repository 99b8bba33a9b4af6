"""Round 5: block-diagonal head fusion, concat-built (no DUS/transpose).

Round 4's script had two bugs (no per-head baseline branch; Mosaic can't
lower dynamic_update_slice). This round builds the block-diagonal
operands purely from static lane/sublane concatenations:

  full    per-head chain (proper baseline)
  bd8     ONE (S, G*D) x (G*D, G*S)^T score matmul for all G heads
          (full contraction fill, aligned N = G*S = 4608; 8x MAC waste)
  bd8pv   bd8 + ONE (S, G*S) x (G*S, G*D) block-diag pV matmul
  probe   the bare bd8-shaped matmul + slice store: its speed ceiling
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
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
    o_ref[0, g] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def build_bd(parts, S, D, G, dtype):
    """rows of a (G*S, G*D) block-diagonal from per-head (S, D) parts."""
    rows = []
    for g in range(G):
        pads = []
        if g:
            pads.append(jnp.zeros((S, g * D), dtype))
        pads.append(parts[g])
        if g < G - 1:
            pads.append(jnp.zeros((S, (G - 1 - g) * D), dtype))
        rows.append(jnp.concatenate(pads, axis=1))
    return jnp.concatenate(rows, axis=0)


def make_kernel(variant, sm_scale, G, S, D):
    def kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, r_ref, o_ref):
        cos = cos_ref[...]
        sin = sin_ref[...]
        R = r_ref[...].astype(q_ref.dtype)
        if variant == "full":
            for g in range(G):
                q, k = rope_qk(q_ref[0, g], k_ref[0, g], cos, sin, R,
                               sm_scale)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                softmax_pv(s, v_ref[0, g], o_ref, g)
            return
        if variant == "probe":
            qc = jnp.concatenate([q_ref[0, g] for g in range(G)], axis=1)
            kbd = build_bd([k_ref[0, g] for g in range(G)], S, D, G,
                           k_ref.dtype)
            s_all = jax.lax.dot_general(
                qc, kbd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (S, G*S)
            for g in range(G):
                o_ref[0, g] = s_all[:, g * S:g * S + D].astype(o_ref.dtype)
            return
        # bd8 / bd8pv
        qs, ks = [], []
        for g in range(G):
            q, k = rope_qk(q_ref[0, g], k_ref[0, g], cos, sin, R,
                           sm_scale)
            qs.append(q)
            ks.append(k)
        qc = jnp.concatenate(qs, axis=1)                     # (S, G*D)
        kbd = build_bd(ks, S, D, G, qc.dtype)                # (G*S, G*D)
        s_all = jax.lax.dot_general(
            qc, kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (S, G*S)
        if variant == "bd8pv":
            s3 = s_all.reshape(S, G, S)
            m = jnp.max(s3, axis=2, keepdims=True)           # (S, G, 1)
            p = jnp.exp2(s3 - m).reshape(S, G * S)
            l = jnp.sum(p.reshape(S, G, S), axis=2)          # (S, G)
            vbd = build_bd([v_ref[0, g] for g in range(G)], S, D, G,
                           v_ref.dtype)                      # (G*S, G*D)
            acc = jax.lax.dot(p.astype(vbd.dtype), vbd,
                              preferred_element_type=jnp.float32)
            acc = acc.reshape(S, G, D) / jnp.where(
                l == 0.0, 1.0, l)[..., None]
            for g in range(G):
                o_ref[0, g] = acc[:, g].astype(o_ref.dtype)
            return
        for g in range(G):
            softmax_pv(s_all[:, g * S:(g + 1) * S], v_ref[0, g], o_ref, g)
    return kernel


def run_variant(variant, q, k, v, cos, sin, iters=20):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    sm_scale = 1.0 / math.sqrt(D)
    G = 8
    kernel = make_kernel(variant, sm_scale, G, S, D)
    R = jnp.asarray(_rot_matrix(D, "interleaved"))
    cosf = cos.astype(jnp.float32)
    sinf = sin.astype(jnp.float32)
    qspec = pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0))
    tabspec = pl.BlockSpec((S, D), lambda b, h: (0, 0))
    call = pl.pallas_call(
        kernel, grid=(B, H // G),
        in_specs=[qspec, qspec, qspec, tabspec, tabspec,
                  pl.BlockSpec((D, D), lambda b, h: (0, 0))],
        out_specs=[qspec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")))

    @jax.jit
    def chain(q, k, v):
        def body(c, _):
            (out,) = call(c, k, v, cosf, sinf, R)
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
    for variant in ("full", "bd8", "bd8pv", "probe"):
        try:
            ms, val = run_variant(variant, q, k, v, cos, sin)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:7s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
            continue
        if variant == "full":
            ref = val
        drift = abs(val - ref) / (abs(ref) + 1e-9) if ref else float("nan")
        note = " (NOT ATTENTION — ceiling only)" if variant == "probe" \
            else f"  (drift vs full {drift:.2e})"
        print(f"{variant:7s} {ms:7.3f} ms/block  x28 = {28*ms:6.1f} "
              f"ms/frame  {flops/ms*1e3/1e12:5.1f} TF/s{note}",
              flush=True)


if __name__ == "__main__":
    main()
