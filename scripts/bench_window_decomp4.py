"""Round 4: fewer, bigger matmuls for the window-attention wall.

Rounds 1-3: every per-head formulation (NT, NN pre-transposed, 2-head
block-diag) lands at 7-9 TF/s — consistent with per-matmul-op overhead
at the (576, 64) x (64, 576) size, not with any single relayout. This
round fuses ALL G heads' score matmuls into ONE aligned matmul:

  full       production chain (baseline)
  bd8        block-diagonal 8-head scores: Qcat (576, 512) x
             Kbd (512, 4608) -> all heads' score stripes in one op
             (8x MAC waste, but full contraction fill, lane-aligned
             4608 = 36*128; per-head softmax/pV unchanged)
  bd8pv      bd8 + block-diagonal pV: Pcat (576, 4608) x Vbd (4608,
             512) -> all heads' outputs side by side in one op
  probe      a bare (576, 512) x (512, 4608) matmul in a kernel: the
             block-diag op's speed ceiling
  bdot       one batched dot_general over the G axis (fixed from r3)
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
    qrot = jax.lax.dot_general(q_raw, R, (((q_raw.ndim - 1,), (0,)),
                                          ((), ())),
                               preferred_element_type=jnp.float32)
    q32 = q_raw.astype(jnp.float32) * cos + qrot * sin
    q = (q32 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
    krot = jax.lax.dot_general(k_raw, R, (((k_raw.ndim - 1,), (0,)),
                                          ((), ())),
                               preferred_element_type=jnp.float32)
    k = (k_raw.astype(jnp.float32) * cos + krot * sin).astype(k_raw.dtype)
    return q, k


def softmax_pv(s, v, o_ref, g):
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
    o_ref[0, g] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def make_kernel(variant, sm_scale, G, S, D):
    def kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, r_ref, o_ref):
        cos = cos_ref[...]
        sin = sin_ref[...]
        R = r_ref[...].astype(q_ref.dtype)
        if variant == "probe":
            # ceiling probe: one aligned big matmul + a cheap store
            qc = q_ref[0].transpose(1, 0, 2).reshape(S, G * D)
            kb = k_ref[0].transpose(1, 0, 2).reshape(S, G * D)
            kb2 = jnp.pad(kb, ((0, G * S - S), (0, 0)))
            s_all = jax.lax.dot_general(
                qc, kb2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for g in range(G):
                o_ref[0, g] = s_all[:, g * S:g * S + D].astype(o_ref.dtype)
            return
        if variant == "bdot":
            q, k = rope_qk(q_ref[0], k_ref[0], cos, sin, R, sm_scale)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # (G, S, S)
            for g in range(G):
                softmax_pv(s[g], v_ref[0, g], o_ref, g)
            return
        # bd8 / bd8pv: rope per head (cheap), then ONE block-diag matmul
        q, k = rope_qk(q_ref[0], k_ref[0], cos, sin, R, sm_scale)
        # Qcat (S, G*D): heads side by side on lanes
        qc = q.transpose(1, 0, 2).reshape(S, G * D)
        # Kbd (G*S, G*D): block g occupies rows g*S.. and lanes g*D..
        kbd = jnp.zeros((G * S, G * D), k.dtype)
        for g in range(G):
            kbd = jax.lax.dynamic_update_slice(
                kbd, k[g], (g * S, g * D))
        s_all = jax.lax.dot_general(
            qc, kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (S, G*S)
        if variant == "bd8pv":
            m = jnp.max(s_all.reshape(S, G, S), axis=2)  # (S, G)
            mrep = jnp.repeat(m, S, axis=1)              # (S, G*S)
            p = jnp.exp2(s_all - mrep)
            l = jnp.sum(p.reshape(S, G, S), axis=2)      # (S, G)
            vbd = jnp.zeros((G * S, G * D), v_ref.dtype)
            for g in range(G):
                vbd = jax.lax.dynamic_update_slice(
                    vbd, v_ref[0, g], (g * S, g * D))
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
    for variant in ("full", "bd8", "bd8pv", "bdot", "probe"):
        try:
            ms, val = run_variant(variant, q, k, v, cos, sin)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:7s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
            continue
        if ref is None:
            ref = val
        drift = abs(val - ref) / (abs(ref) + 1e-9)
        note = " (OUTPUT NOT ATTENTION — ceiling only)" \
            if variant == "probe" else f"  (drift vs full {drift:.2e})"
        print(f"{variant:7s} {ms:7.3f} ms/block  x28 = {28*ms:6.1f} "
              f"ms/frame  {flops/ms*1e3/1e12:5.1f} TF/s{note}",
              flush=True)


if __name__ == "__main__":
    main()
