"""Round 6: NN-aligned matmul ceiling probes for the window wall.

Round 5's probe was still an NT dot (Mosaic had to transpose the
4.7 MB block-diag operand in-kernel). This round measures the true
ceiling of the block-diag idea with everything pre-oriented:

  nn_probe   kernel gets qc (S, G*D) and ktbd (G*D, G*Sp) ALREADY
             BUILT AND TRANSPOSED (outside, not timed): one aligned
             NN matmul + slice store. The absolute in-kernel ceiling.
  nn_chain   same, but qc/ktbd are rebuilt inside the timed chain from
             (B, H, S, D) layouts — the honest production cost.
  xla_nn     the identical aligned matmul through plain XLA (jnp.dot),
             batched over B: is ~35 TF/s a chip/compiler wall or a
             Pallas artifact?
  xla_big    one giant control matmul (4608, 4608) x (4608, 4608) in
             XLA: what does this chip actually sustain on bf16 matmul?
"""

import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10, inner=1):
    val = float(fn(*args))
    t0 = time.perf_counter()
    val = float(fn(*args))
    return (time.perf_counter() - t0) / (iters * inner) * 1e3, val


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = 9, 16, 576, 64
    G = 8
    Sp = 640  # 576 padded to a lane multiple so head stripes align
    key = jax.random.PRNGKey(0)
    q, k = (jax.random.normal(jax.random.fold_in(key, i), (B, H, S, D),
                              jnp.bfloat16) for i in range(2))

    def build_ops(q, k):
        """(B, H, S, D) -> qc (B, Hc, S, G*D), ktbd (B, Hc, G*D, G*Sp)."""
        Hc = H // G
        qc = (q.reshape(B, Hc, G, S, D).transpose(0, 1, 3, 2, 4)
              .reshape(B, Hc, S, G * D))
        # ktbd: block g occupies rows g*D.. and lanes g*Sp..
        kt = k.reshape(B, Hc, G, S, D).transpose(0, 1, 2, 4, 3)  # (..G,D,S)
        kt = jnp.pad(kt, ((0, 0),) * 3 + ((0, 0), (0, Sp - S)))
        blocks = []
        for g in range(G):
            pads = []
            if g:
                pads.append(jnp.zeros((B, Hc, D, g * Sp), kt.dtype))
            pads.append(kt[:, :, g])
            if g < G - 1:
                pads.append(jnp.zeros((B, Hc, D, (G - 1 - g) * Sp),
                                      kt.dtype))
            blocks.append(jnp.concatenate(pads, axis=3))
        return qc, jnp.concatenate(blocks, axis=2)      # (B,Hc,G*D,G*Sp)

    qc0, ktbd0 = jax.jit(build_ops)(q, k)
    Hc = H // G
    flops_true = 2.0 * B * H * S * S * D          # useful score FLOPs
    flops_dense = 2.0 * B * Hc * S * (G * D) * (G * Sp)  # streamed MACs

    def kernel(qc_ref, kt_ref, o_ref):
        s_all = jax.lax.dot_general(
            qc_ref[0, 0], kt_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (S, G*Sp) NN
        o_ref[0, 0] = s_all[:, :D].astype(o_ref.dtype)

    call = pl.pallas_call(
        kernel, grid=(B, Hc),
        in_specs=[pl.BlockSpec((1, 1, S, G * D),
                               lambda b, h: (b, h, 0, 0)),
                  pl.BlockSpec((1, 1, G * D, G * Sp),
                               lambda b, h: (b, h, 0, 0))],
        out_specs=[pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, Hc, S, D), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")))

    iters = 10

    @jax.jit
    def chain_probe(qc, ktbd):
        def body(c, _):
            (out,) = call(c, ktbd)
            return c.at[:, :, :, :D].add(out * 1e-3), ()
        c, _ = jax.lax.scan(body, qc, None, length=iters)
        return jnp.sum(c)

    ms, _ = timed(chain_probe, qc0, ktbd0, iters=iters)
    print(f"nn_probe  {ms:7.3f} ms/block  x28 = {28*ms:6.1f} ms/frame  "
          f"useful {flops_true/ms*1e3/1e12:5.1f} TF/s  "
          f"dense {flops_dense/ms*1e3/1e12:5.1f} TF/s", flush=True)

    @jax.jit
    def chain_honest(q, k):
        def body(c, _):
            qc, ktbd = build_ops(c, k)
            (out,) = call(qc, ktbd)
            return c.at[:, :H // G, :, :D].add(
                out.reshape(B, Hc, S, D) * 1e-3), ()
        c, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(c)

    ms, _ = timed(chain_honest, q, k, iters=iters)
    print(f"nn_chain  {ms:7.3f} ms/block (incl. XLA operand build)  "
          f"useful {flops_true/ms*1e3/1e12:5.1f} TF/s", flush=True)

    @jax.jit
    def chain_xla(qc, ktbd):
        def body(c, _):
            s = jnp.einsum("bhsd,bhdk->bhsk", c, ktbd,
                           preferred_element_type=jnp.float32)
            return c.at[:, :, :, :D].add(
                s[:, :, :, :D].astype(c.dtype) * 1e-3), ()
        c, _ = jax.lax.scan(body, qc, None, length=iters)
        return jnp.sum(c)

    ms, _ = timed(chain_xla, qc0, ktbd0, iters=iters)
    print(f"xla_nn    {ms:7.3f} ms/block  useful "
          f"{flops_true/ms*1e3/1e12:5.1f} TF/s  dense "
          f"{flops_dense/ms*1e3/1e12:5.1f} TF/s", flush=True)

    N = 4608
    a = jax.random.normal(key, (N, N), jnp.bfloat16)

    @jax.jit
    def chain_big(a):
        def body(c, _):
            return (c @ c * jnp.bfloat16(1e-4)
                    + a * jnp.bfloat16(1e-3)), ()
        c, _ = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    ms, _ = timed(chain_big, a, iters=iters)
    fl = 2.0 * N ** 3
    print(f"xla_big   {ms:7.3f} ms/iter ({N}^3 matmul)  "
          f"{fl/ms*1e3/1e12:5.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
