"""Micro-bench: ViT-Det window attention (S=576, D=64) — XLA fallback vs
Pallas flash with window-sized tiles.

The detector trunk runs 28 window blocks per frame on (B*nw, 16, 576, 64)
layouts; the flash kernel's small-sequence guard (S < block_q) routes
them to the XLA reference path today. This measures whether a single-tile
(block 576) Pallas call beats the XLA path — including rope.

Honest timing per CLAUDE.md: the chained dependency lives INSIDE the
jitted step (q feeds on the previous output), dispatches pipeline, and a
final host readback forces the chain.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from skix.ops.attention import flash_attention, rope_2d_tables


def timeit(step, q, k, v, iters=30):
    s, q2 = step(q, k, v)
    _ = float(s)                      # compile + settle
    t0 = time.perf_counter()
    qq = q
    for _ in range(iters):
        s, qq = step(qq, k, v)
    _ = float(s)                      # readback forces the whole chain
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B, H, S, D = 9, 16, 576, 64     # 1008px frame: 9 windows of 24², B=1
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, S, D),
                                 jnp.bfloat16) for i in range(3))
    import numpy as np
    pos = np.stack(np.meshgrid(np.arange(24), np.arange(24),
                               indexing="ij"), -1).reshape(-1, 2)
    cos, sin = rope_2d_tables(jnp.asarray(pos), D, 100.0)

    def mk(**kw):
        @jax.jit
        def step(q, k, v):
            out = flash_attention(q, k, v, **kw)
            return jnp.sum(out), q + out.astype(q.dtype) * 1e-3
        return step

    variants = [
        ("xla (today)", mk()),
        ("pallas576", mk(block_q=576, block_k_major=576, block_k=576)),
        ("xla+rope", mk(rope_cos=cos, rope_sin=sin)),
        ("pallas576+rope", mk(rope_cos=cos, rope_sin=sin,
                              block_q=576, block_k_major=576, block_k=576)),
        ("pallas576+rope+fm", mk(rope_cos=cos, rope_sin=sin, fixed_max=30.0,
                                 block_q=576, block_k_major=576,
                                 block_k=576)),
    ]
    for name, fn in variants:
        ms = timeit(fn, q, k, v)
        print(f"{name:22s} {ms:7.3f} ms/block   x28 = {28*ms:6.1f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
