"""Block-size sweep for VGGT's attention shapes.

The aggregator's frame attention runs at S≈1374 (37² patches + 5
special tokens) and global attention at S≈2748 — the default 1024
blocks pad those to 2048/3072 (49%/12% wasted tiles). This sweeps
S-fitted tile edges (flash_attention pads ragged tails in-kernel).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_vggt_blocks.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from skix.ops.attention import flash_attention, rope_2d_tables


def sweep(B, H, S, D, blocks_list, iters=20):
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, S, D),
                                 jnp.bfloat16) for i in range(3))
    side = int(np.ceil(np.sqrt(S)))
    pos = np.stack(np.meshgrid(np.arange(side), np.arange(side),
                               indexing="ij"), -1).reshape(-1, 2)[:S]
    cos, sin = rope_2d_tables(jnp.asarray(pos), D, 100.0)
    flops = 4.0 * B * H * S * S * D

    for blk in blocks_list:
        kw = {} if blk is None else dict(block_q=blk, block_k_major=blk,
                                         block_k=blk)

        @jax.jit
        def chain(q, k, v):
            def body(c, _):
                out = flash_attention(c, k, v, fixed_max=12.0,
                                      rope_cos=cos, rope_sin=sin, **kw)
                return c + out.astype(c.dtype) * 1e-3, ()
            c, _ = jax.lax.scan(body, q, None, length=iters)
            return jnp.sum(c)

        _ = float(chain(q, k, v))
        t0 = time.perf_counter()
        _ = float(chain(q, k, v))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"(B={B},H={H},S={S},D={D}) block={blk or 'default'}: "
              f"{ms:7.3f} ms  {flops/ms*1e3/1e12:5.1f} TF/s", flush=True)


if __name__ == "__main__":
    # frame attention (2 frames batched) and global attention shapes
    # (block edges must be multiples of 8 for the Mosaic lowering)
    sweep(2, 16, 1374, 64, [None, 344, 688, 1376])
    sweep(1, 16, 2748, 64, [None, 688, 912, 1376])
