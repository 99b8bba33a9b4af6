"""On-chip flash-attention benchmark/sweep: fwd and fwd+bwd TF/s.

Usage: python scripts/bench_attention.py [quick|sweep]

Measures with the honest-timing technique from bench.py (the axon relay
returns early from block_until_ready, so every measurement chains steps
and forces a host readback that data-depends on all of them).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

from skix.ops.attention import flash_attention


def time_fn(step, x, iters=10):
    s, x1 = step(x)
    _ = float(s)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        s, x = step(x)
    _ = float(s)
    return (time.perf_counter() - t0) / iters


def bench_config(B, H, S, D, bq, bkm, bk, dtype=jnp.bfloat16, iters=10,
                 mode="fwd", fixed_max=None):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, S, D), dtype)

    attn = functools.partial(flash_attention, block_q=bq, block_k_major=bkm,
                             block_k=bk, fixed_max=fixed_max)

    if mode == "fwd":
        @jax.jit
        def step(x):
            o = attn(x, x, x)
            nxt = x * 0.999 + o * 1e-3
            return jnp.sum(o.astype(jnp.float32)), nxt

        flops_per = 4.0 * B * H * S * S * D  # QK^T + PV
    else:
        def loss(x):
            return jnp.sum(attn(x, x, x).astype(jnp.float32))

        @jax.jit
        def step(x):
            l, g = jax.value_and_grad(loss)(x)
            nxt = x * 0.999 + g * 1e-3
            return l + jnp.sum(g.astype(jnp.float32)), nxt

        # fwd 2 matmuls + bwd 5 matmuls (dv, dp, dk, dq, p-recompute x2)
        flops_per = (4.0 + 10.0) * B * H * S * S * D

    dt = time_fn(step, q, iters)
    return flops_per / dt / 1e12


def main():
    mode_arg = sys.argv[1] if len(sys.argv) > 1 else "quick"
    B, H, S, D = 1, 16, 8192, 64  # VGGT-1B global-attention shape

    if mode_arg == "sweep":
        grids = [(512, 1024, 512), (1024, 1024, 512), (2048, 1024, 512),
                 (1024, 2048, 512), (2048, 2048, 512), (1024, 512, 512),
                 (2048, 512, 512), (1024, 1024, 1024), (2048, 2048, 1024),
                 (4096, 1024, 512), (2048, 4096, 512), (2048, 1024, 256)]
        for bq, bkm, bk in grids:
            try:
                tf = bench_config(B, H, S, D, bq, bkm, bk, mode="fwd")
                print(json.dumps({"cfg": [bq, bkm, bk], "mode": "fwd",
                                  "tf_s": round(tf, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"cfg": [bq, bkm, bk],
                                  "error": str(e)[:200]}), flush=True)
        for bq, bkm, bk in [(512, 1024, 512), (1024, 1024, 512),
                            (2048, 2048, 512)]:
            try:
                tf = bench_config(B, H, S, D, bq, bkm, bk, mode="fwdbwd")
                print(json.dumps({"cfg": [bq, bkm, bk], "mode": "fwdbwd",
                                  "tf_s": round(tf, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"cfg": [bq, bkm, bk], "mode": "fwdbwd",
                                  "error": str(e)[:200]}), flush=True)
    elif mode_arg == "fmsweep":
        # single-level tiles (the measured winner pattern) × fixed_max —
        # large block_q amortizes K/V HBM reloads further
        grids = [(1024, 1024, 1024), (2048, 1024, 1024),
                 (4096, 1024, 1024), (1024, 2048, 2048),
                 (2048, 2048, 2048), (8192, 1024, 1024)]
        for fm in (None, 12.0):
            for bq, bkm, bk in grids:
                try:
                    tf = bench_config(B, H, S, D, bq, bkm, bk, mode="fwd",
                                      fixed_max=fm)
                    print(json.dumps({"cfg": [bq, bkm, bk],
                                      "fixed_max": fm, "mode": "fwd",
                                      "tf_s": round(tf, 1)}), flush=True)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"cfg": [bq, bkm, bk], "fixed_max": fm,
                                      "error": str(e)[:160]}), flush=True)
    else:
        for mode in ("fwd", "fwdbwd"):
            tf = bench_config(B, H, S, D, 1024, 1024, 1024, mode=mode)
            print(json.dumps({"metric": f"flash_attention_{mode}",
                              "value": round(tf, 1), "unit": "TF/s",
                              "shape": [B, H, S, D]}), flush=True)


if __name__ == "__main__":
    main()
