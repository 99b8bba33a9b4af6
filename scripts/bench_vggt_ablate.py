"""VGGT aggregator cost ablation: locate the non-matmul drags.

Measures the full-width depth-24 aggregator (no heads) with individual
features toggled off to attribute the 90.5 ms (docs/PERF.md) between
attention math, qk-norm LayerNorms, rope, and per-layer output
materialization. Ablated variants are NOT numerically equivalent — this
is a cost probe, not a correctness config.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_vggt_ablate.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from skix.models.vggt import Aggregator


def measure(tag, iters=10, **kw):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 2, 518, 518, 3)), jnp.float32)
    agg = Aggregator(dtype=jnp.bfloat16, **kw)
    t0 = time.time()
    v = jax.jit(agg.init)(jax.random.PRNGKey(0), imgs)

    @jax.jit
    def step(v, x):
        outs, _ = agg.apply(v, x)
        s = sum(o.astype(jnp.float32).mean() for o in outs)
        return s, x * 0.999 + s * 1e-9

    s, x = step(v, imgs)
    _ = float(s)
    t0 = time.time()
    for _ in range(iters):
        s, x = step(v, x)
    _ = float(s)
    dt = (time.time() - t0) / iters
    print(f"{tag}: {dt*1000:.1f} ms", flush=True)
    return dt


def main():
    base = measure("baseline (qk_norm, rope, 5 output layers)",
                   output_layers=(4, 11, 17, 23))
    measure("single output layer", output_layers=(23,))
    measure("no qk-norm", output_layers=(4, 11, 17, 23), qk_norm=False)
    measure("no rope", output_layers=(4, 11, 17, 23), rope_freq=-1.0)
    measure("no fixed-max attention", output_layers=(4, 11, 17, 23),
            attn_fixed_max=None)


if __name__ == "__main__":
    main()
