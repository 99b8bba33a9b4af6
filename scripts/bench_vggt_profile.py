"""Decompose VGGT forward cost: aggregator vs DPT heads.

Measures the full-architecture forward (518 px, 2 frames) at three head
configurations to attribute the 104.5 ms/pair (docs/PERF.md) between the
48 attention blocks and the two DPT heads' full-resolution conv stacks.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_vggt_profile.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from skix.models.vggt import VGGT


def measure(model, tag, iters=10):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 2, 518, 518, 3)), jnp.float32)
    t0 = time.time()
    v = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)

    # params flow through arguments — closing over them captures GBs of
    # constants into the lowered program and breaks the remote compile
    @jax.jit
    def step(v, x):
        out = model.apply(v, x)
        leaves = [l.astype(jnp.float32).mean() for l in
                  jax.tree.leaves(out)]
        s = sum(leaves)
        return s, x * 0.999 + s * 1e-9

    s, x = step(v, imgs)
    _ = float(s)
    print(f"{tag}: compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        s, x = step(v, x)
    _ = float(s)
    dt = (time.time() - t0) / iters
    print(f"{tag}: {dt*1000:.1f} ms/pair", flush=True)
    return dt


def main():
    full = measure(VGGT(dtype=jnp.bfloat16), "full (camera+depth+point)")
    no_pt = measure(VGGT(dtype=jnp.bfloat16, enable_point=False),
                    "camera+depth")
    agg = measure(VGGT(dtype=jnp.bfloat16, enable_depth=False,
                       enable_point=False), "camera only (≈aggregator)")
    print(f"split: aggregator+camera {agg*1000:.1f} ms, "
          f"depth head {(no_pt-agg)*1000:.1f} ms, "
          f"point head {(full-no_pt)*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
