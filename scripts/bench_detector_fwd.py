"""SAM3 detector full-size inference benchmark (clean in-jit chaining).

Re-measures the 1008 px reference-config forward with the honest-timing
harness (params as jit arguments, iteration chain inside jit, one host
readback) — the round-2 100 ms/frame figure predates the discovery that
eager ops between jitted calls cost ~78 ms each through the axon tunnel.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_detector_fwd.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from skix.tracking.sam3_detector import Sam3Detector


def main():
    det = Sam3Detector.full_size(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    size = det.img_size
    imgs = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(0, 0.1, (1, 8, det.d_model)), jnp.float32)

    t0 = time.time()
    variables = jax.jit(lambda k: det.init(k, imgs, text))(
        jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"init {time.time()-t0:.0f}s, params {n/1e6:.0f} M", flush=True)

    @jax.jit
    def step(v, x):
        out = det.apply(v, x, text)
        nxt = x * 0.999 + jnp.mean(out.scores) * 1e-6
        return jnp.sum(out.boxes_cxcywh) + jnp.sum(out.scores), nxt

    t0 = time.time()
    s, x = step(variables, imgs)
    _ = float(s)
    print(f"compile+first {time.time()-t0:.0f}s", flush=True)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        s, x = step(variables, x)
    _ = float(s)
    dt = (time.time() - t0) / iters
    print(f"detector fwd: {dt*1000:.1f} ms/frame = {1/dt:.1f} fps @1008px",
          flush=True)


if __name__ == "__main__":
    main()
