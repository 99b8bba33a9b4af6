"""On-chip SAM3DBody full-size inference benchmark.

Reference backbone scale: ViT-H (embed 1280, depth 32, heads 16 —
sam_3d_body/models/backbones/vit.py:24-26), 256 px crops, promptable
decoder + MHR head + hand decoder. Measures the batched crop →
(params, joints, vertices, camera) forward that prepare_side_results
runs per frame (one crop per detected person).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_sam3d_body.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from skix.models.sam3d_body import SAM3DBody


def main():
    model = SAM3DBody(embed_dim=1280, depth=32, num_heads=16,
                      decoder_dim=1024, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    for B in (1, 8):
        crops = jnp.asarray(rng.uniform(0, 1, (B, 256, 256, 3)),
                            jnp.float32)
        t0 = time.time()
        if B == 1:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), crops)
            n = sum(x.size for x in jax.tree.leaves(variables))
            print(f"init {time.time()-t0:.0f}s, params {n/1e6:.0f} M",
                  flush=True)

        # chain INSIDE jit: eager ops between calls go through the axon
        # tunnel at ~78 ms each and would inflate the measurement. Pass
        # variables as an ARGUMENT — closing over them captures 2.7 GB of
        # constants into the lowered program and breaks the remote compile.
        @jax.jit
        def step(v, x):
            out = model.apply(v, x)
            nxt = x * 0.999 + jnp.mean(
                out.joints_2d_crop.astype(jnp.float32)) * 1e-6
            return jnp.sum(out.joints_3d.astype(jnp.float32)), nxt

        t0 = time.time()
        s, x = step(variables, crops)
        _ = float(s)
        print(f"B={B} compile+first {time.time()-t0:.0f}s", flush=True)

        iters = 10
        t0 = time.time()
        for i in range(iters):
            s, x = step(variables, x)
        _ = float(s)
        dt = (time.time() - t0) / iters
        print(f"B={B}: {dt*1000:.1f} ms/call = {B/dt:.1f} crops/s/chip",
              flush=True)


if __name__ == "__main__":
    main()
