"""Full-architecture VGGT train-step benchmark on one TPU chip.

Measures a complete optimization step (forward + flash-attention backward
+ optimizer update) on the VGGT-1B architecture (518 px, embed 1024,
depth 24 alternating = 48 attention blocks, camera + depth + point heads),
bf16 compute, rematerialized aggregator blocks.

The reference trains VGGT on data-center GPU clusters; this demonstrates
the same architecture training on a single v5e — the capability the
Pallas flash backward (skix/ops/attention.py) was built for.

Run (slow first compile through the remote-compile tunnel):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_vggt_train.py

Honest timing per CLAUDE.md: steps are chained through the updated
parameters and a host readback reduces a value that data-depends on all
the work (block_until_ready returns early under the axon relay).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from skix.models.vggt import VGGT


def main(frames: int = 2, img: int = 518, steps: int = 3,
         optimizer: str = "adamw"):
    model = VGGT(img_size=img, remat=True, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (1, frames, img, img, 3)),
                         jnp.float32)
    tgt_depth = jnp.asarray(
        rng.uniform(1, 10, (1, frames, img, img, 1)), jnp.float32)

    print("init (jitted)...", flush=True)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"init {time.time()-t0:.1f}s, params {n_params/1e6:.0f} M",
          flush=True)

    if optimizer == "adamw":
        tx = optax.adamw(1e-4)
    elif optimizer == "adafactor":
        tx = optax.adafactor(1e-4)
    else:
        tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p):
        out = model.apply(p, images)
        loss = jnp.mean(jnp.abs(out["depth"] - tgt_depth))
        loss = loss + 0.1 * jnp.mean(out["pose_enc"] ** 2)
        if "world_points" in out:
            loss = loss + 0.01 * jnp.mean(jnp.abs(out["world_points"]))
        return loss

    # donate params + opt state so XLA updates them in place — without
    # donation the old and new copies coexist and 887 M params OOM a 16 GB
    # chip before activations even count
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return p, s, loss

    print("compiling train step...", flush=True)
    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state)
    # readback forces completion of the first step
    print(f"compile+first step {time.time()-t0:.1f}s "
          f"loss={float(loss):.4f}", flush=True)

    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = train_step(params, opt_state)
    # host readback that depends on every chained step
    _ = float(loss) + float(jnp.sum(jax.tree.leaves(params)[0]))
    dt = (time.time() - t0) / steps
    print(f"train step: {dt*1000:.1f} ms  "
          f"({frames} frames @ {img}px, {optimizer}, remat, bf16)",
          flush=True)
    print(f"throughput: {frames/dt:.2f} frames/s/chip training", flush=True)


if __name__ == "__main__":
    import sys
    opt = sys.argv[1] if len(sys.argv) > 1 else "adamw"
    main(optimizer=opt)
