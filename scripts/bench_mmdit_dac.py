"""On-chip measurements: image-edit MMDiT sampling + detector DAC training.

1. MMDiT 4-step rectified-flow sampling at a 1B-class configuration
   (dim 2048, depth 18, heads 16 — the largest double-stream config that
   fits one v5e with headroom; the reference's Qwen-Image-Edit Rapid-AIO
   transformer is a 20 B-param variant of the same architecture on
   data-center GPUs). 512 px image → 64×64 latents → patch 2.
2. SAM3 detector full-size train step with DAC one-to-many queries ON,
   to price the 2× decoder-query duplication against the measured 423 ms
   non-DAC step (docs/PERF.md).

Honest timing per CLAUDE.md (chained steps + host readback).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_mmdit_dac.py [mmdit|dac]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_mmdit():
    from skix.models.mmdit import QwenImageDiT, edit_plus_sample

    # 1B-class config at the reference's head geometry (head_dim 128,
    # axes 16/56/56); 512px → 32×32 latent grid → 1024 target tokens
    # + 1024 source-image tokens per Edit-Plus step
    model = QwenImageDiT(in_channels=64, out_channels=16, num_layers=18,
                         attention_head_dim=128, num_attention_heads=16,
                         joint_attention_dim=1024,
                         axes_dims_rope=(16, 56, 56))
    fhw = ((1, 32, 32), (1, 32, 32))
    lat = jnp.zeros((1, 1024, 64), jnp.float32)
    txt = jnp.zeros((1, 16, 1024), jnp.float32)
    t0 = time.time()
    variables = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), lat, txt, jnp.zeros((1,)), fhw[:1])
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"mmdit init {time.time()-t0:.0f}s, params {n/1e6:.0f} M",
          flush=True)
    variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                             if x.dtype == jnp.float32 else x, variables)

    # chain INSIDE jit (eager ops between calls cost ~50 ms through the
    # axon tunnel and inflate measurements)
    sample = jax.jit(lambda v, z, k: edit_plus_sample(
        model, v, jax.random.normal(k, z.shape, z.dtype), z, txt, fhw,
        num_steps=4))
    t0 = time.time()
    out = sample(variables, lat, jax.random.PRNGKey(1))
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"compile+first sample {time.time()-t0:.0f}s", flush=True)

    iters = 5
    z = lat
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    for i in range(iters):
        z = sample(variables, z, key)
    _ = float(jnp.sum(z.astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(f"mmdit 4-step edit: {dt*1000:.0f} ms/image @512px "
          f"({1/dt:.2f} img/s/chip)", flush=True)


def bench_dac_train():
    import optax

    from skix.tracking.matcher import sam3_detection_loss
    from skix.tracking.sam3_detector import Sam3Detector

    det = Sam3Detector.full_size(dtype=jnp.bfloat16, remat=True)
    size = det.img_size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(0, 0.1, (1, 8, det.d_model)), jnp.float32)
    gts = jnp.asarray([[[0.4, 0.5, 0.2, 0.3], [0.7, 0.3, 0.1, 0.2]]])
    gt_valid = jnp.ones((1, 2), bool)

    t0 = time.time()
    variables = jax.jit(lambda k: det.init(k, imgs, text))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    print(f"detector init {time.time()-t0:.0f}s", flush=True)

    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state):
        def loss_fn(p):
            out = det.apply({"params": p}, imgs, text, apply_dac=True)
            return sam3_detection_loss(out, gts, gt_valid)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state)
    print(f"compile+first step {time.time()-t0:.0f}s "
          f"loss={float(loss):.3f}", flush=True)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state)
    _ = float(loss) + float(jnp.sum(jax.tree.leaves(params)[0]))
    dt = (time.time() - t0) / iters
    print(f"detector DAC train step: {dt*1000:.0f} ms @1008px B=1",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("mmdit", "both"):
        bench_mmdit()
    if which in ("dac", "both"):
        bench_dac_train()
