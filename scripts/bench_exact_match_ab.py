"""A/B: greedy vs exact-auction matching inside the detector train step.

The reference matches with scipy Hungarian on the host
(sam3/train/matcher.py:15); skix runs the match on-device — greedy
(fixed-iteration approximation) has been the default, auction_assign
(Bertsekas ε-scaling, exact LAP) is the candidate. This prices the
exact matcher inside the full-size SAM3 detector train step (DAC o2m
ON, so the o2m repeats=3 group-bidding path is exercised too).

Honest timing per CLAUDE.md (chained steps + host readback).

Run: PYTHONPATH=/root/.axon_site:/root/repo \
     python scripts/bench_exact_match_ab.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from skix.tracking.matcher import sam3_detection_loss
    from skix.tracking.sam3_detector import Sam3Detector

    det = Sam3Detector.full_size(dtype=jnp.bfloat16, remat=True)
    size = det.img_size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(0, 0.1, (1, 8, det.d_model)), jnp.float32)
    # denser GT set than the 2-object smoke: 12 objects stresses the
    # assignment more realistically
    g = rng.uniform(0.15, 0.85, (1, 12, 2))
    wh = rng.uniform(0.05, 0.25, (1, 12, 2))
    gts = jnp.asarray(np.concatenate([g, wh], -1), jnp.float32)
    gt_valid = jnp.ones((1, 12), bool)

    t0 = time.time()
    variables = jax.jit(lambda k: det.init(k, imgs, text))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    print(f"detector init {time.time()-t0:.0f}s", flush=True)

    tx = optax.adamw(1e-4)

    def make_step(exact: bool):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state):
            def loss_fn(p):
                out = det.apply({"params": p}, imgs, text, apply_dac=True)
                return sam3_detection_loss(out, gts, gt_valid, exact=exact)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, loss

        return step

    import sys
    variants = ((False, True) if len(sys.argv) < 2
                else (sys.argv[1] == "exact",))
    for exact in variants:
        step = make_step(exact)
        # real copies — step donates its inputs, so aliasing `params`
        # would invalidate it for the next variant
        p = jax.tree.map(jnp.copy, params)
        opt_state = jax.jit(tx.init)(p)
        t0 = time.time()
        p, opt_state, loss = step(p, opt_state)
        print(f"exact={exact}: compile+first {time.time()-t0:.0f}s "
              f"loss={float(loss):.3f}", flush=True)
        iters = 5
        t0 = time.time()
        for _ in range(iters):
            p, opt_state, loss = step(p, opt_state)
        _ = float(loss) + float(jnp.sum(jax.tree.leaves(p)[0]))
        dt = (time.time() - t0) / iters
        print(f"exact={exact}: detector DAC train step "
              f"{dt*1000:.0f} ms @1008px B=1 G=12", flush=True)
        del p, opt_state


if __name__ == "__main__":
    main()
