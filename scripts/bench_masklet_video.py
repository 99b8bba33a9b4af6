"""Integrated SAM3 video model (detector + masklet lifecycle + memory
tracker) per-frame budget on one chip.

The reference runs this loop per frame on a data-center GPU
(sam3_video_inference.py:1346 detection step + per-object refinement).
Timing is honest: T frames stream through ``MaskletVideoModel.step``
with state/banks carried (a real data dependency), and the clock closes
over a host readback that depends on the final frame's outputs.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_masklet_video.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from skix.tracking.masklet import MaskletConfig, MaskletVideoModel
from skix.tracking.memory_tracker import MaskMemoryTracker
from skix.tracking.sam3_detector import Sam3Detector


def main(T: int = 10, n_obj: int = 8, trk_size: int = 512):
    rng = np.random.default_rng(0)
    det = Sam3Detector.full_size(dtype=jnp.bfloat16)
    size = det.img_size
    imgs = rng.integers(0, 255, (T, 720, 1280, 3)).astype(np.uint8)
    text = jnp.asarray(rng.normal(0, 0.1, (8, det.d_model)), jnp.float32)

    t0 = time.time()
    det_vars = jax.jit(lambda k: det.init(
        k, jnp.zeros((1, size, size, 3)), text[None]))(jax.random.PRNGKey(0))
    print(f"detector init {time.time()-t0:.0f}s "
          f"({sum(x.size for x in jax.tree.leaves(det_vars))/1e6:.0f} M)",
          flush=True)

    trk = MaskMemoryTracker(features=128, num_heads=2, mem_slots=7)
    t0 = time.time()
    import functools

    from skix.tracking.memory_tracker import init_memory

    trk_vars = jax.jit(functools.partial(trk.init, method=trk.step))(
        jax.random.PRNGKey(1), jnp.zeros((1, trk_size, trk_size, 3)),
        init_memory(7, trk_size // 8, trk_size // 8, 128))
    print(f"tracker init {time.time()-t0:.0f}s", flush=True)

    cfg = MaskletConfig(max_objects=n_obj, dense_memory_attention=True)
    model = MaskletVideoModel(det, det_vars, trk, trk_vars, cfg,
                              trk_img_size=trk_size)
    state, banks = model.init_state((trk_size, trk_size))

    # warm up / compile (first frame) with a host readback
    t0 = time.time()
    state, banks, out = model.step(imgs[0], text, state, banks)
    _ = float(jnp.sum(out["out_mask_logits"]))
    print(f"compile+first {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    for t in range(1, T):
        state, banks, out = model.step(imgs[t], text, state, banks)
    _ = float(jnp.sum(out["out_mask_logits"])
              + jnp.sum(banks.mem) + jnp.sum(state.keep_alive))
    dt = (time.time() - t0) / (T - 1)
    print(f"masklet video step (host frames): {dt*1000:.1f} ms/frame = "
          f"{1/dt:.1f} fps (@{n_obj} objects, detector {size}px bf16 "
          f"trunk, tracker {trk_size}px f128)", flush=True)

    # device-resident clip: upload once, slice per frame on device
    t0 = time.time()
    imgs_dev = jnp.asarray(imgs)
    jax.block_until_ready(imgs_dev)
    up = time.time() - t0
    mb = imgs.nbytes / 1e6
    print(f"  clip upload: {mb:.0f} MB in {up*1000:.0f} ms "
          f"({mb/up:.0f} MB/s, {up/T*1000:.1f} ms/frame amortized)",
          flush=True)
    state, banks = model.init_state((trk_size, trk_size))
    state, banks, out = model.step(imgs_dev[0], text, state, banks)
    float(jnp.sum(out["out_mask_logits"]))
    t0 = time.time()
    for t in range(1, T):
        state, banks, out = model.step(imgs_dev[t], text, state, banks)
    _ = float(jnp.sum(out["out_mask_logits"])
              + jnp.sum(banks.mem) + jnp.sum(state.keep_alive))
    dt = (time.time() - t0) / (T - 1)
    print(f"masklet video step (device clip): {dt*1000:.1f} ms/frame = "
          f"{1/dt:.1f} fps", flush=True)

    # chunk-scanned path: C frames per dispatch + one stacked readback
    # (propagate_clip; exact-parity vs the streaming loop by test)
    for chunk, lowres in ((4, True), (8, True), (8, False)):
        kw = dict(chunk=chunk, include_lowres_logits=lowres)
        outs = list(model.propagate_clip(imgs[:chunk], text, **kw))
        t0 = time.time()
        outs = list(model.propagate_clip(imgs, text, **kw))
        dt = (time.time() - t0) / T
        print(f"propagate_clip chunk={chunk} lowres={lowres}: "
          f"{dt*1000:.1f} ms/frame = "
          f"{1/dt:.1f} fps (incl. packed download+unpack of "
          f"{outs[0]['outputs']['mask'].shape} masks/frame)", flush=True)

    # ---- component budget (each piece chained 5× inside its own loop,
    # one readback per component) ----
    from skix.tracking.masklet import (_masklet_frame_core, _prep_frame)
    from skix.utils.jitapply import apply_model

    det_in, tin = _prep_frame(jnp.asarray(imgs[0]), True, size, trk_size)
    jax.block_until_ready(tin)

    def timeit(fn, first, steps=5):
        out = fn(first)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(steps):
            out = fn(out)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        return (time.time() - t0) / steps

    def prep_step(f):
        d, t = _prep_frame(f, False, size, trk_size)
        return f + 1e-12 * jnp.mean(t)
    t_prep = timeit(prep_step, jnp.asarray(imgs[0], jnp.float32))
    print(f"  prep (720p->det+trk inputs): {t_prep*1000:.1f} ms",
          flush=True)

    def det_step(x):
        out = apply_model(det, None, det_vars, x, text[None])
        return x * 0.999 + jnp.mean(out.scores) * 1e-6
    t_det = timeit(det_step, det_in)
    print(f"  detector fwd @1008px: {t_det*1000:.1f} ms", flush=True)

    det0 = apply_model(det, None, det_vars, det_in, text[None])

    def core_step(sb):
        st, bk = sb
        st, bk, _ = _masklet_frame_core(
            trk, cfg, False, trk_vars, tin, det0.boxes_cxcywh[0],
            det0.scores[0], det0.mask_logits[0], st, bk)
        return (st, bk)
    t_core = timeit(core_step, (state, banks))
    print(f"  tracker+lifecycle+mem core: {t_core*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
