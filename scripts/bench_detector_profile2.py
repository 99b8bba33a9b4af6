"""Round-5 detector profile with calibration-clean timing.

The round-5 calibration (scripts/bench_calibration.py) showed every
short-chain micro number in the round-3/4 detector work was dominated
by the relay's ~25 ms fixed per-call cost, and the window attention op
is really ~0.157 ms (78 TF/s) — ~4.4 ms of the measured 78 ms/frame.
This script re-attributes the frame budget with chain-length sweeps +
linear fits per component:

  full        Sam3Detector.full_size forward (the 78 ms/frame number)
  trunk       ViTDetBackbone alone (1008 px, 1024x32, bf16)
  win_block   ONE window block: (9, 576, 1024) through layers.Block
              with the production single-tile flash + fused rope
  glob_block  ONE global block: (1, 5184, 1024)
  win_relayout window_partition -> window_unpartition only
  mlp5184     the (5184,1024)x(1024,4736)x(4736,1024) MLP pair alone
  qkvproj     the (5184,1024)x(1024,3072) + proj matmuls alone

Expected reconciliation: 28*win_block + 4*glob_block + patch/ln_pre
~= trunk; trunk + tail ~= full.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_detector_profile2.py
"""

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from bench_calibration import fit_chain  # noqa: E402


def report_ms(name, a, b, totals, per_frame_mult=1.0):
    print(f"{name:12s} fixed a = {a * 1e3:7.1f} ms   per-iter b = "
          f"{b * 1e3:8.3f} ms" + (
              f"   x{per_frame_mult:g} = {b * 1e3 * per_frame_mult:7.2f} "
              f"ms/frame" if per_frame_mult != 1.0 else ""), flush=True)


def probe(name, fn, x0, lengths=(4, 12, 36), mult=1.0):
    def mk(n):
        @jax.jit
        def chain():
            def body(c, _):
                out = fn(c)
                return c * 0.999 + out.astype(c.dtype) * 1e-3, ()
            c, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return chain
    a, b, totals = fit_chain(mk, lengths)
    report_ms(name, a, b, totals, mult)
    return b


def pyloop(name, step_fn, x0, iters, mult=1.0):
    """Python-loop harness for the BIG programs (one jitted step,
    dispatches queued back-to-back, terminal readback): a single scan
    chain over the full detector crashed the remote compiler's pipe, and
    at ~80 ms/iter the fixed cost amortizes at modest iters anyway."""
    import time

    x, s = step_fn(x0)
    _ = float(s)
    t0 = time.perf_counter()
    for _i in range(iters):
        x, s = step_fn(x)
    _ = float(s)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:12s} python-loop {ms:8.2f} ms/iter (n={iters})"
          + (f"   x{mult:g}" if mult != 1.0 else ""), flush=True)
    return ms


def main():
    from skix.models.layers import Block, make_grid_positions
    from skix.tracking.sam3_detector import Sam3Detector
    from skix.tracking.vitdet import (ViTDetBackbone, window_partition,
                                      window_unpartition)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey
    size = 1008
    gh = size // 14                 # 72
    ws = 24
    D, H = 1024, 16
    pos_win = jnp.asarray(make_grid_positions(ws, ws))[None]
    wb = Block(num_heads=H, mlp_ratio=4.625, qk_norm=False,
               dtype=jnp.bfloat16, rope_freq=100.0, rope_tables=True,
               attn_block=ws * ws)
    xw = jax.random.normal(key(2), (9, ws * ws, D), jnp.bfloat16)
    pw = jnp.broadcast_to(pos_win, (9, ws * ws, 2))
    wvars = jax.jit(lambda k: wb.init(k, xw, pw))(key(3))
    probe("win_block", lambda c: wb.apply(wvars, c, pw), xw,
          lengths=(8, 24, 72), mult=28)

    # ---- one global block ----
    S = gh * gh
    pos_g = jnp.asarray(make_grid_positions(gh, gh))[None]
    gb = Block(num_heads=H, mlp_ratio=4.625, qk_norm=False,
               dtype=jnp.bfloat16, rope_freq=100.0, rope_tables=True)
    xg = jax.random.normal(key(4), (1, S, D), jnp.bfloat16)
    pg = jnp.broadcast_to(pos_g, (1, S, 2))
    gvars = jax.jit(lambda k: gb.init(k, xg, pg))(key(5))
    probe("glob_block", lambda c: gb.apply(gvars, c, pg), xg,
          lengths=(8, 24, 72), mult=4)

    # ---- window relayout only ----
    xmap = jax.random.normal(key(6), (1, gh, gh, D), jnp.bfloat16)

    def relayout(c):
        wins, pad_hw = window_partition(c, ws)
        return window_unpartition(wins * 1.001, ws, pad_hw, (gh, gh))

    probe("win_relayout", relayout, xmap, lengths=(16, 48, 144), mult=28)

    # ---- bare matmul expectations ----
    w1 = jax.random.normal(key(7), (D, 4736), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key(8), (4736, D), jnp.bfloat16) * 0.02
    xs = jax.random.normal(key(9), (S, D), jnp.bfloat16)
    probe("mlp5184", lambda c: (jax.nn.gelu(c @ w1) @ w2), xs,
          lengths=(8, 24, 72), mult=32)

    wqkv = jax.random.normal(key(10), (D, 3 * D), jnp.bfloat16) * 0.02
    wproj = jax.random.normal(key(11), (D, D), jnp.bfloat16) * 0.02
    probe("qkvproj", lambda c: ((c @ wqkv)[:, :D] @ wproj), xs,
          lengths=(8, 24, 72), mult=32)

    # ---- big programs LAST, python-loop harness ----
    imgs = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    trunk = ViTDetBackbone(dtype=jnp.bfloat16)
    tvars = jax.jit(lambda k: trunk.init(k, imgs))(key(1))

    @jax.jit
    def trunk_step(x):
        out = trunk.apply(tvars, x)
        nxt = x * 0.999 + jnp.mean(out) * 1e-6
        return nxt, jnp.sum(out)

    pyloop("trunk", trunk_step, imgs, iters=12)

    det = Sam3Detector.full_size(dtype=jnp.bfloat16)
    text = jnp.asarray(rng.normal(0, 0.1, (1, 8, det.d_model)), jnp.float32)
    dvars = jax.jit(lambda k: det.init(k, imgs, text))(key(0))

    @jax.jit
    def det_step(x):
        out = det.apply(dvars, x, text)
        nxt = x * 0.999 + jnp.mean(out.scores) * 1e-6
        return nxt, jnp.sum(out.boxes_cxcywh) + jnp.sum(out.scores)

    pyloop("full", det_step, imgs, iters=12)


if __name__ == "__main__":
    main()
