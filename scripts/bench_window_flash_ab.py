"""One-shot TPU experiment batch: window-flash A/B on the detector path.

Runs, in one process (remote compiles amortized):
  1. the window-attention micro-bench (XLA vs single-tile Pallas, rope)
  2. Sam3Detector full-size forward, window_flash ON vs OFF

Honest timing per CLAUDE.md: iteration chains INSIDE jit where possible,
dispatch chains otherwise, one host readback at the end of each chain.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_window_flash_ab.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def micro():
    from skix.ops.attention import flash_attention, rope_2d_tables

    B, H, S, D = 9, 16, 576, 64
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, S, D),
                                 jnp.bfloat16) for i in range(3))
    pos = np.stack(np.meshgrid(np.arange(24), np.arange(24),
                               indexing="ij"), -1).reshape(-1, 2)
    cos, sin = rope_2d_tables(jnp.asarray(pos), D, 100.0)

    def mk(**kw):
        @jax.jit
        def chain(q, k, v):
            def body(c, _):
                out = flash_attention(c, k, v, **kw)
                return c + out.astype(c.dtype) * 1e-3, ()
            c, _ = jax.lax.scan(body, q, None, length=20)
            return jnp.sum(c)
        return chain

    tile = dict(block_q=576, block_k_major=576, block_k=576)
    for name, fn in [
            ("xla (old route)", mk()),
            ("pallas576", mk(**tile)),
            ("xla+rope-tables", mk(rope_cos=cos, rope_sin=sin)),
            ("pallas576+rope", mk(rope_cos=cos, rope_sin=sin, **tile))]:
        s = fn(q, k, v)
        _ = float(s)                      # compile + settle
        t0 = time.perf_counter()
        _ = float(fn(q, k, v))
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"micro {name:18s} {ms:7.3f} ms/block  x28 = "
              f"{28 * ms:6.1f} ms/frame", flush=True)


def build_detector(**kw):
    """Full-size detector + random weights + inputs — the shared harness
    (also used by bench_single_tile_heads.py)."""
    from skix.tracking.sam3_detector import Sam3Detector

    det = Sam3Detector.full_size(dtype=jnp.bfloat16, **kw)
    rng = np.random.default_rng(0)
    size = det.img_size
    imgs = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(0, 0.1, (1, 8, det.d_model)), jnp.float32)
    t0 = time.time()
    variables = jax.jit(lambda k: det.init(k, imgs, text))(
        jax.random.PRNGKey(0))
    print(f"init {time.time()-t0:.0f}s ({kw})", flush=True)
    return det, variables, imgs, text


def time_detector_fwd(det, variables, imgs, text, label: str,
                      iters: int = 10) -> float:
    """Honest-timing forward loop: iteration chain via the input, one
    host readback closing over the last iteration."""
    @jax.jit
    def step(v, x):
        out = det.apply(v, x, text)
        nxt = x * 0.999 + jnp.mean(out.scores) * 1e-6
        return jnp.sum(out.boxes_cxcywh) + jnp.sum(out.scores), nxt

    t0 = time.time()
    s, x = step(variables, imgs)
    _ = float(s)
    print(f"compile+first {time.time()-t0:.0f}s ({label})", flush=True)
    t0 = time.time()
    for _ in range(iters):
        s, x = step(variables, x)
    _ = float(s)
    dt = (time.time() - t0) / iters
    print(f"detector fwd {label}: {dt*1000:.1f} "
          f"ms/frame = {1/dt:.1f} fps @1008px", flush=True)
    return dt


def detector(window_flash: bool, tail_flash: bool = True):
    det, variables, imgs, text = build_detector(
        window_flash=window_flash, tail_flash=tail_flash)
    time_detector_fwd(det, variables, imgs, text,
                      f"window_flash={window_flash} "
                      f"tail_flash={tail_flash}")


def lsum_vggt_scale():
    """fixed-max fwd at VGGT-global scale (S=8192, D=64): does moving
    the Σp partition onto the ones-column MXU matmul (mxu_lsum) beat the
    VPU lane reduction? (The D=64 forward plateaued ~49.5 TF/s,
    VPU-softmax-chain bound — docs/PERF.md.)"""
    from skix.ops.attention import flash_attention

    B, H, S, D = 1, 16, 8192, 64
    key = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, S, D),
                                 jnp.bfloat16) for i in range(3))
    flops = 4.0 * B * H * S * S * D

    def mk(**kw):
        @jax.jit
        def chain(q, k, v):
            def body(c, _):
                out = flash_attention(c, k, v, fixed_max=8.0, **kw)
                return c + out.astype(c.dtype) * 1e-3, ()
            c, _ = jax.lax.scan(body, q, None, length=10)
            return jnp.sum(c)
        return chain

    for name, fn in [("fixed-max (vpu lsum)", mk()),
                     ("fixed-max + mxu_lsum", mk(mxu_lsum=True))]:
        s = fn(q, k, v)
        _ = float(s)
        t0 = time.perf_counter()
        _ = float(fn(q, k, v))
        dt = (time.perf_counter() - t0) / 10
        print(f"lsum {name:22s} {dt*1e3:7.2f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    import sys

    if "tail" in sys.argv[1:]:
        # tail_flash A/B only (fusion-encoder self-attn through Pallas)
        detector(True, tail_flash=True)
        detector(True, tail_flash=False)
    else:
        micro()
        lsum_vggt_scale()
        detector(True)
        detector(False)
