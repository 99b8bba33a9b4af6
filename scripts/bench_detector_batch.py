"""Detector throughput vs batch size (offline-video batching).

The per-frame detector forward is bounded by the chip's small-matmul
throughput (docs/PERF.md round-4 dead-end). Batching frames makes MORE
small ops in the window trunk (windows just multiply), but the
conv/neck/fusion/decoder tail (~38 of 78 ms) consists of ops that DO
grow with batch — if ms/frame drops materially at B=2/4, a two-phase
masklet pipeline (batched detection ahead of the sequential tracker
scan) is worth building.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_detector_batch.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_window_flash_ab import build_detector  # noqa: E402


def main():
    det, variables, imgs, text = build_detector()
    rng = np.random.default_rng(1)
    size = det.img_size
    for B in (1, 2, 4):
        x0 = jnp.asarray(rng.uniform(0, 1, (B, size, size, 3)),
                         jnp.float32)
        tb = jnp.broadcast_to(text, (B, *text.shape[1:]))

        @jax.jit
        def step(v, x, tb=tb):
            out = det.apply(v, x, tb)
            nxt = x * 0.999 + jnp.mean(out.scores) * 1e-6
            return jnp.sum(out.boxes_cxcywh) + jnp.sum(out.scores), nxt

        t0 = time.time()
        s, x = step(variables, x0)
        _ = float(s)
        print(f"B={B} compile+first {time.time()-t0:.0f}s", flush=True)
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            s, x = step(variables, x)
        _ = float(s)
        dt = (time.time() - t0) / iters
        print(f"B={B}: {dt*1e3:7.1f} ms/batch = {dt*1e3/B:6.1f} ms/frame "
              f"({B/dt:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
