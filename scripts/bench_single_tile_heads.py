"""Head-group sweep for the single-tile window-attention fast path.

The ViT-Det window shape (9 windows × 16 heads × 576 tokens × D=64)
runs the generic kernel as a 144-cell grid of tiny tiles — per-cell
overhead bound (measured 6.4 TF/s). The single-tile kernel batches G
heads per cell with exact one-pass softmax; this sweep measures G and
the detector-forward effect.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_single_tile_heads.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import skix.ops.attention as A


def micro():
    B, H, S, D = 9, 16, 576, 64
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, S, D),
                                 jnp.bfloat16) for i in range(3))
    pos = np.stack(np.meshgrid(np.arange(24), np.arange(24),
                               indexing="ij"), -1).reshape(-1, 2)
    cos, sin = A.rope_2d_tables(jnp.asarray(pos), D, 100.0)
    flops = 4.0 * B * H * S * S * D
    tile = dict(block_q=S, block_k_major=S, block_k=S)

    ref_out = None
    # G=16 at this shape OOMs scoped VMEM (21.6 MB > 16 MB) — the
    # dispatcher now clamps it to 8, so the sweep stops there
    for g in (0, 1, 2, 4, 8):
        A.SINGLE_TILE_HEAD_GROUP = g

        @jax.jit
        def chain(q, k, v):
            def body(c, _):
                out = A.flash_attention(c, k, v, rope_cos=cos,
                                        rope_sin=sin, **tile)
                return c + out.astype(c.dtype) * 1e-3, ()
            c, _ = jax.lax.scan(body, q, None, length=20)
            return jnp.sum(c)

        s = chain(q, k, v)
        val = float(s)
        if ref_out is None:
            ref_out = val
        t0 = time.perf_counter()
        _ = float(chain(q, k, v))
        ms = (time.perf_counter() - t0) / 20 * 1e3
        tag = "generic" if g == 0 else f"G={g}"
        drift = abs(val - ref_out) / (abs(ref_out) + 1e-9)
        print(f"window tile {tag:8s} {ms:7.3f} ms/block  x28 = "
              f"{28 * ms:6.1f} ms/frame   {flops/ms*1e3/1e12:5.1f} TF/s "
              f"(vs generic drift {drift:.2e})", flush=True)
    A.SINGLE_TILE_HEAD_GROUP = 8


def detector():
    from bench_window_flash_ab import build_detector, time_detector_fwd

    det, variables, imgs, text = build_detector()
    for g in (8, 0):
        A.SINGLE_TILE_HEAD_GROUP = g
        time_detector_fwd(det, variables, imgs, text,
                          f"single_tile_heads={g}")
    A.SINGLE_TILE_HEAD_GROUP = 8


if __name__ == "__main__":
    micro()
    detector()
