"""Benchmark: 2D→3D lifting throughput (frames/sec/chip) on one TPU chip.

The headline metric from BASELINE.md: the reference claims "real-time
30 fps" end-to-end on GPU (doc/process_documentation.md:204) and its lifting
stage processes one clip at a time through a 243-frame receptive-field
dilated ConvNet. Here the full-size lifter (1024 channels, fw 3,3,3,3,3 —
identical architecture family) runs batched under jit in bf16 on the MXU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = measured frames/sec ÷ 30 (the reference's stated real-time
rate).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from skix.models.videopose3d import TemporalLifter

    model = TemporalLifter(filter_widths=(3, 3, 3, 3, 3), channels=1024,
                           compute_dtype=jnp.bfloat16)
    rf = model.rf  # 243

    # B=32, T=2048 measured best on v5e (~4.5M frames/s ≈ 77% of bf16 peak
    # FLOPs for this conv stack; longer T amortizes the 242-frame halo)
    B, T_out = 32, 2048
    T_in = T_out + rf - 1
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, rf, 17, 2)), train=False)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (B, T_in, 17, 2),
                          jnp.float32)

    # NOTE: under the axon relay, block_until_ready returns before device
    # work completes — the only reliable sync is a host readback of a value
    # that data-depends on every chained call. Each step feeds its output
    # into the next step's input; the final scalar sum forces the chain.
    @jax.jit
    def step(v, inp):
        out = model.apply(v, inp, train=False)
        nxt = inp * 0.999 + jnp.pad(
            out[..., :2], ((0, 0), (0, rf - 1), (0, 0), (0, 0))) * 1e-3
        return jnp.sum(out), nxt

    s, x = step(variables, x)
    _ = float(s)  # compile + full sync

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        s, x = step(variables, x)
    _ = float(s)  # depends on all iterations
    dt = time.perf_counter() - t0

    frames_per_sec = B * T_out * iters / dt
    print(json.dumps({
        "metric": "lifting_throughput",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
