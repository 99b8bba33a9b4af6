"""Train a tiny lifter on synthetic Unity-style data and commit the ckpt.

Produces ``tests/fixtures/lifter_tiny.npz`` (flax-native checkpoint) plus
the deterministic synthetic-clip generator the accuracy test reuses. The
zero-egress build env cannot download the reference's pretrained
checkpoint, so this committed tiny checkpoint is the end-to-end accuracy
evidence: record → CLI → 3D output → MPJPE vs synthetic GT.

The synthetic motion lives on a low-dimensional pose manifold (base
H36M-17 skeleton + smooth blend of fixed deformation bases) seen from a
fixed camera — the 2D→3D inverse is well-posed, so a small lifter learns
it to a few mm.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

# H36M-17 rest skeleton (meters, pelvis at origin; y up is NEGATIVE here
# to mimic screen-style coords used by the lifting pipeline)
BASE = np.array([
    [0.0, 0.0, 0.0],      # pelvis
    [-0.13, 0.0, 0.0], [-0.14, 0.45, 0.02], [-0.15, 0.9, 0.05],  # R leg
    [0.13, 0.0, 0.0], [0.14, 0.45, 0.02], [0.15, 0.9, 0.05],     # L leg
    [0.0, -0.23, 0.0], [0.0, -0.47, 0.02],                        # spine
    [0.0, -0.58, 0.05], [0.0, -0.68, 0.05],                       # neck/head
    [0.16, -0.43, 0.0], [0.3, -0.2, 0.03], [0.33, 0.03, 0.06],    # L arm
    [-0.16, -0.43, 0.0], [-0.3, -0.2, 0.03], [-0.33, 0.03, 0.06],  # R arm
], np.float32)

K = np.array([[1100.0, 0, 960], [0, 1100.0, 540], [0, 0, 1]], np.float32)
W, H = 1920, 1080
DEPTH = 8.0
N_BASES = 6


def _bases(rng: np.random.Generator) -> np.ndarray:
    return rng.normal(0, 0.06, (N_BASES, 17, 3)).astype(np.float32)


_BASES = _bases(np.random.default_rng(1234))  # fixed manifold


def synth_clip(seed: int, T: int = 240):
    """→ (pose_3d root-relative (T,17,3), pixels (T,17,2))."""
    rng = np.random.default_rng(seed)
    # smooth blend coefficients
    a = rng.normal(0, 1, (T, N_BASES)).astype(np.float32)
    for _ in range(3):
        a[1:-1] = (a[:-2] + a[1:-1] + a[2:]) / 3.0
    x3 = BASE[None] + np.einsum("tk,kjd->tjd", a, _BASES)
    # small smooth image-plane root translation (keeps the person framed)
    root = np.stack([rng.normal(0, 0.4) + 0.3 * np.sin(
        np.linspace(0, 3, T) + rng.uniform(0, 6)),
        rng.normal(0, 0.2) + 0.2 * np.cos(
            np.linspace(0, 2.4, T) + rng.uniform(0, 6))], -1)
    cam = x3.copy()
    cam[..., 0] += root[:, None, 0]
    cam[..., 1] += root[:, None, 1]
    cam[..., 2] += DEPTH
    uv = cam[..., :2] / cam[..., 2:3]
    px = uv * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])
    return x3.astype(np.float32), px.astype(np.float32)


def main():
    sys.path.insert(0, str(REPO))
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from skix.geometry.camera import normalize_screen_coordinates
    from skix.models.generators import ChunkedGenerator
    from skix.models.train import init_state, make_optimizer, train_step
    from skix.models.videopose3d import TemporalLifter
    from skix.pipelines.videopose3d import save_checkpoint

    p2, p3 = [], []
    for seed in range(192):
        x3, px = synth_clip(seed)
        p2.append(np.asarray(
            normalize_screen_coordinates(jnp.asarray(px), W, H)))
        p3.append(x3)

    model = TemporalLifter(filter_widths=(3, 3, 3), channels=128,
                           strided=True)
    gen = ChunkedGenerator(p2, p3, receptive_field=model.rf, batch_size=256,
                           chunk_length=1, augment=True, seed=0)
    optimizer = make_optimizer(lr=2e-3, lr_decay=0.985,
                               steps_per_epoch=max(len(gen), 1))
    state = init_state(model, jax.random.PRNGKey(0), optimizer)
    step = jax.jit(train_step, static_argnums=(0, 1))
    rng = jax.random.PRNGKey(1)
    for epoch in range(40):
        losses = []
        for x2d, y3d in gen.epoch():
            rng, sub = jax.random.split(rng)
            state, loss = step(model, optimizer, state,
                               jnp.asarray(x2d), jnp.asarray(y3d), sub)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.5f}", flush=True)

    out = REPO / "tests" / "fixtures" / "lifter_tiny.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    save_checkpoint(str(out), variables)
    print(f"saved {out} ({out.stat().st_size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
