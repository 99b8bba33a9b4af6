"""Field-of-view estimation from a single image.

Capability parity with the reference's FOV-estimator slot (SURVEY.md §2.7:
prepare_side_results/tools/build_fov_estimator.py wraps MoGe-2 to estimate
the camera FOV feeding the SAM-3D-Body perspective camera head).

A compact convnet regresses (fov_h, fov_w) in radians; converters map
FOV ↔ focal length in pixels. Production MoGe weights drop into the same
interface when converted.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def fov_to_focal(fov_rad, size_px):
    """focal = (size/2) / tan(fov/2)."""
    return (size_px / 2.0) / jnp.tan(jnp.clip(fov_rad / 2.0, 1e-4, 1.55))


def focal_to_fov(focal_px, size_px):
    return 2.0 * jnp.arctan((size_px / 2.0) / jnp.clip(focal_px, 1e-4))


class FovEstimator(nn.Module):
    """Image (B, H, W, 3) in [0,1] → (B, 2) FOV (h, w) in radians,
    bounded to (20°, 120°)."""

    width: int = 32
    depth: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        h = (images - 0.5) / 0.5
        h = h.astype(self.dtype)
        for i in range(self.depth):
            h = nn.Conv(self.width * (1 + i // 2), (3, 3), strides=(2, 2),
                        padding="SAME", dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f"norm_{i}")(h)
            h = nn.silu(h)
        h = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
        raw = nn.Dense(2, name="head")(h)
        lo, hi = jnp.radians(20.0), jnp.radians(120.0)
        return lo + (hi - lo) * nn.sigmoid(raw)


def estimate_focal_lengths(model: FovEstimator, variables, frames_u8,
                           batch_size: int = 16):
    """Per-frame (fx, fy) pixels for a uint8 clip."""
    import numpy as np

    T, H, W = frames_u8.shape[:3]
    from skix.utils.jitapply import apply_model
    fwd = lambda v, x: apply_model(model, None, v, x)  # noqa: E731
    outs = []
    for s in range(0, T, batch_size):
        chunk = jnp.asarray(frames_u8[s:s + batch_size], jnp.float32) / 255.0
        fov = fwd(variables, chunk)
        fy = fov_to_focal(fov[:, 0], H)
        fx = fov_to_focal(fov[:, 1], W)
        outs.append(np.stack([np.asarray(fx), np.asarray(fy)], -1))
    return np.concatenate(outs, 0)
