"""SuperPoint learned keypoint extractor (Flax, lightglue-convertible).

Reference capability: the VGGSfM track-prediction slot ships learned
extractors (vggt/vggt/dependency/vggsfm_utils.py:189
``initialize_feature_extractors`` — ALIKED / SuperPoint / SIFT via
lightglue, default ALIKED; :228 ``extract_keypoints`` unions the
keypoints of every configured extractor). This module implements the
SuperPoint architecture (the tractable learned one: a small VGG-style
shared encoder + detector/descriptor heads) TPU-first:

- one fused program per frame: encoder convs → 65-way cell softmax →
  depth-to-space score map → ``simple_nms`` (the lightglue iterated
  max-pool suppression, transcribed exactly) → fixed-``max_pts`` top-k
  slots. No data-dependent shapes; a whole clip vmaps through one jit.
- ``convert_superpoint`` consumes the public magicleap/lightglue
  ``superpoint_v1.pth`` state-dict layout (conv1a..conv4b, convPa/Pb,
  convDa/Db) — parity-tested against a hand-built torch oracle on
  random weights (tests/test_superpoint.py).

Descriptors (the 256-d head) are exposed for completeness
(``sample_descriptors``); the SfM query path only consumes keypoint
coordinates, like the reference's ``extract_keypoints``.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SuperPoint(nn.Module):
    """image (B, H, W, 1|3) in [0, 1] → (scores (B, H, W),
    descriptors (B, H/8, W/8, 256) L2-normalized). H, W must be
    multiples of 8. RGB collapses to grayscale with the lightglue
    weights (0.299, 0.587, 0.114)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 3:
            x = x @ jnp.array([0.299, 0.587, 0.114], x.dtype)[:, None]
        dt = self.dtype
        relu = nn.relu

        def conv(h, c, k, name):
            return nn.Conv(c, (k, k), padding="SAME", dtype=dt,
                           name=name)(h)

        def pool(h):
            return nn.max_pool(h, (2, 2), strides=(2, 2))

        h = relu(conv(x, 64, 3, "conv1a"))
        h = relu(conv(h, 64, 3, "conv1b"))
        h = pool(h)
        h = relu(conv(h, 64, 3, "conv2a"))
        h = relu(conv(h, 64, 3, "conv2b"))
        h = pool(h)
        h = relu(conv(h, 128, 3, "conv3a"))
        h = relu(conv(h, 128, 3, "conv3b"))
        h = pool(h)
        h = relu(conv(h, 128, 3, "conv4a"))
        h = relu(conv(h, 128, 3, "conv4b"))

        # detector head: 65-way per-cell softmax, dustbin dropped,
        # 8×8 depth-to-space (lightglue superpoint.py forward)
        pa = relu(conv(h, 256, 3, "convPa"))
        logits = conv(pa, 65, 1, "convPb").astype(jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)[..., :-1]       # (B,h,w,64)
        B, gh, gw, _ = p.shape
        scores = p.reshape(B, gh, gw, 8, 8).transpose(0, 1, 3, 2, 4)
        scores = scores.reshape(B, gh * 8, gw * 8)

        # descriptor head, L2-normalized over channels
        da = relu(conv(h, 256, 3, "convDa"))
        d = conv(da, 256, 1, "convDb").astype(jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return scores, d


def simple_nms(scores, nms_radius: int = 4):
    """lightglue ``simple_nms``: keep local maxima of a (…, H, W) score
    map, with two suppression-refill iterations (exact transcription)."""
    k = 2 * nms_radius + 1

    def maxpool(s):
        return jax.lax.reduce_window(
            s, -jnp.inf, jax.lax.max, (1,) * (s.ndim - 2) + (k, k),
            (1,) * s.ndim,
            [(0, 0)] * (s.ndim - 2) + [(nms_radius, nms_radius)] * 2)

    zeros = jnp.zeros_like(scores)
    max_mask = scores == maxpool(scores)
    for _ in range(2):
        supp_mask = maxpool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == maxpool(supp_scores)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


@functools.partial(jax.jit, static_argnums=(0, 2, 4, 5))
def _superpoint_core(model, variables, max_pts: int, image, det_thres,
                     nms_radius: int):
    scores, _ = model.apply(variables, image[None])
    s = simple_nms(scores[0], nms_radius)
    H, W = s.shape
    # remove border keypoints (lightglue remove_borders = 4)
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    interior = (xx >= 4) & (xx < W - 4) & (yy >= 4) & (yy < H - 4)
    masked = jnp.where((s > det_thres) & interior, s, -jnp.inf)
    top, idx = jax.lax.top_k(masked.reshape(-1), max_pts)
    valid = top > -jnp.inf
    xy = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], axis=-1)
    return xy, jnp.where(valid, top, 0.0), valid


def superpoint_keypoints(model: SuperPoint, variables, image,
                         max_pts: int = 512, det_thres: float = 0.005,
                         nms_radius: int = 4):
    """Fixed-shape keypoint extraction — the learned counterpart of
    ``sfm_tracks.shi_tomasi_keypoints`` (same return contract:
    ``(xy (max_pts, 2), score (max_pts,), valid (max_pts,))``, (x, y)
    pixels sorted by decreasing score)."""
    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 2:
        img = img[..., None]
    return _superpoint_core(model, variables, max_pts, img, det_thres,
                            nms_radius)


def sample_descriptors(descriptors, xy, stride: int = 8):
    """Bilinearly sample L2-renormalized descriptors at pixel keypoints
    (exact lightglue ``sample_descriptors`` transcription: keypoints map
    to align_corners=True grid coordinates
    ``(xy − s/2 + 0.5) · (g−1)/(g·s − s/2 − 0.5)`` per axis, bilinear,
    then renormalize). ``descriptors (gh, gw, C)``, ``xy (N, 2)`` →
    (N, C)."""
    gh, gw, C = descriptors.shape
    s = float(stride)
    k = jnp.asarray(xy, jnp.float32) - s / 2 + 0.5
    gx = k[:, 0] * (gw - 1) / (gw * s - s / 2 - 0.5)
    gy = k[:, 1] * (gh - 1) / (gh * s - s / 2 - 0.5)
    gx = jnp.clip(gx, 0.0, gw - 1.0)
    gy = jnp.clip(gy, 0.0, gh - 1.0)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, gw - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, gh - 2)
    fx = gx - x0
    fy = gy - y0
    d00 = descriptors[y0, x0]
    d01 = descriptors[y0, x0 + 1]
    d10 = descriptors[y0 + 1, x0]
    d11 = descriptors[y0 + 1, x0 + 1]
    d = (d00 * ((1 - fx) * (1 - fy))[:, None]
         + d01 * (fx * (1 - fy))[:, None]
         + d10 * ((1 - fx) * fy)[:, None]
         + d11 * (fx * fy)[:, None])
    return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)


# ---------------------------------------------------------------------------
# converter (magicleap superpoint_v1.pth / lightglue layout)
# ---------------------------------------------------------------------------

_CONV_NAMES = ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
               "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb")


def convert_superpoint(state_dict, prefix: str = "") -> dict:
    """torch SuperPoint ``state_dict()`` → flax variables.

    Layer names match both the original magicleap ``SuperPointNet`` and
    the lightglue ``SuperPoint`` module (conv1a..convDb, each with
    ``.weight`` (O, I, kh, kw) and ``.bias``)."""

    def np_of(t):
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t)

    sd = {k[len(prefix):] if prefix and k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    params = {}
    for name in _CONV_NAMES:
        params[name] = {
            "kernel": jnp.asarray(
                np_of(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np_of(sd[f"{name}.bias"]))}
    return {"params": params}


def reference_superpoint_spec() -> dict:
    """Expected state-dict entries → shapes (torch order) for tests."""
    spec = {}
    plan = (("conv1a", 1, 64, 3), ("conv1b", 64, 64, 3),
            ("conv2a", 64, 64, 3), ("conv2b", 64, 64, 3),
            ("conv3a", 64, 128, 3), ("conv3b", 128, 128, 3),
            ("conv4a", 128, 128, 3), ("conv4b", 128, 128, 3),
            ("convPa", 128, 256, 3), ("convPb", 256, 65, 1),
            ("convDa", 128, 256, 3), ("convDb", 256, 256, 1))
    for name, cin, cout, k in plan:
        spec[f"{name}.weight"] = (cout, cin, k, k)
        spec[f"{name}.bias"] = (cout,)
    return spec
