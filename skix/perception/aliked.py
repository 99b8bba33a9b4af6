"""ALIKED learned keypoint extractor (Flax, lightglue-layout converter).

Reference capability: the VGGSfM track-prediction slot's DEFAULT learned
extractor is ALIKED (vggt/vggt/dependency/vggsfm_utils.py:189,207
``initialize_feature_extractors`` — ``ALIKED(max_num_keypoints,
detection_threshold)`` via lightglue, keypoints unioned with the other
configured extractors at :228). This module implements the ALIKED
architecture (Zhao et al. 2023, "ALIKED: A Lighter Keypoint and
Descriptor Extraction Network via Deformable Transformation") TPU-first:

- **Deformable convolution** (the paper's core op) as a gather + one big
  matmul: per-tap bilinear sampling at learned offsets builds a
  ``(B, H, W, K², C_in)`` tensor that contracts against the kernel on
  the MXU (``deform_conv2d``) — no torchvision op, no scatter.
  VERIFIED: exact parity vs an independent numpy transcription of the
  torchvision ``deform_conv2d`` sampling rule, and the zero-offset case
  collapses to ``lax.conv`` (tests/test_aliked.py).
- **Backbone**: ConvBlock(c1) → ResBlock(c2) → ResBlock(c3, DCN) →
  ResBlock(c4, DCN) over 1×/2×/8×/32× average-pooled scales, per-scale
  1×1 projections to dim/4, bilinear ``align_corners=True`` upsampling
  back to full res, concat → L2-normalised feature map + sigmoid score
  head (SMH). BatchNorm inference statistics, SELU gates.
- **DKD** differentiable keypoint detection: single-pass max-pool NMS,
  border suppression, fixed-``max_pts`` top-k slots, sub-pixel
  refinement by temperature-0.1 soft-argmax over (2r+1)² score patches,
  refined score by bilinear resampling of the score map. VERIFIED vs a
  numpy oracle of the soft-argmax (tests/test_aliked.py).
- **SDDH** sparse deformable descriptor head: K×K feature patches at
  each keypoint → offset MLP → ``n_pos`` deformable samples →
  1×1 sf-conv + SELU → position-flattened 1×1 convM → L2-normalised
  descriptors. The SfM query path consumes only keypoints (like the
  reference's ``extract_keypoints``); descriptors are exposed for
  completeness.

Weight story (HONEST): lightglue (the package shipping the reference's
ALIKED weights) is NOT importable in this environment, so unlike the
SuperPoint/YOLO/detectron2 converters there is no oracle to verify
``convert_aliked`` against. The converter targets the lightglue
``aliked.py`` state-dict layout as published (block1..4 conv/bn pairs,
DCN offset_conv/regular_conv, conv1..4 projections, score_head.0/2/4/6,
desc_head offset_conv/sf_conv/convM); it is round-trip- and
shape-tested on ``reference_aliked_spec`` random state dicts, and every
numeric building block carries its own oracle test — but end-to-end
converted-weight parity remains UNVERIFIED until lightglue is
reachable. ``sfm_tracks.initialize_feature_extractors`` therefore keeps
SuperPoint (converter-verified) as the recommended learned extractor.

Config table (lightglue ``ALIKED.cfgs``): c1–c4 channels, feature dim,
SDDH kernel K and sample count M per model size.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ALIKED_CFGS = {
    "aliked-t16": dict(c1=8, c2=16, c3=32, c4=64, dim=64, K=3, M=16),
    "aliked-n16": dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=16),
    "aliked-n16rot": dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=16),
    "aliked-n32": dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=32),
}


# ---------------------------------------------------------------------------
# bilinear sampling + deformable convolution
# ---------------------------------------------------------------------------

def bilinear_sample(img, py, px):
    """Sample ``img (H, W, C)`` at float pixel coords ``py/px (...)``,
    zeros outside (torchvision grid_sample padding_mode='zeros' /
    deform_conv2d border semantics: each of the four corner taps
    contributes only when inside the image)."""
    H, W = img.shape[:2]
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None]
    wx = (px - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    return ((1 - wy) * (1 - wx) * tap(y0, x0)
            + (1 - wy) * wx * tap(y0, x0 + 1)
            + wy * (1 - wx) * tap(y0 + 1, x0)
            + wy * wx * tap(y0 + 1, x0 + 1))


def deform_conv2d(x, offsets, weight, bias=None, mask=None):
    """Deformable conv, stride 1, SAME padding (the only configuration
    ALIKED uses). torchvision semantics with NHWC layout:

    - ``x (B, H, W, C_in)``
    - ``offsets (B, H, W, 2·K²)`` interleaved per tap ``(Δy, Δx)``,
      taps row-major over the K×K kernel
    - ``weight (K, K, C_in, C_out)`` (flax conv layout)
    - ``mask (B, H, W, K²)`` optional modulation (sigmoid applied by the
      caller, as in torchvision)

    Output ``(B, H, W, C_out)``: per-tap bilinear gathers build
    ``(B, H, W, K², C_in)`` which contracts with the kernel in ONE
    einsum — the MXU-friendly formulation of the scatter-heavy CUDA op.
    """
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    pad = K // 2
    # coordinate math in f32 regardless of the feature dtype (bf16
    # positions would quantize at hundreds of pixels)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    off = offsets.astype(jnp.float32).reshape(B, H, W, K * K, 2)

    taps = []
    for i in range(K):
        for j in range(K):
            k = i * K + j
            py = yy[None] + (i - pad) + off[:, :, :, k, 0]
            px = xx[None] + (j - pad) + off[:, :, :, k, 1]
            taps.append(jax.vmap(bilinear_sample)(x, py, px))
    sampled = jnp.stack(taps, axis=3)              # (B, H, W, K², C_in)
    if mask is not None:
        sampled = sampled * mask[..., None]
    out = jnp.einsum("bhwkc,kco->bhwo", sampled,
                     weight.reshape(K * K, Cin, -1),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def upsample_align_corners(x, out_h: int, out_w: int):
    """Bilinear upsample with torch ``align_corners=True`` grid mapping
    (output index i → input coord i·(in−1)/(out−1)) — jax.image.resize
    implements only the half-pixel convention, so this samples the
    corner-aligned grid explicitly. ``x (B, H, W, C)``."""
    B, H, W, C = x.shape
    # coordinates stay f32 regardless of the feature dtype: bf16 coords
    # quantize to ~2-pixel steps past coord 256 (8 mantissa bits) and
    # the align-corners grid degenerates to blocky nearest sampling —
    # the same rule deform_conv2d applies to its offset math
    py = (jnp.arange(out_h) * ((H - 1) / max(out_h - 1, 1))).astype(
        jnp.float32)
    px = (jnp.arange(out_w) * ((W - 1) / max(out_w - 1, 1))).astype(
        jnp.float32)
    gy, gx = jnp.meshgrid(py, px, indexing="ij")
    out = jax.vmap(bilinear_sample, in_axes=(0, None, None))(
        x.astype(jnp.float32), gy, gx)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# backbone modules
# ---------------------------------------------------------------------------

class DeformableConv2d(nn.Module):
    """lightglue aliked.py DeformableConv2d: a regular conv predicts
    per-tap offsets (clamped to ±max(H, W)/4), then the deformable
    gather-matmul applies ``regular_conv``'s kernel at those offsets."""

    features: int
    kernel_size: int = 3
    use_mask: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size
        n_off = 2 * K * K
        ch = 3 * K * K if self.use_mask else n_off
        raw = nn.Conv(ch, (K, K), padding="SAME", use_bias=True,
                      dtype=self.dtype, name="offset_conv")(x)
        if self.use_mask:
            # torch: chunk(3) then cat(o1, o2) == the first 2K² channels
            # verbatim (training assigns the torchvision (Δy, Δx)
            # interleave meaning); mask = sigmoid of the last K².
            off = raw[..., :n_off]
            mask = jax.nn.sigmoid(raw[..., n_off:])
        else:
            off, mask = raw, None
        max_off = max(x.shape[1], x.shape[2]) / 4.0
        off = jnp.clip(off, -max_off, max_off)
        w = self.param(
            "regular_conv",
            nn.initializers.variance_scaling(2.0, "fan_in",
                                             "truncated_normal"),
            (K, K, x.shape[-1], self.features), self.dtype)
        return deform_conv2d(x, off, w, mask=mask)


def _norm(dtype):
    return functools.partial(nn.BatchNorm, use_running_average=True,
                             momentum=0.9, epsilon=1e-5, dtype=dtype)


def _conv(features, k, dcn, dtype, name):
    if dcn:
        return DeformableConv2d(features, k, dtype=dtype, name=name)
    return nn.Conv(features, (k, k), padding="SAME", use_bias=False,
                   dtype=dtype, name=name)


class ConvBlock(nn.Module):
    """conv3×3 → BN → SELU, twice (aliked.py ConvBlock)."""

    features: int
    dcn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = _norm(self.dtype)
        h = _conv(self.features, 3, self.dcn, self.dtype, "conv1")(x)
        h = jax.nn.selu(norm(name="bn1")(h))
        h = _conv(self.features, 3, self.dcn, self.dtype, "conv2")(h)
        return jax.nn.selu(norm(name="bn2")(h))


class ResBlock(nn.Module):
    """Pre-activation-free residual pair with a 1×1 downsample on the
    channel change (aliked.py ResBlock: gate(bn1(conv1)) → bn2(conv2),
    add the 1×1-projected identity, gate)."""

    features: int
    dcn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = _norm(self.dtype)
        h = _conv(self.features, 3, self.dcn, self.dtype, "conv1")(x)
        h = jax.nn.selu(norm(name="bn1")(h))
        h = _conv(self.features, 3, self.dcn, self.dtype, "conv2")(h)
        h = norm(name="bn2")(h)
        idn = nn.Conv(self.features, (1, 1), use_bias=True,
                      dtype=self.dtype, name="downsample")(x)
        return jax.nn.selu(h + idn)


class ALIKED(nn.Module):
    """image (B, H, W, 3) in [0, 1], H/W multiples of 32 →
    (feature_map (B, H, W, dim) L2-normalised, score_map (B, H, W))."""

    model_name: str = "aliked-n16"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = ALIKED_CFGS[self.model_name]
        c1, c2, c3, c4, dim = (cfg["c1"], cfg["c2"], cfg["c3"],
                               cfg["c4"], cfg["dim"])
        B, H, W, _ = x.shape

        def pool(h, k):
            return nn.avg_pool(h, (k, k), strides=(k, k))

        x1 = ConvBlock(c1, dtype=self.dtype, name="block1")(x)
        x2 = ResBlock(c2, dtype=self.dtype, name="block2")(pool(x1, 2))
        x3 = ResBlock(c3, dcn=True, dtype=self.dtype,
                      name="block3")(pool(x2, 4))
        x4 = ResBlock(c4, dcn=True, dtype=self.dtype,
                      name="block4")(pool(x3, 4))

        def proj(h, name):
            return jax.nn.selu(nn.Conv(dim // 4, (1, 1), use_bias=False,
                                       dtype=self.dtype, name=name)(h))

        f = jnp.concatenate([
            proj(x1, "conv1"),
            upsample_align_corners(proj(x2, "conv2"), H, W),
            upsample_align_corners(proj(x3, "conv3"), H, W),
            upsample_align_corners(proj(x4, "conv4"), H, W),
        ], axis=-1)                                  # (B, H, W, dim)

        s = jax.nn.selu(nn.Conv(8, (1, 1), use_bias=False,
                                dtype=self.dtype, name="score_head_0")(f))
        s = jax.nn.selu(nn.Conv(4, (3, 3), padding="SAME", use_bias=False,
                                dtype=self.dtype, name="score_head_2")(s))
        s = jax.nn.selu(nn.Conv(4, (3, 3), padding="SAME", use_bias=False,
                                dtype=self.dtype, name="score_head_4")(s))
        s = nn.Conv(1, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="score_head_6")(s)
        score = jax.nn.sigmoid(s.astype(jnp.float32))[..., 0]
        feat = f.astype(jnp.float32)
        feat = feat / jnp.maximum(
            jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
        return feat, score


class SDDH(nn.Module):
    """Sparse deformable descriptor head (aliked.py SDDH): per keypoint,
    a K×K feature patch predicts ``n_pos`` sampling offsets; features
    bilinearly sampled there pass a 1×1 ``sf_conv`` + SELU and flatten
    into a 1×1 ``convM`` → L2-normalised descriptor.

    ``__call__(feature_map (H, W, dim), kpts_xy (N, 2) pixel coords) →
    (N, dim)``. Fixed N slots (invalid slots produce garbage the caller
    masks)."""

    dim: int
    kernel_size: int = 3
    n_pos: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap, kpts_xy):
        K, M, C = self.kernel_size, self.n_pos, self.dim
        H, W = fmap.shape[:2]
        N = kpts_xy.shape[0]
        # K×K patches at integer keypoint positions (zero padded).
        base = jnp.floor(kpts_xy).astype(jnp.int32)      # (N, 2) x, y
        dy, dx = jnp.meshgrid(jnp.arange(K) - K // 2,
                              jnp.arange(K) - K // 2, indexing="ij")
        py = base[:, 1, None, None] + dy[None]
        px = base[:, 0, None, None] + dx[None]
        inb = (py >= 0) & (py < H) & (px >= 0) & (px < W)
        patch = fmap[jnp.clip(py, 0, H - 1), jnp.clip(px, 0, W - 1)]
        patch = jnp.where(inb[..., None], patch, 0.0)    # (N, K, K, C)

        # offset MLP: KxK valid conv (== dense over the patch) → SELU →
        # 1×1 conv; clamp like the deformable blocks.
        w1 = self.param("offset_conv_0",
                        nn.initializers.lecun_normal(),
                        (K, K, C, 2 * M), self.dtype)
        b1 = self.param("offset_conv_0_bias", nn.initializers.zeros,
                        (2 * M,), self.dtype)
        h = jnp.einsum("nklc,klcm->nm", patch, w1) + b1
        h = jax.nn.selu(h)
        w2 = self.param("offset_conv_2",
                        nn.initializers.lecun_normal(),
                        (2 * M, 2 * M), self.dtype)
        b2 = self.param("offset_conv_2_bias", nn.initializers.zeros,
                        (2 * M,), self.dtype)
        off = (h @ w2 + b2).reshape(N, M, 2)             # (Δx, Δy)? no:
        # torch reshapes (N, 2M, 1, 1) → (N, M, 2) row-major: per sample
        # position the pair order follows the offset_conv channel layout
        # (x, y) — matching grid_sample's (x, y) coordinate convention.
        max_off = max(H, W) / 4.0
        off = jnp.clip(off, -max_off, max_off)
        pos = kpts_xy[:, None, :] + off                  # (N, M, 2) x, y
        samples = bilinear_sample(fmap, pos[..., 1], pos[..., 0])

        wsf = self.param("sf_conv", nn.initializers.lecun_normal(),
                         (C, C), self.dtype)
        samples = jax.nn.selu(samples @ wsf)             # (N, M, C)
        wm = self.param("convM", nn.initializers.lecun_normal(),
                        (M * C, C), self.dtype)
        desc = samples.reshape(N, M * C) @ wm
        return desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# DKD keypoint detection
# ---------------------------------------------------------------------------

def dkd_detect(score_map, max_pts: int, det_thres: float = 0.2,
               radius: int = 2, temperature: float = 0.1):
    """Differentiable keypoint detection (ALIKED soft_detect.py DKD,
    inference path): max-pool NMS (single pass), border suppression,
    top-``max_pts`` slots, soft-argmax sub-pixel refinement over the
    (2r+1)² patch, refined score by bilinear resample.

    ``score_map (H, W)`` → ``(xy (max_pts, 2) float sub-pixel,
    score (max_pts,), valid (max_pts,))``."""
    H, W = score_map.shape
    k = 2 * radius + 1
    local_max = jax.lax.reduce_window(
        score_map, -jnp.inf, jax.lax.max, (k, k), (1, 1),
        [(radius, radius)] * 2)
    nms = jnp.where(score_map == local_max, score_map, 0.0)
    # reference border zeroing: rows/cols [:r+1] and [-r:] (soft_detect
    # DKD) — valid range is r+1 … size−r−1 inclusive
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    border = ((xx > radius) & (xx < W - radius)
              & (yy > radius) & (yy < H - radius))
    nms = jnp.where(border, nms, 0.0)

    top, idx = jax.lax.top_k(nms.reshape(-1), max_pts)
    valid = top > det_thres
    iy = idx // W
    ix = idx % W

    # (2r+1)² patches around each peak; out-of-bounds taps never occur
    # (border suppressed above).
    dy, dx = jnp.meshgrid(jnp.arange(-radius, radius + 1),
                          jnp.arange(-radius, radius + 1), indexing="ij")
    patch = score_map[jnp.clip(iy[:, None, None] + dy[None], 0, H - 1),
                      jnp.clip(ix[:, None, None] + dx[None], 0, W - 1)]
    patch = patch.reshape(max_pts, -1)
    p = jax.nn.softmax(
        (patch - jnp.max(patch, axis=1, keepdims=True)) / temperature,
        axis=1)
    grid = jnp.stack([dx.reshape(-1), dy.reshape(-1)], -1).astype(
        score_map.dtype)                                  # (k², 2) x, y
    resid = p @ grid                                      # (max_pts, 2)
    xy = jnp.stack([ix, iy], -1).astype(score_map.dtype) + resid
    score = bilinear_sample(score_map[..., None], xy[:, 1], xy[:, 0])[:, 0]
    return xy, jnp.where(valid, score, 0.0), valid


# ---------------------------------------------------------------------------
# extractor protocol + converter
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def _aliked_core(model, variables, max_pts, image, det_thres):
    fmap, score = model.apply(variables, image[None])
    return dkd_detect(score[0], max_pts, det_thres)


def aliked_keypoints(model: ALIKED, variables, image, max_pts: int = 512,
                     det_thres: float = 0.2):
    """Fixed-slot extractor protocol (matches shi_tomasi/superpoint/sift:
    image (H, W)|(H, W, 3) in [0, 1] → (xy, score, valid))."""
    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 2:
        img = jnp.repeat(img[..., None], 3, axis=-1)
    return _aliked_core(model, variables, int(max_pts), img,
                        jnp.float32(det_thres))


def _np_of(t):
    try:
        return np.asarray(t.detach().cpu().numpy(), np.float32)
    except AttributeError:
        return np.asarray(t, np.float32)


def convert_aliked(state_dict, model_name: str = "aliked-n16"):
    """lightglue/ALIKED torch state dict → ``(backbone_variables,
    sddh_variables)``: flax variables for :class:`ALIKED` and for its
    SDDH descriptor head (``desc_head.*`` weights), respectively. Layout
    transcribed from lightglue aliked.py (see module docstring for the
    verification caveat)."""
    sd = {k: _np_of(v) for k, v in state_dict.items()}

    def conv_w(key):
        return sd[key].transpose(2, 3, 1, 0)     # OIHW → HWIO

    blocks: dict = {}
    bstats: dict = {}
    for bi, dcn in (("block1", False), ("block2", False),
                    ("block3", True), ("block4", True)):
        bp: dict = {}
        bs: dict = {}
        for ci in ("conv1", "conv2"):
            src = f"{bi}.{ci}"
            if dcn:
                bp[ci] = {"offset_conv": {
                    "kernel": conv_w(f"{src}.offset_conv.weight"),
                    "bias": sd[f"{src}.offset_conv.bias"]},
                    "regular_conv": conv_w(f"{src}.regular_conv.weight")}
            else:
                bp[ci] = {"kernel": conv_w(f"{src}.weight")}
            bn = f"{bi}.{'bn1' if ci == 'conv1' else 'bn2'}"
            bname = "bn1" if ci == "conv1" else "bn2"
            bp[bname] = {"scale": sd[f"{bn}.weight"],
                         "bias": sd[f"{bn}.bias"]}
            bs[bname] = {"mean": sd[f"{bn}.running_mean"],
                         "var": sd[f"{bn}.running_var"]}
        if f"{bi}.downsample.weight" in sd:
            bp["downsample"] = {
                "kernel": conv_w(f"{bi}.downsample.weight"),
                "bias": sd[f"{bi}.downsample.bias"]}
        blocks[bi] = bp
        bstats[bi] = bs

    for i in range(1, 5):
        blocks[f"conv{i}"] = {"kernel": conv_w(f"conv{i}.weight")}
    for li, di in ((0, "score_head_0"), (2, "score_head_2"),
                   (4, "score_head_4"), (6, "score_head_6")):
        blocks[di] = {"kernel": conv_w(f"score_head.{li}.weight")}

    cfg = ALIKED_CFGS[model_name]
    sddh = {
        "offset_conv_0":
            sd["desc_head.offset_conv.0.weight"].transpose(2, 3, 1, 0),
        "offset_conv_0_bias": sd["desc_head.offset_conv.0.bias"],
        "offset_conv_2":
            sd["desc_head.offset_conv.2.weight"][:, :, 0, 0].T,
        "offset_conv_2_bias": sd["desc_head.offset_conv.2.bias"],
        "sf_conv": sd["desc_head.sf_conv.weight"][:, :, 0, 0].T,
        # convM (dim, dim·M, 1, 1): torch flattens (C, M) channel-major
        # per sample position; our reshape is (M, C) — permute to match.
        "convM": sd["desc_head.convM.weight"][:, :, 0, 0]
            .reshape(-1, cfg["dim"], cfg["M"])
            .transpose(2, 1, 0).reshape(cfg["M"] * cfg["dim"], -1),
    }
    return {"params": blocks, "batch_stats": bstats}, {"params": sddh}


def reference_aliked_spec(model_name: str = "aliked-n16") -> dict:
    """Shapes of the lightglue ALIKED state-dict layout (for converter
    round-trip tests on random weights)."""
    cfg = ALIKED_CFGS[model_name]
    c = [3, cfg["c1"], cfg["c2"], cfg["c3"], cfg["c4"]]
    dim, K, M = cfg["dim"], cfg["K"], cfg["M"]
    spec: dict = {}

    def bn(prefix, n):
        for s in ("weight", "bias", "running_mean", "running_var"):
            spec[f"{prefix}.{s}"] = (n,)

    # block1: ConvBlock (plain convs)
    spec["block1.conv1.weight"] = (c[1], 3, 3, 3)
    bn("block1.bn1", c[1])
    spec["block1.conv2.weight"] = (c[1], c[1], 3, 3)
    bn("block1.bn2", c[1])
    # block2..4: ResBlocks (3/4 deformable)
    for bi, dcn in ((2, False), (3, True), (4, True)):
        ci, co = c[bi - 1 + 0], c[bi]
        for li, (cin, cout) in enumerate(((ci, co), (co, co)), start=1):
            pre = f"block{bi}.conv{li}"
            if dcn:
                spec[f"{pre}.offset_conv.weight"] = (18, cin, 3, 3)
                spec[f"{pre}.offset_conv.bias"] = (18,)
                spec[f"{pre}.regular_conv.weight"] = (cout, cin, 3, 3)
            else:
                spec[f"{pre}.weight"] = (cout, cin, 3, 3)
            bn(f"block{bi}.bn{li}", cout)
        spec[f"block{bi}.downsample.weight"] = (co, ci, 1, 1)
        spec[f"block{bi}.downsample.bias"] = (co,)
    for i in range(1, 5):
        spec[f"conv{i}.weight"] = (dim // 4, c[i], 1, 1)
    spec["score_head.0.weight"] = (8, dim, 1, 1)
    spec["score_head.2.weight"] = (4, 8, 3, 3)
    spec["score_head.4.weight"] = (4, 4, 3, 3)
    spec["score_head.6.weight"] = (1, 4, 3, 3)
    spec["desc_head.offset_conv.0.weight"] = (2 * M, dim, K, K)
    spec["desc_head.offset_conv.0.bias"] = (2 * M,)
    spec["desc_head.offset_conv.2.weight"] = (2 * M, 2 * M, 1, 1)
    spec["desc_head.offset_conv.2.bias"] = (2 * M,)
    spec["desc_head.sf_conv.weight"] = (dim, dim, 1, 1)
    spec["desc_head.convM.weight"] = (dim, dim * M, 1, 1)
    return spec
