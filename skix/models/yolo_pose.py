"""YOLO-class single-stage pose detector (Flax, ultralytics-convertible).

Reference capability: prepare_dataset/model/yolov11_pose.py:42 — the
reference wraps ``ultralytics.YOLO(pose_ckpt)`` to get per-frame person
boxes + 17 COCO keypoints with confidences (and yolov11_bbox.py /
yolov11_mask.py for box/mask variants). This module is the TPU-native
counterpart at real capability: BOTH ultralytics architecture
generations, selected by ``version``:

- ``version=8``: YOLOv8 (CSP C2f backbone, SPPF, PAN-FPN neck,
  decoupled anchor-free DFL head + pose head), scalable n/s/m/l/x.
- ``version=11``: YOLO11 — the reference's actual checkpoints
  (``yolo11x-pose.pt`` / ``yolo11x-seg.pt`` / ``yolo11x.pt``,
  configs/prepare_dataset.yaml:9-11): C3k2 blocks (C2f with optional
  nested C3k bottlenecks), a C2PSA attention stage after SPPF, and the
  non-legacy depthwise-separable classification branch.

Open ultralytics ``.pt`` checkpoints of either generation convert 1:1
via :func:`convert_ultralytics_pose` / :func:`convert_ultralytics_seg`
with the matching ``version``.

TPU-first design decisions (vs the torch original):
- NHWC everywhere; convs are bias-free + BatchNorm + SiLU so XLA fuses
  the whole block into the conv epilogue.
- Decode is fully static-shape: per-level predictions flatten and
  concatenate into one (B, A, C) tensor over precomputed anchor tables,
  then fixed top-K + skix.ops.nms — no data-dependent shapes anywhere,
  the whole clip batches through one jit.
- DFL (distribution focal regression, reg_max=16 bins/side) stays — the
  softmax-expectation is a tiny matmul that rides the MXU.
- Train-time assignment (task-aligned, see yolo_loss.py) is dense and
  fixed-slot: (Ngt, A) alignment matrices with validity masks instead of
  per-image Python loops.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.ops.nms import nms

# depth_mult, width_mult, max_channels (ultralytics scale tables)
SCALES = {
    "n": (0.34, 0.25, 1024),
    "s": (0.34, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}
# yolo11.yaml scales; for m/l/x every C3k2 forces c3k=True (parse_model)
SCALES11 = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


def _make_divisible(c: float, d: int = 8) -> int:
    return max(d, int(round(c / d) * d))


class ConvBNAct(nn.Module):
    """ultralytics ``Conv``: Conv2d(bias=False) + BN (+ SiLU unless
    ``act=False``). ``groups=features`` makes it the ultralytics
    ``DWConv`` (depthwise)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    act: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(h)
        return nn.silu(h) if self.act else h


class Bottleneck(nn.Module):
    """ultralytics ``Bottleneck``: cv1 3×3 to ``hidden`` channels, cv2
    3×3 back to ``features``. C2f/C3k call it with e=1.0 (hidden =
    features); C3k2's plain-bottleneck path uses the ultralytics DEFAULT
    e=0.5 (hidden = features // 2) — ``hidden=None`` means full width."""

    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32
    hidden: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.features if self.hidden is None else self.hidden
        h = ConvBNAct(c_, 3, 1, self.dtype, name="cv1")(x, train)
        h = ConvBNAct(self.features, 3, 1, self.dtype, name="cv2")(h, train)
        return x + h if self.shortcut else h


class C2f(nn.Module):
    """Cross-stage partial block: 1x1 expand → split → n bottlenecks,
    each chunk appended → 1x1 fuse on the (2+n)-way concat."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        h = ConvBNAct(2 * c, 1, 1, self.dtype, name="cv1")(x, train)
        parts = list(jnp.split(h, 2, axis=-1))
        for i in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, self.dtype,
                                    name=f"m_{i}")(parts[-1], train))
        return ConvBNAct(self.features, 1, 1, self.dtype,
                         name="cv2")(jnp.concatenate(parts, -1), train)


class C3k(nn.Module):
    """ultralytics ``C3k``: a C3 block whose bottlenecks use 3×3 convs
    (k=3, e=1.0). ``features`` = in = out channels; hidden c_ = features/2
    (C3's e=0.5). forward: cv3(cat(m(cv1(x)), cv2(x)))."""

    features: int
    n: int = 2
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.features // 2
        a = ConvBNAct(c_, 1, 1, self.dtype, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, 1, self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.dtype,
                           name=f"m_{i}")(a, train)
        return ConvBNAct(self.features, 1, 1, self.dtype,
                         name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k2(nn.Module):
    """ultralytics ``C3k2`` (YOLO11): a C2f whose per-chunk module is a
    nested :class:`C3k` when ``c3k`` else a plain Bottleneck; hidden
    width ``c = int(features · e)`` (e=0.25 for the first two backbone
    stages, 0.5 elsewhere)."""

    features: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.e)
        h = ConvBNAct(2 * c, 1, 1, self.dtype, name="cv1")(x, train)
        parts = list(jnp.split(h, 2, axis=-1))
        for i in range(self.n):
            if self.c3k:
                blk = C3k(c, 2, self.shortcut, self.dtype, name=f"m_{i}")
            else:
                # ultralytics Bottleneck(self.c, self.c, shortcut, g)
                # keeps the default e=0.5 → half-width cv1 (unlike C2f,
                # which passes e=1.0 explicitly).
                blk = Bottleneck(c, self.shortcut, self.dtype,
                                 hidden=c // 2, name=f"m_{i}")
            parts.append(blk(parts[-1], train))
        return ConvBNAct(self.features, 1, 1, self.dtype,
                         name="cv2")(jnp.concatenate(parts, -1), train)


class PSAAttention(nn.Module):
    """ultralytics ``Attention`` (inside C2PSA): 1×1 ConvBN qkv → exact
    per-head softmax attention over the H·W tokens + a depthwise 3×3
    positional term on v → 1×1 ConvBN projection. head_dim = dim/heads,
    key_dim = head_dim·attn_ratio."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        kd = int(hd * self.attn_ratio)
        h = self.dim + 2 * kd * nh
        qkv = ConvBNAct(h, 1, 1, self.dtype, act=False,
                        name="qkv")(x, train)
        qkv = qkv.reshape(B, H * W, nh, 2 * kd + hd)  # head-major channels
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        attn = jnp.einsum("binc,bjnc->bnij", q, k) * (kd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bjnd,bnij->bind", v, attn)
        out = out.reshape(B, H, W, self.dim)
        pe = ConvBNAct(self.dim, 3, 1, self.dtype, act=False,
                       groups=self.dim, name="pe")(
            v.reshape(B, H, W, self.dim), train)
        return ConvBNAct(self.dim, 1, 1, self.dtype, act=False,
                         name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """attention + 2-layer conv FFN, both residual."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + PSAAttention(self.dim, self.num_heads, 0.5, self.dtype,
                             name="attn")(x, train)
        h = ConvBNAct(2 * self.dim, 1, 1, self.dtype, name="ffn_0")(x, train)
        h = ConvBNAct(self.dim, 1, 1, self.dtype, act=False,
                      name="ffn_1")(h, train)
        return x + h


class C2PSA(nn.Module):
    """ultralytics ``C2PSA``: 1×1 split → n PSABlocks on one half →
    1×1 fuse. heads = hidden_c // 64 (ultralytics hard-codes it)."""

    features: int
    n: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        h = ConvBNAct(2 * c, 1, 1, self.dtype, name="cv1")(x, train)
        a, b = jnp.split(h, 2, axis=-1)
        heads = max(1, c // 64)
        for i in range(self.n):
            b = PSABlock(c, heads, self.dtype, name=f"m_{i}")(b, train)
        return ConvBNAct(self.features, 1, 1, self.dtype, name="cv2")(
            jnp.concatenate([a, b], -1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained stride-1 maxpools."""

    features: int
    pool: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        h = ConvBNAct(c, 1, 1, self.dtype, name="cv1")(x, train)
        k = self.pool
        outs = [h]
        for _ in range(3):
            outs.append(nn.max_pool(outs[-1], (k, k), strides=(1, 1),
                                    padding="SAME"))
        return ConvBNAct(self.features, 1, 1, self.dtype,
                         name="cv2")(jnp.concatenate(outs, -1), train)


def _yolo_trunk(x, train, ch, n3, n6, dt):
    """Shared CSP backbone + PAN-FPN neck → (o3, o4, o5) at /8 /16 /32.

    A free function (not a Module) so the pose and seg variants register
    IDENTICAL flat layer names (b0..b9, h12..h21) on their own scopes —
    the ultralytics converter depends on those names."""
    c1, c2, c3, c4, c5 = ch

    # backbone (layer indices follow the ultralytics yaml for the
    # converter's name mapping: b0..b9)
    h = ConvBNAct(c1, 3, 2, dt, name="b0")(x, train)        # P1/2
    h = ConvBNAct(c2, 3, 2, dt, name="b1")(h, train)        # P2/4
    h = C2f(c2, n3, True, dt, name="b2")(h, train)
    h = ConvBNAct(c3, 3, 2, dt, name="b3")(h, train)        # P3/8
    p3 = C2f(c3, n6, True, dt, name="b4")(h, train)
    h = ConvBNAct(c4, 3, 2, dt, name="b5")(p3, train)       # P4/16
    p4 = C2f(c4, n6, True, dt, name="b6")(h, train)
    h = ConvBNAct(c5, 3, 2, dt, name="b7")(p4, train)       # P5/32
    h = C2f(c5, n3, True, dt, name="b8")(h, train)
    p5 = SPPF(c5, 5, dt, name="b9")(h, train)

    # PAN-FPN neck (h12/h15/h18/h21 = the yaml's layer numbers)
    def up2(t):
        B, H, W, C = t.shape
        return jax.image.resize(t, (B, 2 * H, 2 * W, C), "nearest")

    t4 = C2f(c4, n3, False, dt, name="h12")(
        jnp.concatenate([up2(p5), p4], -1), train)
    o3 = C2f(c3, n3, False, dt, name="h15")(
        jnp.concatenate([up2(t4), p3], -1), train)
    d3 = ConvBNAct(c3, 3, 2, dt, name="h16")(o3, train)
    o4 = C2f(c4, n3, False, dt, name="h18")(
        jnp.concatenate([d3, t4], -1), train)
    d4 = ConvBNAct(c4, 3, 2, dt, name="h19")(o4, train)
    o5 = C2f(c5, n3, False, dt, name="h21")(
        jnp.concatenate([d4, p5], -1), train)
    return o3, o4, o5


def _yolo11_trunk(x, train, ch, n, c3k_all, dt):
    """YOLO11 backbone + neck → (o3, o4, o5) at /8 /16 /32.

    Layer names follow the yolo11.yaml numbering (b0..b10, h13..h22) for
    the converter's name mapping. ``c3k_all``: parse_model forces
    c3k=True on every C3k2 for the m/l/x scales."""
    c1, c2, c3, c4, c5 = ch

    h = ConvBNAct(c1, 3, 2, dt, name="b0")(x, train)         # P1/2
    h = ConvBNAct(c2, 3, 2, dt, name="b1")(h, train)         # P2/4
    h = C3k2(c3, n, c3k_all, 0.25, True, dt, name="b2")(h, train)
    h = ConvBNAct(c3, 3, 2, dt, name="b3")(h, train)         # P3/8
    p3 = C3k2(c4, n, c3k_all, 0.25, True, dt, name="b4")(h, train)
    h = ConvBNAct(c4, 3, 2, dt, name="b5")(p3, train)        # P4/16
    p4 = C3k2(c4, n, True, 0.5, True, dt, name="b6")(h, train)
    h = ConvBNAct(c5, 3, 2, dt, name="b7")(p4, train)        # P5/32
    h = C3k2(c5, n, True, 0.5, True, dt, name="b8")(h, train)
    h = SPPF(c5, 5, dt, name="b9")(h, train)
    p5 = C2PSA(c5, n, dt, name="b10")(h, train)

    def up2(t):
        B, H, W, C = t.shape
        return jax.image.resize(t, (B, 2 * H, 2 * W, C), "nearest")

    t4 = C3k2(c4, n, c3k_all, 0.5, True, dt, name="h13")(
        jnp.concatenate([up2(p5), p4], -1), train)
    o3 = C3k2(c3, n, c3k_all, 0.5, True, dt, name="h16")(
        jnp.concatenate([up2(t4), p3], -1), train)
    d3 = ConvBNAct(c3, 3, 2, dt, name="h17")(o3, train)
    o4 = C3k2(c4, n, c3k_all, 0.5, True, dt, name="h19")(
        jnp.concatenate([d3, t4], -1), train)
    d4 = ConvBNAct(c4, 3, 2, dt, name="h20")(o4, train)
    o5 = C3k2(c5, n, True, 0.5, True, dt, name="h22")(
        jnp.concatenate([d4, p5], -1), train)
    return o3, o4, o5


class PoseDetections(NamedTuple):
    boxes_xyxy: jnp.ndarray   # (B, K, 4) pixels
    scores: jnp.ndarray       # (B, K)
    keypoints: jnp.ndarray    # (B, K, 17, 3) x, y, conf (pixels)
    valid: jnp.ndarray        # (B, K) bool


class RawPredictions(NamedTuple):
    """Pre-decode per-anchor outputs (training consumes these)."""

    box_dist: jnp.ndarray     # (B, A, 4, reg_max) DFL logits
    cls_logits: jnp.ndarray   # (B, A, nc)
    kpt_raw: jnp.ndarray      # (B, A, 17, 3) raw offsets + conf logit
    anchors: jnp.ndarray      # (A, 2) grid-cell centers (grid units)
    strides: jnp.ndarray      # (A,) pixels per grid unit


def _widths(scale: str, version: int):
    """(channel plan, repeat counts) for one scale/version."""
    d, w, mc = (SCALES11 if version == 11 else SCALES)[scale]
    ch = [_make_divisible(min(c * w, mc * w))
          for c in (64, 128, 256, 512, 1024)]
    if version == 11:
        n = max(1, round(2 * d))
        return ch, n, n
    return ch, max(1, round(3 * d)), max(1, round(6 * d))


def _trunk(images, train, scale, version, dt):
    ch, n3, n6 = _widths(scale, version)
    if version == 11:
        return _yolo11_trunk(images, train, ch, n3, scale in "mlx", dt)
    return _yolo_trunk(images, train, ch, n3, n6, dt)


def _cls_branch(feat, train, cc, nc, version, li, dt):
    """ultralytics Detect cv3: plain 2×Conv3x3 (v8/legacy) or the
    non-legacy depthwise-separable stack (v11):
    (DWConv3 → Conv1) ×2 → 1×1 Conv2d."""
    if version == 11:
        cin = feat.shape[-1]
        c = ConvBNAct(cin, 3, 1, dt, groups=cin,
                      name=f"cv3_{li}_0_0")(feat, train)
        c = ConvBNAct(cc, 1, 1, dt, name=f"cv3_{li}_0_1")(c, train)
        c = ConvBNAct(cc, 3, 1, dt, groups=cc,
                      name=f"cv3_{li}_1_0")(c, train)
        c = ConvBNAct(cc, 1, 1, dt, name=f"cv3_{li}_1_1")(c, train)
    else:
        c = ConvBNAct(cc, 3, 1, dt, name=f"cv3_{li}_0")(feat, train)
        c = ConvBNAct(cc, 3, 1, dt, name=f"cv3_{li}_1")(c, train)
    return nn.Conv(nc, (1, 1), name=f"cv3_{li}_2")(c.astype(jnp.float32))


class YoloPose(nn.Module):
    """YOLOv8/YOLO11-pose: image (B, H, W, 3) in [0, 1] → per-anchor raw
    heads.

    ``scale`` picks the n/s/m/l/x width/depth family; ``version`` the
    architecture generation (8 = C2f, 11 = C3k2/C2PSA — the reference's
    yolo11*-pose checkpoints). H, W must be multiples of 32. Use
    :func:`decode` / :func:`detect` for boxes.
    """

    scale: str = "s"
    num_keypoints: int = 17
    num_classes: int = 1
    reg_max: int = 16
    version: int = 8
    dtype: jnp.dtype = jnp.float32

    def widths(self):
        return _widths(self.scale, self.version)

    @nn.compact
    def __call__(self, images, train: bool = False) -> RawPredictions:
        ch, n3, n6 = self.widths()
        c3, c4, c5 = ch[2:]
        dt = self.dtype
        o3, o4, o5 = _trunk(images.astype(dt), train, self.scale,
                            self.version, dt)

        # decoupled heads (cv2 box / cv3 cls / cv4 pose — ultralytics names)
        nk = self.num_keypoints * 3
        cb = max(16, c3 // 4, 4 * self.reg_max)
        cc = max(c3, min(self.num_classes, 100))
        ck = max(c3 // 4, nk)
        B = images.shape[0]
        dists, clss, kpts, anchors, strides = [], [], [], [], []
        for li, (feat, stride) in enumerate(((o3, 8), (o4, 16), (o5, 32))):
            b = ConvBNAct(cb, 3, 1, dt, name=f"cv2_{li}_0")(feat, train)
            b = ConvBNAct(cb, 3, 1, dt, name=f"cv2_{li}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), name=f"cv2_{li}_2")(
                b.astype(jnp.float32))
            c = _cls_branch(feat, train, cc, self.num_classes,
                            self.version, li, dt)
            k = ConvBNAct(ck, 3, 1, dt, name=f"cv4_{li}_0")(feat, train)
            k = ConvBNAct(ck, 3, 1, dt, name=f"cv4_{li}_1")(k, train)
            k = nn.Conv(nk, (1, 1), name=f"cv4_{li}_2")(
                k.astype(jnp.float32))
            gh, gw = feat.shape[1], feat.shape[2]
            dists.append(b.reshape(B, gh * gw, 4, self.reg_max))
            clss.append(c.reshape(B, gh * gw, self.num_classes))
            kpts.append(k.reshape(B, gh * gw, self.num_keypoints, 3))
            ys, xs = np.meshgrid(np.arange(gh) + 0.5, np.arange(gw) + 0.5,
                                 indexing="ij")
            anchors.append(np.stack([xs.ravel(), ys.ravel()], -1))
            strides.append(np.full(gh * gw, stride, np.float32))

        return RawPredictions(
            box_dist=jnp.concatenate(dists, 1),
            cls_logits=jnp.concatenate(clss, 1),
            kpt_raw=jnp.concatenate(kpts, 1),
            anchors=jnp.asarray(np.concatenate(anchors, 0), jnp.float32),
            strides=jnp.asarray(np.concatenate(strides, 0)))


def dfl_expectation(box_dist):
    """(…, 4, reg_max) logits → (…, 4) expected l,t,r,b distances
    (grid units): softmax over bins, dot with bin index."""
    reg_max = box_dist.shape[-1]
    p = jax.nn.softmax(box_dist, axis=-1)
    return p @ jnp.arange(reg_max, dtype=jnp.float32)


def decode_boxes(raw: RawPredictions):
    """Per-anchor xyxy pixel boxes from DFL distances (dist2bbox)."""
    ltrb = dfl_expectation(raw.box_dist)                    # (B, A, 4)
    a = raw.anchors[None]
    s = raw.strides[None, :, None]
    x1y1 = (a - ltrb[..., :2]) * s
    x2y2 = (a + ltrb[..., 2:]) * s
    return jnp.concatenate([x1y1, x2y2], -1)


def decode_keypoints(raw: RawPredictions):
    """ultralytics kpts_decode: xy = (raw*2 + anchor - 0.5) * stride."""
    a = raw.anchors[None, :, None, :]
    s = raw.strides[None, :, None, None]
    xy = (raw.kpt_raw[..., :2] * 2.0 + (a - 0.5)) * s
    conf = jax.nn.sigmoid(raw.kpt_raw[..., 2:3])
    return jnp.concatenate([xy, conf], -1)


def detect(raw: RawPredictions, top_k: int = 8, score_threshold: float = 0.25,
           nms_iou: float = 0.7, pre_nms_k: int = 128) -> PoseDetections:
    """Static-shape postprocess: per-image top-``pre_nms_k`` candidate pool
    → NMS → top-``top_k`` survivors into padded detection slots (the
    reference's Results.boxes/keypoints).

    NMS must run on a pool much larger than ``top_k``: a confident object
    emits many high-score duplicate anchors, and top-k'ing before NMS would
    let those duplicates evict weaker *real* objects from the pool
    entirely (ultralytics NMS'es thousands of candidates, then truncates).
    """
    boxes = decode_boxes(raw)                               # (B, A, 4)
    kpts = decode_keypoints(raw)                            # (B, A, 17, 3)
    scores = jax.nn.sigmoid(raw.cls_logits).max(-1)         # (B, A)
    pool = min(max(pre_nms_k, top_k), scores.shape[-1])

    def one(sc, bx, kp):
        pool_s, idx = jax.lax.top_k(sc, pool)
        bxs = bx[idx]
        keep = nms(bxs, pool_s, nms_iou)
        # rank survivors first (suppressed → -inf), then take top_k
        ranked = jnp.where(keep, pool_s, -jnp.inf)
        top_s, sel = jax.lax.top_k(ranked, top_k)
        ok = jnp.isfinite(top_s) & (top_s > score_threshold)
        return bxs[sel], pool_s[sel], kp[idx][sel], ok

    b, s, k, v = jax.vmap(one)(scores, boxes, kpts)
    return PoseDetections(boxes_xyxy=b, scores=s, keypoints=k, valid=v)


# ---------------------------------------------------------------------------
# detect-only variant (reference yolov11_bbox.py — plain yolo11x.pt)
# ---------------------------------------------------------------------------


class RawDetectPredictions(NamedTuple):
    """Pre-decode per-anchor detect-only outputs."""

    box_dist: jnp.ndarray     # (B, A, 4, reg_max) DFL logits
    cls_logits: jnp.ndarray   # (B, A, nc)
    anchors: jnp.ndarray      # (A, 2) grid-cell centers (grid units)
    strides: jnp.ndarray      # (A,) pixels per grid unit


class BoxDetections(NamedTuple):
    boxes_xyxy: jnp.ndarray   # (B, K, 4) pixels
    scores: jnp.ndarray       # (B, K)
    cls: jnp.ndarray          # (B, K) int32 class ids
    valid: jnp.ndarray        # (B, K) bool


class YoloDetect(nn.Module):
    """YOLOv8/YOLO11 detect-only: image (B, H, W, 3) in [0, 1] → per-anchor
    box + class heads.

    Reference capability: the bbox task runs a PLAIN ``yolo11x.pt``
    COCO-80 detect checkpoint with a person class filter
    (prepare_dataset/model/yolov11_bbox.py:77,118 ``classes=0``;
    configs/prepare_dataset.yaml ``bbox_ckpt``) — a third ultralytics
    head layout next to -pose/-seg. Same trunk/neck and cv2/cv3 branch
    names as :class:`YoloPose` (the Detect head sits at the same
    model.22/model.23 slot Pose does), so
    :func:`convert_ultralytics_detect` shares the trunk mapping.
    """

    scale: str = "s"
    num_classes: int = 80
    reg_max: int = 16
    version: int = 8
    dtype: jnp.dtype = jnp.float32

    def widths(self):
        return _widths(self.scale, self.version)

    @nn.compact
    def __call__(self, images, train: bool = False) -> RawDetectPredictions:
        ch, n3, n6 = self.widths()
        c3, c4, c5 = ch[2:]
        dt = self.dtype
        o3, o4, o5 = _trunk(images.astype(dt), train, self.scale,
                            self.version, dt)
        cb = max(16, c3 // 4, 4 * self.reg_max)
        cc = max(c3, min(self.num_classes, 100))
        B = images.shape[0]
        dists, clss, anchors, strides = [], [], [], []
        for li, (feat, stride) in enumerate(((o3, 8), (o4, 16), (o5, 32))):
            b = ConvBNAct(cb, 3, 1, dt, name=f"cv2_{li}_0")(feat, train)
            b = ConvBNAct(cb, 3, 1, dt, name=f"cv2_{li}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), name=f"cv2_{li}_2")(
                b.astype(jnp.float32))
            c = _cls_branch(feat, train, cc, self.num_classes,
                            self.version, li, dt)
            gh, gw = feat.shape[1], feat.shape[2]
            dists.append(b.reshape(B, gh * gw, 4, self.reg_max))
            clss.append(c.reshape(B, gh * gw, self.num_classes))
            ys, xs = np.meshgrid(np.arange(gh) + 0.5, np.arange(gw) + 0.5,
                                 indexing="ij")
            anchors.append(np.stack([xs.ravel(), ys.ravel()], -1))
            strides.append(np.full(gh * gw, stride, np.float32))
        return RawDetectPredictions(
            box_dist=jnp.concatenate(dists, 1),
            cls_logits=jnp.concatenate(clss, 1),
            anchors=jnp.asarray(np.concatenate(anchors, 0), jnp.float32),
            strides=jnp.asarray(np.concatenate(strides, 0)))


def detect_boxes(raw: RawDetectPredictions, top_k: int = 8,
                 score_threshold: float = 0.25, nms_iou: float = 0.7,
                 pre_nms_k: int = 128,
                 classes: Optional[Sequence[int]] = None) -> BoxDetections:
    """Static-shape detect-only postprocess. ``classes`` restricts the
    class-score max to the listed ids BEFORE candidate ranking — the
    ultralytics ``classes=0`` person filter the reference passes
    (yolov11_bbox.py:118)."""
    boxes = decode_boxes(raw)   # duck-typed: box_dist/anchors/strides
    probs = jax.nn.sigmoid(raw.cls_logits)                  # (B, A, nc)
    if classes is not None:
        keep_c = np.zeros(probs.shape[-1], bool)
        keep_c[list(classes)] = True
        probs = jnp.where(jnp.asarray(keep_c)[None, None], probs, 0.0)
    scores = probs.max(-1)                                  # (B, A)
    cls_ids = probs.argmax(-1).astype(jnp.int32)            # (B, A)
    pool = min(max(pre_nms_k, top_k), scores.shape[-1])

    def one(sc, bx, ci):
        pool_s, idx = jax.lax.top_k(sc, pool)
        bxs = bx[idx]
        keep = nms(bxs, pool_s, nms_iou)
        ranked = jnp.where(keep, pool_s, -jnp.inf)
        top_s, sel = jax.lax.top_k(ranked, top_k)
        ok = jnp.isfinite(top_s) & (top_s > score_threshold)
        return bxs[sel], pool_s[sel], ci[idx][sel], ok

    b, s, c, v = jax.vmap(one)(scores, boxes, cls_ids)
    return BoxDetections(boxes_xyxy=b, scores=s, cls=c, valid=v)


# ---------------------------------------------------------------------------
# segmentation variant (reference yolov11_mask.py — ultralytics -seg)
# ---------------------------------------------------------------------------


class Proto(nn.Module):
    """ultralytics ``Proto``: P3 feature → (B, Hp, Wp, nm) mask
    prototypes at stride 4 (Conv → learned 2× ConvTranspose → Conv →
    1×1 Conv)."""

    mid: int            # npr (width-scaled 256)
    nm: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBNAct(self.mid, 3, 1, self.dtype, name="cv1")(x, train)
        h = nn.ConvTranspose(self.mid, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upsample")(h)
        h = ConvBNAct(self.mid, 3, 1, self.dtype, name="cv2")(h, train)
        return ConvBNAct(self.nm, 1, 1, self.dtype, name="cv3")(h, train)


class RawSegPredictions(NamedTuple):
    """Pre-decode per-anchor seg outputs."""

    box_dist: jnp.ndarray     # (B, A, 4, reg_max) DFL logits
    cls_logits: jnp.ndarray   # (B, A, nc)
    mask_coefs: jnp.ndarray   # (B, A, nm)
    protos: jnp.ndarray       # (B, Hp, Wp, nm) stride-4 prototypes
    anchors: jnp.ndarray      # (A, 2)
    strides: jnp.ndarray      # (A,)


class SegDetections(NamedTuple):
    boxes_xyxy: jnp.ndarray   # (B, K, 4) pixels
    scores: jnp.ndarray       # (B, K)
    masks: jnp.ndarray        # (B, K, Hp, Wp) f32 probabilities, box-cropped
    valid: jnp.ndarray        # (B, K) bool


class YoloSeg(nn.Module):
    """YOLOv8-seg: image (B, H, W, 3) in [0, 1] → per-anchor raw heads +
    mask prototypes.

    Reference capability: prepare_dataset/model/yolov11_mask.py:75 —
    person segmentation masks ``(T, 1, H, W)`` for the ``pt_info``
    contract. Same trunk as :class:`YoloPose` (identical layer names, so
    ultralytics ``-seg`` checkpoints convert via
    :func:`convert_ultralytics_seg`); the pose head is replaced by the
    ultralytics ``Segment`` head: per-anchor ``nm``-dim mask
    coefficients (cv4) + a stride-4 prototype bank (Proto on P3). A
    detection's mask is the sigmoid of its coefficients' inner product
    with the prototypes — one (A, nm) × (nm, Hp·Wp) matmul per image on
    the MXU, no per-object conv work.
    """

    scale: str = "s"
    num_classes: int = 1
    nm: int = 32              # mask coefficients per anchor
    reg_max: int = 16
    version: int = 8
    dtype: jnp.dtype = jnp.float32

    def widths(self):
        return _widths(self.scale, self.version)

    def proto_channels(self) -> int:
        # parse_model: npr = make_divisible(min(256, max_ch) * width, 8)
        d, w, mc = (SCALES11 if self.version == 11 else SCALES)[self.scale]
        return _make_divisible(min(256 * w, mc * w))

    @nn.compact
    def __call__(self, images, train: bool = False) -> RawSegPredictions:
        ch, n3, n6 = self.widths()
        c3, c4, c5 = ch[2:]
        dt = self.dtype
        o3, o4, o5 = _trunk(images.astype(dt), train, self.scale,
                            self.version, dt)

        protos = Proto(self.proto_channels(), self.nm, dt,
                       name="proto")(o3, train)

        cb = max(16, c3 // 4, 4 * self.reg_max)
        cc = max(c3, min(self.num_classes, 100))
        ck = max(c3 // 4, self.nm)
        B = images.shape[0]
        dists, clss, coefs, anchors, strides = [], [], [], [], []
        for li, (feat, stride) in enumerate(((o3, 8), (o4, 16), (o5, 32))):
            b = ConvBNAct(cb, 3, 1, dt, name=f"cv2_{li}_0")(feat, train)
            b = ConvBNAct(cb, 3, 1, dt, name=f"cv2_{li}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), name=f"cv2_{li}_2")(
                b.astype(jnp.float32))
            c = _cls_branch(feat, train, cc, self.num_classes,
                            self.version, li, dt)
            k = ConvBNAct(ck, 3, 1, dt, name=f"cv4_{li}_0")(feat, train)
            k = ConvBNAct(ck, 3, 1, dt, name=f"cv4_{li}_1")(k, train)
            k = nn.Conv(self.nm, (1, 1), name=f"cv4_{li}_2")(
                k.astype(jnp.float32))
            gh, gw = feat.shape[1], feat.shape[2]
            dists.append(b.reshape(B, gh * gw, 4, self.reg_max))
            clss.append(c.reshape(B, gh * gw, self.num_classes))
            coefs.append(k.reshape(B, gh * gw, self.nm))
            ys, xs = np.meshgrid(np.arange(gh) + 0.5, np.arange(gw) + 0.5,
                                 indexing="ij")
            anchors.append(np.stack([xs.ravel(), ys.ravel()], -1))
            strides.append(np.full(gh * gw, stride, np.float32))

        return RawSegPredictions(
            box_dist=jnp.concatenate(dists, 1),
            cls_logits=jnp.concatenate(clss, 1),
            mask_coefs=jnp.concatenate(coefs, 1),
            protos=protos.astype(jnp.float32),
            anchors=jnp.asarray(np.concatenate(anchors, 0), jnp.float32),
            strides=jnp.asarray(np.concatenate(strides, 0)))


def crop_masks_to_boxes(masks, boxes_xyxy, mask_stride: float = 4.0):
    """Zero mask probability outside each detection's box (ultralytics
    ``crop_mask``). ``masks (..., K, Hp, Wp)``, ``boxes (..., K, 4)`` in
    image pixels; the mask grid is ``mask_stride`` px per cell."""
    Hp, Wp = masks.shape[-2:]
    bx = boxes_xyxy[..., None, None, :] / mask_stride   # (..., K, 1, 1, 4)
    xs = jnp.arange(Wp, dtype=jnp.float32)[None, :]
    ys = jnp.arange(Hp, dtype=jnp.float32)[:, None]
    inside = ((xs >= bx[..., 0]) & (xs < bx[..., 2])
              & (ys >= bx[..., 1]) & (ys < bx[..., 3]))
    return masks * inside


def detect_seg(raw: RawSegPredictions, top_k: int = 8,
               score_threshold: float = 0.25, nms_iou: float = 0.7,
               pre_nms_k: int = 128) -> SegDetections:
    """Static-shape seg postprocess: NMS on a large candidate pool →
    top-``top_k`` survivors → per-survivor masks from the prototype bank
    (sigmoid(coefs · protos), box-cropped — ultralytics
    ``process_mask`` semantics). Mask assembly happens AFTER selection,
    so only K (not A) mask images are ever materialized."""
    boxes = decode_boxes(raw)   # duck-typed: box_dist/anchors/strides
    scores = jax.nn.sigmoid(raw.cls_logits).max(-1)         # (B, A)
    pool = min(max(pre_nms_k, top_k), scores.shape[-1])

    def one(sc, bx, cf, protos):
        pool_s, idx = jax.lax.top_k(sc, pool)
        bxs = bx[idx]
        keep = nms(bxs, pool_s, nms_iou)
        ranked = jnp.where(keep, pool_s, -jnp.inf)
        top_s, sel = jax.lax.top_k(ranked, top_k)
        ok = jnp.isfinite(top_s) & (top_s > score_threshold)
        sel_boxes = bxs[sel]
        sel_coefs = cf[idx][sel]                            # (K, nm)
        m = jax.nn.sigmoid(
            jnp.einsum("kn,hwn->khw", sel_coefs, protos))
        m = crop_masks_to_boxes(m, sel_boxes)
        return sel_boxes, pool_s[sel], m, ok

    b, s, m, v = jax.vmap(one)(scores, boxes, raw.mask_coefs, raw.protos)
    return SegDetections(boxes_xyxy=b, scores=s, masks=m, valid=v)


# ---------------------------------------------------------------------------
# ultralytics converter seam
# ---------------------------------------------------------------------------

# our flax module name → ultralytics model.N layer index
_LAYER_MAP = {
    "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4, "b5": 5, "b6": 6,
    "b7": 7, "b8": 8, "b9": 9, "h12": 12, "h15": 15, "h16": 16,
    "h18": 18, "h19": 19, "h21": 21,
}
_HEAD_LAYER = 22
# yolo11.yaml numbering (C2PSA at 10 shifts the head to 13..22, Pose=23)
_LAYER_MAP11 = {
    "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4, "b5": 5, "b6": 6,
    "b7": 7, "b8": 8, "b9": 9, "b10": 10, "h13": 13, "h16": 16,
    "h17": 17, "h19": 19, "h20": 20, "h22": 22,
}
_HEAD_LAYER11 = 23
# v11 C3k2 layers that are plain Conv/SPPF/C2PSA vs blocks; c3k flags per
# layer for the n/s scales (m/l/x force True — parse_model)
_C3K2_LAYERS11 = {"b2": False, "b4": False, "b6": True, "b8": True,
                  "h13": False, "h16": False, "h19": False, "h22": True}


def _np_of(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _conv_kernel(w):
    # torch (O, I, kh, kw) → flax (kh, kw, I, O)
    return jnp.asarray(_np_of(w).transpose(2, 3, 1, 0))


def _convbn(sd, pre):
    return (
        {"conv": {"kernel": _conv_kernel(sd[f"{pre}.conv.weight"])},
         "bn": {"scale": jnp.asarray(_np_of(sd[f"{pre}.bn.weight"])),
                "bias": jnp.asarray(_np_of(sd[f"{pre}.bn.bias"]))}},
        {"bn": {"mean": jnp.asarray(_np_of(sd[f"{pre}.bn.running_mean"])),
                "var": jnp.asarray(_np_of(sd[f"{pre}.bn.running_var"]))}},
    )


def _c2f(sd, pre, n):
    p, s = {}, {}
    for sub in ("cv1", "cv2"):
        p[sub], s[sub] = _convbn(sd, f"{pre}.{sub}")
    for i in range(n):
        blk_p, blk_s = {}, {}
        for sub in ("cv1", "cv2"):
            blk_p[sub], blk_s[sub] = _convbn(sd, f"{pre}.m.{i}.{sub}")
        p[f"m_{i}"], s[f"m_{i}"] = blk_p, blk_s
    return p, s


def _c3k(sd, pre):
    """C3k (always 2 inner bottlenecks in C3k2's instantiation)."""
    p, s = {}, {}
    for sub in ("cv1", "cv2", "cv3"):
        p[sub], s[sub] = _convbn(sd, f"{pre}.{sub}")
    for j in range(2):
        bp, bs = {}, {}
        for sub in ("cv1", "cv2"):
            bp[sub], bs[sub] = _convbn(sd, f"{pre}.m.{j}.{sub}")
        p[f"m_{j}"], s[f"m_{j}"] = bp, bs
    return p, s


def _c3k2(sd, pre, n, c3k):
    p, s = {}, {}
    for sub in ("cv1", "cv2"):
        p[sub], s[sub] = _convbn(sd, f"{pre}.{sub}")
    for i in range(n):
        if c3k:
            p[f"m_{i}"], s[f"m_{i}"] = _c3k(sd, f"{pre}.m.{i}")
        else:
            bp, bs = {}, {}
            for sub in ("cv1", "cv2"):
                bp[sub], bs[sub] = _convbn(sd, f"{pre}.m.{i}.{sub}")
            p[f"m_{i}"], s[f"m_{i}"] = bp, bs
    return p, s


def _c2psa(sd, pre, n):
    p, s = {}, {}
    for sub in ("cv1", "cv2"):
        p[sub], s[sub] = _convbn(sd, f"{pre}.{sub}")
    for i in range(n):
        bp, bs = {}, {}
        ap, asn = {}, {}
        for sub in ("qkv", "proj", "pe"):
            ap[sub], asn[sub] = _convbn(sd, f"{pre}.m.{i}.attn.{sub}")
        bp["attn"], bs["attn"] = ap, asn
        bp["ffn_0"], bs["ffn_0"] = _convbn(sd, f"{pre}.m.{i}.ffn.0")
        bp["ffn_1"], bs["ffn_1"] = _convbn(sd, f"{pre}.m.{i}.ffn.1")
        p[f"m_{i}"], s[f"m_{i}"] = bp, bs
    return p, s


def convert_ultralytics_pose(state_dict, scale: str = "s",
                             num_keypoints: int = 17, num_classes: int = 1,
                             prefix: str = "model.",
                             version: int = 8) -> dict:
    """ultralytics YOLO-pose ``model.state_dict()`` → flax variables.

    ``version`` selects the architecture generation: 8 (C2f trunk, head
    at model.22) or 11 (C3k2/C2PSA trunk, depthwise-separable cls
    branch, head at model.23 — the reference's ``yolo11{n..x}-pose.pt``
    layouts). Accepts the torch naming (``model.0.conv.weight`` …); pass
    ``prefix=""`` for dicts saved without the wrapping ``model.`` scope.
    Returns ``{"params": …, "batch_stats": …}`` for :class:`YoloPose`.
    The DFL projection conv is fixed (arange) in both frameworks and is
    not a parameter here.
    """
    sd = {k[len(prefix):] if prefix and k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    model = YoloPose(scale=scale, num_keypoints=num_keypoints,
                     num_classes=num_classes, version=version)
    _, n3, n6 = model.widths()
    params, stats = _convert_trunk_and_heads(sd, n3, n6, version, scale)
    return {"params": params, "batch_stats": stats}


def _convert_trunk_and_heads(sd, n3, n6, version=8, scale="s",
                             cv4_branch=True):
    """Shared between the pose/seg/detect converters: trunk + the
    decoupled cv2/cv3 head branches, plus the cv4 branch when present
    (pose keypoints and seg mask-coefs live in the same ``cv4`` slot on
    both sides; plain Detect checkpoints have none)."""
    params: dict = {}
    stats: dict = {}
    if version == 11:
        for name, idx in _LAYER_MAP11.items():
            pre = str(idx)
            if name in _C3K2_LAYERS11:
                c3k = _C3K2_LAYERS11[name] or scale in "mlx"
                params[name], stats[name] = _c3k2(sd, pre, n3, c3k)
            elif name == "b9":                        # SPPF
                p, s = {}, {}
                for sub in ("cv1", "cv2"):
                    p[sub], s[sub] = _convbn(sd, f"{pre}.{sub}")
                params[name], stats[name] = p, s
            elif name == "b10":                       # C2PSA
                params[name], stats[name] = _c2psa(sd, pre, n3)
            else:
                params[name], stats[name] = _convbn(sd, pre)
        head = _HEAD_LAYER11
    else:
        for name, idx in _LAYER_MAP.items():
            pre = str(idx)
            if name in ("b2", "b8", "h12", "h15", "h18", "h21"):
                params[name], stats[name] = _c2f(sd, pre, n3)
            elif name in ("b4", "b6"):
                params[name], stats[name] = _c2f(sd, pre, n6)
            else:  # plain Conv or SPPF
                if f"{pre}.cv1.conv.weight" in sd:        # SPPF (b9)
                    p, s = {}, {}
                    for sub in ("cv1", "cv2"):
                        p[sub], s[sub] = _convbn(sd, f"{pre}.{sub}")
                    params[name], stats[name] = p, s
                else:
                    params[name], stats[name] = _convbn(sd, pre)
        head = _HEAD_LAYER

    # box/pose branches: model.N.{cv2,cv4}.{level}.{0,1,2}
    for branch in (("cv2", "cv4") if cv4_branch else ("cv2",)):
        for li in range(3):
            pre = f"{head}.{branch}.{li}"
            for j in range(2):
                p, s = _convbn(sd, f"{pre}.{j}")
                params[f"{branch}_{li}_{j}"] = p
                stats[f"{branch}_{li}_{j}"] = s
            params[f"{branch}_{li}_2"] = {
                "kernel": _conv_kernel(sd[f"{pre}.2.weight"]),
                "bias": jnp.asarray(_np_of(sd[f"{pre}.2.bias"]))}
    # cls branch: plain (v8 legacy) vs DW-separable pairs (v11)
    for li in range(3):
        pre = f"{head}.cv3.{li}"
        if version == 11:
            for j in range(2):
                for k in range(2):
                    p, s = _convbn(sd, f"{pre}.{j}.{k}")
                    params[f"cv3_{li}_{j}_{k}"] = p
                    stats[f"cv3_{li}_{j}_{k}"] = s
        else:
            for j in range(2):
                p, s = _convbn(sd, f"{pre}.{j}")
                params[f"cv3_{li}_{j}"] = p
                stats[f"cv3_{li}_{j}"] = s
        params[f"cv3_{li}_2"] = {
            "kernel": _conv_kernel(sd[f"{pre}.2.weight"]),
            "bias": jnp.asarray(_np_of(sd[f"{pre}.2.bias"]))}
    return params, stats


def convert_ultralytics_detect(state_dict, scale: str = "s",
                               num_classes: int = 80,
                               prefix: str = "model.",
                               version: int = 8) -> dict:
    """ultralytics plain-Detect ``model.state_dict()`` (``yolo11x.pt``,
    the reference's ``bbox_ckpt`` — yolov11_bbox.py:77) → flax variables
    for :class:`YoloDetect`. Same trunk mapping as the pose converter;
    no cv4 branch exists in this layout."""
    sd = {k[len(prefix):] if prefix and k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    model = YoloDetect(scale=scale, num_classes=num_classes,
                       version=version)
    _, n3, n6 = model.widths()
    params, stats = _convert_trunk_and_heads(sd, n3, n6, version, scale,
                                             cv4_branch=False)
    return {"params": params, "batch_stats": stats}


def convert_ultralytics_seg(state_dict, scale: str = "s",
                            num_classes: int = 1,
                            prefix: str = "model.",
                            version: int = 8) -> dict:
    """ultralytics YOLOv8/11-seg ``model.state_dict()`` → flax variables
    for :class:`YoloSeg`. Same trunk/head mapping as the pose converter
    (cv4 carries mask coefficients here) plus the ``model.N.proto``
    block. The proto upsample is a torch ``ConvTranspose2d`` whose
    kernel must be SPATIALLY FLIPPED for ``lax.conv_transpose`` (which
    does not mirror — same fix as the SAM decoder converter,
    sam_decoder.py:258)."""
    sd = {k[len(prefix):] if prefix and k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    model = YoloSeg(scale=scale, num_classes=num_classes, version=version)
    _, n3, n6 = model.widths()
    params, stats = _convert_trunk_and_heads(sd, n3, n6, version, scale)
    head = _HEAD_LAYER11 if version == 11 else _HEAD_LAYER
    pre = f"{head}.proto"
    proto_p, proto_s = {}, {}
    for sub in ("cv1", "cv2", "cv3"):
        proto_p[sub], proto_s[sub] = _convbn(sd, f"{pre}.{sub}")
    w = _np_of(sd[f"{pre}.upsample.weight"])    # torch (in, out, kh, kw)
    proto_p["upsample"] = {
        "kernel": jnp.asarray(w.transpose(2, 3, 0, 1)[::-1, ::-1]),
        "bias": jnp.asarray(_np_of(sd[f"{pre}.upsample.bias"]))}
    params["proto"] = proto_p
    stats["proto"] = proto_s
    return {"params": params, "batch_stats": stats}


def reference_state_dict_spec(scale: str = "s", num_keypoints: int = 17,
                              num_classes: int = 1,
                              version: int = 8) -> dict:
    """Expected ultralytics state-dict entries → shapes (torch order).

    Ground truth for converter tests when ultralytics itself is not
    installed (the reference consumes it as a pip dep — there is no
    vendored oracle to import): enumerate every tensor a YOLO-pose
    ``model.state_dict()`` contains for this scale/version, so tests can
    build a synthetic checkpoint and assert the converter consumes all
    of it.
    """
    model = YoloPose(scale=scale, num_keypoints=num_keypoints,
                     num_classes=num_classes, version=version)
    ch, n3, n6 = model.widths()
    c1, c2, c3, c4, c5 = ch
    spec: dict = {}

    def convbn(pre, cin, cout, k, groups=1):
        spec[f"{pre}.conv.weight"] = (cout, cin // groups, k, k)
        for suf in ("weight", "bias", "running_mean", "running_var"):
            spec[f"{pre}.bn.{suf}"] = (cout,)

    def c2f(pre, cin, cout, n, k=3):
        c = cout // 2
        convbn(f"{pre}.cv1", cin, 2 * c, 1)
        convbn(f"{pre}.cv2", (2 + n) * c, cout, 1)
        for i in range(n):
            convbn(f"{pre}.m.{i}.cv1", c, c, k)
            convbn(f"{pre}.m.{i}.cv2", c, c, k)

    def c3k2(pre, cin, cout, n, c3k, e):
        c = int(cout * e)
        convbn(f"{pre}.cv1", cin, 2 * c, 1)
        convbn(f"{pre}.cv2", (2 + n) * c, cout, 1)
        for i in range(n):
            if c3k:
                c_ = c // 2
                convbn(f"{pre}.m.{i}.cv1", c, c_, 1)
                convbn(f"{pre}.m.{i}.cv2", c, c_, 1)
                convbn(f"{pre}.m.{i}.cv3", 2 * c_, c, 1)
                for j in range(2):
                    convbn(f"{pre}.m.{i}.m.{j}.cv1", c_, c_, 3)
                    convbn(f"{pre}.m.{i}.m.{j}.cv2", c_, c_, 3)
            else:
                # plain Bottleneck with the ultralytics default e=0.5
                convbn(f"{pre}.m.{i}.cv1", c, c // 2, 3)
                convbn(f"{pre}.m.{i}.cv2", c // 2, c, 3)

    if version == 11:
        mlx = scale in "mlx"
        ck3 = {k: (v or mlx) for k, v in _C3K2_LAYERS11.items()}
        convbn("model.0", 3, c1, 3)
        convbn("model.1", c1, c2, 3)
        c3k2("model.2", c2, c3, n3, ck3["b2"], 0.25)
        convbn("model.3", c3, c3, 3)
        c3k2("model.4", c3, c4, n3, ck3["b4"], 0.25)
        convbn("model.5", c4, c4, 3)
        c3k2("model.6", c4, c4, n3, True, 0.5)
        convbn("model.7", c4, c5, 3)
        c3k2("model.8", c5, c5, n3, True, 0.5)
        convbn("model.9.cv1", c5, c5 // 2, 1)
        convbn("model.9.cv2", 2 * c5, c5, 1)
        # C2PSA at model.10
        c = c5 // 2
        nh = max(1, c // 64)
        hd = c // nh
        kd = int(hd * 0.5)
        convbn("model.10.cv1", c5, 2 * c, 1)
        convbn("model.10.cv2", 2 * c, c5, 1)
        for i in range(n3):
            convbn(f"model.10.m.{i}.attn.qkv", c, c + 2 * kd * nh, 1)
            convbn(f"model.10.m.{i}.attn.proj", c, c, 1)
            convbn(f"model.10.m.{i}.attn.pe", c, c, 3, groups=c)
            convbn(f"model.10.m.{i}.ffn.0", c, 2 * c, 1)
            convbn(f"model.10.m.{i}.ffn.1", 2 * c, c, 1)
        c3k2("model.13", c5 + c4, c4, n3, ck3["h13"], 0.5)
        c3k2("model.16", c4 + c4, c3, n3, ck3["h16"], 0.5)
        convbn("model.17", c3, c3, 3)
        c3k2("model.19", c3 + c4, c4, n3, ck3["h19"], 0.5)
        convbn("model.20", c4, c4, 3)
        c3k2("model.22", c4 + c5, c5, n3, True, 0.5)
        head = _HEAD_LAYER11
    else:
        convbn("model.0", 3, c1, 3)
        convbn("model.1", c1, c2, 3)
        c2f("model.2", c2, c2, n3)
        convbn("model.3", c2, c3, 3)
        c2f("model.4", c3, c3, n6)
        convbn("model.5", c3, c4, 3)
        c2f("model.6", c4, c4, n6)
        convbn("model.7", c4, c5, 3)
        c2f("model.8", c5, c5, n3)
        convbn("model.9.cv1", c5, c5 // 2, 1)
        convbn("model.9.cv2", 2 * c5, c5, 1)
        c2f("model.12", c5 + c4, c4, n3)
        c2f("model.15", c4 + c3, c3, n3)
        convbn("model.16", c3, c3, 3)
        c2f("model.18", c3 + c4, c4, n3)
        convbn("model.19", c4, c4, 3)
        c2f("model.21", c4 + c5, c5, n3)
        head = _HEAD_LAYER

    nk = num_keypoints * 3
    cb = max(16, c3 // 4, 4 * model.reg_max)
    cc = max(c3, min(num_classes, 100))
    ck = max(c3 // 4, nk)
    for li, cin in enumerate((c3, c4, c5)):
        convbn(f"model.{head}.cv2.{li}.0", cin, cb, 3)
        convbn(f"model.{head}.cv2.{li}.1", cb, cb, 3)
        spec[f"model.{head}.cv2.{li}.2.weight"] = \
            (4 * model.reg_max, cb, 1, 1)
        spec[f"model.{head}.cv2.{li}.2.bias"] = (4 * model.reg_max,)
        if version == 11:
            convbn(f"model.{head}.cv3.{li}.0.0", cin, cin, 3, groups=cin)
            convbn(f"model.{head}.cv3.{li}.0.1", cin, cc, 1)
            convbn(f"model.{head}.cv3.{li}.1.0", cc, cc, 3, groups=cc)
            convbn(f"model.{head}.cv3.{li}.1.1", cc, cc, 1)
        else:
            convbn(f"model.{head}.cv3.{li}.0", cin, cc, 3)
            convbn(f"model.{head}.cv3.{li}.1", cc, cc, 3)
        spec[f"model.{head}.cv3.{li}.2.weight"] = (num_classes, cc, 1, 1)
        spec[f"model.{head}.cv3.{li}.2.bias"] = (num_classes,)
        convbn(f"model.{head}.cv4.{li}.0", cin, ck, 3)
        convbn(f"model.{head}.cv4.{li}.1", ck, ck, 3)
        spec[f"model.{head}.cv4.{li}.2.weight"] = (nk, ck, 1, 1)
        spec[f"model.{head}.cv4.{li}.2.bias"] = (nk,)
    return spec


def reference_state_dict_spec_seg(scale: str = "s",
                                  num_classes: int = 1,
                                  version: int = 8) -> dict:
    """Expected ultralytics YOLOv8/11-seg state-dict entries → shapes.
    Trunk + cv2/cv3 are identical to the pose spec; cv4 regresses
    ``nm``-dim mask coefficients and ``model.N.proto`` is added."""
    model = YoloSeg(scale=scale, num_classes=num_classes, version=version)
    ch, _, _ = model.widths()
    c3 = ch[2]
    spec = reference_state_dict_spec(scale=scale, num_classes=num_classes,
                                     version=version)
    head = _HEAD_LAYER11 if version == 11 else _HEAD_LAYER
    # replace the pose cv4 rows with the seg coefficient head
    spec = {k: v for k, v in spec.items() if ".cv4." not in k}
    nm = model.nm
    ck = max(c3 // 4, nm)
    for li, cin in enumerate(ch[2:]):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            spec[f"model.{head}.cv4.{li}.0.bn.{suf}"] = (ck,)
            spec[f"model.{head}.cv4.{li}.1.bn.{suf}"] = (ck,)
        spec[f"model.{head}.cv4.{li}.0.conv.weight"] = (ck, cin, 3, 3)
        spec[f"model.{head}.cv4.{li}.1.conv.weight"] = (ck, ck, 3, 3)
        spec[f"model.{head}.cv4.{li}.2.weight"] = (nm, ck, 1, 1)
        spec[f"model.{head}.cv4.{li}.2.bias"] = (nm,)
    npr = model.proto_channels()
    for pre, cin, cout, k in (("cv1", c3, npr, 3), ("cv2", npr, npr, 3),
                              ("cv3", npr, nm, 1)):
        spec[f"model.{head}.proto.{pre}.conv.weight"] = (cout, cin, k, k)
        for suf in ("weight", "bias", "running_mean", "running_var"):
            spec[f"model.{head}.proto.{pre}.bn.{suf}"] = (cout,)
    spec[f"model.{head}.proto.upsample.weight"] = (npr, npr, 2, 2)
    spec[f"model.{head}.proto.upsample.bias"] = (npr,)
    return spec


def reference_state_dict_spec_detect(scale: str = "s",
                                     num_classes: int = 80,
                                     version: int = 8) -> dict:
    """Expected ultralytics plain-Detect (``yolo11x.pt``) state-dict
    entries → shapes: the pose spec's trunk + cv2/cv3 rows with no cv4
    branch (Detect has only box + class heads)."""
    spec = reference_state_dict_spec(scale=scale, num_classes=num_classes,
                                     version=version)
    return {k: v for k, v in spec.items() if ".cv4." not in k}
