"""Cascade Mask R-CNN ViT-Det — the SAM-3D-Body pipeline's human detector.

Reference capability: prepare_side_results/tools/build_detector.py:10
(``HumanDetector`` wraps detectron2's ``cascade_mask_rcnn_vitdet_h_75ep``
LazyConfig and exposes ``run_human_detection`` with class/score filtering,
optional full-image fallback and lexsort box ordering,
build_detector.py:60-97) + tools/cascade_mask_rcnn_vitdet_h_75ep.py
(architecture: plain ViT backbone with decomposed relative-position
windows, SimpleFeaturePyramid, 3 cascade box stages with class-agnostic
regression and per-stage Box2Box weights (10,5)/(20,10)/(30,15)).
The estimator runs it when no precomputed bbox is supplied
(sam_3d_body_estimator.py:110-121).

TPU-first redesign, same discipline as :mod:`skix.models.keypoint_rcnn`
(whose RPN head, anchor grid, delta decoding and multilevel RoIAlign are
reused verbatim): fixed proposal/detection slots with validity masks, all
three cascade stages run on every slot, static shapes throughout. The
decomposed rel-pos bias tables are gathered with a trace-time numpy index
(q/k sizes are static) so the per-window attention stays one fused einsum
chain on the MXU.

Converter: :func:`convert_detectron2_cascade_vitdet` maps the detectron2
``model_final_f05665.pkl``-style state dict (LazyConfig GeneralizedRCNN
names: ``backbone.net.*`` ViT, ``backbone.simfp_*`` pyramid,
``proposal_generator.rpn_head.*``, ``roi_heads.box_head.{k}.*`` /
``box_predictor.{k}.*`` / ``mask_head.*``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.keypoint_rcnn import (
    ANCHOR_RATIOS, ANCHOR_SIZES, apply_deltas, level_anchors,
    multilevel_roi_align)
from skix.ops.nms import nms

# per-stage Box2BoxTransform weights (cascade_mask_rcnn_vitdet_h_75ep.py:
# box_predictors use (w1, w1, w2, w2) for (10,5), (20,10), (30,15))
CASCADE_STAGE_WEIGHTS = ((10.0, 10.0, 5.0, 5.0),
                         (20.0, 20.0, 10.0, 10.0),
                         (30.0, 30.0, 15.0, 15.0))


# ---------------------------------------------------------------------------
# decomposed relative position bias (detectron2 modeling/backbone/utils.py
# get_rel_pos / add_decomposed_rel_pos)
# ---------------------------------------------------------------------------

def rel_pos_index(q_size: int, k_size: int) -> np.ndarray:
    """(q, k) gather index into a (2·max(q,k)−1, C) rel-pos table.

    detectron2 ``get_rel_pos``: relative coords with short-side scaling
    when q_size != k_size. Static sizes → plain numpy at trace time."""
    ratio_q = max(k_size / q_size, 1.0)
    ratio_k = max(q_size / k_size, 1.0)
    q = np.arange(q_size, dtype=np.float64)[:, None] * ratio_q
    k = np.arange(k_size, dtype=np.float64)[None, :] * ratio_k
    rel = q - k + (k_size - 1) * ratio_k
    return rel.astype(np.int64)


def resize_rel_pos(table, target_len: int):
    """Linear-resize a (L, C) rel-pos table to (target_len, C)
    (detectron2 interpolates when 2·max(q,k)−1 != L)."""
    if table.shape[0] == target_len:
        return table
    return jax.image.resize(table, (target_len, table.shape[1]), "linear")


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                           q_hw: Tuple[int, int], k_hw: Tuple[int, int]):
    """attn (B, qh·qw, kh·kw) += decomposed rel-pos bias from q
    (B, qh·qw, C)."""
    qh, qw = q_hw
    kh, kw = k_hw
    Rh = resize_rel_pos(rel_pos_h, 2 * max(qh, kh) - 1)[
        jnp.asarray(rel_pos_index(qh, kh))]                 # (qh, kh, C)
    Rw = resize_rel_pos(rel_pos_w, 2 * max(qw, kw) - 1)[
        jnp.asarray(rel_pos_index(qw, kw))]                 # (qw, kw, C)
    r_q = q.reshape(q.shape[0], qh, qw, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.reshape(-1, qh, qw, kh, kw)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(-1, qh * qw, kh * kw)


class D2Attention(nn.Module):
    """detectron2 ViT attention: fused qkv + decomposed rel-pos bias."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)   # rel-pos table extent

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        B, N, _ = x.shape
        h, w = hw
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * self.num_heads,
                                                   N, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (head_dim ** -0.5)) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim))
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim))
            attn = add_decomposed_rel_pos(attn, q, rel_h, rel_w, (h, w),
                                          (h, w))
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).reshape(B, self.num_heads, N, head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class D2Block(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 0        # 0 = global attention
    mlp_ratio: float = 4.0
    rel_pos_size: int = 14      # table extent = window (or global grid)

    @nn.compact
    def __call__(self, x):
        # x (B, H, W, C)
        from skix.tracking.vitdet import window_partition, window_unpartition

        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            win, pad_hw = window_partition(x, self.window_size)
            hw = (self.window_size, self.window_size)
        else:
            win = x.reshape(B, H * W, C)
            hw = (H, W)
        win = D2Attention(self.dim, self.num_heads,
                          input_size=(self.rel_pos_size, self.rel_pos_size),
                          name="attn")(win, hw)
        if self.window_size > 0:
            x = window_unpartition(win, self.window_size, pad_hw, (H, W))
        else:
            x = win.reshape(B, H, W, C)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y, approximate=False))
        return x + y


class ViTDetD2(nn.Module):
    """detectron2-flavor plain ViT trunk (vit.py ``ViT``): conv patchify,
    bicubic-interpolated absolute positions, windowed blocks with
    decomposed rel-pos, global attention at ``global_indexes``."""

    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    patch_size: int = 16
    window_size: int = 14
    global_indexes: Sequence[int] = (7, 15, 23, 31)
    pretrain_grid: int = 14     # 224 // 16 pos-embed table side

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.pretrain_grid, self.pretrain_grid,
                          self.embed_dim))
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            # d2 get_abs_pos: bicubic resize of the square table
            pos = jax.image.resize(pos, (1, gh, gw, self.embed_dim),
                                   "bicubic")
        x = x + pos
        for i in range(self.depth):
            glob = i in tuple(self.global_indexes)
            x = D2Block(
                self.embed_dim, self.num_heads,
                window_size=0 if glob else self.window_size,
                rel_pos_size=(gh if glob else self.window_size),
                name=f"block{i}")(x)
        return x                                           # (B, gh, gw, C)


class ConvLN(nn.Module):
    """detectron2 Conv2d(..., bias=False, norm=LN) pair."""

    features: int
    kernel: int
    name_prefix: str = "conv"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding="SAME", use_bias=False, name="conv")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class SimpleFeaturePyramid(nn.Module):
    """detectron2 SimpleFeaturePyramid: one stride-16 ViT map → P2..P5
    via deconv/identity/maxpool rescales, each followed by 1×1 + 3×3
    LN convs; P6 = maxpool(P5) (LastLevelMaxPool)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, x):
        # x (B, gh, gw, C) at stride 16
        C = x.shape[-1]
        outs = []
        # scale 4.0 → stride 4: deconv2 + LN + GELU + deconv2
        h = nn.ConvTranspose(C // 2, (2, 2), strides=(2, 2),
                             name="s4_deconv1")(x)
        h = nn.gelu(nn.LayerNorm(epsilon=1e-6, name="s4_ln")(h),
                    approximate=False)
        h = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2),
                             name="s4_deconv2")(h)
        outs.append(h)
        # scale 2.0 → stride 8
        outs.append(nn.ConvTranspose(C // 2, (2, 2), strides=(2, 2),
                                     name="s8_deconv")(x))
        outs.append(x)                                       # stride 16
        outs.append(nn.max_pool(x, (2, 2), strides=(2, 2)))  # stride 32
        feats = []
        for lv, h in zip((2, 3, 4, 5), outs):
            h = ConvLN(self.out_channels, 1, name=f"p{lv}_conv1")(h)
            h = ConvLN(self.out_channels, 3, name=f"p{lv}_conv2")(h)
            feats.append(h)
        feats.append(nn.max_pool(feats[-1], (1, 1), strides=(2, 2),
                                 padding="SAME"))             # P6
        return feats


class D2RPNHead(nn.Module):
    """StandardRPNHead with conv_dims=[-1, -1] (two 3×3 convs — the
    vitdet override in mask_rcnn_vitdet.py)."""

    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats):
        c0 = nn.Conv(256, (3, 3), padding="SAME", name="conv0")
        c1 = nn.Conv(256, (3, 3), padding="SAME", name="conv1")
        obj = nn.Conv(self.num_anchors, (1, 1), name="objectness_logits")
        deltas = nn.Conv(4 * self.num_anchors, (1, 1), name="anchor_deltas")
        outs = []
        for f in feats:
            h = nn.relu(c1(nn.relu(c0(f))))
            outs.append((obj(h), deltas(h)))
        return outs


class CascadeBoxHead(nn.Module):
    """FastRCNNConvFCHead(conv_dims=[256]*4, norm=LN, fc_dims=[1024]) +
    FastRCNNOutputLayers with class-agnostic regression."""

    num_classes: int = 80

    @nn.compact
    def __call__(self, rois):
        h = rois
        for i in range(4):
            h = nn.relu(ConvLN(256, 3, name=f"conv{i + 1}")(h))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(1024, name="fc1")(h))
        scores = nn.Dense(self.num_classes + 1, name="cls_score")(h)
        deltas = nn.Dense(4, name="bbox_pred")(h)   # cls_agnostic_bbox_reg
        return scores, deltas


class MaskHead(nn.Module):
    """MaskRCNNConvUpsampleHead: 4× conv3×3(LN) + deconv ×2 + 1×1
    predictor. The skiing pipeline consumes boxes only
    (build_detector.py:96 returns boxes), but the head keeps the
    published checkpoint layout convertible 1:1."""

    num_classes: int = 80

    @nn.compact
    def __call__(self, rois):
        h = rois
        for i in range(4):
            h = nn.relu(ConvLN(256, 3, name=f"mask_fcn{i + 1}")(h))
        h = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                     name="deconv")(h))
        return nn.Conv(self.num_classes, (1, 1), name="predictor")(h)


class CascadeDetections(NamedTuple):
    boxes_xyxy: jnp.ndarray    # (B, K, 4)
    scores: jnp.ndarray        # (B, K)  — 3-stage mean prob of the class
    classes: jnp.ndarray       # (B, K) int32
    valid: jnp.ndarray         # (B, K) bool
    masks: jnp.ndarray         # (B, K, 28, 28) sigmoid probs of the class


class CascadeMaskRCNN(nn.Module):
    """Fixed-slot cascade inference (detectron2 CascadeROIHeads
    ``_forward_box``): stage k's class-agnostic deltas refine its input
    boxes, which become stage k+1's proposals; final per-class scores are
    the MEAN of the three stages' softmax probabilities; boxes are the
    last stage's."""

    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    patch_size: int = 16
    window_size: int = 14
    global_indexes: Sequence[int] = (7, 15, 23, 31)
    num_classes: int = 80
    pre_nms_topk: int = 256
    post_nms_topk: int = 128
    detections: int = 16
    score_threshold: float = 0.25   # build_detector.py:51 test override
    nms_iou: float = 0.5

    def setup(self):
        self.net = ViTDetD2(self.embed_dim, self.depth, self.num_heads,
                            self.patch_size, self.window_size,
                            self.global_indexes, name="net")
        self.fpn = SimpleFeaturePyramid(name="fpn")
        self.rpn = D2RPNHead(len(ANCHOR_RATIOS), name="rpn_head")
        self.box_heads = [CascadeBoxHead(self.num_classes,
                                         name=f"box_head{k}")
                          for k in range(3)]
        self.mask_head = MaskHead(self.num_classes, name="mask_head")

    def propose(self, rpn_outs, shapes, hw):
        H, W = hw
        all_boxes, all_logits = [], []
        for (obj, deltas), (gh, gw, stride, size) in zip(rpn_outs, shapes):
            A = len(ANCHOR_RATIOS)
            anch = jnp.asarray(level_anchors(gh, gw, stride, size))
            logit = obj.reshape(-1)
            dl = deltas.reshape(gh * gw, A, 4).reshape(-1, 4)
            k = min(self.pre_nms_topk, logit.shape[0])
            top, idx = jax.lax.top_k(logit, k)
            all_boxes.append(apply_deltas(anch[idx], dl[idx]))
            all_logits.append(top)
        boxes = jnp.concatenate(all_boxes, 0)
        logits = jnp.concatenate(all_logits, 0)
        boxes = self._clip(boxes, H, W)
        keep = nms(boxes, logits, 0.7)
        scored = jnp.where(keep, logits, -jnp.inf)
        top, idx = jax.lax.top_k(scored, self.post_nms_topk)
        return boxes[idx]

    @staticmethod
    def _clip(boxes, H, W):
        return jnp.stack([jnp.clip(boxes[:, 0], 0, W),
                          jnp.clip(boxes[:, 1], 0, H),
                          jnp.clip(boxes[:, 2], 0, W),
                          jnp.clip(boxes[:, 3], 0, H)], -1)

    def __call__(self, images) -> CascadeDetections:
        B, H, W, _ = images.shape
        x = (images - jnp.asarray([0.485, 0.456, 0.406])) \
            / jnp.asarray([0.229, 0.224, 0.225])
        feats = self.fpn(self.net(x))
        rpn_outs = self.rpn(feats)
        shapes = [(f.shape[1], f.shape[2], st, sz)
                  for f, st, sz in zip(feats, (4, 8, 16, 32, 64),
                                       ANCHOR_SIZES)]

        def per_image(rpn_i, feats_i):
            boxes = self.propose(rpn_i, shapes, (H, W))
            probs = []
            for k in range(3):
                rois = multilevel_roi_align(feats_i, boxes, 7)
                scores, deltas = self.box_heads[k](rois)
                probs.append(jax.nn.softmax(scores, -1))
                boxes = self._clip(
                    apply_deltas(boxes, deltas, CASCADE_STAGE_WEIGHTS[k]),
                    H, W)
            p = jnp.mean(jnp.stack(probs), 0)[:, :self.num_classes]
            # flattened (box, class) candidates → per-class NMS via a
            # class-offset trick on the fixed detection budget
            best_cls = jnp.argmax(p, -1)
            best_p = jnp.max(p, -1)
            offset = best_cls.astype(jnp.float32)[:, None] \
                * jnp.asarray([4096.0, 4096.0, 4096.0, 4096.0])
            keep = nms(boxes + offset, best_p, self.nms_iou)
            scored = jnp.where(keep, best_p, -jnp.inf)
            top, idx = jax.lax.top_k(scored, self.detections)
            det_boxes = boxes[idx]
            det_cls = best_cls[idx]
            rois = multilevel_roi_align(feats_i, det_boxes, 14)
            mlogit = self.mask_head(rois)            # (K, 28, 28, NC)
            m = jax.nn.sigmoid(jnp.take_along_axis(
                mlogit, det_cls[:, None, None, None], axis=-1))[..., 0]
            ok = jnp.isfinite(top) & (top > self.score_threshold)
            return det_boxes, jnp.where(jnp.isfinite(top), top, 0.0), \
                det_cls, ok, m

        outs = [per_image([(o[b], d[b]) for o, d in rpn_outs],
                          [f[b] for f in feats]) for b in range(B)]
        stack = lambda i: jnp.stack([o[i] for o in outs])  # noqa: E731
        return CascadeDetections(boxes_xyxy=stack(0), scores=stack(1),
                                 classes=stack(2), valid=stack(3),
                                 masks=stack(4))


# ---------------------------------------------------------------------------
# HumanDetector facade (build_detector.py:10-97)
# ---------------------------------------------------------------------------

def postprocess_human_boxes(boxes_xyxy, scores, classes, valid,
                            image_hw: Tuple[int, int],
                            det_cat_id: int = 0, bbox_thr: float = 0.5,
                            default_to_full_image: bool = True) -> np.ndarray:
    """``run_detectron2_vitdet`` post-processing (build_detector.py:60-97):
    keep ``pred_classes == det_cat_id`` above ``bbox_thr``; if none and
    ``default_to_full_image``, one full-image box; lexsort rows by
    (x1 primary, then y1, x2, y2) for a deterministic order."""
    boxes = np.asarray(boxes_xyxy, np.float64)
    ok = (np.asarray(valid, bool) & (np.asarray(classes) == det_cat_id)
          & (np.asarray(scores) > bbox_thr))
    boxes = boxes[ok]
    if len(boxes) == 0:
        if not default_to_full_image:
            return np.zeros((0, 4), np.float64)
        h, w = image_hw
        return np.array([[0, 0, w, h]], np.float64)
    order = np.lexsort((boxes[:, 3], boxes[:, 2], boxes[:, 1], boxes[:, 0]))
    return boxes[order]


class HumanDetector:
    """Reference ``HumanDetector`` semantics over the TPU cascade model.

    ``run_human_detection(img)`` resizes the short edge to
    ``image_size`` capped at ``image_size`` (d2 ResizeShortestEdge
    test-time transform), runs one jitted forward and maps the surviving
    boxes back to original pixels with the reference's ordering."""

    def __init__(self, model: Optional[CascadeMaskRCNN] = None,
                 variables=None, image_size: int = 1024, rng_seed: int = 0):
        self.model = model or CascadeMaskRCNN()
        self.image_size = int(image_size)
        if variables is None:
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, self.image_size, self.image_size, 3)))
        self.variables = variables
        self._fwd = jax.jit(
            lambda v, x: self.model.apply(v, x))

    def _scale(self, h: int, w: int) -> float:
        s = self.image_size / min(h, w)
        if max(h, w) * s > self.image_size:       # max_size cap
            s = self.image_size / max(h, w)
        return s

    def run_human_detection(self, img: np.ndarray, det_cat_id: int = 0,
                            bbox_thr: float = 0.5, nms_thr: float = 0.3,
                            default_to_full_image: bool = True) -> np.ndarray:
        del nms_thr  # NMS threshold is baked into the jitted program
        h, w = img.shape[:2]
        out = self.detect_frames(img[None].astype(np.float32) / 255.0
                                 if img.dtype == np.uint8
                                 else img[None].astype(np.float32))
        return postprocess_human_boxes(
            out.boxes_xyxy[0], out.scores[0], out.classes[0], out.valid[0],
            (h, w), det_cat_id, bbox_thr, default_to_full_image)

    def detect_frames(self, frames: np.ndarray) -> CascadeDetections:
        """(T, H, W, 3) float [0,1] → CascadeDetections in ORIGINAL-image
        pixels; frames resize/pad to one static (image_size, image_size)
        program shape."""
        T, h, w = frames.shape[:3]
        s = self._scale(h, w)
        nh, nw = int(round(h * s)), int(round(w * s))
        x = jax.image.resize(jnp.asarray(frames), (T, nh, nw, 3),
                             "bilinear")
        x = jnp.pad(x, ((0, 0), (0, self.image_size - nh),
                        (0, self.image_size - nw), (0, 0)))
        out = self._fwd(self.variables, x)
        return CascadeDetections(
            boxes_xyxy=np.asarray(out.boxes_xyxy) / s,
            scores=np.asarray(out.scores), classes=np.asarray(out.classes),
            valid=np.asarray(out.valid), masks=np.asarray(out.masks))

    def detect_clip(self, frames_u8: np.ndarray, batch_size: int = 4,
                    det_cat_id: int = 0, bbox_thr: float = 0.5,
                    max_people: int = 4):
        """Clip driver: (T, H, W, 3) uint8 → (T, max_people, 4) boxes +
        (T, max_people) valid — fixed person slots ordered by the
        reference's lexsort."""
        T, h, w = frames_u8.shape[:3]
        boxes = np.zeros((T, max_people, 4), np.float32)
        valid = np.zeros((T, max_people), bool)
        for s0 in range(0, T, batch_size):
            e = min(s0 + batch_size, T)
            fr = frames_u8[s0:e].astype(np.float32) / 255.0
            if e - s0 < batch_size:
                fr = np.pad(fr, ((0, batch_size - (e - s0)), (0, 0),
                                 (0, 0), (0, 0)))
            out = self.detect_frames(fr)
            for i in range(e - s0):
                b = postprocess_human_boxes(
                    out.boxes_xyxy[i], out.scores[i], out.classes[i],
                    out.valid[i], (h, w), det_cat_id, bbox_thr,
                    default_to_full_image=True)[:max_people]
                boxes[s0 + i, :len(b)] = b
                valid[s0 + i, :len(b)] = True
        return boxes, valid


# ---------------------------------------------------------------------------
# converter (detectron2 LazyConfig GeneralizedRCNN state-dict layout)
# ---------------------------------------------------------------------------

def _np_of(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _conv(sd, pre):
    out = {"kernel": jnp.asarray(_np_of(
        sd[f"{pre}.weight"]).transpose(2, 3, 1, 0))}
    if f"{pre}.bias" in sd:
        out["bias"] = jnp.asarray(_np_of(sd[f"{pre}.bias"]))
    return out


def _deconv(sd, pre):
    # torch ConvTranspose2d (I, O, kh, kw) → flax (kh, kw, I, O) + the
    # spatial FLIP (lax.conv_transpose does not mirror — same convention
    # as skix/tracking/sam_decoder.py)
    w = _np_of(sd[f"{pre}.weight"]).transpose(2, 3, 0, 1)[::-1, ::-1]
    out = {"kernel": jnp.asarray(np.ascontiguousarray(w))}
    if f"{pre}.bias" in sd:
        out["bias"] = jnp.asarray(_np_of(sd[f"{pre}.bias"]))
    return out


def _ln(sd, pre):
    return {"scale": jnp.asarray(_np_of(sd[f"{pre}.weight"])),
            "bias": jnp.asarray(_np_of(sd[f"{pre}.bias"]))}


def _dense(sd, pre):
    return {"kernel": jnp.asarray(_np_of(sd[f"{pre}.weight"]).T),
            "bias": jnp.asarray(_np_of(sd[f"{pre}.bias"]))}


def _convln(sd, pre):
    return {"conv": _conv(sd, pre), "norm": _ln(sd, f"{pre}.norm")}


def convert_detectron2_cascade_vitdet(state_dict) -> dict:
    """detectron2 cascade_mask_rcnn_vitdet ``model_final``-style state
    dict → flax variables for :class:`CascadeMaskRCNN`.

    pos_embed: d2 stores a flat ``(1, g²(+1), C)`` token table
    (pretrain_use_cls_token prepends one); the grid square is kept and a
    leading cls token dropped."""
    sd = state_dict
    depth = 1 + max(int(k.split(".")[3])
                    for k in sd if k.startswith("backbone.net.blocks."))
    net: dict = {"patch_embed": _conv(sd, "backbone.net.patch_embed.proj")}
    pe = _np_of(sd["backbone.net.pos_embed"])
    n_tok = pe.shape[1]
    g = int(round(n_tok ** 0.5))
    if g * g != n_tok:                      # leading cls token
        pe = pe[:, 1:]
        g = int(round(pe.shape[1] ** 0.5))
    net["pos_embed"] = jnp.asarray(pe.reshape(1, g, g, -1))
    for i in range(depth):
        pre = f"backbone.net.blocks.{i}"
        net[f"block{i}"] = {
            "norm1": _ln(sd, f"{pre}.norm1"),
            "norm2": _ln(sd, f"{pre}.norm2"),
            "attn": {"qkv": _dense(sd, f"{pre}.attn.qkv"),
                     "proj": _dense(sd, f"{pre}.attn.proj"),
                     "rel_pos_h": jnp.asarray(
                         _np_of(sd[f"{pre}.attn.rel_pos_h"])),
                     "rel_pos_w": jnp.asarray(
                         _np_of(sd[f"{pre}.attn.rel_pos_w"]))},
            "mlp_fc1": _dense(sd, f"{pre}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{pre}.mlp.fc2"),
        }

    # SimpleFeaturePyramid sequential indices per scale
    # (detectron2 fpn.py SimpleFeaturePyramid.__init__):
    #   simfp_2: 0 deconv, 1 LN, 2 GELU, 3 deconv, 4 conv1x1+LN, 5 conv3x3+LN
    #   simfp_3: 0 deconv, 1 conv1x1+LN, 2 conv3x3+LN
    #   simfp_4: 0 conv1x1+LN, 1 conv3x3+LN
    #   simfp_5: 0 maxpool(stateless), 1 conv1x1+LN, 2 conv3x3+LN
    fpn = {
        "s4_deconv1": _deconv(sd, "backbone.simfp_2.0"),
        "s4_ln": _ln(sd, "backbone.simfp_2.1"),
        "s4_deconv2": _deconv(sd, "backbone.simfp_2.3"),
        "p2_conv1": _convln(sd, "backbone.simfp_2.4"),
        "p2_conv2": _convln(sd, "backbone.simfp_2.5"),
        "s8_deconv": _deconv(sd, "backbone.simfp_3.0"),
        "p3_conv1": _convln(sd, "backbone.simfp_3.1"),
        "p3_conv2": _convln(sd, "backbone.simfp_3.2"),
        "p4_conv1": _convln(sd, "backbone.simfp_4.0"),
        "p4_conv2": _convln(sd, "backbone.simfp_4.1"),
        "p5_conv1": _convln(sd, "backbone.simfp_5.1"),
        "p5_conv2": _convln(sd, "backbone.simfp_5.2"),
    }

    rpn = {"conv0": _conv(sd, "proposal_generator.rpn_head.conv.conv0"),
           "conv1": _conv(sd, "proposal_generator.rpn_head.conv.conv1"),
           "objectness_logits": _conv(
               sd, "proposal_generator.rpn_head.objectness_logits"),
           "anchor_deltas": _conv(
               sd, "proposal_generator.rpn_head.anchor_deltas")}

    params: dict = {"net": net, "fpn": fpn, "rpn_head": rpn}
    for k in range(3):
        head = {}
        for c in range(1, 5):
            head[f"conv{c}"] = _convln(sd,
                                       f"roi_heads.box_head.{k}.conv{c}")
        head["fc1"] = _dense(sd, f"roi_heads.box_head.{k}.fc1")
        head["cls_score"] = _dense(sd,
                                   f"roi_heads.box_predictor.{k}.cls_score")
        head["bbox_pred"] = _dense(sd,
                                   f"roi_heads.box_predictor.{k}.bbox_pred")
        params[f"box_head{k}"] = head
    mh = {}
    for c in range(1, 5):
        mh[f"mask_fcn{c}"] = _convln(sd, f"roi_heads.mask_head.mask_fcn{c}")
    mh["deconv"] = _deconv(sd, "roi_heads.mask_head.deconv")
    mh["predictor"] = _conv(sd, "roi_heads.mask_head.predictor")
    params["mask_head"] = mh
    return {"params": params}


def cascade_reference_state_dict_spec(embed_dim: int = 1280,
                                      depth: int = 32,
                                      num_heads: int = 16,
                                      window_size: int = 14,
                                      global_grid: int = 64,
                                      num_classes: int = 80,
                                      global_indexes=(7, 15, 23, 31),
                                      cls_token: bool = True) -> dict:
    """Canonical cascade-vitdet state-dict entries → torch shapes (the
    converter-test oracle; detectron2 is a pip dep of the reference, not
    vendored, and not installed here)."""
    spec: dict = {}
    hd = embed_dim // num_heads

    def conv(pre, cin, cout, k, bias=True):
        spec[f"{pre}.weight"] = (cout, cin, k, k)
        if bias:
            spec[f"{pre}.bias"] = (cout,)

    def deconv(pre, cin, cout, k):
        spec[f"{pre}.weight"] = (cin, cout, k, k)
        spec[f"{pre}.bias"] = (cout,)

    def ln(pre, c):
        spec[f"{pre}.weight"] = (c,)
        spec[f"{pre}.bias"] = (c,)

    def dense(pre, cin, cout):
        spec[f"{pre}.weight"] = (cout, cin)
        spec[f"{pre}.bias"] = (cout,)

    def convln(pre, cin, cout, k):
        conv(pre, cin, cout, k, bias=False)
        ln(f"{pre}.norm", cout)

    conv("backbone.net.patch_embed.proj", 3, embed_dim, 16)
    spec["backbone.net.pos_embed"] = (1, 14 * 14 + (1 if cls_token else 0),
                                      embed_dim)
    for i in range(depth):
        pre = f"backbone.net.blocks.{i}"
        ln(f"{pre}.norm1", embed_dim)
        ln(f"{pre}.norm2", embed_dim)
        dense(f"{pre}.attn.qkv", embed_dim, 3 * embed_dim)
        dense(f"{pre}.attn.proj", embed_dim, embed_dim)
        ext = global_grid if i in tuple(global_indexes) else window_size
        spec[f"{pre}.attn.rel_pos_h"] = (2 * ext - 1, hd)
        spec[f"{pre}.attn.rel_pos_w"] = (2 * ext - 1, hd)
        dense(f"{pre}.mlp.fc1", embed_dim, 4 * embed_dim)
        dense(f"{pre}.mlp.fc2", 4 * embed_dim, embed_dim)
    deconv("backbone.simfp_2.0", embed_dim, embed_dim // 2, 2)
    ln("backbone.simfp_2.1", embed_dim // 2)
    deconv("backbone.simfp_2.3", embed_dim // 2, embed_dim // 4, 2)
    convln("backbone.simfp_2.4", embed_dim // 4, 256, 1)
    convln("backbone.simfp_2.5", 256, 256, 3)
    deconv("backbone.simfp_3.0", embed_dim, embed_dim // 2, 2)
    convln("backbone.simfp_3.1", embed_dim // 2, 256, 1)
    convln("backbone.simfp_3.2", 256, 256, 3)
    convln("backbone.simfp_4.0", embed_dim, 256, 1)
    convln("backbone.simfp_4.1", 256, 256, 3)
    convln("backbone.simfp_5.1", embed_dim, 256, 1)
    convln("backbone.simfp_5.2", 256, 256, 3)
    conv("proposal_generator.rpn_head.conv.conv0", 256, 256, 3)
    conv("proposal_generator.rpn_head.conv.conv1", 256, 256, 3)
    conv("proposal_generator.rpn_head.objectness_logits", 256, 3, 1)
    conv("proposal_generator.rpn_head.anchor_deltas", 256, 12, 1)
    for k in range(3):
        cin = 256
        for c in range(1, 5):
            convln(f"roi_heads.box_head.{k}.conv{c}", cin, 256, 3)
        dense(f"roi_heads.box_head.{k}.fc1", 256 * 7 * 7, 1024)
        dense(f"roi_heads.box_predictor.{k}.cls_score", 1024,
              num_classes + 1)
        dense(f"roi_heads.box_predictor.{k}.bbox_pred", 1024, 4)
    for c in range(1, 5):
        convln(f"roi_heads.mask_head.mask_fcn{c}", 256, 256, 3)
    deconv("roi_heads.mask_head.deconv", 256, 256, 2)
    conv("roi_heads.mask_head.predictor", 256, num_classes, 1)
    return spec
