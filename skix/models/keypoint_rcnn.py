"""Keypoint R-CNN (ResNet-50 FPN) — the D2-slot 2D keypoint source.

Reference capability: prepare_dataset/model/detectron2.py:445
(Detectron2Wrapper drives ``COCO-Keypoints/keypoint_rcnn_R_50_FPN_3x``
via DefaultPredictor and consumes pred_boxes + scores + pred_keypoints
(N, 17, 3)). The reference's ``pt_info`` contract and the triangulation
loader (triangulation/load.py:193) treat this as a source INDEPENDENT of
the YOLO detector; skix mirrors that with this second architecture
family (two-stage, heatmap keypoints) next to the regression-based
:mod:`skix.models.yolo_pose`.

TPU-first redesign of the two-stage pipeline — every data-dependent
quantity becomes a fixed-slot masked tensor:
- proposals: static per-level top-k → fixed-shape NMS → N proposal slots
  with a validity mask (no dynamic instance lists);
- RoIAlign: each box samples ALL FPN levels with one bilinear gather
  program and blends with a one-hot level assignment (a 4× widening of
  a tiny crop beats data-dependent control flow under XLA);
- heads run on every slot, masks kill the padding.
FrozenBatchNorm (detectron2's backbone norm) folds to a per-channel
scale+shift. Converter: :func:`convert_detectron2_keypoint_rcnn` maps a
detectron2 ``model_final.pkl``-style state dict 1:1.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.ops.nms import nms

BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)   # detectron2 box-head weights
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
ANCHOR_SIZES = (32, 64, 128, 256, 512)       # per FPN level P2..P6


class FrozenBN(nn.Module):
    """FrozenBatchNorm2d: constant per-channel affine using stored
    statistics (detectron2 backbone norm — never updated)."""

    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        m = self.param("running_mean", nn.initializers.zeros,
                       (self.features,))
        v = self.param("running_var", nn.initializers.ones,
                       (self.features,))
        scale = w * jax.lax.rsqrt(v + 1e-5)
        return x * scale + (b - m * scale)


class Bottleneck(nn.Module):
    mid: int
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        s = self.stride
        h = nn.Conv(self.mid, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(FrozenBN(self.mid, name="conv1_norm")(h))
        h = nn.Conv(self.mid, (3, 3), strides=(s, s), padding="SAME",
                    use_bias=False, name="conv2")(h)
        h = nn.relu(FrozenBN(self.mid, name="conv2_norm")(h))
        h = nn.Conv(self.out, (1, 1), use_bias=False, name="conv3")(h)
        h = FrozenBN(self.out, name="conv3_norm")(h)
        if x.shape[-1] != self.out or s != 1:
            x = nn.Conv(self.out, (1, 1), strides=(s, s), use_bias=False,
                        name="shortcut")(x)
            x = FrozenBN(self.out, name="shortcut_norm")(x)
        return nn.relu(x + h)


class ResNet50FPN(nn.Module):
    """ResNet-50 trunk + FPN → {P2, P3, P4, P5} (256ch) and P6."""

    fpn_dim: int = 256

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="stem_conv1")(x)
        h = nn.relu(FrozenBN(64, name="stem_norm")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        for si, (n_blocks, mid, out) in enumerate(
                ((3, 64, 256), (4, 128, 512), (6, 256, 1024),
                 (3, 512, 2048))):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = Bottleneck(mid, out, stride,
                               name=f"res{si + 2}_{bi}")(h)
            feats.append(h)
        c2, c3, c4, c5 = feats
        d = self.fpn_dim
        l5 = nn.Conv(d, (1, 1), name="fpn_lateral5")(c5)
        l4 = nn.Conv(d, (1, 1), name="fpn_lateral4")(c4)
        l3 = nn.Conv(d, (1, 1), name="fpn_lateral3")(c3)
        l2 = nn.Conv(d, (1, 1), name="fpn_lateral2")(c2)

        def up2(t, like):
            B, H, W, C = like.shape
            return jax.image.resize(t, (B, H, W, C), "nearest")

        m5 = l5
        m4 = l4 + up2(m5, l4)
        m3 = l3 + up2(m4, l3)
        m2 = l2 + up2(m3, l2)
        p5 = nn.Conv(d, (3, 3), padding="SAME", name="fpn_output5")(m5)
        p4 = nn.Conv(d, (3, 3), padding="SAME", name="fpn_output4")(m4)
        p3 = nn.Conv(d, (3, 3), padding="SAME", name="fpn_output3")(m3)
        p2 = nn.Conv(d, (3, 3), padding="SAME", name="fpn_output2")(m2)
        p6 = nn.max_pool(p5, (1, 1), strides=(2, 2))
        return (p2, p3, p4, p5, p6)


class RPNHead(nn.Module):
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(256, (3, 3), padding="SAME", name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), name="objectness_logits")
        deltas = nn.Conv(4 * self.num_anchors, (1, 1), name="anchor_deltas")
        outs = []
        for f in feats:
            h = nn.relu(conv(f))
            outs.append((obj(h), deltas(h)))
        return outs


def level_anchors(gh: int, gw: int, stride: int, size: float,
                  ratios=ANCHOR_RATIOS) -> np.ndarray:
    """(gh*gw*A, 4) xyxy anchors for one level.

    Centers at ``x * stride`` — detectron2's DefaultAnchorGenerator
    default is ``offset=0.0`` (anchor_generator.py), and a converted
    RPN's anchor_deltas were regressed against THOSE anchors; a +0.5
    cell offset would displace every decoded proposal by stride/2."""
    ys = np.arange(gh, dtype=np.float32) * stride
    xs = np.arange(gw, dtype=np.float32) * stride
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    boxes = []
    for r in ratios:
        w = size * np.sqrt(1.0 / r)
        h = size * np.sqrt(r)
        boxes.append(np.stack([cx - w / 2, cy - h / 2,
                               cx + w / 2, cy + h / 2], -1))
    return np.stack(boxes, 2).reshape(-1, 4).astype(np.float32)


def apply_deltas(anchors, deltas, weights=(1.0, 1.0, 1.0, 1.0),
                 clip: float = 4.135):
    """Standard (dx, dy, dw, dh) box regression (detectron2
    Box2BoxTransform; clip = log(1000/16))."""
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) / 2
    ay = (anchors[..., 1] + anchors[..., 3]) / 2
    dx, dy, dw, dh = (deltas[..., 0] / wx, deltas[..., 1] / wy,
                      jnp.minimum(deltas[..., 2] / ww, clip),
                      jnp.minimum(deltas[..., 3] / wh, clip))
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def roi_align(feat, boxes, out_size: int, stride: int):
    """RoIAlign(aligned=True) with one bilinear sample per bin center.

    feat (H, W, C); boxes (N, 4) xyxy pixels → (N, S, S, C). Static
    shapes; vmapped over boxes.
    """
    H, W, C = feat.shape
    S = out_size

    def one(b):
        x0, y0, x1, y1 = b[0], b[1], b[2], b[3]
        bw = jnp.maximum((x1 - x0) / S, 1e-6)
        bh = jnp.maximum((y1 - y0) / S, 1e-6)
        # bin centers in feature coords (aligned=True → -0.5 offset)
        xs = (x0 + (jnp.arange(S) + 0.5) * bw) / stride - 0.5
        ys = (y0 + (jnp.arange(S) + 0.5) * bh) / stride - 0.5
        x0i = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
        y0i = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
        fx = jnp.clip(xs - x0i, 0.0, 1.0)
        fy = jnp.clip(ys - y0i, 0.0, 1.0)
        g00 = feat[y0i[:, None], x0i[None, :]]
        g01 = feat[y0i[:, None], x0i[None, :] + 1]
        g10 = feat[y0i[:, None] + 1, x0i[None, :]]
        g11 = feat[y0i[:, None] + 1, x0i[None, :] + 1]
        wx = fx[None, :, None]
        wy = fy[:, None, None]
        return (g00 * (1 - wx) * (1 - wy) + g01 * wx * (1 - wy)
                + g10 * (1 - wx) * wy + g11 * wx * wy)

    return jax.vmap(one)(boxes)


def multilevel_roi_align(feats: Sequence, boxes, out_size: int,
                         strides=(4, 8, 16, 32)):
    """Sample every level, blend by the canonical level assignment
    k = floor(4 + log2(sqrt(area)/224)) clamped to [2, 5]."""
    area = jnp.clip((boxes[:, 2] - boxes[:, 0])
                    * (boxes[:, 3] - boxes[:, 1]), 1e-6)
    k = jnp.floor(4.0 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-9))
    k = jnp.clip(k, 2, 5).astype(jnp.int32) - 2          # 0..3
    onehot = jax.nn.one_hot(k, 4)                        # (N, 4)
    crops = jnp.stack([roi_align(f, boxes, out_size, s)
                       for f, s in zip(feats[:4], strides)])  # (4,N,S,S,C)
    return jnp.einsum("lnhwc,nl->nhwc", crops, onehot)


class BoxHead(nn.Module):
    """2-FC head + predictors (detectron2 FastRCNNConvFCHead +
    FastRCNNOutputLayers; num_classes=1 → cls_score has 2 logits)."""

    num_classes: int = 1

    @nn.compact
    def __call__(self, rois):
        h = rois.reshape(rois.shape[0], -1)
        h = nn.relu(nn.Dense(1024, name="fc1")(h))
        h = nn.relu(nn.Dense(1024, name="fc2")(h))
        scores = nn.Dense(self.num_classes + 1, name="cls_score")(h)
        deltas = nn.Dense(4 * self.num_classes, name="bbox_pred")(h)
        return scores, deltas


class KeypointHead(nn.Module):
    """8× conv3x3(512) → deconv ×2 → bilinear ×2 → (N, 56, 56, 17)."""

    num_keypoints: int = 17

    @nn.compact
    def __call__(self, rois):
        h = rois
        for i in range(8):
            h = nn.relu(nn.Conv(512, (3, 3), padding="SAME",
                                name=f"conv_fcn{i + 1}")(h))
        h = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding=[(1, 1), (1, 1)],
                             name="score_lowres")(h)
        N, H, W, K = h.shape
        return jax.image.resize(h, (N, 2 * H, 2 * W, K), "bilinear")


class KeypointRCNNOutputs(NamedTuple):
    boxes_xyxy: jnp.ndarray   # (B, K, 4)
    scores: jnp.ndarray       # (B, K)
    keypoints: jnp.ndarray    # (B, K, 17, 3) x, y, prob
    valid: jnp.ndarray        # (B, K) bool


class KeypointRCNN(nn.Module):
    """Full two-stage model. ``__call__`` runs backbone+RPN+heads at
    fixed slot counts; see also ``backbone_forward`` / ``heads_on_boxes``
    for the training path (GT boxes as proposals, detectron2's keypoint
    head training regime)."""

    num_keypoints: int = 17
    pre_nms_topk: int = 256       # per level
    post_nms_topk: int = 64       # proposal slots
    detections: int = 8           # output slots
    score_threshold: float = 0.7  # reference score_thresh (detectron2.py:47)
    nms_iou: float = 0.5

    def setup(self):
        self.backbone = ResNet50FPN(name="backbone")
        self.rpn = RPNHead(len(ANCHOR_RATIOS), name="rpn_head")
        self.box_head = BoxHead(1, name="box_head")
        self.kpt_head = KeypointHead(self.num_keypoints, name="kpt_head")

    def propose(self, rpn_outs, shapes):
        """Per-image proposal slots from RPN outputs (single image —
        vmapped by the caller). Returns (P, 4) boxes + (P,) logits."""
        all_boxes, all_logits = [], []
        for (obj, deltas), (gh, gw, stride, size) in zip(rpn_outs, shapes):
            A = len(ANCHOR_RATIOS)
            anch = jnp.asarray(level_anchors(gh, gw, stride, size))
            logit = obj.reshape(-1)
            dl = deltas.reshape(gh * gw, A, 4).reshape(-1, 4)
            k = min(self.pre_nms_topk, logit.shape[0])
            top, idx = jax.lax.top_k(logit, k)
            boxes = apply_deltas(anch[idx], dl[idx])
            all_boxes.append(boxes)
            all_logits.append(top)
        boxes = jnp.concatenate(all_boxes, 0)
        logits = jnp.concatenate(all_logits, 0)
        keep = nms(boxes, logits, 0.7)
        scored = jnp.where(keep, logits, -jnp.inf)
        top, idx = jax.lax.top_k(scored, self.post_nms_topk)
        return boxes[idx], top

    def __call__(self, images) -> KeypointRCNNOutputs:
        B, H, W, _ = images.shape
        x = (images - jnp.asarray([0.485, 0.456, 0.406])) \
            / jnp.asarray([0.229, 0.224, 0.225])
        feats = self.backbone(x)
        rpn_outs = self.rpn(feats)
        shapes = [(f.shape[1], f.shape[2], st, sz)
                  for f, st, sz in zip(feats, (4, 8, 16, 32, 64),
                                       ANCHOR_SIZES)]

        def per_image(args):
            rpn_i, feats_i = args
            props, _ = self.propose(rpn_i, shapes)
            props = jnp.stack([jnp.clip(props[:, 0], 0, W),
                               jnp.clip(props[:, 1], 0, H),
                               jnp.clip(props[:, 2], 0, W),
                               jnp.clip(props[:, 3], 0, H)], -1)
            rois = multilevel_roi_align(feats_i, props, 7)
            scores, deltas = self.box_head(rois)
            p = jax.nn.softmax(scores, -1)[:, 0]        # person prob
            boxes = apply_deltas(props, deltas, BBOX_REG_WEIGHTS)
            boxes = jnp.stack([jnp.clip(boxes[:, 0], 0, W),
                               jnp.clip(boxes[:, 1], 0, H),
                               jnp.clip(boxes[:, 2], 0, W),
                               jnp.clip(boxes[:, 3], 0, H)], -1)
            keep = nms(boxes, p, self.nms_iou)
            scored = jnp.where(keep, p, -jnp.inf)
            top, idx = jax.lax.top_k(scored, self.detections)
            det_boxes = boxes[idx]
            krois = multilevel_roi_align(feats_i, det_boxes, 14)
            heat = self.kpt_head(krois)                 # (K, 56, 56, 17)
            kpts = decode_keypoint_heatmaps(heat, det_boxes)
            ok = top > self.score_threshold
            return det_boxes, jnp.where(jnp.isfinite(top), top, 0.0), \
                kpts, ok

        # manual loop over the (small, static) batch: flax modules can't
        # be closed over by lax control flow; B is the clip chunk size
        outs = [per_image(([(o[b], d[b]) for o, d in rpn_outs],
                           [f[b] for f in feats])) for b in range(B)]
        stack = lambda i: jnp.stack([o[i] for o in outs])  # noqa: E731
        return KeypointRCNNOutputs(boxes_xyxy=stack(0), scores=stack(1),
                                   keypoints=stack(2), valid=stack(3))

    # ---------------- training path ----------------

    def backbone_forward(self, images):
        x = (images - jnp.asarray([0.485, 0.456, 0.406])) \
            / jnp.asarray([0.229, 0.224, 0.225])
        feats = self.backbone(x)
        return feats, self.rpn(feats)

    def heads_on_boxes(self, feats, boxes):
        """Box + keypoint heads on given (B, N, 4) boxes (training with
        GT proposals). Returns (scores, deltas, heatmaps)."""
        B, N, _ = boxes.shape

        def one(args):
            feats_i, boxes_i = args
            rois = multilevel_roi_align(feats_i, boxes_i, 7)
            scores, deltas = self.box_head(rois)
            krois = multilevel_roi_align(feats_i, boxes_i, 14)
            heat = self.kpt_head(krois)
            return scores, deltas, heat

        outs = [one(([f[b] for f in feats], boxes[b])) for b in range(B)]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]),
                jnp.stack([o[2] for o in outs]))


def decode_keypoint_heatmaps(heat, boxes):
    """(N, S, S, 17) logits + (N, 4) boxes → (N, 17, 3) x, y, prob
    (detectron2 heatmaps_to_keypoints: argmax bin center → box coords)."""
    N, S, _, K = heat.shape
    flat = heat.transpose(0, 3, 1, 2).reshape(N, K, S * S)
    prob = jax.nn.softmax(flat, -1)
    idx = jnp.argmax(flat, -1)
    py = (idx // S).astype(jnp.float32) + 0.5
    px = (idx % S).astype(jnp.float32) + 0.5
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)[:, None]
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)[:, None]
    x = boxes[:, 0][:, None] + px / S * w
    y = boxes[:, 1][:, None] + py / S * h
    p = jnp.take_along_axis(prob, idx[..., None], -1)[..., 0]
    return jnp.stack([x, y, p], -1)


def keypoint_head_loss(heat, boxes, gt_kpts, valid):
    """Spatial-softmax CE at the GT keypoint's bin (detectron2
    keypoint_rcnn_loss). heat (B, N, S, S, 17); boxes/gt in pixels."""
    B, N, S, _, K = heat.shape
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    gx = (gt_kpts[..., 0] - boxes[..., 0][..., None]) / w[..., None] * S
    gy = (gt_kpts[..., 1] - boxes[..., 1][..., None]) / h[..., None] * S
    inside = ((gx >= 0) & (gx < S) & (gy >= 0) & (gy < S)
              & (gt_kpts[..., 2] > 0) & valid[..., None])
    xi = jnp.clip(gx.astype(jnp.int32), 0, S - 1)
    yi = jnp.clip(gy.astype(jnp.int32), 0, S - 1)
    flat = heat.transpose(0, 1, 4, 2, 3).reshape(B, N, K, S * S)
    logp = jax.nn.log_softmax(flat, -1)
    tgt = yi * S + xi
    ce = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
    denom = jnp.maximum(inside.sum(), 1)
    return jnp.where(inside, ce, 0.0).sum() / denom


def box_head_loss(scores, deltas, proposals, gt_boxes, valid):
    """Softmax CE (person vs background on padded slots) + smooth-L1 on
    the regression deltas for valid slots."""
    labels = jnp.where(valid, 0, 1)                     # 0=person, 1=bg
    ce = -jnp.take_along_axis(jax.nn.log_softmax(scores, -1),
                              labels[..., None], -1)[..., 0].mean()
    wx, wy, ww, wh = BBOX_REG_WEIGHTS
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], 1e-6)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], 1e-6)
    px = (proposals[..., 0] + proposals[..., 2]) / 2
    py = (proposals[..., 1] + proposals[..., 3]) / 2
    gw = jnp.maximum(gt_boxes[..., 2] - gt_boxes[..., 0], 1e-6)
    gh = jnp.maximum(gt_boxes[..., 3] - gt_boxes[..., 1], 1e-6)
    gx = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2
    gy = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2
    tgt = jnp.stack([wx * (gx - px) / pw, wy * (gy - py) / ph,
                     ww * jnp.log(gw / pw), wh * jnp.log(gh / ph)], -1)
    d = jnp.abs(deltas - tgt)
    sl1 = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5).sum(-1)
    denom = jnp.maximum(valid.sum(), 1)
    return ce + jnp.where(valid, sl1, 0.0).sum() / denom


# ---------------------------------------------------------------------------
# detectron2 converter seam
# ---------------------------------------------------------------------------

def _np_of(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _conv(sd, pre):
    return {"kernel": jnp.asarray(_np_of(
        sd[f"{pre}.weight"]).transpose(2, 3, 1, 0)),
        **({"bias": jnp.asarray(_np_of(sd[f"{pre}.bias"]))}
           if f"{pre}.bias" in sd else {})}


def _norm(sd, pre):
    return {k: jnp.asarray(_np_of(sd[f"{pre}.{k}"]))
            for k in ("weight", "bias", "running_mean", "running_var")}


def _dense(sd, pre):
    return {"kernel": jnp.asarray(_np_of(sd[f"{pre}.weight"]).T),
            "bias": jnp.asarray(_np_of(sd[f"{pre}.bias"]))}


def convert_detectron2_keypoint_rcnn(state_dict) -> dict:
    """detectron2 keypoint_rcnn_R_50_FPN state dict → flax variables.

    Canonical names per detectron2's GeneralizedRCNN: ``backbone.
    bottom_up.*`` / ``backbone.fpn_*``, ``proposal_generator.rpn_head.*``,
    ``roi_heads.box_head.*``/``box_predictor.*``/``keypoint_head.*``.
    The keypoint head's deconv kernel is spatially FLIPPED — torch's
    ConvTranspose2d cross-correlates the *output* grad while
    lax.conv_transpose mirrors the kernel (same convention as the SAM
    mask-decoder converter, skix/tracking/sam_decoder.py).
    """
    sd = state_dict
    bb: dict = {
        "stem_conv1": _conv(sd, "backbone.bottom_up.stem.conv1"),
        "stem_norm": _norm(sd, "backbone.bottom_up.stem.conv1.norm"),
    }
    for si, n_blocks in enumerate((3, 4, 6, 3)):
        for bi in range(n_blocks):
            pre = f"backbone.bottom_up.res{si + 2}.{bi}"
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = _conv(sd, f"{pre}.conv{ci}")
                blk[f"conv{ci}_norm"] = _norm(sd, f"{pre}.conv{ci}.norm")
            if f"{pre}.shortcut.weight" in sd:
                blk["shortcut"] = _conv(sd, f"{pre}.shortcut")
                blk["shortcut_norm"] = _norm(sd, f"{pre}.shortcut.norm")
            bb[f"res{si + 2}_{bi}"] = blk
    for lv in (2, 3, 4, 5):
        bb[f"fpn_lateral{lv}"] = _conv(sd, f"backbone.fpn_lateral{lv}")
        bb[f"fpn_output{lv}"] = _conv(sd, f"backbone.fpn_output{lv}")

    rpn = {"conv": _conv(sd, "proposal_generator.rpn_head.conv"),
           "objectness_logits": _conv(
               sd, "proposal_generator.rpn_head.objectness_logits"),
           "anchor_deltas": _conv(
               sd, "proposal_generator.rpn_head.anchor_deltas")}

    box = {"fc1": _dense(sd, "roi_heads.box_head.fc1"),
           "fc2": _dense(sd, "roi_heads.box_head.fc2"),
           "cls_score": _dense(sd, "roi_heads.box_predictor.cls_score"),
           "bbox_pred": _dense(sd, "roi_heads.box_predictor.bbox_pred")}

    kpt: dict = {}
    for i in range(8):
        kpt[f"conv_fcn{i + 1}"] = _conv(
            sd, f"roi_heads.keypoint_head.conv_fcn{i + 1}")
    w = _np_of(sd["roi_heads.keypoint_head.score_lowres.weight"])
    # torch deconv (I, O, kh, kw) → flax (kh, kw, I, O), spatial flip
    kpt["score_lowres"] = {
        "kernel": jnp.asarray(w.transpose(2, 3, 0, 1)[::-1, ::-1]),
        "bias": jnp.asarray(_np_of(
            sd["roi_heads.keypoint_head.score_lowres.bias"]))}

    return {"params": {"backbone": bb, "rpn_head": rpn, "box_head": box,
                       "kpt_head": kpt}}


def reference_state_dict_spec(num_keypoints: int = 17) -> dict:
    """Canonical detectron2 keypoint-rcnn state-dict entries → shapes
    (torch order) — the converter-test oracle, since detectron2 is a pip
    dep the reference does not vendor."""
    spec: dict = {}

    def conv(pre, cin, cout, k, bias=True):
        spec[f"{pre}.weight"] = (cout, cin, k, k)
        if bias:
            spec[f"{pre}.bias"] = (cout,)

    def norm(pre, c):
        for s in ("weight", "bias", "running_mean", "running_var"):
            spec[f"{pre}.{s}"] = (c,)

    def convnorm(pre, cin, cout, k):
        conv(pre, cin, cout, k, bias=False)
        norm(f"{pre}.norm", cout)

    convnorm("backbone.bottom_up.stem.conv1", 3, 64, 7)
    cin = 64
    for si, (n_blocks, mid, cout) in enumerate(
            ((3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048))):
        for bi in range(n_blocks):
            pre = f"backbone.bottom_up.res{si + 2}.{bi}"
            convnorm(f"{pre}.conv1", cin, mid, 1)
            convnorm(f"{pre}.conv2", mid, mid, 3)
            convnorm(f"{pre}.conv3", mid, cout, 1)
            if bi == 0:
                convnorm(f"{pre}.shortcut", cin, cout, 1)
            cin = cout
    for lv, c in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lv}", c, 256, 1)
        conv(f"backbone.fpn_output{lv}", 256, 256, 3)
    conv("proposal_generator.rpn_head.conv", 256, 256, 3)
    conv("proposal_generator.rpn_head.objectness_logits", 256, 3, 1)
    conv("proposal_generator.rpn_head.anchor_deltas", 256, 12, 1)
    spec["roi_heads.box_head.fc1.weight"] = (1024, 256 * 7 * 7)
    spec["roi_heads.box_head.fc1.bias"] = (1024,)
    spec["roi_heads.box_head.fc2.weight"] = (1024, 1024)
    spec["roi_heads.box_head.fc2.bias"] = (1024,)
    spec["roi_heads.box_predictor.cls_score.weight"] = (2, 1024)
    spec["roi_heads.box_predictor.cls_score.bias"] = (2,)
    spec["roi_heads.box_predictor.bbox_pred.weight"] = (4, 1024)
    spec["roi_heads.box_predictor.bbox_pred.bias"] = (4,)
    cin = 256
    for i in range(8):
        conv(f"roi_heads.keypoint_head.conv_fcn{i + 1}", cin, 512, 3)
        cin = 512
    spec["roi_heads.keypoint_head.score_lowres.weight"] = (
        512, num_keypoints, 4, 4)
    spec["roi_heads.keypoint_head.score_lowres.bias"] = (num_keypoints,)
    return spec
