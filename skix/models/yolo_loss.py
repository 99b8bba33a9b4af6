"""YOLO-pose training loss: dense task-aligned assignment + cls/box/DFL/
keypoint terms (reference capability: the ultralytics trainer behind
prepare_dataset/model/yolov11_pose.py:42 — v8PoseLoss semantics).

TPU-first: assignment is one dense (B, A, Ngt) tensor program with
validity masks — no per-image Python, no dynamic shapes. GT comes in
fixed slots (pad Ngt, mask with ``gt_valid``); everything jits once and
batches over the clip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from skix.models.yolo_pose import (RawPredictions, decode_boxes,
                                   decode_keypoints, dfl_expectation)

# COCO-17 OKS sigmas (keypoint evaluation constants, category metadata)
OKS_SIGMAS = jnp.asarray([
    .026, .025, .025, .035, .035, .079, .079, .072, .072, .062, .062,
    .107, .107, .087, .087, .089, .089], jnp.float32)


def box_iou_xyxy(a, b, eps: float = 1e-9):
    """IoU between (..., A, 4) and (..., G, 4) → (..., A, G)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1]))[..., :, None]
    area_b = ((b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]))[..., None, :]
    return inter / (area_a + area_b - inter + eps)


def ciou(pred, gt, eps: float = 1e-9):
    """Complete IoU between matched (..., 4) xyxy boxes → (...,)."""
    lt = jnp.maximum(pred[..., :2], gt[..., :2])
    rb = jnp.minimum(pred[..., 2:], gt[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    wp = pred[..., 2] - pred[..., 0]
    hp = pred[..., 3] - pred[..., 1]
    wg = gt[..., 2] - gt[..., 0]
    hg = gt[..., 3] - gt[..., 1]
    union = wp * hp + wg * hg - inter + eps
    iou = inter / union
    # enclosing box diagonal + center distance
    elt = jnp.minimum(pred[..., :2], gt[..., :2])
    erb = jnp.maximum(pred[..., 2:], gt[..., 2:])
    c2 = jnp.sum((erb - elt) ** 2, -1) + eps
    pc = (pred[..., :2] + pred[..., 2:]) / 2
    gc = (gt[..., :2] + gt[..., 2:]) / 2
    rho2 = jnp.sum((pc - gc) ** 2, -1)
    v = (4 / jnp.pi ** 2) * (jnp.arctan(wg / (hg + eps))
                             - jnp.arctan(wp / (hp + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


def task_aligned_assign(raw: RawPredictions, gt_boxes, gt_cls, gt_valid,
                        topk: int = 10, alpha: float = 0.5,
                        beta: float = 6.0):
    """Dense TAL: align = score^alpha * iou^beta over anchors-in-gt,
    top-k per GT, conflicts resolved by best IoU.

    Returns (assigned_gt (B, A) int, fg (B, A) bool,
    target_scores (B, A, nc)) — all fixed-shape.
    """
    pred_boxes = jax.lax.stop_gradient(decode_boxes(raw))       # (B, A, 4)
    scores = jax.lax.stop_gradient(jax.nn.sigmoid(raw.cls_logits))
    B, A, _ = scores.shape
    G = gt_boxes.shape[1]
    centers = raw.anchors * raw.strides[:, None]                # (A, 2) px

    iou = box_iou_xyxy(pred_boxes, gt_boxes)                    # (B, A, G)
    cls_score = jnp.take_along_axis(
        scores, jnp.broadcast_to(gt_cls[:, None, :], (B, A, G)), axis=-1)
    align = cls_score ** alpha * iou ** beta

    in_gt = ((centers[None, :, None, 0] > gt_boxes[:, None, :, 0])
             & (centers[None, :, None, 0] < gt_boxes[:, None, :, 2])
             & (centers[None, :, None, 1] > gt_boxes[:, None, :, 1])
             & (centers[None, :, None, 1] < gt_boxes[:, None, :, 3]))
    valid = in_gt & gt_valid[:, None, :]
    align = jnp.where(valid, align, 0.0)

    # top-k anchors per GT (over the anchor axis)
    k = min(topk, A)
    thresh = jax.lax.top_k(align.transpose(0, 2, 1), k)[0][..., -1]  # (B,G)
    mask = valid & (align >= jnp.maximum(thresh[:, None, :], 1e-9))

    # conflicts: anchor claimed by several GTs → keep highest IoU
    masked_iou = jnp.where(mask, iou, -1.0)
    assigned = jnp.argmax(masked_iou, axis=-1)                  # (B, A)
    fg = jnp.max(mask, axis=-1)                                 # (B, A)

    # normalized target scores (per-GT max-align scaled to max-IoU)
    pos_align = jnp.where(mask, align, 0.0)
    max_align = pos_align.max(axis=1, keepdims=True)            # (B, 1, G)
    max_iou = jnp.where(mask, iou, 0.0).max(axis=1, keepdims=True)
    norm = pos_align * max_iou / (max_align + 1e-9)             # (B, A, G)
    t = jnp.take_along_axis(norm, assigned[..., None], axis=-1)[..., 0]
    nc = raw.cls_logits.shape[-1]
    cls_onehot = jax.nn.one_hot(
        jnp.take_along_axis(gt_cls, assigned, axis=-1), nc)
    target_scores = cls_onehot * jnp.where(fg, t, 0.0)[..., None]
    return assigned, fg, target_scores


def pose_detection_loss(raw: RawPredictions, gt_boxes, gt_kpts, gt_valid,
                        gt_cls=None, box_w: float = 7.5, cls_w: float = 0.5,
                        dfl_w: float = 1.5, kpt_w: float = 12.0,
                        kobj_w: float = 1.0):
    """Total loss + per-term dict.

    gt_boxes (B, G, 4) xyxy px; gt_kpts (B, G, 17, 3) x, y, vis;
    gt_valid (B, G) bool; gt_cls (B, G) int (default all class 0).
    """
    B, A = raw.cls_logits.shape[:2]
    G = gt_boxes.shape[1]
    if gt_cls is None:
        gt_cls = jnp.zeros((B, G), jnp.int32)
    assigned, fg, target_scores = task_aligned_assign(
        raw, gt_boxes, gt_cls, gt_valid)
    ts_sum = jnp.maximum(target_scores.sum(), 1.0)

    # cls: BCE against the aligned soft targets, over ALL anchors
    logits = raw.cls_logits
    bce = (jnp.maximum(logits, 0) - logits * target_scores
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    loss_cls = bce.sum() / ts_sum

    # gather per-anchor GT
    tb = jnp.take_along_axis(gt_boxes, assigned[..., None], axis=1)  # (B,A,4)
    tk = jnp.take_along_axis(
        gt_kpts, assigned[..., None, None], axis=1)           # (B, A, 17, 3)
    w = jnp.where(fg, target_scores.max(-1), 0.0)             # (B, A)

    # box: CIoU on fg anchors
    pred_boxes = decode_boxes(raw)
    loss_box = (w * (1.0 - ciou(pred_boxes, tb))).sum() / ts_sum

    # DFL: cross-entropy on the two integer bins bracketing the GT dist
    s = raw.strides[None, :, None]
    a = raw.anchors[None]
    gt_ltrb = jnp.concatenate(
        [a - tb[..., :2] / s, tb[..., 2:] / s - a], -1)        # grid units
    reg_max = raw.box_dist.shape[-1]
    gt_ltrb = jnp.clip(gt_ltrb, 0, reg_max - 1 - 0.01)
    lo = jnp.floor(gt_ltrb)
    hi = lo + 1
    wl = hi - gt_ltrb
    logp = jax.nn.log_softmax(raw.box_dist, -1)
    take = lambda idx: jnp.take_along_axis(  # noqa: E731
        logp, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
    dfl = -(take(lo) * wl + take(hi) * (1.0 - wl)).mean(-1)    # (B, A)
    loss_dfl = (w * dfl).sum() / ts_sum

    # keypoints: OKS-style xy loss + visibility BCE on fg anchors
    pk = decode_keypoints(raw)                                 # (B, A, 17, 3)
    area = jnp.clip((tb[..., 2] - tb[..., 0]) * (tb[..., 3] - tb[..., 1]),
                    1e-9)[..., None]
    d2 = jnp.sum((pk[..., :2] - tk[..., :2]) ** 2, -1)
    kpt_mask = tk[..., 2] > 0
    e = d2 / ((2 * OKS_SIGMAS[None, None]) ** 2 * (area + 1e-9) * 2)
    # OKS term saturates (vanishing grad) once a keypoint is far off —
    # the scale-normalized L1 term keeps pulling it back
    l1 = jnp.sqrt(d2 + 1e-9) / jnp.sqrt(area)
    okd = jnp.where(kpt_mask, 1.0 - jnp.exp(-e) + 0.5 * l1, 0.0)
    denom = jnp.maximum(kpt_mask.sum(-1), 1)
    loss_kpt = (w * okd.sum(-1) / denom).sum() / ts_sum

    kl = raw.kpt_raw[..., 2]
    kt = kpt_mask.astype(jnp.float32)
    kbce = (jnp.maximum(kl, 0) - kl * kt
            + jnp.log1p(jnp.exp(-jnp.abs(kl)))).mean(-1)
    loss_kobj = (w * kbce).sum() / ts_sum

    total = (box_w * loss_box + cls_w * loss_cls + dfl_w * loss_dfl
             + kpt_w * loss_kpt + kobj_w * loss_kobj)
    return total, {"cls": loss_cls, "box": loss_box, "dfl": loss_dfl,
                   "kpt": loss_kpt, "kobj": loss_kobj,
                   "num_fg": fg.sum().astype(jnp.float32)}
