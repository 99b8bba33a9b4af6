"""Single-stage anchor-free person + pose detector (Flax).

Capability parity with the reference's perception tier
(prepare_dataset/model/yolov11_pose.py / yolov11_bbox.py / yolov11_mask.py
and detectron2.py — ultralytics/detectron2 wrappers producing per-frame
person bboxes, 17 COCO keypoints with confidences, and masks).

TPU-first design: a CenterNet-style anchor-free head — conv backbone at
1/8 resolution, per-cell outputs {objectness, bbox (l,t,r,b), 17×(dx,dy,
conf) keypoint offsets, mask logits} — decoded with a fixed top-K argmax +
NMS (skix.ops.nms) into the padded ``(N, …)`` detection arrays that
skix.perception.selection consumes. Everything static-shape under one jit;
the whole clip batches through the forward.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from skix.ops.nms import nms


class ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="norm")(h)
        return nn.silu(h)


class PoseDetections(NamedTuple):
    boxes_cxcywh: jnp.ndarray  # (B, K, 4) pixels
    scores: jnp.ndarray        # (B, K) objectness
    keypoints: jnp.ndarray     # (B, K, 17, 3) x, y, conf (pixels)
    valid: jnp.ndarray         # (B, K) bool
    mask_logits: jnp.ndarray   # (B, H/8, W/8) person-mask logits


class PoseDetector(nn.Module):
    """Image (B, H, W, 3) in [0,1] → top-K padded person detections."""

    width: int = 64
    depth: int = 4
    num_keypoints: int = 17
    top_k: int = 8
    score_threshold: float = 0.3
    nms_iou: float = 0.6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images) -> PoseDetections:
        B, H, W, _ = images.shape
        x = (images - 0.5) / 0.5
        h = ConvBlock(self.width, 2, self.dtype, name="stem1")(x.astype(self.dtype))
        h = ConvBlock(self.width, 2, self.dtype, name="stem2")(h)
        h = ConvBlock(2 * self.width, 2, self.dtype, name="stem3")(h)
        for i in range(self.depth):
            h = h + ConvBlock(2 * self.width, 1, self.dtype,
                              name=f"res_{i}")(h)
        h = h.astype(jnp.float32)
        gh, gw = h.shape[1], h.shape[2]
        stride = H / gh

        obj = nn.Conv(1, (3, 3), padding="SAME", name="obj_head")(h)[..., 0]
        ltrb = nn.softplus(nn.Conv(4, (3, 3), padding="SAME",
                                   name="box_head")(h)) * stride
        kpt = nn.Conv(self.num_keypoints * 3, (3, 3), padding="SAME",
                      name="kpt_head")(h)
        kpt = kpt.reshape(B, gh, gw, self.num_keypoints, 3)
        mask_logits = nn.Conv(1, (3, 3), padding="SAME",
                              name="mask_head")(h)[..., 0]

        # decode: cell centers + offsets
        ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * stride
        cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
        flat_scores = jax.nn.sigmoid(obj).reshape(B, gh * gw)
        x1 = (cx - ltrb[..., 0]).reshape(B, -1)
        y1 = (cy - ltrb[..., 1]).reshape(B, -1)
        x2 = (cx + ltrb[..., 2]).reshape(B, -1)
        y2 = (cy + ltrb[..., 3]).reshape(B, -1)
        kx = (cx[..., None] + kpt[..., 0] * stride).reshape(B, -1, self.num_keypoints)
        ky = (cy[..., None] + kpt[..., 1] * stride).reshape(B, -1, self.num_keypoints)
        kc = jax.nn.sigmoid(kpt[..., 2]).reshape(B, -1, self.num_keypoints)

        K = self.top_k

        def decode_one(sc, bx1, by1, bx2, by2, kxx, kyy, kcc):
            top_s, idx = jax.lax.top_k(sc, K)
            boxes_xyxy = jnp.stack([bx1[idx], by1[idx], bx2[idx], by2[idx]],
                                   axis=-1)
            keep = nms(boxes_xyxy, top_s, self.nms_iou)
            ok = keep & (top_s > self.score_threshold)
            cxy = jnp.stack([(boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) / 2,
                             (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) / 2,
                             boxes_xyxy[:, 2] - boxes_xyxy[:, 0],
                             boxes_xyxy[:, 3] - boxes_xyxy[:, 1]], axis=-1)
            kp = jnp.stack([kxx[idx], kyy[idx], kcc[idx]], axis=-1)
            return cxy, top_s, kp, ok

        boxes, scores, kps, valid = jax.vmap(decode_one)(
            flat_scores, x1, y1, x2, y2, kx, ky, kc)
        return PoseDetections(boxes_cxcywh=boxes, scores=scores,
                              keypoints=kps, valid=valid,
                              mask_logits=mask_logits)


def detect_clip(model: PoseDetector, variables, frames_u8, batch_size: int = 8):
    """Whole-clip detection → padded arrays for selection:
    (boxes (T,K,4) cxcywh, keypoints (T,K,17,3), det_valid (T,K),
    scores (T,K))."""
    import numpy as np

    T = frames_u8.shape[0]
    from skix.utils.jitapply import apply_model
    fwd = lambda v, x: apply_model(model, None, v, x)  # noqa: E731
    boxes, kpts, valid, scores = [], [], [], []
    for s in range(0, T, batch_size):
        e = min(s + batch_size, T)
        chunk = jnp.asarray(frames_u8[s:e], jnp.float32) / 255.0
        pad = batch_size - (e - s)
        if pad:
            chunk = jnp.pad(chunk, ((0, pad), (0, 0), (0, 0), (0, 0)))
        det = fwd(variables, chunk)
        n = e - s
        boxes.append(np.asarray(det.boxes_cxcywh[:n]))
        kpts.append(np.asarray(det.keypoints[:n]))
        valid.append(np.asarray(det.valid[:n]))
        scores.append(np.asarray(det.scores[:n]))
    return (np.concatenate(boxes), np.concatenate(kpts),
            np.concatenate(valid), np.concatenate(scores))
