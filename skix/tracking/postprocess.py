"""Detection output post-processing (COCO-style result preparation).

Capability parity with the reference's ``PostProcessImage``
(``sam3/eval/postprocessors.py:30``): converts raw detector outputs into
evaluator-ready results —

- per-query probabilities ``sigmoid(logits)``, gated by the presence head
  when enabled (``use_presence``, postprocessors.py:104-106);
- boxes cxcywh → xyxy, scaled to the target image size
  (postprocessors.py:232-236);
- masks bilinearly resized to the target size and binarized at
  ``sigmoid > 0.5`` (postprocessors.py:161-168);
- top-``max_dets`` selection by score (postprocessors.py:300-315) and an
  optional detection threshold (postprocessors.py:242-249).

TPU-first: fixed-capacity outputs under jit — the threshold produces a
boolean ``valid`` mask instead of ragged filtering (mask-based missing
data, never dynamic shapes), and top-k uses ``lax.top_k``. Host-side
ragged conversion for evaluators is a one-liner on the returned arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ProcessedDetections(NamedTuple):
    boxes_xyxy: jnp.ndarray   # (B, K, 4) in target-size pixels
    scores: jnp.ndarray       # (B, K) presence-gated probabilities
    masks: Optional[jnp.ndarray]  # (B, K, H, W) bool, or None
    valid: jnp.ndarray        # (B, K) bool — above detection threshold


def postprocess_detections(
    boxes_cxcywh: jnp.ndarray,        # (B, Q, 4) normalized
    logits: jnp.ndarray,              # (B, Q) score logits
    presence_logit: jnp.ndarray | None = None,  # (B,)
    mask_logits: jnp.ndarray | None = None,     # (B, Q, h, w)
    target_size: tuple[int, int] | None = None,  # (H, W) pixels
    max_dets: int = 100,
    detection_threshold: float | None = None,
    use_presence: bool = True,
) -> ProcessedDetections:
    """Jit-compatible (static ``target_size``/``max_dets``).

    ``target_size=None`` keeps boxes normalized and masks at their
    native feature resolution (an explicit size is required to rescale
    — a (1, 1) default would silently collapse masks to one pixel).
    ``detection_threshold=None`` disables score gating; any float
    (including 0.0) is applied, matching the reference postprocessor."""
    B, Q = logits.shape
    probs = jax.nn.sigmoid(logits)
    if use_presence and presence_logit is not None:
        probs = probs * jax.nn.sigmoid(presence_logit)[:, None]

    k = min(max_dets, Q) if max_dets > 0 else Q
    scores, idx = jax.lax.top_k(probs, k)                     # (B, K)
    take = jax.vmap(lambda a, i: a[i])
    boxes = take(boxes_cxcywh, idx)                           # (B, K, 4)

    cx, cy, w, h = [boxes[..., i] for i in range(4)]
    H, W = target_size if target_size is not None else (1, 1)
    boxes_xyxy = jnp.stack(
        [(cx - w / 2) * W, (cy - h / 2) * H,
         (cx + w / 2) * W, (cy + h / 2) * H], axis=-1)

    masks = None
    if mask_logits is not None:
        m = take(mask_logits, idx)                            # (B, K, h, w)
        if target_size is not None:
            m = jax.image.resize(m, (B, k, H, W), "bilinear")
        masks = jax.nn.sigmoid(m) > 0.5

    valid = (jnp.ones_like(scores, bool) if detection_threshold is None
             else scores > detection_threshold)
    return ProcessedDetections(boxes_xyxy=boxes_xyxy, scores=scores,
                               masks=masks, valid=valid)
