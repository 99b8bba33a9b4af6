"""Image-level promptable detection API (Sam3Processor-family facade).

Capability parity with the reference's single-image request protocol
(sam3/model/sam3_image_processor.py:14 ``Sam3Processor``: set_image →
set_text_prompt / add_geometric_prompt (boxes with pos/neg labels, added
incrementally) / reset_all_prompts / set_confidence_threshold, each
prompt mutation re-running grounding and returning boxes + scores +
masks above threshold).

TPU-first: the image resizes once on device; every prompt mutation calls
ONE jitted detector forward with fixed-capacity prompt slots (the
reference re-runs its grounding pass the same way). Text prompts embed
through the CLIP tower when provided, else the deterministic hash
embedding (smoke mode).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


@dataclasses.dataclass
class _ImageState:
    image: jnp.ndarray            # (1, S, S, 3) resized, [0, 1]
    original_hw: tuple
    text_memory: Optional[jnp.ndarray] = None     # (1, L, d_model)
    text_pad: Optional[jnp.ndarray] = None        # (1, L) bool True=PAD
    boxes: Optional[np.ndarray] = None            # (Nb, 4) normalized cxcywh
    box_labels: Optional[np.ndarray] = None       # (Nb,)
    points: Optional[np.ndarray] = None           # (Np, 2) normalized xy
    point_labels: Optional[np.ndarray] = None     # (Np,)
    results: Optional[Dict] = None


class Sam3Processor:
    """set_image → set_text_prompt / add_geometric_prompt → results."""

    def __init__(self, detector, variables=None, clip=None,
                 confidence_threshold: float = 0.5, rng_seed: int = 0):
        """``detector``: a Sam3Detector; ``clip``: optional
        (ClipTokenizer, VETextEncoder, variables) triple."""
        self.detector = detector
        self.clip = clip
        self.confidence_threshold = float(confidence_threshold)
        size = detector.img_size
        if variables is None:
            log.warning("no detector weights — random init (smoke mode)")
        # ensure ALL prompt branches have params (geometry encoder included)
        need_init = variables is None or "geometry_encoder" not in \
            variables.get("params", {})
        if need_init:
            full_vars = jax.jit(
                lambda k: detector.init(
                    k, jnp.zeros((1, size, size, 3)),
                    jnp.zeros((1, 4, detector.d_model)),
                    points=jnp.zeros((1, detector.max_points, 2)),
                    point_labels=jnp.zeros((1, detector.max_points),
                                           jnp.int32),
                    point_valid=jnp.zeros((1, detector.max_points), bool),
                    boxes=jnp.zeros((1, detector.max_boxes, 4)),
                    box_labels=jnp.zeros((1, detector.max_boxes), jnp.int32),
                    box_valid=jnp.zeros((1, detector.max_boxes), bool)))(
                jax.random.PRNGKey(rng_seed))
            if variables is None:
                variables = full_vars
            else:  # graft missing branches onto provided weights
                merged = dict(variables["params"])
                for key, val in full_vars["params"].items():
                    merged.setdefault(key, val)
                variables = {**variables, "params": merged}
        self.variables = variables
        self._fwd = jax.jit(self._forward)
        self._preprocess = jax.jit(
            lambda img: jax.image.resize(img, (size, size, 3),
                                         "bilinear")[None])

    # ---------------- request API ----------------
    def set_image(self, image: np.ndarray, state: Optional[dict] = None
                  ) -> _ImageState:
        """``image (H, W, 3)`` uint8 (0..255) or float (0..1) → state.
        Normalization branches on DTYPE (a value heuristic would
        mis-scale dark uint8 frames); resize runs jitted (eager dispatch
        through the axon tunnel is ~0.5 s/op)."""
        image = np.asarray(image)
        H, W = image.shape[:2]
        if np.issubdtype(image.dtype, np.integer):
            img = jnp.asarray(image, jnp.float32) / 255.0
        else:
            img = jnp.asarray(image, jnp.float32)
        return _ImageState(image=self._preprocess(img),
                           original_hw=(H, W))

    def set_text_prompt(self, prompt: str, state: _ImageState) -> Dict:
        if self.clip is not None:
            from skix.utils.jitapply import apply_model

            tokenizer, encoder, variables = self.clip
            tokens = jnp.asarray(tokenizer([prompt]))
            # jitted — a 24-layer tower run eagerly is hundreds of
            # per-op relay dispatches through the axon tunnel
            valid_mask, resized, _ = apply_model(encoder, None, variables,
                                                 tokens)
            state.text_memory = resized
            # VETextEncoder returns True=VALID; the detector pad mask is
            # True=PAD (torch convention) — invert
            state.text_pad = ~valid_mask
        else:
            from skix.tracking.detector import embed_text_prompt

            vec = embed_text_prompt(prompt, self.detector.d_model)
            state.text_memory = jnp.tile(jnp.asarray(vec)[None, None],
                                         (1, 4, 1))
            state.text_pad = jnp.zeros((1, 4), bool)
        return self._run(state)

    def add_geometric_prompt(self, box: List[float], label: bool,
                             state: _ImageState) -> Dict:
        """``box`` normalized [cx, cy, w, h]; ``label`` True=positive."""
        b = np.asarray(box, np.float32)[None]
        lb = np.asarray([1 if label else 0], np.int32)
        state.boxes = (b if state.boxes is None
                       else np.concatenate([state.boxes, b]))
        state.box_labels = (lb if state.box_labels is None
                            else np.concatenate([state.box_labels, lb]))
        if len(state.boxes) > self.detector.max_boxes:
            log.warning("more than %d box prompts; keeping the most recent",
                        self.detector.max_boxes)
            state.boxes = state.boxes[-self.detector.max_boxes:]
            state.box_labels = state.box_labels[-self.detector.max_boxes:]
        return self._run(state)

    def add_point_prompt(self, point: List[float], label: bool,
                         state: _ImageState) -> Dict:
        """``point`` normalized [x, y]; ``label`` True=positive."""
        p = np.asarray(point, np.float32)[None]
        lb = np.asarray([1 if label else 0], np.int32)
        state.points = (p if state.points is None
                        else np.concatenate([state.points, p]))
        state.point_labels = (lb if state.point_labels is None
                              else np.concatenate([state.point_labels, lb]))
        if len(state.points) > self.detector.max_points:
            state.points = state.points[-self.detector.max_points:]
            state.point_labels = state.point_labels[
                -self.detector.max_points:]
        return self._run(state)

    def reset_all_prompts(self, state: _ImageState) -> _ImageState:
        state.text_memory = None
        state.text_pad = None
        state.boxes = state.box_labels = None
        state.points = state.point_labels = None
        state.results = None
        return state

    def set_confidence_threshold(self, threshold: float,
                                 state: Optional[_ImageState] = None):
        self.confidence_threshold = float(threshold)
        if state is not None and state.results is not None:
            return self._run(state)
        return None

    # ---------------- grounding ----------------
    def _forward(self, variables, image, text, text_pad, pts, plab, pval,
                 bxs, blab, bval):
        det = self.detector.apply(variables, image, text,
                                  text_pad_mask=text_pad, points=pts,
                                  point_labels=plab, point_valid=pval,
                                  boxes=bxs, box_labels=blab, box_valid=bval)
        # per-query probabilities gated by the presence head (reference
        # _forward_grounding: sigmoid(scores) * sigmoid(presence))
        probs = jax.nn.sigmoid(det.scores[0]) \
            * jax.nn.sigmoid(det.presence[0])
        return (det.boxes_cxcywh[0], probs, det.mask_logits[0],
                det.presence[0])

    def _run(self, state: _ImageState) -> Dict:
        Np = self.detector.max_points
        Nb = self.detector.max_boxes
        pts = np.zeros((1, Np, 2), np.float32)
        plab = np.zeros((1, Np), np.int32)
        pval = np.zeros((1, Np), bool)
        if state.points is not None:
            n = len(state.points)
            pts[0, :n] = state.points
            plab[0, :n] = state.point_labels
            pval[0, :n] = True
        bxs = np.zeros((1, Nb, 4), np.float32)
        blab = np.zeros((1, Nb), np.int32)
        bval = np.zeros((1, Nb), bool)
        if state.boxes is not None:
            n = len(state.boxes)
            bxs[0, :n] = state.boxes
            blab[0, :n] = state.box_labels
            bval[0, :n] = True
        text = state.text_memory
        if text is None:
            # geometric-only prompting: the reference substitutes the
            # "visual" text prompt (sam3_image_processor.py:128-135)
            return self.set_text_prompt("visual", state) \
                if (state.boxes is not None or state.points is not None) \
                else {}
        boxes, scores, masks, presence = self._fwd(
            self.variables, state.image, text, state.text_pad,
            jnp.asarray(pts), jnp.asarray(plab), jnp.asarray(pval),
            jnp.asarray(bxs), jnp.asarray(blab), jnp.asarray(bval))
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        keep = scores >= self.confidence_threshold
        H, W = state.original_hw
        xyxy = np.stack([(boxes[:, 0] - boxes[:, 2] / 2) * W,
                         (boxes[:, 1] - boxes[:, 3] / 2) * H,
                         (boxes[:, 0] + boxes[:, 2] / 2) * W,
                         (boxes[:, 1] + boxes[:, 3] / 2) * H], -1)
        state.results = {
            "boxes_xyxy": xyxy[keep],
            "scores": scores[keep],
            "masks_lowres": np.asarray(masks)[keep],
            "presence": float(presence),
            "all_boxes_xyxy": xyxy,
            "all_scores": scores,
        }
        return state.results
