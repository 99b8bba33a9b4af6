"""Video-tracking session API.

Capability parity with the reference's SAM3 predictor request protocol
(sam3/model/sam3_video_predictor.py:23,56,88: start_session / add_prompt /
remove_object / reset_session / close + streaming ``propagate_in_video``)
— minus every piece of process machinery: the reference needs spawn'd
NCCL worker processes, command/result queues, barriers and a parent-death
watchdog (:290-509) because one Python process can't drive multiple GPUs;
under JAX one process drives all TPU chips, so the session protocol
survives as a plain class around jitted calls (SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from skix.tracking.detector import DetrDetector, embed_text_prompt
from skix.tracking.lifecycle import (TrackerConfig, init_tracker_state,
                                     tracker_step)

log = logging.getLogger(__name__)


@dataclasses.dataclass
class _Session:
    frames: np.ndarray            # (T, H, W, 3) uint8
    prompts: Dict[str, np.ndarray]
    removed_ids: set
    # frame_idx → geometric prompt arrays (normalized coords + validity)
    geometry: Dict[int, dict] = dataclasses.field(default_factory=dict)
    # text → (L,) bool PAD mask (True = padding token) for the CLIP path;
    # absent entries mean no mask (hash/encoder prompts are all-valid)
    prompt_pads: Dict[str, np.ndarray] = dataclasses.field(
        default_factory=dict)


class VideoPredictor:
    """start_session → add_prompt(text=...) → propagate_in_video (stream)."""

    def __init__(self, detector=None,
                 variables=None, tracker_cfg: Optional[TrackerConfig] = None,
                 rng_seed: int = 0, batch_size: int = 4,
                 text_encoder=None, clip=None,
                 tracker=None, masklet_cfg=None, scan_chunk: int = 8,
                 smoke_prompts: bool = False):
        """``detector``: a compact :class:`DetrDetector` (default) or a
        full-capability :class:`skix.tracking.sam3_detector.Sam3Detector`.

        ``text_encoder``: optional ``(TextEncoder, variables)`` pair —
        prompts embedded by the byte-level causal transformer.
        ``clip``: optional ``(ClipTokenizer, VETextEncoder, variables)``
        triple — prompts embedded by the real CLIP tower (the reference
        path); used with Sam3Detector.

        ``tracker``: optional ``(MaskMemoryTracker, variables)`` pair —
        with a Sam3Detector this selects **masklet propagation** (the
        reference's full video model, sam3_video_base.py:151): per-frame
        mask-IoU association + memory-conditioned per-object propagation,
        and ``propagate_in_video`` outputs carry per-object ``mask``
        arrays. ``masklet_cfg``: a :class:`skix.tracking.masklet.
        MaskletConfig` for that path. ``scan_chunk``: frames per fused
        scan dispatch on the no-geometry masklet path — outputs arrive
        in bursts of this size (first result after one chunk, not one
        frame); set 1 for lowest-latency interactive streaming.

        ``smoke_prompts``: explicit opt-in for the deterministic hash
        prompt embeddings on the Sam3Detector path when no ``clip`` tower
        is configured (tests/smoke only). Without it, a sam3-path
        ``add_prompt(text=...)`` with no CLIP raises — a production-shaped
        API must not silently embed prompts with a hash."""
        from skix.tracking.sam3_detector import Sam3Detector

        self.detector = detector or DetrDetector()
        self.is_sam3 = isinstance(self.detector, Sam3Detector)
        self.text_encoder = text_encoder
        self.clip = clip
        self.tracker = tracker
        self.masklet_cfg = masklet_cfg
        self.scan_chunk = int(scan_chunk)
        self.smoke_prompts = bool(smoke_prompts)
        if tracker is not None and not self.is_sam3:
            raise ValueError("masklet propagation (tracker=...) needs the "
                             "Sam3Detector path (mask-producing detector)")
        size = self.detector.img_size
        if variables is None:
            if self.is_sam3:
                # init WITH (all-invalid) geometry slots so the geometry
                # encoder's params exist for point/box-prompted sessions
                Np = self.detector.max_points
                Nb = self.detector.max_boxes
                variables = jax.jit(self.detector.init)(
                    jax.random.PRNGKey(rng_seed),
                    jnp.zeros((1, size, size, 3)),
                    jnp.zeros((1, 4, self.detector.d_model)),
                    points=jnp.zeros((1, Np, 2)),
                    point_labels=jnp.zeros((1, Np), jnp.int32),
                    point_valid=jnp.zeros((1, Np), bool),
                    boxes=jnp.zeros((1, Nb, 4)),
                    box_labels=jnp.zeros((1, Nb), jnp.int32),
                    box_valid=jnp.zeros((1, Nb), bool))
            else:
                variables = jax.jit(self.detector.init)(
                    jax.random.PRNGKey(rng_seed),
                    jnp.zeros((1, size, size, 3)),
                    jnp.zeros((1, self.detector.prompt_dim)))
        self.variables = variables
        self.cfg = tracker_cfg or TrackerConfig()
        self.batch_size = batch_size
        self.sessions: Dict[int, _Session] = {}
        self._next_session = 0
        self._detect = jax.jit(self._detect_batch)
        self._step = jax.jit(
            lambda st, b, s, v: tracker_step(st, b, s, v, self.cfg))

    # ---------------- request API ----------------
    def handle_request(self, request: dict) -> Optional[dict]:
        """The reference's dict request protocol
        (sam3_video_predictor.py:56 ``handle_request``): dispatch on
        ``request["type"]``. ``start_session`` accepts the reference's
        ``resource_path`` (decoded via skix.io.video) or a preloaded
        ``frames`` array; ``add_prompt`` takes the protocol's
        ``bounding_boxes`` in **normalized 0-1 xywh**
        (sam3_video_inference.py:882-888 asserts the range), converted
        here to the pixel xyxy our API uses."""
        rt = request["type"]
        if rt == "start_session":
            if "frames" in request:
                frames = np.asarray(request["frames"])
            else:
                from skix.io.video import read_video

                frames = read_video(request["resource_path"])
            return {"session_id": self.start_session(
                frames, session_id=request.get("session_id"))}
        if rt == "add_prompt":
            boxes = request.get("bounding_boxes")
            if boxes is not None:
                # protocol boxes are NORMALIZED 0-1 xywh
                # (sam3_video_inference.py:882-888 asserts the range);
                # add_prompt takes pixel xyxy — scale by the frame size
                b = np.asarray(boxes, np.float32)
                s = self.sessions[request["session_id"]]
                H, W = s.frames.shape[1:3]
                b = b * np.asarray([W, H, W, H], np.float32)
                boxes = np.concatenate([b[:, :2], b[:, :2] + b[:, 2:]], -1)
            fi = request.get("frame_index", 0)
            self.add_prompt(request["session_id"],
                            text=request.get("text"),
                            frame_idx=fi,
                            points=request.get("points"),
                            point_labels=request.get("point_labels"),
                            boxes_xyxy=boxes,
                            box_labels=request.get("bounding_box_labels"))
            return {"frame_index": fi}
        if rt == "remove_object":
            self.remove_object(request["session_id"], request["obj_id"])
            return None
        if rt == "reset_session":
            self.reset_session(request["session_id"])
            return None
        if rt == "close_session":
            self.close_session(request["session_id"])
            return None
        raise RuntimeError(f"invalid request type: {rt}")

    def handle_stream_request(self, request: dict) -> Iterator[dict]:
        """Streaming half of the protocol (sam3_video_predictor.py:88);
        the protocol's direction default is "both", like the reference."""
        if request["type"] != "propagate_in_video":
            raise RuntimeError(f"invalid request type: {request['type']}")
        yield from self.propagate_in_video(
            request["session_id"], request.get("text"),
            start_frame_idx=request.get("start_frame_index"),
            max_frame_num_to_track=request.get("max_frame_num_to_track"),
            propagation_direction=request.get("propagation_direction",
                                              "both"))

    def start_session(self, frames: np.ndarray, session_id=None):
        """``session_id``: optional caller-supplied identifier (the
        reference accepts one and mints a uuid otherwise,
        sam3_video_predictor.py:108-119; here the mint is an int)."""
        if session_id is None:
            session_id = self._next_session
            self._next_session += 1
        self.sessions[session_id] = _Session(frames=np.asarray(frames),
                                             prompts={},
                                             removed_ids=set())
        return session_id

    def add_prompt(self, session_id: int, text: Optional[str] = None,
                   frame_idx: int = 0, points=None, point_labels=None,
                   boxes_xyxy=None, box_labels=None) -> None:
        """Add a text and/or geometric prompt (reference
        sam3_video_predictor.py:131: text, points + labels, boxes +
        labels on a specific frame). Geometric prompts are stored in
        fixed-capacity slots and condition detection on ``frame_idx``
        via the detector's geometry encoder (Sam3Detector only);
        ``points``/``boxes_xyxy`` are in ORIGINAL frame pixels."""
        s = self.sessions[session_id]
        if points is not None or boxes_xyxy is not None:
            if not self.is_sam3:
                raise ValueError(
                    "geometric prompts need the Sam3Detector path")
            H, W = s.frames.shape[1:3]
            Np = self.detector.max_points
            Nb = self.detector.max_boxes
            # merge into the frame's existing slots (repeated add_prompt
            # calls on the same frame ACCUMULATE prompts, like the
            # reference's interactive refinement)
            g = s.geometry.get(int(frame_idx))
            if g is None:
                g = {"points": np.zeros((Np, 2), np.float32),
                     "point_labels": np.zeros((Np,), np.int32),
                     "point_valid": np.zeros((Np,), bool),
                     "boxes": np.zeros((Nb, 4), np.float32),
                     "box_labels": np.zeros((Nb,), np.int32),
                     "box_valid": np.zeros((Nb,), bool)}
            if points is not None:
                pts = np.asarray(points, np.float32).reshape(-1, 2)
                lab = (np.asarray(point_labels, np.int32).reshape(-1)
                       if point_labels is not None
                       else np.ones(len(pts), np.int32))
                o = int(g["point_valid"].sum())
                k = min(len(pts), Np - o)
                if k < len(pts):
                    log.warning(
                        "frame %d point slots full (%d/%d): dropping %d "
                        "point prompt(s); reset_session to start over",
                        frame_idx, o, Np, len(pts) - k)
                g["points"][o:o + k] = pts[:k] / [W, H]
                g["point_labels"][o:o + k] = lab[:k]
                g["point_valid"][o:o + k] = True
            if boxes_xyxy is not None:
                bx = np.asarray(boxes_xyxy, np.float32).reshape(-1, 4)
                lab = (np.asarray(box_labels, np.int32).reshape(-1)
                       if box_labels is not None
                       else np.ones(len(bx), np.int32))
                o = int(g["box_valid"].sum())
                k = min(len(bx), Nb - o)
                if k < len(bx):
                    log.warning(
                        "frame %d box slots full (%d/%d): dropping %d "
                        "box prompt(s); reset_session to start over",
                        frame_idx, o, Nb, len(bx) - k)
                # normalized cxcywh (the geometry encoder's convention)
                cx = (bx[:k, 0] + bx[:k, 2]) / 2 / W
                cy = (bx[:k, 1] + bx[:k, 3]) / 2 / H
                bw = (bx[:k, 2] - bx[:k, 0]) / W
                bh = (bx[:k, 3] - bx[:k, 1]) / H
                g["boxes"][o:o + k] = np.stack([cx, cy, bw, bh], -1)
                g["box_labels"][o:o + k] = lab[:k]
                g["box_valid"][o:o + k] = True
            s.geometry[int(frame_idx)] = g
        if text is None:
            return
        if self.clip is not None:
            from skix.utils.jitapply import apply_model

            tokenizer, encoder, variables = self.clip
            tokens = jnp.asarray(tokenizer([text]))
            # jitted (24-layer tower eager = hundreds of relay dispatches)
            valid_mask, resized, _ = apply_model(encoder, None, variables,
                                                 tokens)
            s.prompts[text] = np.asarray(resized[0])       # (L, d_model)
            # VETextEncoder returns True=VALID; the detector pad mask is
            # True=PAD — invert (image_processor.py convention). Without
            # it the fusion encoder attends to ~29 PAD embeddings of a
            # 32-slot prompt
            s.prompt_pads[text] = ~np.asarray(valid_mask[0])
        elif self.is_sam3:
            if not self.smoke_prompts:
                raise ValueError(
                    "Sam3Detector text prompting needs a CLIP tower "
                    "(clip=(tokenizer, encoder, variables)); pass "
                    "smoke_prompts=True to opt into deterministic hash "
                    "embeddings for tests/smoke runs")
            # deterministic hash prompt memory (explicit smoke mode)
            vec = embed_text_prompt(text, self.detector.d_model)
            s.prompts[text] = np.tile(np.asarray(vec)[None], (4, 1))
        elif self.text_encoder is not None:
            from skix.tracking.text_encoder import encode_texts

            model, variables = self.text_encoder
            s.prompts[text] = np.asarray(
                encode_texts(model, variables, [text])[0])
        else:
            s.prompts[text] = np.asarray(
                embed_text_prompt(text, self.detector.prompt_dim))

    def remove_object(self, session_id: int, obj_id: int) -> None:
        self.sessions[session_id].removed_ids.add(int(obj_id))

    def reset_session(self, session_id: int) -> None:
        s = self.sessions[session_id]
        s.prompts.clear()
        s.prompt_pads.clear()
        s.removed_ids.clear()
        s.geometry.clear()

    def close_session(self, session_id: int) -> None:
        self.sessions.pop(session_id, None)

    # ---------------- propagation ----------------
    def _detect_batch(self, variables, images, prompt, geometry=None,
                      text_pad=None):
        if self.is_sam3:
            geo = dict(geometry or {})
            if text_pad is not None:
                geo["text_pad_mask"] = jnp.broadcast_to(
                    text_pad[None], (images.shape[0], text_pad.shape[0]))
            det = self.detector.apply(variables, images, prompt, **geo)
            cx, cy, w, h = [det.boxes_cxcywh[..., i] for i in range(4)]
            size = self.detector.img_size
            boxes = jnp.stack([(cx - w / 2) * size, (cy - h / 2) * size,
                               (cx + w / 2) * size, (cy + h / 2) * size],
                              axis=-1)
            return boxes, det.scores
        det = self.detector.apply(variables, images, prompt)
        return det.boxes_xyxy, det.scores

    def _propagate_masklets(self, s: _Session, prompt, idx_map,
                            text_pad=None) -> Iterator[dict]:
        """Masklet propagation (per-object masks through the memory
        tracker — reference Sam3VideoBase._det_track_one_frame). Thin
        adapter over :meth:`MaskletVideoModel.propagate` (single source
        for the per-frame loop + chunked uploads): renames ``boxes`` →
        ``bbox`` for the session output contract and applies
        ``remove_object`` suppression. ``idx_map``: the ordered GLOBAL
        frame indices this pass visits (forward or reverse segment)."""
        from skix.tracking.masklet import MaskletConfig, MaskletVideoModel

        trk_model, trk_vars = self.tracker
        cfg = self.masklet_cfg or MaskletConfig()
        # a descending segment is the protocol's backward pass: flip the
        # lifecycle's hotstart/duplicate/occlusion comparisons (reference
        # sam3_video_base.py reverse handling)
        reverse = len(idx_map) > 1 and idx_map[1] < idx_map[0]
        if cfg.reverse != reverse:
            cfg = dataclasses.replace(cfg, reverse=reverse)
        mdl = MaskletVideoModel(self.detector, self.variables, trk_model,
                                trk_vars, cfg)
        frames = np.ascontiguousarray(s.frames[np.asarray(idx_map)])
        geometry_by_frame = {
            local_t: {
                "points": jnp.asarray(g["points"])[None],
                "point_labels": jnp.asarray(g["point_labels"])[None],
                "point_valid": jnp.asarray(g["point_valid"])[None],
                "boxes": jnp.asarray(g["boxes"])[None],
                "box_labels": jnp.asarray(g["box_labels"])[None],
                "box_valid": jnp.asarray(g["box_valid"])[None],
            }
            for local_t, gt in enumerate(idx_map)
            if (g := s.geometry.get(int(gt))) is not None
        } or None
        if geometry_by_frame is None:
            # no geometric prompts → the chunk-scanned path (C frames
            # per dispatch; exact-parity test vs the streaming loop).
            # Results arrive in scan_chunk-sized bursts — see __init__.
            stream = mdl.propagate_clip(frames, jnp.asarray(prompt),
                                        chunk=self.scan_chunk,
                                        include_lowres_logits=False,
                                        start_frame=int(idx_map[0]),
                                        text_pad=text_pad)
        else:
            stream = mdl.propagate(frames, jnp.asarray(prompt),
                                   geometry_by_frame=geometry_by_frame,
                                   include_lowres_logits=False,
                                   start_frame=int(idx_map[0]),
                                   text_pad=text_pad)
        for item in stream:
            out = item["outputs"]
            out_np = {
                "mask": out["mask"],
                "bbox": out["boxes"],
                "score": out["score"],
                "tracker_score": out["tracker_score"],
                "active": out["active"],
                "confirmed": out["confirmed"],
                "obj_id": out["obj_id"],
            }
            if s.removed_ids:
                drop = np.isin(out_np["obj_id"], list(s.removed_ids))
                out_np["active"] = out_np["active"] & ~drop
            yield {"frame_index": int(idx_map[item["frame_index"]]),
                   "outputs": out_np}

    def propagate_in_video(self, session_id: int,
                           prompt_text: Optional[str] = None,
                           start_frame_idx: Optional[int] = None,
                           max_frame_num_to_track: Optional[int] = None,
                           propagation_direction: str = "forward"
                           ) -> Iterator[dict]:
        """Yield per-frame tracking outputs ``{frame_index, outputs}``
        (streaming, like reference handle_stream_request :88). With a
        memory ``tracker`` configured, outputs carry per-object ``mask``
        arrays (masklet propagation); otherwise box-level tracking.

        ``start_frame_idx``/``max_frame_num_to_track``/
        ``propagation_direction`` follow the reference protocol
        (sam3_video_predictor.py:183-220): forward yields
        ``[s0, min(T, s0+max))``, backward walks ``s0 → 0`` reverse in
        time (each direction restarts tracking at the prompted frame —
        the start frame is yielded by BOTH passes under "both", exactly
        as the reference does). Direct callers default to "forward";
        the dict protocol defaults to "both" like the reference."""
        s = self.sessions[session_id]
        if propagation_direction not in ("both", "forward", "backward"):
            raise ValueError(
                f"invalid propagation direction: {propagation_direction}")
        if prompt_text is None:
            if not s.prompts and s.geometry:
                # geometry-only prompting uses the 'visual' concept token
                # (reference sam3_image_processor.py geometric-only path)
                self.add_prompt(session_id, "visual")
            if not s.prompts:
                raise ValueError("no prompt added to session")
            # the LATEST text prompt is the active one (the reference's
            # add_prompt resets state — "since it's a semantic prompt,
            # we start over", sam3_video_inference.py:862)
            prompt_text = next(reversed(s.prompts))
        T = s.frames.shape[0]
        s0 = 0 if start_frame_idx is None else int(start_frame_idx)
        maxn = T if max_frame_num_to_track is None \
            else int(max_frame_num_to_track)
        segments = []
        if propagation_direction in ("both", "forward"):
            segments.append(list(range(s0, min(T, s0 + maxn))))
        if propagation_direction in ("both", "backward"):
            segments.append(list(range(s0, max(-1, s0 - maxn), -1)))
        for idx_map in segments:
            if not idx_map:
                continue
            pad = s.prompt_pads.get(prompt_text)
            pad = None if pad is None else jnp.asarray(pad)
            if self.tracker is not None:
                yield from self._propagate_masklets(
                    s, jnp.asarray(s.prompts[prompt_text]), idx_map,
                    text_pad=pad)
            else:
                yield from self._propagate_boxes(s, prompt_text, idx_map,
                                                 text_pad=pad)

    def _propagate_boxes(self, s: _Session, prompt_text: str,
                         idx_map, text_pad=None) -> Iterator[dict]:
        """Box-level tracking over one ordered frame segment."""
        prompt = jnp.asarray(s.prompts[prompt_text])[None]
        size = self.detector.img_size
        H, W = s.frames.shape[1:3]
        frames = s.frames[np.asarray(idx_map)]
        T = frames.shape[0]
        state = init_tracker_state(self.cfg)
        sx, sy = W / size, H / size

        use_geo = self.is_sam3 and bool(s.geometry)
        for start in range(0, T, self.batch_size):
            chunk = frames[start:start + self.batch_size]
            n = len(chunk)
            imgs = jnp.asarray(chunk, jnp.float32) / 255.0
            imgs = jax.image.resize(imgs, (n, size, size, 3), "bilinear")
            pad = self.batch_size - n
            if pad:
                imgs = jnp.pad(imgs, ((0, pad), (0, 0), (0, 0), (0, 0)))
            geometry = None
            if use_geo:
                B = self.batch_size
                Np = self.detector.max_points
                Nb = self.detector.max_boxes
                gb = {"points": np.zeros((B, Np, 2), np.float32),
                      "point_labels": np.zeros((B, Np), np.int32),
                      "point_valid": np.zeros((B, Np), bool),
                      "boxes": np.zeros((B, Nb, 4), np.float32),
                      "box_labels": np.zeros((B, Nb), np.int32),
                      "box_valid": np.zeros((B, Nb), bool)}
                for i in range(n):
                    g = s.geometry.get(int(idx_map[start + i]))
                    if g is not None:
                        for k in gb:
                            gb[k][i] = g[k]
                geometry = {k: jnp.asarray(v) for k, v in gb.items()}
            boxes, scores = self._detect(
                self.variables, imgs,
                jnp.broadcast_to(prompt,
                                 (self.batch_size, *prompt.shape[1:])),
                geometry, text_pad)
            boxes = np.array(boxes)[:n]  # writable host copy
            scores = np.array(scores)[:n]
            boxes[..., 0] *= sx
            boxes[..., 2] *= sx
            boxes[..., 1] *= sy
            boxes[..., 3] *= sy
            for i in range(n):
                valid = jnp.ones(boxes.shape[1], bool)
                state, out = self._step(state, jnp.asarray(boxes[i]),
                                        jnp.asarray(scores[i]), valid)
                out_np = {k: np.asarray(v) for k, v in out.items()}
                if s.removed_ids:
                    drop = np.isin(out_np["obj_id"], list(s.removed_ids))
                    out_np["active"] = out_np["active"] & ~drop
                yield {"frame_index": int(idx_map[start + i]),
                       "outputs": out_np}

    # ---------------- stats ----------------
    def session_stats(self, session_id: int) -> dict:
        s = self.sessions[session_id]
        return {"frames": int(len(s.frames)),
                "prompts": sorted(s.prompts),
                "removed_ids": sorted(s.removed_ids),
                "geometry_frames": sorted(s.geometry)}
