"""Stage CLI: video → per-video record (.npz pt_info contract).

Reference entry: prepare_dataset/main.py:162 — iterate persons/videos,
decode, run the configured tasks {yolo, detectron2, depth, optical_flow}
(process/preprocess.py:50 ``Preprocess.__call__`` multiplexer), assemble the
``pt_info`` schema, validate shapes, atomic save, skip-if-exists resume
(main.py:133), per-video try/except isolation (main.py:137-147).

TPU-first redesign:
- streaming chunked decode (skix.io.video) instead of whole-clip
  ``torchvision.io.read_video``;
- perception models behind a small registry; each backend maps
  ``frames (T, H, W, 3) uint8`` → task outputs. Backends:
  * ``precomputed`` — sidecar ``<video>.detections.npz`` with raw padded
    per-frame detections (the BASELINE config-1 pathway);
  * ``skix`` — JAX models (DPT-style depth via skix.models.dpt, RAFT-style
    flow via skix.models.raft) when weights are configured;
  * anything callable registered by the user.
- athlete selection + hole filling as one jitted scan
  (skix.perception.selection).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Dict

import numpy as np

from skix.config import cli_main, iter_person_dirs
from skix.io import PTInfo, check_pt_info_shapes, save_pt_info
from skix.io.video import probe_video, read_video_chunks

log = logging.getLogger(__name__)

# task registry: name -> factory(cfg) -> callable(frames_u8) -> dict
_BACKENDS: Dict[str, Callable] = {}


def register_backend(name: str):
    def deco(fn):
        _BACKENDS[name] = fn
        return fn

    return deco


@register_backend("precomputed")
def _precomputed_backend(cfg, video_path: Path):
    """Loads padded raw detections from ``<video>.detections.npz``:
    boxes (T,N,4) cxcywh, keypoints (T,N,17,3), det_valid (T,N),
    optional depth (T,1,H,W), optical_flow (T-1,2,H,W)."""
    sidecar = video_path.with_suffix(".detections.npz")

    def run(frames: np.ndarray) -> dict:
        if not sidecar.exists():
            raise FileNotFoundError(
                f"precomputed backend needs {sidecar}")
        with np.load(sidecar, allow_pickle=False) as z:
            return dict(z)

    return run


def _chunked_clip_detect(frames: np.ndarray, batch_size: int, pad_hw,
                         detect_chunk):
    """Shared whole-clip detection driver: fixed-size batch chunks with
    /32 spatial padding (static shapes), xyxy→cxcywh to the selection
    contract. ``detect_chunk(chunk) -> (boxes_xyxy, keypoints, valid,
    scores)`` is the only model-specific part (kept single-sourced so the
    padding/slicing logic can't drift between the YOLO and D2 sources)."""
    import jax.numpy as jnp

    T = frames.shape[0]
    ph, pw = pad_hw
    boxes, kpts, valid, scores = [], [], [], []
    for s in range(0, T, batch_size):
        e = min(s + batch_size, T)
        chunk = jnp.asarray(frames[s:e], jnp.float32) / 255.0
        chunk = jnp.pad(chunk, ((0, batch_size - (e - s)), (0, ph),
                                (0, pw), (0, 0)))
        bx, kp, vl, sc = detect_chunk(chunk)
        n = e - s
        b = np.asarray(bx[:n])
        cxy = np.stack([(b[..., 0] + b[..., 2]) / 2,
                        (b[..., 1] + b[..., 3]) / 2,
                        b[..., 2] - b[..., 0], b[..., 3] - b[..., 1]], -1)
        boxes.append(cxy)
        kpts.append(np.asarray(kp[:n]))
        valid.append(np.asarray(vl[:n]))
        scores.append(np.asarray(sc[:n]))
    return np.concatenate(boxes), np.concatenate(kpts), \
        np.concatenate(valid), np.concatenate(scores)


def _compute_track_ids(cfg, boxes_cxcywh, scores, valid,
                       flow=None) -> np.ndarray:
    """(T, N) det→track-id map via the fixed-slot ByteTrack scan (jit
    cached per config). Reference: ultralytics ``mode="track"`` built
    from the ``bytetrack``/``botsort`` yaml blocks
    (configs/prepare_dataset.yaml:45-82, yolov11_pose.py:173).
    ``tracker_type: botsort`` adds camera-motion compensation fitted on
    the pipeline's optical flow (``flow (T-1, 2, H, W)``; silently
    plain-ByteTrack when the flow task is off)."""
    import jax
    import jax.numpy as jnp

    from skix.perception.byte_track import (ByteTrackConfig,
                                            fit_global_motion, motion_grid,
                                            track_sequence_ids)
    from skix.tracking.matcher import cxcywh_to_xyxy

    raw = dict(cfg.get("bytetrack", {}) or {})
    use_gmc = (raw.get("tracker_type") == "botsort" and flow is not None
               and flow.shape[0] > 0)
    fields = ByteTrackConfig.__dataclass_fields__
    btc = ByteTrackConfig(**{k: v for k, v in raw.items() if k in fields})
    cache = _compute_track_ids.__dict__.setdefault("_jit", {})
    key = (btc, use_gmc)
    if key not in cache:
        def f(b, s, v, m=None, _c=btc):
            return track_sequence_ids(b, s, v, _c, motion=m)

        cache[key] = jax.jit(f)
    if "gmc" not in cache:     # module-cached: never a per-call closure
        cache["gmc"] = jax.jit(fit_global_motion)
    xyxy = cxcywh_to_xyxy(jnp.asarray(boxes_cxcywh, jnp.float32))
    args = (xyxy, jnp.asarray(scores, jnp.float32),
            jnp.asarray(valid, bool))
    if use_gmc:
        # subsample HOST-side: ship ~1/stride² of the flow volume to the
        # device instead of the dense (T-1, 2, H, W) field (~5 GB for a
        # 300-frame 1080p clip through the relay)
        flow = np.asarray(flow)
        gy, gx = motion_grid(*flow.shape[-2:])
        pts = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
        samples = flow[:, :, gy, gx].reshape(flow.shape[0], 2, -1)
        motion = cache["gmc"](jnp.asarray(pts),
                              jnp.asarray(samples.transpose(0, 2, 1)))
        return np.asarray(cache[key](*args, motion))
    return np.asarray(cache[key](*args))


def _detect_clip_yolo(cfg, frames: np.ndarray, load_vars):
    """Whole-clip YoloPose detection → padded (T, K, …) arrays."""
    import jax
    import jax.numpy as jnp

    from skix.models.yolo_pose import YoloPose, detect
    from skix.utils.jitapply import apply_model

    model = YoloPose(scale=str(cfg.get("yolo_scale", "s")),
                     version=int(cfg.get("yolo_version", 11)))
    _, H, W = frames.shape[:3]
    ph, pw = (-H) % 32, (-W) % 32
    variables = load_vars("yolo_checkpoint", lambda: jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H + ph, W + pw, 3))))())
    top_k = int(cfg.get("top_k", 8))
    thr = float(cfg.get("score_threshold", 0.3))

    def detect_chunk(chunk):
        raw = apply_model(model, None, variables, chunk)
        det = detect(raw, top_k=top_k, score_threshold=thr)
        return det.boxes_xyxy, det.keypoints, det.valid, \
            det.scores

    return _chunked_clip_detect(frames, int(cfg.get("det_batch", 8)),
                                (ph, pw), detect_chunk)


def _detect_clip_boxes(cfg, frames: np.ndarray, load_vars):
    """Whole-clip plain-Detect person boxes — the reference's SEPARATE
    bbox task running a plain ``yolo11x.pt`` COCO-80 checkpoint with the
    ultralytics ``classes=0`` person filter (yolov11_bbox.py:77,118;
    configs/prepare_dataset.yaml ``bbox_ckpt``). Returns cxcywh boxes,
    class ids, valid, scores in the shared clip-detect contract."""
    import jax
    import jax.numpy as jnp

    from skix.models.yolo_pose import YoloDetect, detect_boxes
    from skix.utils.jitapply import apply_model

    model = YoloDetect(scale=str(cfg.get("bbox_scale",
                                         cfg.get("yolo_scale", "s"))),
                       num_classes=int(cfg.get("bbox_classes", 80)),
                       version=int(cfg.get("yolo_version", 11)))
    _, H, W = frames.shape[:3]
    ph, pw = (-H) % 32, (-W) % 32
    variables = load_vars("bbox_checkpoint", lambda: jax.jit(
        lambda: model.init(jax.random.PRNGKey(4),
                           jnp.zeros((1, H + ph, W + pw, 3))))())
    top_k = int(cfg.get("top_k", 8))
    thr = float(cfg.get("bbox_score_threshold",
                        cfg.get("score_threshold", 0.3)))

    def detect_chunk(chunk):
        raw = apply_model(model, None, variables, chunk)
        det = detect_boxes(raw, top_k=top_k, score_threshold=thr,
                           classes=(0,))
        return det.boxes_xyxy, det.cls, det.valid, det.scores

    return _chunked_clip_detect(frames, int(cfg.get("det_batch", 8)),
                                (ph, pw), detect_chunk)


def _detect_clip_seg(cfg, frames: np.ndarray, load_vars):
    """Whole-clip YoloSeg person segmentation → (T, K, 4) cxcywh boxes,
    (T, K, Hp, Wp) mask probabilities (stride-4 proto grid of the padded
    frame), (T, K) valid. Reference: the separate YOLOv11Mask model
    (prepare_dataset/model/yolov11_mask.py:75)."""
    import jax
    import jax.numpy as jnp

    from skix.models.yolo_pose import YoloSeg, detect_seg
    from skix.utils.jitapply import apply_model

    model = YoloSeg(scale=str(cfg.get("seg_scale",
                                      cfg.get("yolo_scale", "s"))),
                    version=int(cfg.get("yolo_version", 11)))
    _, H, W = 0, frames.shape[1], frames.shape[2]
    ph, pw = (-H) % 32, (-W) % 32
    variables = load_vars("seg_checkpoint", lambda: jax.jit(
        lambda: model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, H + ph, W + pw, 3))))())
    top_k = int(cfg.get("top_k", 8))
    thr = float(cfg.get("seg_score_threshold",
                        cfg.get("score_threshold", 0.3)))

    def detect_chunk(chunk):
        raw = apply_model(model, None, variables, chunk)
        det = detect_seg(raw, top_k=top_k, score_threshold=thr)
        return det.boxes_xyxy, det.masks, det.valid, det.scores

    return _chunked_clip_detect(frames, int(cfg.get("det_batch", 8)),
                                (ph, pw), detect_chunk)


def _detect_clip_rcnn(cfg, frames: np.ndarray, load_vars):
    """Whole-clip KeypointRCNN detection (the D2 source) → padded
    arrays in the same contract."""
    import jax
    import jax.numpy as jnp

    from skix.models.keypoint_rcnn import KeypointRCNN
    from skix.utils.jitapply import apply_model

    model = KeypointRCNN(
        pre_nms_topk=int(cfg.get("d2_pre_nms_topk", 256)),
        post_nms_topk=int(cfg.get("d2_post_nms_topk", 64)),
        detections=int(cfg.get("top_k", 8)),
        score_threshold=float(cfg.get("d2_score_threshold", 0.7)))
    _, H, W = frames.shape[:3]
    ph, pw = (-H) % 32, (-W) % 32

    def init_fn():
        import warnings

        warnings.warn("random-init KeypointRCNN is smoke-only")
        return jax.jit(lambda: model.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, H + ph, W + pw, 3))))()

    variables = load_vars("d2_checkpoint", init_fn)

    def detect_chunk(chunk):
        out = apply_model(model, None, variables, chunk)
        return out.boxes_xyxy, out.keypoints, out.valid, \
            out.scores

    return _chunked_clip_detect(frames, int(cfg.get("d2_batch", 2)),
                                (ph, pw), detect_chunk)


@register_backend("skix")
def _skix_backend(cfg, video_path: Path):
    """On-device perception — the TPU-native equivalents of the
    reference's {yolo, detectron2, depth, optical_flow} task set
    (process/preprocess.py:50). ``pose_model`` picks the primary
    (YOLO-slot) source: ``yolo`` = the real YOLOv8-pose family
    (yolov11_pose.py capability), ``compact`` = the small CenterNet
    (smoke/CI). ``d2_model: rcnn`` adds the INDEPENDENT second source
    the reference gets from detectron2's Keypoint R-CNN
    (detectron2.py:445) into the d2_* contract slots; ``none`` mirrors
    the primary (documented degenerate mode). Each sub-model loads
    converted weights when configured, random-init (smoke mode)
    otherwise."""
    import jax
    import jax.numpy as jnp

    from skix.models.pose_detector import PoseDetector, detect_clip

    def load_vars(key, init_fn):
        ckpt = cfg.get(key)
        if ckpt and Path(ckpt).exists():
            from skix.pipelines.videopose3d import load_checkpoint

            return load_checkpoint(ckpt)
        log.warning("%s not configured — random init (smoke mode)", key)
        return init_fn()

    tasks = set(cfg.get("tasks", ["pose"]))
    pose_model = str(cfg.get("pose_model", "compact"))
    d2_model = str(cfg.get("d2_model", "none"))

    def run(frames: np.ndarray) -> dict:
        H, W = frames.shape[1:3]
        if pose_model == "yolo":
            boxes, kpts, valid, scores = _detect_clip_yolo(cfg, frames,
                                                           load_vars)
        else:
            det_model = PoseDetector(
                width=int(cfg.get("detector_width", 64)),
                depth=int(cfg.get("detector_depth", 4)),
                top_k=int(cfg.get("top_k", 8)),
                score_threshold=float(cfg.get("score_threshold", 0.3)))
            det_vars = load_vars("detector_checkpoint", lambda: jax.jit(
                det_model.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, H, W, 3))))
            boxes, kpts, valid, scores = detect_clip(
                det_model, det_vars, frames,
                batch_size=int(cfg.get("det_batch", 8)))
        out = {"boxes": boxes, "keypoints": kpts, "det_valid": valid}
        if str(cfg.get("bbox_model", "none")) == "detect":
            # the reference's bbox slot comes from a SEPARATE plain
            # yolo11x.pt detect run (yolov11_bbox.py:77), not from the
            # pose model's boxes
            bb, bc, bv, bs = _detect_clip_boxes(cfg, frames, load_vars)
            out.update({"bbox_boxes": bb, "bbox_valid": bv,
                        "bbox_scores": bs})
        if "mask" in tasks:
            sb, sm, sv, _ = _detect_clip_seg(cfg, frames, load_vars)
            out.update({"seg_boxes": sb, "seg_masks": sm,
                        "seg_valid": sv})
        if d2_model == "rcnn":
            d2b, d2k, d2v, _ = _detect_clip_rcnn(cfg, frames, load_vars)
            out.update({"d2_boxes": d2b, "d2_keypoints": d2k,
                        "d2_det_valid": d2v})
        if "depth" in tasks:
            from skix.models.dpt import MonocularDepth, estimate_depth_batched

            n_layers = int(cfg.get("depth_layers", 12))
            # 4 evenly spaced taps over the configured depth
            taps = tuple(sorted({max(0, (n_layers * (i + 1)) // 4 - 1)
                                 for i in range(4)}))
            while len(taps) < 4:  # tiny configs: pad with the last layer
                taps = taps + (n_layers - 1,)
            dm = MonocularDepth(patch_size=16,
                                embed_dim=int(cfg.get("depth_dim", 384)),
                                depth=n_layers,
                                num_heads=int(cfg.get("depth_heads", 6)),
                                taps=taps,
                                features=int(cfg.get("depth_features", 256)))
            dv = load_vars("depth_checkpoint", lambda: jax.jit(dm.init)(
                jax.random.PRNGKey(1), jnp.zeros((1, (H // 16) * 16,
                                                  (W // 16) * 16, 3))))
            fr = frames[:, : (H // 16) * 16, : (W // 16) * 16]
            d = estimate_depth_batched(dm, dv, fr,
                                       batch_size=int(cfg.get("depth_batch", 4)))
            out["depth"] = np.pad(d, ((0, 0), (0, 0),
                                      (0, H - d.shape[2]),
                                      (0, W - d.shape[3])), mode="edge")
        if "optical_flow" in tasks:
            from skix.models.raft import RAFT, compute_flow_sequence

            rm = RAFT(hidden=int(cfg.get("flow_hidden", 96)),
                      context=int(cfg.get("flow_context", 64)),
                      corr_levels=3, corr_radius=3,
                      iters=int(cfg.get("flow_iters", 8)))
            ph, pw = (-H) % 8, (-W) % 8
            rv = load_vars("flow_checkpoint", lambda: jax.jit(rm.init)(
                jax.random.PRNGKey(2),
                jnp.zeros((1, H + ph, W + pw, 3)),
                jnp.zeros((1, H + ph, W + pw, 3))))
            out["optical_flow"] = compute_flow_sequence(
                rm, rv, frames, chunk_size=int(cfg.get("flow_batch", 2)))
        if bool(cfg.get("tracking", True)) and frames.shape[0]:
            # reference: ultralytics mode="track" so person selection can
            # follow the SAME track id across frames
            # (yolov11_pose.py:173,241-269); runs after the flow task so
            # tracker_type: botsort can fit camera motion on it
            out["track_ids"] = _compute_track_ids(
                cfg, boxes, scores, valid, flow=out.get("optical_flow"))
            if "bbox_boxes" in out:
                # the reference tracks the separate bbox model too
                # (yolov11_bbox.py:113 mode="track")
                out["bbox_track_ids"] = _compute_track_ids(
                    cfg, out["bbox_boxes"], out["bbox_scores"],
                    out["bbox_valid"], flow=out.get("optical_flow"))
        return out

    return run


def _select_core(boxes, kpts, valid, track_ids):
    from skix.perception import fill_invalid_frames, select_person_sequence

    sel = select_person_sequence(boxes, kpts, det_valid=valid,
                                 track_ids=track_ids)
    kp = fill_invalid_frames(sel.keypoints, sel.valid)
    sc = fill_invalid_frames(sel.scores, sel.valid)
    bx = fill_invalid_frames(sel.boxes, sel.valid)
    return kp, sc, bx, sel.none_index


def _select_and_fill(det: dict) -> dict:
    """Jitted athlete selection + hole filling on raw padded detections
    (jit cached across videos — not a per-call closure). ``track_ids``
    (the ByteTrack det→id map) engage selection priority 1 when the
    backend tracked; −1s otherwise (priority falls through to
    prev-center/area exactly as before)."""
    import jax
    import jax.numpy as jnp

    if not hasattr(_select_and_fill, "_jit"):
        _select_and_fill._jit = jax.jit(_select_core)
    run = _select_and_fill._jit

    tid = det.get("track_ids")
    if tid is None:
        tid = np.full(np.asarray(det["det_valid"]).shape, -1, np.int32)
    kp, sc, bx, none_mask = run(jnp.asarray(det["boxes"], jnp.float32),
                                jnp.asarray(det["keypoints"], jnp.float32),
                                jnp.asarray(det["det_valid"], bool),
                                jnp.asarray(tid, jnp.int32))
    none_index = np.where(np.asarray(none_mask))[0].astype(np.int64)
    kp = np.asarray(kp)
    sc = np.asarray(sc)
    # xyxy bbox from cxcywh for contract parity
    bx = np.asarray(bx)
    xyxy = np.stack([bx[:, 0] - bx[:, 2] / 2, bx[:, 1] - bx[:, 3] / 2,
                     bx[:, 0] + bx[:, 2] / 2, bx[:, 1] + bx[:, 3] / 2], -1)
    kpts3 = np.concatenate([kp, sc[..., None]], axis=-1)
    return {"keypoints": kpts3.astype(np.float32),
            "scores": sc.astype(np.float32),
            "bbox": xyxy.astype(np.float32),
            "none_index": none_index}


def _mask_select_core(boxes, valid, masks):
    """Per-frame athlete mask: selection on the seg model's own boxes
    (the reference's YOLOv11Mask carries its own person picking), gather
    the chosen slot's mask, hole-fill invalid frames."""
    import jax.numpy as jnp

    from skix.perception import fill_invalid_frames, select_person_sequence

    T, K = boxes.shape[:2]
    dummy_kpts = jnp.zeros((T, K, 1, 2), boxes.dtype)
    sel = select_person_sequence(boxes, dummy_kpts, det_valid=valid)
    m = masks[jnp.arange(T), sel.sel_idx]            # (T, Hp, Wp)
    return fill_invalid_frames(m, sel.valid)


def _assemble_person_mask(det: dict, H: int, W: int,
                          chunk: int = 32) -> np.ndarray:
    """(T, 1, H, W) uint8 athlete mask for the pt contract: jitted
    selection + hole-fill at proto resolution, then chunked bilinear
    upsample of the probability field to frame size and 0.5 binarize
    (ultralytics process_mask ordering — upsample BEFORE threshold)."""
    import jax
    import jax.numpy as jnp

    if not hasattr(_assemble_person_mask, "_jit"):
        _assemble_person_mask._jit = jax.jit(_mask_select_core)
    m = _assemble_person_mask._jit(
        jnp.asarray(det["seg_boxes"], jnp.float32),
        jnp.asarray(det["seg_valid"], bool),
        jnp.asarray(det["seg_masks"], jnp.float32))
    T = m.shape[0]
    out = np.zeros((T, 1, H, W), np.uint8)
    for s in range(0, T, chunk):
        e = min(s + chunk, T)
        up = jax.image.resize(
            m[s:e], (e - s, *_padded_hw(H, W)), "bilinear")[:, :H, :W]
        out[s:e, 0] = np.asarray(up > 0.5, np.uint8)
    return out


def _padded_hw(H: int, W: int):
    # the seg masks live on the stride-4 grid of the /32-padded frame
    return (H + (-H) % 32, W + (-W) % 32)


def process_video(cfg, video_path: Path, out_path: Path) -> PTInfo:
    meta = probe_video(video_path)
    max_frames = cfg.get("max_frames")
    chunks = list(read_video_chunks(video_path,
                                    chunk_size=int(cfg.get("chunk_size", 64)),
                                    max_frames=max_frames))
    frames = (np.concatenate(chunks, 0) if chunks
              else np.zeros((0, meta.height, meta.width, 3), np.uint8))
    T = frames.shape[0]

    backend_name = str(cfg.get("backend", "precomputed"))
    backend = _BACKENDS[backend_name](cfg, video_path)
    det = backend(frames)
    sel = _select_and_fill(det)
    if "bbox_boxes" in det and T:
        # bbox slot from the SEPARATE plain-detect run (reference keeps
        # the bbox model's own picking — yolov11_bbox.py:139-196)
        K = det["bbox_boxes"].shape[1]
        sel_bbox = _select_and_fill({
            "boxes": det["bbox_boxes"],
            "keypoints": np.zeros((T, K, 1, 2), np.float32),
            "det_valid": det["bbox_valid"],
            "track_ids": det.get("bbox_track_ids")})
        sel = dict(sel, bbox=sel_bbox["bbox"])
    # second, independent 2D source (reference: detectron2 next to YOLO;
    # triangulation/load.py:193 reads the d2 slots separately)
    if "d2_boxes" in det:
        sel_d2 = _select_and_fill({"boxes": det["d2_boxes"],
                                   "keypoints": det["d2_keypoints"],
                                   "det_valid": det["d2_det_valid"]})
    else:
        sel_d2 = sel

    yolo_mask = None
    if "seg_masks" in det and T:
        yolo_mask = _assemble_person_mask(det, frames.shape[1],
                                          frames.shape[2])

    info = PTInfo(
        video_name=video_path.stem,
        video_path=str(video_path),
        frame_count=T,
        img_shape=(frames.shape[1], frames.shape[2]),
        fps=meta.fps,
        duration=T / meta.fps if meta.fps else 0.0,
        frames=frames if bool(cfg.get("store_frames", False)) else None,
        depth=det.get("depth"),
        optical_flow=det.get("optical_flow"),
        yolo_mask=yolo_mask,
        none_index=sel["none_index"],
        yolo_bbox=sel["bbox"],
        yolo_keypoints=sel["keypoints"],
        yolo_keypoints_score=sel["scores"],
        d2_bbox=sel_d2["bbox"],
        d2_keypoints=sel_d2["keypoints"],
        d2_keypoints_score=sel_d2["scores"],
    )
    check_pt_info_shapes(info)
    save_pt_info(out_path, info)
    return info


@cli_main("prepare_dataset")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    root = Path(cfg.paths.video_root)
    out_root = Path(cfg.paths.out_root)
    done, failed, skipped = 0, 0, 0
    for person_dir in iter_person_dirs(root, cfg):
        for video in sorted(person_dir.glob("*.mp4")):
            out_path = out_root / person_dir.name / f"{video.stem}.npz"
            if out_path.exists() and not bool(cfg.get("overwrite", False)):
                skipped += 1
                continue
            try:
                process_video(cfg, video, out_path)
                done += 1
                log.info("processed %s/%s", person_dir.name, video.name)
            except Exception:  # noqa: BLE001 — per-video isolation
                failed += 1
                log.exception("video %s failed", video)
    log.info("prepare_dataset: %d done, %d skipped, %d failed",
             done, skipped, failed)


if __name__ == "__main__":
    main()
