"""Stage CLI: front-view open-vocabulary tracking (person + snow).

Reference entry: prepare_front_results/prepare_front_results.py:58-129 —
build the (multi-GPU NCCL) SAM3 video predictor, start_session on the
video, add_prompt(text="person") at frame 0, propagate_in_video, save
all-frame outputs (per-object masks + scores), reset_session, repeat with
text="snow", close.

Here the same protocol drives skix.tracking.VideoPredictor — one process,
one jitted pipeline, no NCCL (SURVEY.md §5.8). The default stack is the
reference-capability one: ``Sam3Detector`` (1008 px ViT-Det backbone,
200 queries, maskformer masks) + ``MaskMemoryTracker`` masklet propagation
+ the CLIP text tower when a checkpoint is configured. Outputs per prompt:

- ``<prompt>_masks.npy (T, K, h, w) bool`` — per-object masks
  (``save_mask_size`` rescales; default keeps video resolution)
- ``<prompt>_bboxes.npy (T, K, 4)`` xyxy in frame pixels
- ``<prompt>_scores.npy``, ``<prompt>_tracker_scores.npy``,
  ``<prompt>_active.npy``, ``<prompt>_obj_ids.npy``
- ``person_bboxes.npy (T, 4)`` — best-track path for the front_side stage

Smoke-scale overrides (tiny detector/tracker, hash prompt embedding) are
exercised by tests and documented in ``configs/prepare_front_results.yaml``;
running without checkpoints logs loudly that weights are random.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from skix.config import cli_main, iter_person_dirs

log = logging.getLogger(__name__)


def _load_vars(path):
    from skix.pipelines.videopose3d import load_checkpoint

    return load_checkpoint(path)


def _build_sam3(cfg):
    """Reference-capability predictor: Sam3Detector + masklet tracker."""
    import jax
    import jax.numpy as jnp

    from skix.tracking import MaskletConfig, VideoPredictor
    from skix.tracking.memory_tracker import MaskMemoryTracker, init_memory
    from skix.tracking.sam3_detector import Sam3Detector

    # YAML lists → tuples (Flax modules must stay hashable for jit caching)
    det_kw = {k: tuple(v) if isinstance(v, list) else v
              for k, v in dict(cfg.get("detector", {}) or {}).items()}
    det = Sam3Detector.full_size(**det_kw) if det_kw else \
        Sam3Detector.full_size()
    det_vars = None
    ckpt = cfg.get("detector_checkpoint")
    if ckpt and Path(ckpt).exists():
        det_vars = _load_vars(ckpt)
    else:
        log.warning("SMOKE MODE: no detector checkpoint — the %d-px "
                    "Sam3Detector runs with RANDOM weights; detections "
                    "are meaningless until a converted checkpoint is "
                    "configured (skix.tracking.sam3_detector converters)",
                    det.img_size)

    trk_kw = dict(cfg.get("tracker", {}) or {})
    trk = MaskMemoryTracker(**trk_kw)
    trk_vars = None
    tckpt = cfg.get("tracker_checkpoint")
    if tckpt and Path(tckpt).exists():
        trk_vars = _load_vars(tckpt)
    if trk_vars is None:
        import functools

        size = det.img_size   # MaskletVideoModel feeds frames at this size
        stride = 8 if trk.trunk == "conv" else 14   # conv pyramid | ViT-Det
        probe = jnp.zeros((1, size, size, 3))
        trk_vars = jax.jit(functools.partial(trk.init, method=trk.step))(
            jax.random.PRNGKey(1), probe,
            init_memory(trk.mem_slots, size // stride, size // stride,
                        trk.features))
        if tckpt:
            log.warning("tracker checkpoint %s missing — random init",
                        tckpt)

    mcfg = MaskletConfig(
        max_objects=int(cfg.get("max_objects", 16)),
        max_dets=int(cfg.get("max_dets", 16)),
        score_threshold_detection=float(
            cfg.get("det_score_threshold", 0.5)),
        new_det_thresh=float(cfg.get("new_det_thresh", 0.5)),
        assoc_iou_thresh=float(cfg.get("assoc_iou_thresh", 0.5)),
        trk_assoc_iou_thresh=float(cfg.get("trk_assoc_iou_thresh", 0.5)),
        hotstart_delay=int(cfg.get("hotstart_delay", 0)),
        occlusion_suppress_iou=float(
            cfg.get("occlusion_suppress_iou", 0.0)))

    clip = None
    clip_cfg = cfg.get("clip", {}) or {}
    clip_ckpt = clip_cfg.get("checkpoint") if clip_cfg else None
    if clip_ckpt and Path(clip_ckpt).exists():
        from skix.tracking.clip_text import VETextEncoder
        from skix.tracking.clip_tokenizer import ClipTokenizer

        tok = ClipTokenizer()
        enc = VETextEncoder(d_model=det.d_model)
        clip = (tok, enc, _load_vars(clip_ckpt))
    else:
        log.warning("SMOKE MODE: no CLIP checkpoint — text prompts use the "
                    "deterministic hash embedding, not the CLIP tower")

    # the config states `clip.checkpoint: null = hash embedding (smoke)` —
    # that null is the pipeline-level opt-in the session API now requires
    return VideoPredictor(det, det_vars, tracker=(trk, trk_vars),
                          masklet_cfg=mcfg, clip=clip,
                          smoke_prompts=clip is None)


def _build_compact(cfg):
    """Round-1 compact box-only predictor (cheap smoke path, no masks)."""
    from skix.tracking import DetrDetector, TrackerConfig, VideoPredictor

    det = DetrDetector(
        img_size=int(cfg.get("img_size", 256)),
        patch_size=int(cfg.get("patch_size", 16)),
        embed_dim=int(cfg.get("embed_dim", 192)),
        depth=int(cfg.get("vit_depth", 6)),
        num_heads=int(cfg.get("num_heads", 6)),
        num_queries=int(cfg.get("num_queries", 16)),
        decoder_depth=int(cfg.get("decoder_depth", 2)),
        prompt_dim=int(cfg.get("prompt_dim", 64)),
    )
    variables = None
    ckpt = cfg.get("checkpoint")
    if ckpt and Path(ckpt).exists():
        variables = _load_vars(ckpt)
    else:
        log.warning("no detector checkpoint configured — random init "
                    "(smoke mode)")
    tcfg = TrackerConfig(
        max_objects=int(cfg.get("max_objects", 16)),
        det_score_threshold=float(cfg.get("det_score_threshold", 0.5)),
        min_hits_to_confirm=int(cfg.get("min_hits_to_confirm", 3)))
    return VideoPredictor(det, variables, tcfg,
                          batch_size=int(cfg.get("batch_size", 4)))


def build_predictor(cfg):
    model = str(cfg.get("model", "sam3"))
    if model == "sam3":
        return _build_sam3(cfg)
    if model == "compact":
        return _build_compact(cfg)
    raise ValueError(f"unknown model '{model}' (sam3 | compact)")


def _resize_masks(masks, size):
    """(T, K, H, W) bool → nearest-resized (T, K, h, w) bool."""
    if size is None:
        return masks
    import jax

    h, w = (int(size), int(size)) if np.isscalar(size) else map(int, size)
    T, K = masks.shape[:2]
    out = jax.image.resize(np.asarray(masks, np.float32),
                           (T, K, h, w), "nearest")
    return np.asarray(out) > 0.5


def process_video(pred, video_path: Path, out_dir: Path, cfg) -> dict:
    from skix.io.video import read_video

    frames = read_video(video_path, max_frames=cfg.get("max_frames"))
    sid = pred.start_session(frames)
    has_masks = pred.tracker is not None
    report = {}
    try:
        for prompt in list(cfg.get("prompts", ["person", "snow"])):
            pred.add_prompt(sid, prompt)
            boxes, scores, active, ids = [], [], [], []
            masks, tscores = [], []
            for out in pred.propagate_in_video(sid, prompt):
                o = out["outputs"]
                boxes.append(o["bbox"])
                scores.append(o["score"])
                active.append(o["active"])
                ids.append(o["obj_id"])
                if has_masks:
                    masks.append(o["mask"])
                    tscores.append(o["tracker_score"])
            out_dir.mkdir(parents=True, exist_ok=True)
            boxes = np.stack(boxes)
            scores = np.stack(scores)
            active = np.stack(active)
            np.save(out_dir / f"{prompt}_bboxes.npy", boxes)
            np.save(out_dir / f"{prompt}_scores.npy", scores)
            np.save(out_dir / f"{prompt}_active.npy", active)
            np.save(out_dir / f"{prompt}_obj_ids.npy", np.stack(ids))
            if has_masks:
                m = _resize_masks(np.stack(masks),
                                  cfg.get("save_mask_size"))
                np.save(out_dir / f"{prompt}_masks.npy", m)
                np.save(out_dir / f"{prompt}_tracker_scores.npy",
                        np.stack(tscores))
            if prompt == "person":
                # (T, 4) best-track path for front_side. Frames with NO
                # active track must not emit the slot-0 garbage row the
                # bare argmax would pick: carry the nearest valid box
                # (the pipeline's fill_invalid convention) and save the
                # validity mask alongside.
                sel = np.where(active, scores, -1.0)
                best = np.argmax(sel, axis=1)
                tt = np.arange(len(best))
                valid = sel[tt, best] > -1.0
                pb = boxes[tt, best].astype(np.float32)
                if valid.any():
                    idx = np.where(valid, tt, -1)
                    ff = np.maximum.accumulate(idx)           # last valid ≤ t
                    first = int(np.argmax(valid))
                    ff = np.where(ff < 0, first, ff)          # backfill head
                    pb = pb[ff]
                np.save(out_dir / "person_bboxes.npy", pb)
                np.save(out_dir / "person_valid.npy", valid)
            if has_masks and bool(cfg.get("overlay_video", False)):
                # per-object masklet overlay video (the reference's
                # visualization_utils.py save_masklet_video output)
                from skix.vis.masklet import (masklet_outputs_from_session,
                                              save_masklet_video)

                H, W = frames.shape[1:3]
                per_frame = {
                    t: masklet_outputs_from_session(
                        {"mask": masks[t], "bbox": boxes[t],
                         "score": scores[t], "active": active[t],
                         "obj_id": ids[t]}, (H, W))
                    for t in range(len(boxes))}
                save_masklet_video(
                    frames, per_frame,
                    out_dir / f"{prompt}_overlay.mp4",
                    fps=float(cfg.get("overlay_fps", 10.0)))
            report[prompt] = {
                "frames": int(len(boxes)),
                "mean_active": float(active.mean()),
                "masks_saved": bool(has_masks),
            }
            pred.reset_session(sid)
    finally:
        pred.close_session(sid)
    return report


@cli_main("prepare_front_results")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    pred = build_predictor(cfg)
    root = Path(cfg.paths.video_root)
    out_root = Path(cfg.paths.out_root)
    reports = {}
    for person_dir in iter_person_dirs(root, cfg):
        videos = sorted(person_dir.glob("*.mp4"))
        for vi, video in enumerate(videos):
            # the reference pairs ONE front video per person and writes
            # a flat per-person layout (run.py:78 process_one_person;
            # front_side consumes <person>/person_bboxes.npy). Extra
            # videos in a person dir get their own <stem>/ subdir so
            # fixed-named outputs cannot silently overwrite each other.
            out_dir = out_root / person_dir.name
            if vi > 0:
                out_dir = out_dir / video.stem
                log.warning(
                    "%s: multiple front videos — %s outputs namespaced "
                    "under %s (front_side reads the first video's flat "
                    "layout)", person_dir.name, video.stem, out_dir)
            try:
                reports[f"{person_dir.name}/{video.stem}"] = process_video(
                    pred, video, out_dir, cfg)
                log.info("%s/%s tracked", person_dir.name, video.stem)
            except Exception:  # noqa: BLE001
                log.exception("%s failed", video)
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "front_summary.json").write_text(json.dumps(reports, indent=2))


if __name__ == "__main__":
    main()
