"""Stage CLI: side-view videos → per-frame MHR-70 body estimates.

Reference entry: prepare_side_results/main.py:132 — GPUManager thread pool
(one video per GPU) driving per-frame SAM-3D-Body inference, athlete
selection (closest-to-camera + temporal continuity, infer.py:49), per-frame
``.npz`` saves (save.py:108).

TPU-first: no GPU pool/threads — the whole clip's crops batch through one
jitted forward (data parallelism over a mesh replaces the per-video thread
pool; see skix.parallel). Outputs: ``frame_%06d_sam_3d_body_outputs.npz``
files with the reference field names (consumed by skix.pipelines.fuse's
loader, matching reference fuse/load/load_raw.py:29).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from skix.config import cli_main, iter_person_dirs

log = logging.getLogger(__name__)


def build_estimator(cfg):
    from skix.models.sam3d_body import SAM3DBody, SAM3DBodyEstimator

    model = SAM3DBody(
        crop_size=int(cfg.get("crop_size", 256)),
        patch_size=int(cfg.get("patch_size", 16)),
        embed_dim=int(cfg.get("embed_dim", 384)),
        depth=int(cfg.get("vit_depth", 8)),
        num_heads=int(cfg.get("num_heads", 6)),
        decoder_depth=int(cfg.get("decoder_depth", 4)),
        focal_length=float(cfg.get("crop_focal", 5000.0)),
        backbone=str(cfg.get("backbone", "vit_hmr")),
    )
    variables = None
    ckpt = cfg.get("checkpoint")
    if ckpt and Path(ckpt).exists():
        from skix.pipelines.videopose3d import load_checkpoint

        variables = load_checkpoint(ckpt)
    else:
        log.warning("no SAM3DBody checkpoint configured — random init "
                    "(smoke mode)")
    return SAM3DBodyEstimator(model, variables)


def build_fov_estimator(cfg):
    """Optional MoGe-2 FOV estimator (reference
    tools/build_fov_estimator.py: ``fov_name: moge2`` wraps MoGeModel and
    overrides the batch intrinsics per image). ``fov_name: null`` disables
    it (reference prints "Using the default FOV!")."""
    name = cfg.get("fov_name") or ""
    if not name:
        return None
    if name != "moge2":
        raise ValueError(f"unknown fov_name {name!r} (only 'moge2')")
    from skix.models.moge import MoGeFovEstimator, MoGePointModel

    depth = int(cfg.get("fov_depth", 24))
    taps = cfg.get("fov_taps")
    if taps is None:
        # evenly-spaced 4-tap default scaled to the configured depth
        taps = [max(0, (i + 1) * depth // 4 - 1) for i in range(4)]
    model = MoGePointModel(
        patch_size=int(cfg.get("fov_patch_size", 14)),
        embed_dim=int(cfg.get("fov_embed_dim", 1024)),
        depth=depth,
        num_heads=int(cfg.get("fov_num_heads", 16)),
        taps=tuple(int(t) for t in taps),
    )
    ckpt = cfg.get("fov_checkpoint")
    if ckpt and Path(ckpt).exists():
        from skix.pipelines.videopose3d import load_checkpoint

        variables = load_checkpoint(ckpt)
    else:
        log.warning("no MoGe FOV checkpoint configured — random init "
                    "(smoke mode)")
        variables = None  # lazy init at the clip's padded size
    return MoGeFovEstimator(model, variables)


def build_human_detector(cfg):
    """Optional detector-in-the-loop (reference tools/build_detector.py:10
    ``HumanDetector`` over ``cascade_mask_rcnn_vitdet_h_75ep``): used when
    a record carries no precomputed person bbox
    (sam_3d_body_estimator.py:110-121). ``detector_name: ''`` disables it
    (reference prints "No human detector is used...")."""
    name = cfg.get("detector_name") or ""
    if not name:
        return None
    if name != "vitdet":
        raise ValueError(f"unknown detector_name {name!r} (only 'vitdet')")
    from skix.models.cascade_rcnn import CascadeMaskRCNN, HumanDetector

    model = CascadeMaskRCNN(
        embed_dim=int(cfg.get("detector_embed_dim", 1280)),
        depth=int(cfg.get("detector_depth", 32)),
        num_heads=int(cfg.get("detector_num_heads", 16)),
        window_size=int(cfg.get("detector_window", 14)),
        global_indexes=tuple(
            cfg.get("detector_global_indexes", (7, 15, 23, 31))),
    )
    variables = None
    ckpt = cfg.get("detector_checkpoint")
    if ckpt and Path(ckpt).exists():
        from skix.pipelines.videopose3d import load_checkpoint

        variables = load_checkpoint(ckpt)
    else:
        log.warning("no human-detector checkpoint configured — random "
                    "init (smoke mode)")
    return HumanDetector(model, variables,
                         image_size=int(cfg.get("detector_image_size",
                                                1024)))


def _process_detected_people(estimator, frames, human_detector, cfg,
                             image_focal=None):
    """No-bbox path with a detector in the loop (reference
    sam_3d_body_estimator.py:110-121 + infer.py athlete selection): run
    the estimator on EVERY detected-person slot, then pick the athlete
    per frame (closest camera depth + temporal continuity)."""
    from skix.models.sam3d_body import select_closest_person

    det_boxes, det_valid = human_detector.detect_clip(
        frames,
        batch_size=int(cfg.get("detector_batch", 4)),
        bbox_thr=float(cfg.get("detector_bbox_thr", 0.5)),
        max_people=int(cfg.get("max_people", 4)))
    T, n_slots = det_valid.shape
    per_slot = [estimator.process_clip(
        frames, det_boxes[:, n],
        batch_size=int(cfg.get("batch_size", 8)),
        image_focal=image_focal,
        inference_type=str(cfg.get("inference_type", "body")))
        for n in range(n_slots)]
    outputs, prev = [], None
    for t in range(T):
        cands = [per_slot[n][t] for n in range(n_slots) if det_valid[t, n]]
        pick = select_closest_person(cands, prev)
        ok = pick is not None
        if pick is None:
            # nobody detected this frame: carry the previous athlete
            # forward (fill_invalid convention) instead of emitting the
            # zero-box slot-0 output — and do NOT update `prev`, so the
            # continuity term keeps measuring against a REAL pose
            pick = prev if prev is not None else per_slot[0][t]
        else:
            prev = pick
        outputs.append(dict(pick, det_valid=np.asarray(ok)))
    return outputs


def process_one_video(estimator, record_path: Path, out_dir: Path, cfg,
                      fov_estimator=None, human_detector=None) -> int:
    from skix.io import load_pt_info

    info = load_pt_info(record_path)
    if info.frames is None:
        raise ValueError(f"{record_path} has no stored frames")
    bboxes = info.yolo_bbox if info.yolo_bbox is not None else info.d2_bbox
    image_focal = None
    if fov_estimator is not None:
        # Reference runs MoGe per image and keeps ONLY the vertical focal
        # (run_moge: fx := fy). Intrinsics drift little within a clip —
        # a stride subsamples the clip and repeats each estimate.
        stride = max(1, int(cfg.get("fov_stride", 8)))
        Ks = fov_estimator.intrinsics_for_clip(info.frames[::stride])
        image_focal = np.repeat(Ks[:, 1, 1],
                                stride)[: info.frames.shape[0]]
    if bboxes is None:
        if human_detector is not None:
            outputs = _process_detected_people(
                estimator, info.frames, human_detector, cfg,
                image_focal=image_focal)
            _save_frames_atomic(out_dir, outputs)
            return len(outputs)
        # reference else-branch (sam_3d_body_estimator.py:123-125): one
        # full-image box per frame, is_crop=False
        T, H, W = info.frames.shape[:3]
        log.warning("%s has no person bboxes and no detector configured "
                    "— full-image crops", record_path.name)
        bboxes = np.tile(np.asarray([0.0, 0.0, W, H], np.float32), (T, 1))
    masks = None
    if bool(cfg.get("use_mask", False)):
        # mask-conditioned inference (reference process_one_image
        # masks=...: externally provided masks, score 1): the pt
        # contract's YOLO-seg person mask is the precomputed source
        if info.yolo_mask is not None:
            masks = np.asarray(info.yolo_mask)
        else:
            log.warning("use_mask=true but %s has no yolo_mask — "
                        "running unconditioned", record_path.name)
    outputs = estimator.process_clip(
        info.frames, np.asarray(bboxes, np.float32),
        batch_size=int(cfg.get("batch_size", 8)),
        image_focal=image_focal,
        inference_type=str(cfg.get("inference_type", "body")),
        masks=masks)
    _save_frames_atomic(out_dir, outputs)
    return len(outputs)


def _save_frames_atomic(out_dir: Path, outputs) -> None:
    """Write the per-frame npz set into a tmp dir, then rename into
    place — the resume-by-existence skip in main() must never mistake a
    partially-written directory (killed mid-loop) for a finished one."""
    import shutil

    tmp = out_dir.parent / (out_dir.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    for t, out in enumerate(outputs):
        np.savez(tmp / f"frame_{t:06d}_sam_3d_body_outputs.npz", **out)
    if out_dir.exists():
        shutil.rmtree(out_dir)
    tmp.rename(out_dir)


@cli_main("sam3d_body")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    estimator = build_estimator(cfg)
    fov_estimator = build_fov_estimator(cfg)
    human_detector = build_human_detector(cfg)
    root = Path(cfg.paths.pt_root)
    out_root = Path(cfg.paths.out_root)
    report = {}
    for person_dir in iter_person_dirs(root, cfg):
        for rec in sorted(person_dir.glob("*.npz")) + sorted(person_dir.glob("*.pt")):
            if rec.name.endswith(".detections.npz"):
                continue
            out_dir = out_root / person_dir.name / rec.stem
            if out_dir.exists() and not bool(cfg.get("overwrite", False)):
                continue
            try:
                n = process_one_video(estimator, rec, out_dir, cfg,
                                      fov_estimator=fov_estimator,
                                      human_detector=human_detector)
                report[f"{person_dir.name}/{rec.stem}"] = n
                log.info("%s/%s: %d frames", person_dir.name, rec.stem, n)
            except Exception:  # noqa: BLE001 — per-video isolation + summary
                log.exception("%s failed", rec)
                report[f"{person_dir.name}/{rec.stem}"] = -1
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "sam3d_summary.json").write_text(json.dumps(report, indent=2))
    failures = sum(1 for v in report.values() if v == -1)
    log.info("done: %d videos, %d failures", len(report), failures)


if __name__ == "__main__":
    main()
