"""Stage CLI: front-view open-vocabulary tracking (person + snow).

Reference entry: prepare_front_results/prepare_front_results.py:58-129 —
build the (multi-GPU NCCL) SAM3 predictor, start_session on the video,
add_prompt(text="person") at frame 0, propagate_in_video, save all-frame
outputs to .npy, reset_session, repeat with text="snow", close.

Here the same protocol drives skix.tracking.VideoPredictor — one process,
one jitted pipeline, no NCCL (SURVEY.md §5.8). Outputs per prompt:
``<prompt>_bboxes.npy (T, K, 4)``, ``<prompt>_scores.npy``,
``<prompt>_active.npy``, plus ``person_bboxes.npy`` as the (T, 4) best
track for the front_side stage.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from skix.config import cli_main, iter_person_dirs

log = logging.getLogger(__name__)


def build_predictor(cfg):
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
        from skix.pipelines.videopose3d import load_checkpoint

        variables = load_checkpoint(ckpt)
    else:
        log.warning("no detector checkpoint configured — random init "
                    "(smoke mode)")
    tcfg = TrackerConfig(
        max_objects=int(cfg.get("max_objects", 16)),
        det_score_threshold=float(cfg.get("det_score_threshold", 0.5)),
        min_hits_to_confirm=int(cfg.get("min_hits_to_confirm", 3)),
    )
    return VideoPredictor(det, variables, tcfg,
                          batch_size=int(cfg.get("batch_size", 4)))


def process_video(pred, video_path: Path, out_dir: Path, cfg) -> dict:
    from skix.io.video import read_video

    frames = read_video(video_path, max_frames=cfg.get("max_frames"))
    sid = pred.start_session(frames)
    report = {}
    try:
        for prompt in list(cfg.get("prompts", ["person", "snow"])):
            pred.add_prompt(sid, prompt)
            boxes, scores, active, ids = [], [], [], []
            for out in pred.propagate_in_video(sid, prompt):
                o = out["outputs"]
                boxes.append(o["bbox"])
                scores.append(o["score"])
                active.append(o["active"])
                ids.append(o["obj_id"])
            out_dir.mkdir(parents=True, exist_ok=True)
            boxes = np.stack(boxes)
            scores = np.stack(scores)
            active = np.stack(active)
            np.save(out_dir / f"{prompt}_bboxes.npy", boxes)
            np.save(out_dir / f"{prompt}_scores.npy", scores)
            np.save(out_dir / f"{prompt}_active.npy", active)
            np.save(out_dir / f"{prompt}_obj_ids.npy", np.stack(ids))
            if prompt == "person":
                # (T, 4) best-track path for front_side
                best = np.argmax(np.where(active, scores, -1), axis=1)
                np.save(out_dir / "person_bboxes.npy",
                        boxes[np.arange(len(boxes)), best])
            report[prompt] = {
                "frames": int(len(boxes)),
                "mean_active": float(active.mean()),
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
        for video in sorted(person_dir.glob("*.mp4")):
            try:
                reports[f"{person_dir.name}/{video.stem}"] = process_video(
                    pred, video, out_root / person_dir.name, cfg)
                log.info("%s/%s tracked", person_dir.name, video.stem)
            except Exception:  # noqa: BLE001
                log.exception("%s failed", video)
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "front_summary.json").write_text(json.dumps(reports, indent=2))


if __name__ == "__main__":
    main()
