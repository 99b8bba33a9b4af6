"""Stage CLI: end-to-end pipeline orchestrator with per-stage profiling.

The reference has no single entry that runs the whole dataflow — stages
are launched one-by-one from PBS scripts (pegasus/*.sh) or vscode launch
configs. This runner executes the FULL reference dataflow (SURVEY.md §1)

    prepare_dataset? → videopose3d → triangulation → vggt? →
    bundle_adjustment → sam3d_body? → fuse → front_side? →
    angle → metrics

over one dataset root, with per-stage wall-clock profiling
(skix.utils.StageTimer) and a consolidated summary — the M8 orchestration
milestone of SURVEY.md §7.2. Optional stages run when their inputs exist
(vggt/sam3d_body need frames stored in the records; front_side needs
front bboxes from prepare_front_results or ``paths.front_root``).

Each stage reads/writes the same directories the standalone CLIs use, so
partial runs and reruns compose (skip-if-exists semantics inside stages).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import yaml

from skix.config import cli_main
from skix.utils import StageTimer

log = logging.getLogger(__name__)


def _write_cfg(work: Path, name: str, body: dict) -> str:
    cdir = work / "generated_configs"
    cdir.mkdir(parents=True, exist_ok=True)
    (cdir / f"{name}.yaml").write_text(yaml.safe_dump(body))
    return str(cdir)


@cli_main("run_all")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    work = Path(cfg.paths.work_root)
    pt_root = Path(cfg.paths.pt_root)
    stages = list(cfg.get("stages",
                          ["videopose3d", "triangulation",
                           "bundle_adjustment", "fuse", "angle", "metrics"]))
    timer = StageTimer()
    summary = {}

    if "prepare_dataset" in stages:
        from skix.pipelines.prepare_dataset import main as prep

        video_root = cfg.paths.get("video_root")
        if not video_root:
            # the shipped default is null — str(None) would scan './None'
            raise ValueError("run_all with the prepare_dataset stage needs "
                             "paths.video_root set")
        cdir = _write_cfg(work, "prepare_dataset", {
            "paths": {"video_root": str(video_root),
                      "out_root": str(pt_root)},
            "backend": str(cfg.get("backend", "precomputed")),
            "store_frames": bool(cfg.get("store_frames", False)),
        })
        with timer.span("prepare_dataset"):
            prep([f"--config-dir={cdir}"])

    if "videopose3d" in stages:
        from skix.pipelines.videopose3d import main as vp3d

        cdir = _write_cfg(work, "videopose3d", {
            "paths": {"pt_root": str(pt_root),
                      "out_root": str(work / "videopose3d")},
            "checkpoint": cfg.get("lifter_checkpoint"),
            "filter_widths": list(cfg.get("filter_widths", [3, 3, 3])),
            "channels": int(cfg.get("channels", 128)),
            "kpt_source": str(cfg.get("kpt_source", "detectron2")),
        })
        with timer.span("videopose3d"):
            vp3d([f"--config-dir={cdir}"])
        summary["videopose3d"] = str(work / "videopose3d")

    if "triangulation" in stages:
        from skix.pipelines.triangulation import main as tri

        cdir = _write_cfg(work, "triangulation", {
            "paths": {"pt_root": str(pt_root),
                      "out_root": str(work / "joints_3d")},
            "kpt_source": str(cfg.get("kpt_source", "detectron2")),
            "baseline_m": float(cfg.get("baseline_m", 20.0)),
            "methods": list(cfg.get("tri_methods", ["kpt"])),
            "dist": None,
            "single_view": bool(cfg.get("single_view", False)),
        })
        with timer.span("triangulation"):
            tri([f"--config-dir={cdir}"])
        summary["triangulation"] = str(work / "joints_3d")

    if "vggt" in stages:
        from skix.pipelines.vggt import main as vggt

        cdir = _write_cfg(work, "vggt", {
            "paths": {"pt_root": str(pt_root),
                      "out_root": str(work / "vggt")},
            "mode": "multi",
            "img_size": int(cfg.get("vggt_img_size", 518)),
            "embed_dim": int(cfg.get("vggt_embed_dim", 1024)),
            "depth": int(cfg.get("vggt_depth", 24)),
            "num_heads": int(cfg.get("vggt_num_heads", 16)),
            "intermediate_layer_idx":
                list(cfg.get("vggt_taps", [4, 11, 17, 23])),
            "frame_stride": int(cfg.get("vggt_frame_stride", 30)),
            "checkpoint": cfg.get("vggt_checkpoint"),
            "kpt_source": str(cfg.get("kpt_source", "detectron2")),
        })
        with timer.span("vggt"):
            vggt([f"--config-dir={cdir}"])
        summary["vggt"] = str(work / "vggt")

    if "bundle_adjustment" in stages and not (work / "joints_3d").exists():
        log.warning("bundle_adjustment requested but %s does not exist "
                    "(run the triangulation stage first) — skipping",
                    work / "joints_3d")
    if "bundle_adjustment" in stages and (work / "joints_3d").exists():
        from skix.pipelines.bundle_adjustment import main as ba

        cdir = _write_cfg(work, "bundle_adjustment", {
            "paths": {"in_root": str(work / "joints_3d"),
                      "out_root": str(work / "ba")},
            "weights": {"reproj": 1.0, "cam_smooth": 0.1, "baseline": 0.01,
                        "bone": 0.1, "temporal": 0.1},
            "mode": str(cfg.get("ba_mode", "pose_only")),
            "method": str(cfg.get("ba_method", "lm")),
            "lm": {"max_steps": int(cfg.get("ba_max_steps", 30)),
                   "cg_iters": int(cfg.get("ba_cg_iters", 20))},
            "adam": {"iters": 200, "lr": 0.01},
        })
        with timer.span("bundle_adjustment"):
            ba([f"--config-dir={cdir}"])
        summary["bundle_adjustment"] = str(work / "ba")

    sam3d_root = cfg.paths.get("sam3d_root")
    if "sam3d_body" in stages and not sam3d_root:
        from skix.pipelines.prepare_side_results import main as sam3d

        sam3d_root = work / "sam3d"
        cdir = _write_cfg(work, "sam3d_body", {
            "paths": {"pt_root": str(pt_root), "out_root": str(sam3d_root)},
            "checkpoint": cfg.get("sam3d_checkpoint"),
            "crop_size": int(cfg.get("sam3d_crop_size", 256)),
            "embed_dim": int(cfg.get("sam3d_embed_dim", 384)),
            "vit_depth": int(cfg.get("sam3d_depth", 8)),
            "batch_size": int(cfg.get("sam3d_batch_size", 8)),
            # match the standalone stage default ("full" = hand decoder +
            # wrist refinement, configs/sam3d_body.yaml) so orchestrated
            # and standalone runs agree
            "inference_type": str(cfg.get("sam3d_inference_type",
                                          "full")),
        })
        with timer.span("sam3d_body"):
            sam3d([f"--config-dir={cdir}"])
        summary["sam3d_body"] = str(sam3d_root)

    fused_root = work / "fused"
    if "fuse" in stages:
        if sam3d_root and Path(sam3d_root).exists():
            from skix.pipelines.fuse import main as fuse

            cdir = _write_cfg(work, "fuse", {
                "paths": {"in_root": str(sam3d_root),
                          "out_root": str(fused_root)},
            })
            with timer.span("fuse"):
                fuse([f"--config-dir={cdir}"])
            summary["fuse"] = str(fused_root)
        else:
            log.warning("fuse requested but sam3d_root %r missing — "
                        "skipping", sam3d_root)

    front_root = cfg.paths.get("front_root")
    video_root = cfg.paths.get("video_root")
    if "prepare_front_results" in stages:
        if front_root:
            log.info("front_root provided — prepare_front_results skipped")
        elif not (video_root and Path(video_root).exists()):
            log.warning("prepare_front_results requested but video_root %r "
                        "missing — skipping", video_root)
        else:
            from skix.pipelines.prepare_front_results import main as front

            front_root = work / "front"
            cdir = _write_cfg(work, "prepare_front_results", {
                "paths": {"video_root": str(video_root),
                          "out_root": str(front_root)},
                "checkpoint": cfg.get("front_checkpoint"),
                "prompts": list(cfg.get("front_prompts",
                                        ["person", "snow"])),
                "max_frames": cfg.get("max_frames"),
            })
            with timer.span("prepare_front_results"):
                front([f"--config-dir={cdir}"])
            summary["prepare_front_results"] = str(front_root)

    if "front_side" in stages:
        ok_front = front_root and Path(front_root).exists()
        ok_side = sam3d_root and Path(sam3d_root).exists()
        if not (ok_front and ok_side):
            log.warning("front_side requested but inputs missing "
                        "(front_root=%r side=%r) — skipping",
                        front_root, sam3d_root)
        else:
            from skix.pipelines.front_side import main as front_side

            cdir = _write_cfg(work, "front_side", {
                "paths": {"side_root": str(sam3d_root),
                          "front_root": str(front_root),
                          "out_root": str(work / "front_side")},
                "meters_per_pixel":
                    float(cfg.get("meters_per_pixel", 0.02)),
                # the stage reads "render3d" (front_side.py); accept either key
                "render3d": bool(cfg.get("render3d",
                                         cfg.get("render_video",
                                                 False))),
            })
            with timer.span("front_side"):
                front_side([f"--config-dir={cdir}"])
            summary["front_side"] = str(work / "front_side")

    if "angle" in stages or "metrics" in stages:
        if not fused_root.exists():
            log.warning("angle/metrics requested but %s does not exist — "
                        "skipping", fused_root)
    if fused_root.exists():
        if "angle" in stages:
            from skix.pipelines.angle import main as angle

            cdir = _write_cfg(work, "angle", {
                "paths": {"fused_root": str(fused_root),
                          "out_root": str(work / "angle")},
                "plots": bool(cfg.get("plots", False)),
            })
            with timer.span("angle"):
                angle([f"--config-dir={cdir}"])
            summary["angle"] = str(work / "angle")

        if "metrics" in stages:
            from skix.pipelines.metrics import main as metrics

            cdir = _write_cfg(work, "metrics", {
                "paths": {"in_root": str(fused_root),
                          "out_root": str(work / "metrics")},
                "gt_root": cfg.get("gt_root"),
            })
            with timer.span("metrics"):
                metrics([f"--config-dir={cdir}"])
            summary["metrics"] = str(work / "metrics")

    timer.log_report()
    timer.save(work / "pipeline_timing.json")
    (work / "pipeline_summary.json").write_text(json.dumps(summary, indent=2))
    log.info("pipeline complete: %s", work / "pipeline_summary.json")


if __name__ == "__main__":
    main()
