"""Stage CLI: end-to-end pipeline orchestrator with per-stage profiling.

The reference has no single entry that runs the whole dataflow — stages
are launched one-by-one from PBS scripts (pegasus/*.sh) or vscode launch
configs. This runner executes the chain

    prepare_dataset? → videopose3d → triangulation → sam3d_body? →
    fuse → angle → metrics

over one dataset root, with per-stage wall-clock profiling
(skix.utils.StageTimer) and a consolidated summary — the M8 orchestration
milestone of SURVEY.md §7.2.

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
                          ["videopose3d", "triangulation", "fuse", "angle",
                           "metrics"]))
    timer = StageTimer()
    summary = {}

    if "prepare_dataset" in stages:
        from skix.pipelines.prepare_dataset import main as prep

        cdir = _write_cfg(work, "prepare_dataset", {
            "paths": {"video_root": str(cfg.paths.get("video_root", "")),
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

    sam3d_root = cfg.paths.get("sam3d_root")
    fused_root = work / "fused"
    if "fuse" in stages and sam3d_root and Path(sam3d_root).exists():
        from skix.pipelines.fuse import main as fuse

        cdir = _write_cfg(work, "fuse", {
            "paths": {"in_root": str(sam3d_root),
                      "out_root": str(fused_root)},
        })
        with timer.span("fuse"):
            fuse([f"--config-dir={cdir}"])
        summary["fuse"] = str(fused_root)

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
