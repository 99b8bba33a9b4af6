"""Stage CLI: Levenberg–Marquardt bundle adjustment over a clip.

Reference entry: bundle_adjustment/main.py:98 — scans modality roots, builds
SubjectData, runs per person. Its optimizer loop is dead code
(`run_local_ba` undefined, SURVEY.md §2.5); this stage actually solves,
with skix.solvers.bundle_adjust under jit.

Input per person: one npz with ``X3d (T,J,3)``, ``R (C,3,3)``, ``t (C,3)``,
``K (3,3)|(C,3,3)``, ``x2d (T,C,J,2)``, optional ``conf (T,C,J)``.
Output: refined npz + loss breakdown + reprojection-error log (the
reference logs reprojection errors after every geometric step,
bundle_adjustment/run.py:158-179).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

from skix.config import cli_main

log = logging.getLogger(__name__)


def refine_person(npz_path: Path, out_dir: Path, cfg) -> dict:
    from skix.solvers import BAConfig, bundle_adjust

    with np.load(npz_path, allow_pickle=False) as z:
        data = dict(z)
    ba_cfg = BAConfig(
        w_reproj=float(cfg.weights.reproj),
        w_cam_smooth=float(cfg.weights.cam_smooth),
        w_baseline=float(cfg.weights.baseline),
        w_bone=float(cfg.weights.bone),
        w_temporal=float(cfg.weights.temporal),
        mode=str(cfg.mode),
        method=str(cfg.method),
        max_steps=int(cfg.lm.max_steps),
        cg_iters=int(cfg.lm.cg_iters),
        adam_iters=int(cfg.adam.iters),
        adam_lr=float(cfg.adam.lr),
    )
    t0 = time.perf_counter()
    res = bundle_adjust(data["X3d"], data["R"], data["t"], data["K"],
                        data["x2d"], data.get("conf"), cfg=ba_cfg)
    # force completion for honest timing
    X = np.asarray(res.X)
    dt_ms = (time.perf_counter() - t0) * 1e3

    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(out_dir / f"{npz_path.stem}_refined.npz",
             X3d=X, R=np.asarray(res.R), t=np.asarray(res.t))
    report = {
        "solve_ms": round(dt_ms, 2),
        "iterations": int(res.iterations),
        "initial_cost": float(res.initial_cost),
        "final_cost": float(res.final_cost),
        **{k: float(v) for k, v in res.losses.items()},
    }
    (out_dir / f"{npz_path.stem}_ba_report.json").write_text(
        json.dumps(report, indent=2))
    return report


@cli_main("bundle_adjustment")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    root = Path(cfg.paths.in_root)
    out_root = Path(cfg.paths.out_root)
    required = {"X3d", "R", "t", "K", "x2d"}
    reports = {}
    for npz in sorted(root.rglob("*.npz")):
        with np.load(npz, allow_pickle=False) as z:
            if not required <= set(z.keys()):
                continue  # not a BA input bundle (pose logs etc.)
        try:
            reports[npz.stem] = refine_person(npz, out_root / npz.parent.name,
                                              cfg)
            log.info("%s: %.1f ms, cost %.4g → %.4g", npz.stem,
                     reports[npz.stem]["solve_ms"],
                     reports[npz.stem]["initial_cost"],
                     reports[npz.stem]["final_cost"])
        except Exception:  # noqa: BLE001
            log.exception("%s failed", npz)
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "ba_summary.json").write_text(json.dumps(reports, indent=2))


if __name__ == "__main__":
    main()
