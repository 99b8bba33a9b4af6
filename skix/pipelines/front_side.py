"""Stage CLI: side fusion + front BEV trajectory merge.

Reference entry: front_side/main.py:126 (intersect modality roots per
subject) with driver front_side/run.py:41 — per frame: (a) Umeyama-fuse the
two side SAM-3D-Body views into a world skeleton (side/run.py:59), (b) front
SAM3 bbox → foot point → homography BEV (front/bev_utils.py:115), (c) merge:
project the world skeleton into BEV pixels around the foot point and draw
(run.py:222); write the merged video.

TPU-first: step (a) runs clip-at-once through skix.fuse; BEV math is
vectorized over the clip; only the cv2 drawing loop remains per-frame.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from skix.config import cli_main, iter_person_dirs
from skix.front_side import (BEVConfig, bev_homography, draw_bev_skeleton,
                             foot_from_bbox_xyxy, project_world_to_bev)

log = logging.getLogger(__name__)


def load_front_bboxes(path: Path) -> np.ndarray:
    """Front SAM3 person track: (T, 4) xyxy (the reference stores per-frame
    outputs as .npy from prepare_front_results)."""
    arr = np.load(path, allow_pickle=False)
    if arr.ndim == 3:  # (T, N, 4): take track 0
        arr = arr[:, 0]
    return np.asarray(arr, np.float32)


def process_person(person: str, side_left: Path, side_right: Path,
                   front_bboxes: Path, out_dir: Path, cfg) -> dict:
    import jax.numpy as jnp

    from skix.io.video import write_video
    from skix.pipelines.fuse import fuse_person, load_sam3d_sequence

    L3, L2 = load_sam3d_sequence(side_left)
    R3, R2 = load_sam3d_sequence(side_right)
    bboxes = load_front_bboxes(front_bboxes)
    T = min(len(L3), len(R3), len(bboxes))

    # (a) side fusion → world skeleton per frame (one jitted program)
    fused = fuse_person(L3[:T], R3[:T],
                        None if L2 is None else L2[:T],
                        None if R2 is None else R2[:T])
    world = np.asarray(fused.smoothed)  # (T, J, 3)

    # (b) front foot points → BEV pixels
    bev_cfg = BEVConfig(meters_per_pixel=float(cfg.get("meters_per_pixel", 0.02)))
    H, (bw, bh) = bev_homography(cfg.get("img_pts"), cfg.get("bev_pts_m"),
                                 bev_cfg)
    feet_img = foot_from_bbox_xyxy(bboxes[:T])  # (T, 2)
    from skix.front_side.bev import apply_homography

    feet_bev = apply_homography(H, feet_img)  # (T, 2) px on BEV canvas

    # (c) merge: draw trajectory + skeleton overlay per frame
    frames = []
    traj = []
    for t in range(T):
        canvas = np.full((bh, bw, 3), 10, np.uint8)
        traj.append(feet_bev[t])
        for p in traj:
            if np.all(np.isfinite(p)) and 0 <= p[0] < bw and 0 <= p[1] < bh:
                import cv2

                cv2.circle(canvas, tuple(np.round(p).astype(int)), 2,
                           (255, 200, 0), -1)
        center_world = np.nanmean(world[t], axis=0)
        uv = project_world_to_bev(world[t], center_world,
                                  (int(round(feet_bev[t, 0])),
                                   int(round(feet_bev[t, 1]))),
                                  meters_per_pixel=bev_cfg.meters_per_pixel,
                                  rot90_left=True)
        draw_bev_skeleton(canvas, uv)
        frames.append(canvas)

    out_dir.mkdir(parents=True, exist_ok=True)
    write_video(out_dir / f"{person}_bev.mp4", np.stack(frames),
                fps=float(cfg.get("fps", 30.0)))
    if bool(cfg.get("render3d", False)):
        # offscreen 3D BEV video (reference o3d_bev_video_robust.py
        # capability on the JAX rasterizer — no GL context needed)
        from skix.front_side.bev import BEV_EDGES_MINIMAL
        from skix.vis.render3d import BevVideoRenderer, BevView

        center = np.nanmean(world.reshape(-1, 3), axis=0)
        center = np.where(np.isfinite(center), center, 0.0)
        with BevVideoRenderer(
                out_dir / f"{person}_bev3d.mp4",
                edges=BEV_EDGES_MINIMAL,
                width=int(cfg.get("render3d_width", 1280)),
                height=int(cfg.get("render3d_height", 720)),
                fps=int(cfg.get("fps", 30)),
                view=BevView(lookat=tuple(center),
                             eye_height=float(cfg.get(
                                 "render3d_eye_height", 25.0))),
                kp_radius=float(cfg.get("render3d_kp_radius", 0.08)),
        ) as r3d:
            r3d.render_many(world)
    np.save(out_dir / f"{person}_world.npy", world)
    np.save(out_dir / f"{person}_feet_bev.npy", feet_bev)
    return {"frames": int(T),
            "traj_length_px": float(np.nansum(np.linalg.norm(
                np.diff(feet_bev, axis=0), axis=-1)))}


@cli_main("front_side")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    side_root = Path(cfg.paths.side_root)
    front_root = Path(cfg.paths.front_root)
    out_root = Path(cfg.paths.out_root)
    from skix.pipelines.fuse import _resolve_person_views

    reports = {}
    for person_dir in iter_person_dirs(side_root, cfg):
        views = _resolve_person_views(person_dir)
        fb = front_root / person_dir.name / "person_bboxes.npy"
        if not views or not fb.exists():
            log.warning("person %s: missing side views or front bboxes",
                        person_dir.name)
            continue
        try:
            reports[person_dir.name] = process_person(
                person_dir.name, views["left"], views["right"], fb,
                out_root / person_dir.name, cfg)
            log.info("person %s merged", person_dir.name)
        except Exception:  # noqa: BLE001
            log.exception("person %s failed", person_dir.name)
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "front_side_summary.json").write_text(
        json.dumps(reports, indent=2))


if __name__ == "__main__":
    main()
