"""Visualization + BEV + calibration + vis CLI tests."""

import numpy as np
import pytest

rng = np.random.default_rng(13)


class TestSkeletonVis:
    def test_draw_2d(self):
        from skix.vis import SkeletonVisualizer

        frame = np.zeros((64, 64, 3), np.uint8)
        kpts = rng.uniform(5, 59, size=(17, 2))
        out = SkeletonVisualizer("coco").draw_2d(frame, kpts)
        assert out.shape == frame.shape
        assert out.sum() > 0  # something drawn
        assert frame.sum() == 0  # original untouched

    def test_draw_2d_respects_scores(self):
        from skix.vis import SkeletonVisualizer

        frame = np.zeros((64, 64, 3), np.uint8)
        kpts = rng.uniform(5, 59, size=(17, 2))
        out = SkeletonVisualizer("coco").draw_2d(
            frame, kpts, scores=np.zeros(17))
        assert out.sum() == 0  # all below min_score

    def test_plot_3d_frame(self):
        from skix.vis import SkeletonVisualizer

        img = SkeletonVisualizer("h36m").plot_3d_frame(
            rng.normal(size=(17, 3)))
        assert img.ndim == 3 and img.shape[2] == 3

    def test_scene_with_cameras(self):
        from skix.vis import SceneVisualizer

        img = SceneVisualizer("mhr70").plot_scene(
            [rng.normal(size=(70, 3))],
            cameras=[{"K": np.diag([1000, 1000, 1]).astype(float),
                      "R": np.eye(3), "t": np.zeros(3)}])
        assert img.ndim == 3

    def test_render_animation(self, tmp_path):
        from skix.vis import render_animation
        from skix.io.video import probe_video

        T = 4
        render_animation(rng.uniform(0, 100, (T, 17, 2)),
                         rng.normal(size=(T, 17, 3)),
                         tmp_path / "anim.mp4", fps=4)
        assert probe_video(tmp_path / "anim.mp4").frame_count == T


class TestBEV:
    def test_foot_from_bbox(self):
        from skix.front_side import foot_from_bbox_xyxy

        f = foot_from_bbox_xyxy(np.array([10.0, 20, 30, 80]))
        np.testing.assert_allclose(f, [20.0, 80.0])

    def test_homography_maps_corners(self):
        from skix.front_side import BEVConfig, bev_homography
        from skix.front_side.bev import apply_homography, make_bev_canvas

        cfg = BEVConfig()
        H, (w, h) = bev_homography(cfg=cfg)
        # bottom-left image corner → (-15, 0) m → on-canvas
        uv = apply_homography(H, np.array([[0.0, 1080.0]]))
        (ww, hh), S = make_bev_canvas(cfg)
        want = apply_homography(S, np.array([[-15.0, 0.0]]))
        np.testing.assert_allclose(uv, want, atol=1e-3)
        assert 0 <= uv[0, 0] <= w and 0 <= uv[0, 1] <= h

    def test_project_world_centered(self):
        from skix.front_side import project_world_to_bev

        k = np.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 0, 1.0],
                      [np.nan, 0, 0]])
        uv = project_world_to_bev(k, np.zeros(3), (100, 100),
                                  meters_per_pixel=0.1)
        np.testing.assert_allclose(uv[0], [100, 100])
        np.testing.assert_allclose(uv[1], [110, 100])  # +x → +u
        np.testing.assert_allclose(uv[2], [100, 90])   # +z → −v
        assert np.all(np.isnan(uv[3]))

    def test_rot90(self):
        from skix.front_side import project_world_to_bev

        k = np.array([[1.0, 0, 0]])
        uv = project_world_to_bev(k, np.zeros(3), (0, 0),
                                  meters_per_pixel=1.0, rot90_left=True)
        np.testing.assert_allclose(uv[0], [0, -1])  # x maps to z slot

    def test_draw(self):
        from skix.front_side import draw_bev_skeleton

        canvas = np.zeros((50, 50, 3), np.uint8)
        pts = np.full((21, 2), np.nan)
        pts[9] = [10, 10]
        pts[10] = [30, 30]
        out = draw_bev_skeleton(canvas, pts)
        assert out.sum() > 0


class TestCalibrationCLI:
    def test_chessboard_end_to_end(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from skix.pipelines.camera_calibration import main

        # synthesize chessboard photos with a known camera
        cols, rows, sq = 9, 6, 25.0
        K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
        dist = np.zeros(5)
        objp = np.zeros((cols * rows, 3), np.float32)
        objp[:, :2] = np.mgrid[0:cols, 0:rows].T.reshape(-1, 2) * sq
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rngl = np.random.default_rng(2)
        n_img = 0
        for i in range(12):
            rvec = rngl.normal(size=3) * 0.25
            tvec = np.array([-100.0 + 15 * i, -60.0, 520.0 + 12 * i])
            proj, _ = cv2.projectPoints(objp, rvec, tvec, K, dist)
            proj = proj.reshape(-1, 2)
            if proj.min() < 12 or proj[:, 0].max() > 628 or proj[:, 1].max() > 468:
                continue
            img = np.full((480, 640), 255, np.uint8)
            # render a filled chessboard by warping a synthetic board image
            board = np.zeros(((rows + 1) * 40, (cols + 1) * 40), np.uint8)
            for r in range(rows + 1):
                for c in range(cols + 1):
                    if (r + c) % 2 == 0:
                        board[r * 40:(r + 1) * 40, c * 40:(c + 1) * 40] = 255
            src = np.array([[40, 40], [cols * 40, 40], [40, rows * 40]],
                           np.float32)
            dst = np.array([proj[0], proj[cols - 1],
                            proj[(rows - 1) * cols]], np.float32)
            M = cv2.getAffineTransform(src, dst)
            warped = cv2.warpAffine(board, M, (640, 480), flags=cv2.INTER_LINEAR,
                                    borderValue=255)
            img = warped
            cv2.imwrite(str(img_dir / f"img_{i:02d}.png"), img)
            n_img += 1
        if n_img < 5:
            pytest.skip("not enough synthetic views rendered")
        out_dir = tmp_path / "out"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "camera_calibration.yaml").write_text(f"""
paths:
  input: {img_dir}
  out_dir: {out_dir}
board_cols: {cols}
board_rows: {rows}
square_size_mm: {sq}
use_rational_model: false
prune_top_ratio: 0.1
""")
        main([f"--config-dir={cdir}"])
        with np.load(out_dir / "calibration_parameters.npz") as z:
            K_est = z["K"]
            rms = float(z["rms"])
        # affine-warped board ≈ weak-perspective views ⇒ loose focal check
        assert rms < 2.0
        assert (out_dir / "calibration_parameters.yml").exists()
        assert (out_dir / "reprojection_errors.csv").exists()
        assert K_est.shape == (3, 3)


class TestVis3DKptCLI:
    def test_fused_mode(self, tmp_path):
        from skix.pipelines.vis_3d_kpt import main
        from skix.io.video import probe_video

        in_root = tmp_path / "fused" / "p01"
        in_root.mkdir(parents=True)
        np.save(in_root / "p01_smoothed.npy",
                rng.normal(size=(3, 70, 3)).astype(np.float32))
        out_root = tmp_path / "vis"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "vis_3d_kpt.yaml").write_text(f"""
paths:
  in_root: {tmp_path / 'fused'}
  out_root: {out_root}
mode: fused
layout: mhr70
fps: 3.0
""")
        main([f"--config-dir={cdir}"])
        vid = out_root / "p01" / "p01_smoothed_3d.mp4"
        assert vid.exists()
        assert probe_video(vid).frame_count == 3


class TestFrontSideCLI:
    def test_end_to_end(self, tmp_path):
        from skix.pipelines.front_side import main
        from skix.io.video import probe_video

        T = 6
        side = tmp_path / "side" / "p01"
        side.mkdir(parents=True)
        base = rng.normal(size=(T, 70, 3)).cumsum(0) * 0.02
        np.save(side / "left_view.npy", base.astype(np.float32))
        np.save(side / "right_view.npy",
                (base + rng.normal(size=base.shape) * 0.01).astype(np.float32))
        front = tmp_path / "front" / "p01"
        front.mkdir(parents=True)
        bbox = np.tile(np.array([900.0, 400, 1000, 800], np.float32), (T, 1))
        bbox[:, [1, 3]] += np.arange(T)[:, None] * 20  # moving downhill
        np.save(front / "person_bboxes.npy", bbox)
        out_root = tmp_path / "fs"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "front_side.yaml").write_text(f"""
paths:
  side_root: {tmp_path / 'side'}
  front_root: {tmp_path / 'front'}
  out_root: {out_root}
meters_per_pixel: 0.02
fps: 6.0
render3d: true
render3d_width: 128
render3d_height: 96
""")
        main([f"--config-dir={cdir}"])
        assert probe_video(out_root / "p01" / "p01_bev.mp4").frame_count == T
        # opt-in offscreen 3D BEV render (JAX rasterizer)
        assert probe_video(out_root / "p01" / "p01_bev3d.mp4").frame_count == T
        world = np.load(out_root / "p01" / "p01_world.npy")
        assert world.shape == (T, 70, 3)
        import json

        rep = json.loads((out_root / "front_side_summary.json").read_text())
        assert rep["p01"]["traj_length_px"] > 0


class TestReprojectionVis:
    def test_panel_and_report(self, tmp_path):
        from skix.vis.reprojection import (reprojection_panel,
                                           reprojection_report,
                                           save_reprojection_video)
        from skix.io.video import probe_video

        r = np.random.default_rng(5)
        obs = r.uniform(100, 500, (3, 17, 2))
        rep = obs + r.normal(size=obs.shape) * 3
        obs[0, 2] = np.nan  # one invalid joint
        panel = reprojection_panel(None, obs[0], rep[0], title="t0")
        assert panel.shape == (1080, 1920, 3)
        stats = reprojection_report(obs, rep)
        assert 2.0 < stats["mean_px"] < 8.0
        assert stats["valid_fraction"] < 1.0
        save_reprojection_video(None, obs, rep, tmp_path / "reproj.mp4",
                                fps=3)
        assert probe_video(tmp_path / "reproj.mp4").frame_count == 3
