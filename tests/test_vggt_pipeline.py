"""VGGT stage CLI tests (tiny random model — exercises the full driver)."""

import json

import numpy as np
import pytest

rng = np.random.default_rng(41)

TINY_CFG = """
mode: {mode}
checkpoint: null
img_size: 28
patch_size: 14
embed_dim: 32
depth: 2
num_heads: 2
intermediate_layer_idx: [0, 0, 1, 1]
dtype: float32
frame_stride: {stride}
max_frames: 8
kpt_source: detectron2
ba_mode: pose_only
ba_max_steps: 5
enable_point: false
enable_depth: false
"""


class TestSingleView:
    def test_end_to_end(self, tmp_path):
        from skix.io.video import write_video
        from skix.pipelines.vggt import main

        root = tmp_path / "videos" / "p01"
        root.mkdir(parents=True)
        write_video(root / "osmo_1.mp4",
                    rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8),
                    fps=8)
        out_root = tmp_path / "out"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "vggt.yaml").write_text(
            f"paths:\n  video_root: {tmp_path / 'videos'}\n"
            f"  pt_root: {tmp_path / 'videos'}\n  out_root: {out_root}\n"
            + TINY_CFG.format(mode="single", stride=4))
        main([f"--config-dir={cdir}"])
        with np.load(out_root / "p01" / "osmo_1_multi_view_3d_info.npz") as z:
            assert z["extrinsic"].shape == (2, 3, 4)
            assert z["intrinsic"].shape == (2, 3, 3)
            assert z["R"].shape == (2, 3, 3)
            assert z["C"].shape == (2, 3)
            np.testing.assert_array_equal(z["frame_indices"], [0, 4])
        rep = json.loads((out_root / "vggt_summary.json").read_text())
        assert rep["p01/osmo_1"]["frames_processed"] == 2


class TestMultiView:
    def test_end_to_end_with_ba(self, tmp_path):
        from skix.io import PTInfo, save_pt_info
        from skix.pipelines.vggt import main

        T, H, W = 6, 32, 32
        pdir = tmp_path / "pt" / "p01"
        pdir.mkdir(parents=True)
        for name in ("osmo_1", "osmo_2"):
            kpts = rng.uniform(5, 27, (T, 17, 2)).astype(np.float32)
            score = np.ones((T, 17), np.float32)
            info = PTInfo(
                video_name=name, frame_count=T, img_shape=(H, W), fps=30.0,
                duration=T / 30.0,
                frames=rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8),
                d2_keypoints=np.concatenate([kpts, score[..., None]], -1),
                d2_keypoints_score=score)
            save_pt_info(pdir / f"{name}.npz", info)
        out_root = tmp_path / "out"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "vggt.yaml").write_text(
            f"paths:\n  video_root: {tmp_path / 'pt'}\n"
            f"  pt_root: {tmp_path / 'pt'}\n  out_root: {out_root}\n"
            + TINY_CFG.format(mode="multi", stride=3))
        main([f"--config-dir={cdir}"])
        with np.load(out_root / "p01" / "multi_view_refined.npz") as z:
            assert z["X3d"].shape == (T, 17, 3)
            assert np.all(np.isfinite(z["X3d"]))
            assert z["final_cost"] <= z["initial_cost"]
        rep = json.loads((out_root / "vggt_summary.json").read_text())
        assert rep["p01"]["vggt_pairs"] == 2


class TestSfmTracksCLI:
    def test_end_to_end(self, tmp_path):
        from skix.io.video import write_video
        from skix.pipelines.vggt import main

        root = tmp_path / "videos" / "p01"
        root.mkdir(parents=True)
        write_video(root / "osmo_1.mp4",
                    rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8),
                    fps=8)
        out_root = tmp_path / "out"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "vggt.yaml").write_text(
            f"paths:\n  video_root: {tmp_path / 'videos'}\n"
            f"  pt_root: {tmp_path / 'videos'}\n  out_root: {out_root}\n"
            + TINY_CFG.format(mode="sfm", stride=2).replace(
                "enable_point: false", "enable_point: true")
            + "sfm_max_frames: 4\nsfm_max_query_pts: 32\n"
              "sfm_query_frames: 2\nsfm_min_vis: 1\nsfm_vis_thresh: 0.0\n"
              "sfm_min_inlier_per_frame: 0\ntrack_dim: 16\n")
        main([f"--config-dir={cdir}"])
        with np.load(out_root / "p01" / "osmo_1_sfm_tracks.npz") as z:
            S, P, _ = z["tracks"].shape
            assert S == 4 and P > 0
            assert z["vis"].shape == (S, P)
            assert z["points_3d"].shape == (P, 3)
        rep = json.loads((out_root / "vggt_summary.json").read_text())
        assert rep["p01/osmo_1"]["reconstruction"] is True
        # the LM BA refinement ran and did not regress the cost
        assert (rep["p01/osmo_1"]["ba_final_cost"]
                <= rep["p01/osmo_1"]["ba_initial_cost"] + 1e-6)
        sparse = out_root / "p01" / "osmo_1_sparse"
        for f in ("cameras.txt", "images.txt", "points3D.txt"):
            assert (sparse / f).exists()
