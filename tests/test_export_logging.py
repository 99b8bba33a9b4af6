"""COLMAP export + metric logger tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from skix.geometry.rotations import quat_to_matrix, rotvec_to_matrix
from skix.io.colmap_export import export_colmap_text, read_colmap_images_txt
from skix.utils.metric_logger import MetricLogger, read_metrics

rng = np.random.default_rng(241)


class TestColmapExport:
    def test_roundtrip_poses(self, tmp_path):
        K = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]])
        Rs = np.stack([
            np.asarray(rotvec_to_matrix(jnp.asarray(rng.normal(size=3) * 0.4)))
            for _ in range(3)])
        ts = rng.normal(size=(3, 3))
        pts = rng.normal(size=(5, 3))
        out = export_colmap_text(tmp_path / "sparse", K, (1080, 1920),
                                 Rs, ts, points3d=pts)
        assert (out / "cameras.txt").exists()
        cams = (out / "cameras.txt").read_text()
        assert "PINHOLE 1920 1080 1000.0" in cams
        quats, ts_back, names = read_colmap_images_txt(out / "images.txt")
        np.testing.assert_allclose(ts_back, ts, atol=1e-6)
        R_back = np.asarray(quat_to_matrix(jnp.asarray(quats)))
        np.testing.assert_allclose(R_back, Rs, atol=1e-5)
        assert names[0] == "frame_000000.png"
        pts_lines = [ln for ln in (out / "points3D.txt").read_text()
                     .splitlines() if ln and not ln.startswith("#")]
        assert len(pts_lines) == 5


class TestMetricLogger:
    def test_jsonl_roundtrip(self, tmp_path):
        with MetricLogger(tmp_path) as ml:
            ml.log(1, loss=0.5, mpjpe=42.0)
            ml.log(2, loss=0.25)
        rows = read_metrics(tmp_path)
        assert len(rows) == 2
        assert rows[0]["loss"] == 0.5 and rows[0]["mpjpe"] == 42.0
        assert rows[1]["step"] == 2

    def test_append_across_sessions(self, tmp_path):
        with MetricLogger(tmp_path) as ml:
            ml.log(1, a=1.0)
        with MetricLogger(tmp_path) as ml:
            ml.log(2, a=2.0)
        assert len(read_metrics(tmp_path)) == 2


class TestLaunch:
    def test_single_host_initialize_noop(self):
        from skix.utils.launch import initialize_distributed

        info = initialize_distributed()
        assert info["num_processes"] == 1
        assert info["n_devices"] >= 1

    def test_shard_work_partitions_disjoint_and_complete(self):
        from skix.utils.launch import shard_work

        items = [f"p{i:02d}" for i in range(11)]
        parts = [shard_work(items, pid, 3) for pid in range(3)]
        joined = sorted(sum(parts, []))
        assert joined == sorted(items)
        assert all(set(a).isdisjoint(b)
                   for i, a in enumerate(parts) for b in parts[i + 1:])

    def test_launch_main_runs_a_stage(self, tmp_path):
        import numpy as np

        from skix.io import PTInfo, save_pt_info
        from skix.utils.launch import main

        rng = np.random.default_rng(971)
        T = 8
        pdir = tmp_path / "pt" / "p01"
        pdir.mkdir(parents=True)
        for view in ("osmo_1", "osmo_2"):
            kpts = rng.uniform(300, 900, (T, 17, 2)).astype(np.float32)
            score = np.ones((T, 17), np.float32)
            info = PTInfo(video_name=view, frame_count=T,
                          img_shape=(1080, 1920), fps=30.0, duration=T / 30,
                          d2_keypoints=np.concatenate(
                              [kpts, score[..., None]], -1),
                          d2_keypoints_score=score)
            save_pt_info(pdir / f"{view}.npz", info)
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "videopose3d.yaml").write_text(f"""
paths:
  pt_root: {tmp_path / 'pt'}
  out_root: {tmp_path / 'out'}
checkpoint: null
filter_widths: [3, 3]
channels: 16
""")
        main(["videopose3d", f"--config-dir={cdir}"])
        assert list((tmp_path / "out").rglob("*.npy"))

    def test_launch_shards_persons_across_processes(self, tmp_path,
                                                    monkeypatch):
        import numpy as np

        from skix.io import PTInfo, save_pt_info
        from skix.utils.launch import initialize_distributed, main

        rng = np.random.default_rng(972)
        T = 8
        for person in ("p01", "p02", "p03"):
            pdir = tmp_path / "pt" / person
            pdir.mkdir(parents=True)
            for view in ("osmo_1", "osmo_2"):
                kpts = rng.uniform(300, 900, (T, 17, 2)).astype(np.float32)
                score = np.ones((T, 17), np.float32)
                save_pt_info(pdir / f"{view}.npz", PTInfo(
                    video_name=view, frame_count=T, img_shape=(1080, 1920),
                    fps=30.0, duration=T / 30,
                    d2_keypoints=np.concatenate(
                        [kpts, score[..., None]], -1),
                    d2_keypoints_score=score))
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "videopose3d.yaml").write_text(f"""
paths:
  pt_root: {tmp_path / 'pt'}
  out_root: {tmp_path / 'out'}
checkpoint: null
filter_widths: [3, 3]
channels: 16
""")
        monkeypatch.setenv("SKIX_NUM_PROCESSES", "2")
        monkeypatch.setenv("SKIX_PROCESS_ID", "0")
        monkeypatch.setenv("SKIX_COORDINATOR", "localhost:0")
        monkeypatch.setenv("SKIX_FAKE_RENDEZVOUS", "1")
        initialize_distributed._initialized = False
        main(["videopose3d", f"--shard-root={tmp_path / 'pt'}",
              f"--config-dir={cdir}"])
        done = {p.parent.name for p in (tmp_path / "out").rglob("*.npy")}
        assert done == {"p01", "p03"}  # process 0 of 2: indices 0, 2
