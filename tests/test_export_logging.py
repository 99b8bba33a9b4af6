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
