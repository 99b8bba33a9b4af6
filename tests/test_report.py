"""Report stage: the reference's analysis/*.ipynb inspections as a CLI
(schema dumps, GT-free pose metrics, skeleton plots, Unity-GT MPJPE)."""

import json
from pathlib import Path

import numpy as np

from skix.pipelines.report import (describe_artifact, main, pose_summary)


def _write_inputs(root: Path):
    rng = np.random.default_rng(5)
    (root / "pose3d").mkdir(parents=True)
    x = rng.normal(0, 0.3, (12, 17, 3)).astype(np.float32)
    np.save(root / "pose3d" / "left.npy", x)
    np.savez(root / "pose3d" / "clip.npz",
             fused=x + 0.01, score=np.ones((12,), np.float32),
             name=np.asarray("clip"))
    return x


class TestReport:
    def test_describe_artifact(self, tmp_path):
        x = _write_inputs(tmp_path)
        d = describe_artifact(tmp_path / "pose3d" / "clip.npz")
        assert d["fused"]["shape"] == [12, 17, 3]
        assert d["fused"]["finite_frac"] == 1.0
        assert "min" in d["fused"] and "max" in d["fused"]

    def test_pose_summary_layouts(self):
        rng = np.random.default_rng(6)
        for j in (17, 70):
            s = pose_summary(rng.normal(0, 0.2, (8, j, 3)).astype(
                np.float32))
            assert s["frames"] == 8 and s["jitter"] > 0
            assert np.isfinite(s["bone_cv"])
            assert np.isfinite(s["symmetry_error"])

    def test_cli_end_to_end(self, tmp_path):
        x = _write_inputs(tmp_path / "in")
        gt = x + 0.05  # known offset; root-centered MPJPE is small
        np.save(tmp_path / "gt.npy", gt)
        cdir = tmp_path / "conf"
        cdir.mkdir()
        (cdir / "report.yaml").write_text(f"""
paths:
  in_root: {tmp_path/'in'}
  out_root: {tmp_path/'out'}
patterns: ["**/*.npz", "**/*.npy"]
max_artifacts: 16
plot: true
unity_gt: {tmp_path/'gt.npy'}
""")
        results = main([f"--config-dir={cdir}"])
        out = tmp_path / "out"
        assert (out / "report.md").exists()
        data = json.loads((out / "report.json").read_text())
        assert set(data) == set(results)
        r = data["pose3d/clip.npz"]
        assert r["schema"]["fused"]["shape"] == [12, 17, 3]
        assert r["pose"]["fused"]["layout"] == "h36m"
        # GT comparison ran and is consistent (shared root-centering)
        assert r["gt"]["frames"] == 12
        assert r["gt"]["mpjpe_root_centered"] < 0.05
        # plots rendered
        assert r["plots"] and all((out / p).exists() for p in r["plots"])
        md = (out / "report.md").read_text()
        assert "pose3d/clip.npz" in md and "jitter" in md
