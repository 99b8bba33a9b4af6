"""Semi-supervised training + Unity GT loader tests."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.semi_supervised import (
    SemiState,
    bone_length_consistency,
    init_semi_state,
    make_pose_and_traj_models,
    semi_supervised_step,
    weighted_traj_loss,
)
from skix.models.train import make_optimizer

rng = np.random.default_rng(29)


class TestSemiSupervised:
    def _setup(self):
        pose, traj = make_pose_and_traj_models(filter_widths=(3, 3),
                                               channels=16, strided=True)
        opt = make_optimizer(lr=5e-3, steps_per_epoch=100)
        state = init_semi_state(pose, traj, jax.random.PRNGKey(0), opt)
        return pose, traj, opt, state

    def _batches(self, pose):
        B = 4
        x_lab = jnp.asarray(rng.normal(size=(B, pose.rf, 17, 2)) * 0.3,
                            jnp.float32)
        y_lab = jnp.asarray(rng.normal(size=(B, 1, 17, 3)) * 0.2, jnp.float32)
        t_lab = jnp.asarray(np.tile([[0.0, 0.0, 5.0]], (B, 1, 1, 1)),
                            jnp.float32)
        x_un = jnp.asarray(rng.normal(size=(B, pose.rf, 17, 2)) * 0.3,
                           jnp.float32)
        cam = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0, 0, 0, 0, 0], jnp.float32)
        return x_lab, y_lab, t_lab, x_un, cam

    def test_warmup_loss_decreases(self):
        pose, traj, opt, state = self._setup()
        x_lab, y_lab, t_lab, x_un, cam = self._batches(pose)
        step = jax.jit(semi_supervised_step,
                       static_argnums=(0, 1, 2, 10))
        losses = []
        for i in range(25):
            state, loss = step(pose, traj, opt, state, x_lab, y_lab, t_lab,
                               x_un, cam, jax.random.PRNGKey(i), True)
            losses.append(float(loss))
        assert losses[-1] < 0.7 * losses[0]

    def test_full_objective_runs_and_improves(self):
        pose, traj, opt, state = self._setup()
        x_lab, y_lab, t_lab, x_un, cam = self._batches(pose)
        step = jax.jit(semi_supervised_step,
                       static_argnums=(0, 1, 2, 10))
        state, l0 = step(pose, traj, opt, state, x_lab, y_lab, t_lab,
                         x_un, cam, jax.random.PRNGKey(0), False)
        for i in range(25):
            state, loss = step(pose, traj, opt, state, x_lab, y_lab, t_lab,
                               x_un, cam, jax.random.PRNGKey(i + 1), False)
        assert float(loss) < float(l0)
        assert int(state.step) == 26

    def test_weighted_traj_loss_depth_weighting(self):
        near = jnp.asarray([[[[0.0, 0, 2.0]]]])
        far = jnp.asarray([[[[0.0, 0, 20.0]]]])
        err = jnp.asarray([[[[1.0, 0, 0]]]])
        l_near = float(weighted_traj_loss(near + err, near))
        l_far = float(weighted_traj_loss(far + err, far))
        assert l_near > l_far  # same metric error, nearer root weighs more

    def test_bone_consistency_zero_for_same(self):
        x = jnp.asarray(rng.normal(size=(2, 1, 17, 3)), jnp.float32)
        assert float(bone_length_consistency(x, x)) < 1e-6


class TestUnityLoader:
    def _write_jsonl(self, tmp_path, T=3):
        from skix.angle.biomech import UNITY_MHR70_MAPPING

        names = list(UNITY_MHR70_MAPPING.values())
        p2 = tmp_path / "gt2d.jsonl"
        p3 = tmp_path / "gt3d.jsonl"
        with open(p2, "w") as f2, open(p3, "w") as f3:
            for t in range(T):
                j2 = {"joints2d": [
                    {"name": n, "u": 100.0 + i, "v": 200.0 + t}
                    for i, n in enumerate(names)]}
                j3 = {"joints3d": [
                    {"name": n, "x": 1.0, "y": 2.0, "z": 3.0 + i}
                    for i, n in enumerate(names)]}
                f2.write(json.dumps(j2) + "\n")
                f3.write(json.dumps(j3) + "\n")
        return p2, p3

    def test_load_and_harmonize(self, tmp_path):
        from skix.io.unity import load_unity_gt_jsonl

        p2, p3 = self._write_jsonl(tmp_path)
        g2, g3, valid = load_unity_gt_jsonl(p2, p3, height=1080)
        assert g2.shape == (3, 15, 2) and g3.shape == (3, 15, 3)
        assert valid.all()
        # v flipped: v_px = 1080 − v
        np.testing.assert_allclose(g2[0, 0], [100.0, 1080.0 - 200.0])
        # axis conversion (x,y,z) → (−z,−y,x)
        np.testing.assert_allclose(g3[0, 0], [-3.0, -2.0, 1.0])

    def test_missing_joints_masked(self, tmp_path):
        from skix.io.unity import load_unity_gt_jsonl

        p2 = tmp_path / "a.jsonl"
        p3 = tmp_path / "b.jsonl"
        p2.write_text(json.dumps({"joints2d": [
            {"name": "Thigh_L", "u": 5, "v": 5}]}) + "\n")
        p3.write_text(json.dumps({"joints3d": [
            {"name": "Thigh_L", "x": 1, "y": 1, "z": 1}]}) + "\n")
        g2, g3, valid = load_unity_gt_jsonl(p2, p3)
        assert valid.sum() == 1


class TestMetricsUnityGT:
    def test_metrics_cli_with_jsonl_gt(self, tmp_path):
        from skix.angle.biomech import UNITY_MHR70_MAPPING
        from skix.pipelines.metrics import main

        names = list(UNITY_MHR70_MAPPING.values())
        T, J = 6, 15
        r = np.random.default_rng(6)
        gt3d_sam = r.normal(size=(T, J, 3))  # in SAM coords after conversion

        # write jsonl in UNITY coords such that conversion yields gt3d_sam:
        # (x,y,z)_unity -> (-z,-y,x)_sam  ⇒  unity = (z_sam, -y_sam, -x_sam)
        gt_root = tmp_path / "gt"
        gt_root.mkdir()
        with open(gt_root / "p01_3d.jsonl", "w") as f3, \
                open(gt_root / "p01_2d.jsonl", "w") as f2:
            for t in range(T):
                j3 = {"joints3d": [
                    {"name": n,
                     "x": float(gt3d_sam[t, i, 2]),
                     "y": float(-gt3d_sam[t, i, 1]),
                     "z": float(-gt3d_sam[t, i, 0])}
                    for i, n in enumerate(names)]}
                j2 = {"joints2d": [
                    {"name": n, "u": 10.0, "v": 10.0}
                    for n in names]}
                f3.write(json.dumps(j3) + "\n")
                f2.write(json.dumps(j2) + "\n")

        fused_root = tmp_path / "fused" / "p01"
        fused_root.mkdir(parents=True)
        np.save(fused_root / "p01_fused.npy",
                (gt3d_sam + r.normal(size=gt3d_sam.shape) * 0.01
                 ).astype(np.float32))
        np.save(fused_root / "p01_smoothed.npy",
                gt3d_sam.astype(np.float32))
        out_root = tmp_path / "metrics_out"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "metrics.yaml").write_text(f"""
paths:
  in_root: {tmp_path / 'fused'}
  out_root: {out_root}
gt_root: {gt_root}
""")
        main([f"--config-dir={cdir}"])
        rep = json.loads((out_root / "metrics_report.json").read_text())
        vs = rep["p01"]["vs_gt"]
        assert vs["mpjpe_smoothed"] < 1e-5      # exact GT
        assert 0.0 < vs["mpjpe_fused"] < 0.1    # noised copy
