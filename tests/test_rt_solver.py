"""R|t solver + subject map + record-validator tests."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from skix.geometry.rotations import rotvec_to_matrix
from skix.solvers.rt_solver import solve_rt_from_3d

rng = np.random.default_rng(149)


class TestRTSolver:
    def _problem(self, noise_px=0.0):
        rng = np.random.default_rng(149)  # local: order-independent tests
        K = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]])
        R_l = np.eye(3)
        t_l = np.zeros(3)
        R_r = np.asarray(rotvec_to_matrix(jnp.asarray([0.05, 0.4, 0.02])))
        t_r = np.array([-8.0, 0.3, 1.0])
        X = rng.normal(size=(60, 3)) * 1.5 + np.array([0, 0, 15.0])

        def proj(Xw, R, t):
            Xc = Xw @ R.T + t
            uv = Xc[:, :2] / Xc[:, 2:]
            return uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

        uv_l = proj(X, R_l, t_l) + rng.normal(size=(60, 2)) * noise_px
        uv_r = proj(X, R_r, t_r) + rng.normal(size=(60, 2)) * noise_px
        return K, R_r, t_r, X, uv_l, uv_r

    def test_refines_noised_cameras(self):
        K, R_r, t_r, X, uv_l, uv_r = self._problem()
        init = {
            "rl": jnp.zeros(3), "tl": jnp.zeros(3),
            "rr": jnp.asarray(np.asarray(
                jnp.asarray([0.08, 0.35, 0.0]))),  # perturbed
            "tr": jnp.asarray(t_r + np.array([0.4, -0.2, 0.3])),
        }
        sol = solve_rt_from_3d(X, uv_l, uv_r, K, init=init)
        assert float(sol.final_cost) < 0.01 * float(sol.initial_cost)
        np.testing.assert_allclose(np.asarray(sol.R_right), R_r, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sol.t_right), t_r, atol=5e-2)

    def test_auto_init_from_epipolar(self):
        K, R_r, t_r, X, uv_l, uv_r = self._problem()
        sol = solve_rt_from_3d(X, uv_l, uv_r, K,
                               baseline_m=float(np.linalg.norm(t_r)))
        # noiseless data: the solve must end at (near-)zero reprojection
        assert float(sol.final_cost) <= float(sol.initial_cost)
        assert float(sol.final_cost) < 1.0  # ~sub-pixel over 60 joints

    def test_robust_to_outliers(self):
        K, R_r, t_r, X, uv_l, uv_r = self._problem()
        uv_r = uv_r.copy()
        uv_r[::10] += 300.0  # 10% gross outliers
        init = {"rl": jnp.zeros(3), "tl": jnp.zeros(3),
                "rr": jnp.asarray([0.05, 0.4, 0.02]),
                "tr": jnp.asarray(t_r)}
        sol = solve_rt_from_3d(X, uv_l, uv_r, K, init=init,
                               soft_l1_delta=2.0)
        # soft-L1 keeps the solution near truth despite outliers
        np.testing.assert_allclose(np.asarray(sol.R_right), R_r, atol=5e-3)

    def test_full_mode_refines_points(self):
        K, R_r, t_r, X, uv_l, uv_r = self._problem()
        local = np.random.default_rng(7)
        Xn = X + local.normal(size=X.shape) * 0.05
        init = {"rl": jnp.zeros(3), "tl": jnp.zeros(3),
                "rr": jnp.asarray(np.asarray(rotvec_to_matrix(
                    jnp.asarray([0.05, 0.4, 0.02])))) if False else
                jnp.asarray([0.05, 0.4, 0.02]),
                "tr": jnp.asarray(t_r)}
        sol = solve_rt_from_3d(Xn, uv_l, uv_r, K, init=init,
                               refine_points=True, max_steps=150,
                               cg_iters=60)
        err = np.linalg.norm(np.asarray(sol.X) - X, axis=-1).mean()
        err0 = np.linalg.norm(Xn - X, axis=-1).mean()
        assert err < 0.35 * err0


class TestSubjectMap:
    def test_intersection(self, tmp_path):
        from skix.io.subjects import build_subject_map

        for mod, persons in (("pt", ["p01", "p02", "p03"]),
                             ("vggt", ["p01", "p03"]),
                             ("sam3d", ["p03", "p04"])):
            for p in persons:
                (tmp_path / mod / p).mkdir(parents=True)
        subs = build_subject_map({m: tmp_path / m
                                  for m in ("pt", "vggt", "sam3d")})
        assert list(subs) == ["p03"]
        assert subs["p03"]["pt"] == tmp_path / "pt" / "p03"

    def test_union_with_gaps(self, tmp_path):
        from skix.io.subjects import build_subject_map

        (tmp_path / "a" / "p01").mkdir(parents=True)
        (tmp_path / "b" / "p02").mkdir(parents=True)
        subs = build_subject_map({"a": tmp_path / "a", "b": tmp_path / "b"},
                                 require_all=False)
        assert set(subs) == {"p01", "p02"}
        assert subs["p01"]["b"] is None


class TestValidateCLI:
    def test_reports_good_and_bad(self, tmp_path):
        from skix.io import PTInfo, save_pt_info
        from skix.pipelines.validate_records import main

        root = tmp_path / "pt" / "p01"
        root.mkdir(parents=True)
        good = PTInfo(video_name="good", frame_count=3, img_shape=(4, 4),
                      yolo_keypoints=np.zeros((3, 17, 3), np.float32))
        save_pt_info(root / "good.npz", good)
        bad = PTInfo(video_name="bad", frame_count=5, img_shape=(4, 4),
                     yolo_keypoints=np.zeros((3, 17, 3), np.float32))
        save_pt_info(root / "bad.npz", bad, validate=False)
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "validate_records.yaml").write_text(f"""
paths:
  pt_root: {tmp_path / 'pt'}
strict: false
""")
        main([f"--config-dir={cdir}"])
        rep = json.loads((tmp_path / "pt" / "validation_report.json").read_text())
        assert rep["p01/good.npz"] == []
        assert len(rep["p01/bad.npz"]) > 0
