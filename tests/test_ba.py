"""Bundle-adjustment solver tests: LM convergence on synthetic problems."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.geometry.rotations import rotvec_to_matrix
from skix.solvers import BAConfig, ba_loss_terms, bundle_adjust
from skix.solvers.ba import camera_centers, project_tcj
from skix.solvers.lm import levenberg_marquardt

rng = np.random.default_rng(5)


def make_problem(T=20, J=17, noise_px=0.0, seed=5):
    r = np.random.default_rng(seed)
    K = np.array([[1100.0, 0, 960], [0, 1100.0, 540], [0, 0, 1]])
    R = np.stack([
        np.asarray(rotvec_to_matrix(jnp.zeros(3))),
        np.asarray(rotvec_to_matrix(jnp.asarray([0.05, 0.5, 0.02]))),
    ])
    t = np.array([[0.0, 0, 0], [-15.0, 0.3, 2.0]])
    # smooth skeleton trajectory
    base = r.normal(size=(1, J, 3)) * 0.4
    drift = np.linspace(0, 1, T)[:, None, None] * np.array([2.0, 0.1, 0.5])
    X = base + drift + np.array([0, 0, 20.0])
    obs = np.asarray(project_tcj(jnp.asarray(X), jnp.asarray(R), jnp.asarray(t),
                                 jnp.asarray(K)))
    obs = obs + r.normal(size=obs.shape) * noise_px
    return K, R, t, X, obs


class TestLMCore:
    def test_rosenbrock_style_quadratic(self):
        A = jnp.asarray(rng.normal(size=(12, 6)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
        res = levenberg_marquardt(lambda x: A @ x - b, jnp.zeros(6))
        x_star = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
        np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-4)
        assert float(res.cost) < float(res.initial_cost)

    def test_nonlinear_exponential_fit(self):
        tgrid = jnp.linspace(0, 1, 30)
        true = jnp.asarray([2.0, -1.3])
        y = true[0] * jnp.exp(true[1] * tgrid)

        def resid(p):
            return p[0] * jnp.exp(p[1] * tgrid) - y

        res = levenberg_marquardt(resid, jnp.asarray([1.0, 0.0]), max_steps=100)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(true), atol=1e-3)

    def test_marquardt_scaling_on_badly_scaled_problem(self):
        """BA parameter vectors mix radians and meters: columns of J differ
        by ~1e3. diag(JᵀJ) damping must reach a given cost in no more steps
        than identity damping (which conditions the step badly)."""
        r = np.random.default_rng(11)
        scales = jnp.asarray(
            np.concatenate([np.full(4, 1e3), np.full(4, 1.0),
                            np.full(4, 1e-3)]).astype(np.float32))
        A = jnp.asarray(r.normal(size=(36, 12)).astype(np.float32)) * scales
        x_true = jnp.asarray(r.normal(size=(12,)).astype(np.float32))
        y = A @ x_true

        def resid(x):
            return A @ x + 0.05 * (A @ x) ** 2 / (1 + jnp.abs(A @ x)) - (
                y + 0.05 * y ** 2 / (1 + jnp.abs(y)))

        x0 = jnp.zeros(12)
        kw = dict(max_steps=60, cg_iters=40, init_lambda=1e-1, rtol=0.0)
        res_diag = levenberg_marquardt(resid, x0, **kw)
        res_iden = levenberg_marquardt(resid, x0, damping_scale=jnp.ones(12),
                                       **kw)
        # with identical step budgets, Marquardt scaling must not be worse
        # and should reduce the badly-scaled directions far further
        assert float(res_diag.cost) <= float(res_iden.cost) * 1.5
        err_diag = float(jnp.linalg.norm((res_diag.x - x_true) * scales))
        err_iden = float(jnp.linalg.norm((res_iden.x - x_true) * scales))
        assert err_diag <= err_iden * 1.5
        assert float(res_diag.cost) < 1e-3 * float(res_diag.initial_cost)

    def test_explicit_damping_scale_accepted(self):
        A = jnp.asarray(rng.normal(size=(12, 6)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
        diag = jnp.sum(A * A, axis=0)  # exact diag(JᵀJ)
        res = levenberg_marquardt(lambda x: A @ x - b, jnp.zeros(6),
                                  damping_scale=diag)
        x_star = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
        np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-4)


class TestBA:
    def test_pose_only_recovers_noised_joints(self):
        K, R, t, X, obs = make_problem()
        X_noisy = X + rng.normal(size=X.shape) * 0.08
        cfg = BAConfig(mode="pose_only", method="lm", max_steps=40,
                       w_temporal=1e-4, w_bone=1e-4)
        res = bundle_adjust(X_noisy, R, t, K, obs, cfg=cfg)
        err_before = np.linalg.norm(X_noisy - X, axis=-1).mean()
        err_after = np.linalg.norm(np.asarray(res.X) - X, axis=-1).mean()
        assert err_after < 0.25 * err_before
        assert float(res.final_cost) < float(res.initial_cost)

    def test_full_mode_refines_cameras(self):
        K, R, t, X, obs = make_problem()
        rv_noise = np.array([[0.0, 0, 0], [0.01, -0.02, 0.01]])
        R_noisy = np.stack([
            np.asarray(rotvec_to_matrix(jnp.asarray(rv_noise[i]))) @ R[i]
            for i in range(2)
        ])
        t_noisy = t + np.array([[0.0, 0, 0], [0.3, -0.2, 0.4]])
        cfg = BAConfig(mode="full", method="lm", max_steps=60,
                       w_temporal=1e-5, w_bone=1e-5, w_baseline=0.0)
        res = bundle_adjust(X, R_noisy, t_noisy, K, obs, cfg=cfg)
        # reprojection must collapse to ~0 (gauge freedom may move X/R/t)
        reproj = float(res.losses["reprojection"])
        assert reproj < 1.0  # px² — started at thousands
        assert float(res.final_cost) < 0.01 * float(res.initial_cost)

    def test_adam_path_runs(self):
        K, R, t, X, obs = make_problem(T=8)
        X_noisy = X + rng.normal(size=X.shape) * 0.05
        cfg = BAConfig(mode="pose_only", method="adam", adam_iters=200,
                       adam_lr=5e-3)
        res = bundle_adjust(X_noisy, R, t, K, obs, cfg=cfg)
        assert float(res.final_cost) < float(res.initial_cost)

    def test_loss_terms_match_reference_semantics(self):
        """Loss formulas equal a direct numpy transcription of reference
        bundle_adjustment/loss.py on random inputs."""
        K, R, t, X, obs = make_problem(T=6, noise_px=2.0)
        conf = rng.random(obs.shape[:-1])
        cfg = BAConfig()
        from skix.geometry.rotations import matrix_to_rotvec

        terms = ba_loss_terms(jnp.asarray(X), matrix_to_rotvec(jnp.asarray(R)),
                              jnp.asarray(t), jnp.asarray(K), jnp.asarray(obs),
                              jnp.asarray(conf), cfg)
        # numpy oracle
        pred = np.asarray(project_tcj(jnp.asarray(X), jnp.asarray(R),
                                      jnp.asarray(t), jnp.asarray(K)))
        d2 = ((pred - obs) ** 2).sum(-1)
        want_reproj = cfg.w_reproj * (conf * d2).sum() / (conf.sum() + 1e-6)
        np.testing.assert_allclose(float(terms["reprojection"]), want_reproj,
                                   rtol=1e-4)
        # bone-length loss vs direct computation
        from skix.geometry.skeletons import COCO_BONES_12

        bones = np.asarray(COCO_BONES_12)
        L = np.linalg.norm(X[:, bones[:, 0]] - X[:, bones[:, 1]], axis=-1)
        want_bone = cfg.w_bone * ((L - L.mean(0, keepdims=True)) ** 2).mean()
        np.testing.assert_allclose(float(terms["bone_length"]), want_bone,
                                   rtol=1e-4, atol=1e-7)
        want_temporal = cfg.w_temporal * ((X[1:] - X[:-1]) ** 2).mean()
        np.testing.assert_allclose(float(terms["pose_temporal"]), want_temporal,
                                   rtol=1e-4)

    def test_single_camera_baseline_zero(self):
        K, R, t, X, obs = make_problem(T=4)
        from skix.geometry.rotations import matrix_to_rotvec

        terms = ba_loss_terms(jnp.asarray(X),
                              matrix_to_rotvec(jnp.asarray(R[:1])),
                              jnp.asarray(t[:1]), jnp.asarray(K[None][0:1] if K.ndim == 2 else K),
                              jnp.asarray(obs[:, :1]),
                              jnp.ones(obs[:, :1].shape[:-1]), BAConfig())
        assert float(terms["baseline_reg"]) == 0.0

    def test_camera_centers(self):
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.1, 0.2, 0.3])))
        t = np.array([1.0, 2.0, 3.0])
        C = np.asarray(camera_centers(jnp.asarray(R), jnp.asarray(t)))
        np.testing.assert_allclose(R @ C + t, np.zeros(3), atol=1e-6)
