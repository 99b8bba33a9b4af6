"""FOV estimator + tracking-eval tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.fov import FovEstimator, estimate_focal_lengths, focal_to_fov, fov_to_focal
from skix.metrics.tracking_eval import evaluate_tracking

rng = np.random.default_rng(211)


class TestFov:
    def test_roundtrip(self):
        fov = jnp.radians(jnp.asarray([60.0, 90.0]))
        f = fov_to_focal(fov, 1920)
        back = focal_to_fov(f, 1920)
        np.testing.assert_allclose(np.asarray(back), np.asarray(fov),
                                   rtol=1e-5)

    def test_reference_intrinsics_consistent(self):
        # DJI Osmo: fx≈1116.9 @ 1920 → fov_w ≈ 81.4°
        fov = float(np.degrees(focal_to_fov(jnp.asarray(1116.93), 1920)))
        assert 80.0 < fov < 83.0

    def test_estimator_bounds(self):
        model = FovEstimator(width=8, depth=2)
        imgs = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), imgs)
        fov = np.degrees(np.asarray(model.apply(v, imgs)))
        assert np.all(fov > 19.9) and np.all(fov < 120.1)

    def test_clip_helper(self):
        model = FovEstimator(width=8, depth=2)
        imgs = jnp.zeros((1, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(0), imgs)
        frames = rng.integers(0, 255, (5, 32, 48, 3)).astype(np.uint8)
        f = estimate_focal_lengths(model, v, frames, batch_size=2)
        assert f.shape == (5, 2)
        assert np.all(f > 0)


class TestTrackingEval:
    def _seq(self, T=5):
        gt_b = [np.array([[10.0 + 2 * t, 10, 30 + 2 * t, 40]])
                for t in range(T)]
        gt_i = [np.array([1])] * T
        return gt_b, gt_i

    def test_perfect_tracking(self):
        gt_b, gt_i = self._seq()
        rep = evaluate_tracking(gt_b, gt_i, gt_b, gt_i)
        assert rep["mota"] == 1.0
        assert rep["id_switches"] == 0
        assert rep["precision"] == 1.0 and rep["recall"] == 1.0

    def test_id_switch_detected(self):
        gt_b, gt_i = self._seq(4)
        pred_i = [np.array([7]), np.array([7]), np.array([8]), np.array([8])]
        rep = evaluate_tracking(gt_b, pred_i, gt_b, gt_i)
        assert rep["id_switches"] == 1
        assert rep["mota"] == 1.0 - 1 / 4

    def test_false_positives_and_misses(self):
        gt_b, gt_i = self._seq(2)
        pred_b = [np.concatenate([gt_b[0], [[100, 100, 120, 140]]]),
                  np.zeros((0, 4))]
        pred_i = [np.array([1, 2]), np.zeros((0,), int)]
        rep = evaluate_tracking(pred_b, pred_i, gt_b, gt_i)
        assert rep["fp"] == 1 and rep["fn"] == 1
        assert rep["matches"] == 1
