"""Fusion + confidence + biomechanics tests (vs numpy & reference oracles)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from skix.fuse import (
    align_right_to_left,
    body_side_bias,
    center_scale_h36m,
    combine_q,
    crossview_consistency_confidence,
    fit_weak_perspective,
    fuse_pose_no_extrinsics,
    fuse_sequence,
    fuse_two_views,
    median_bone_lengths,
    q_2d_sanity,
    q_from_bone_deviation,
    q_from_temporal,
    softmax2,
    weakpersp_reproj_confidence,
)
from skix.geometry.rotations import rotvec_to_matrix

rng = np.random.default_rng(11)


def _import_reference_confidence():
    sys.path.insert(0, "/root/reference")
    try:
        from fuse import confidence as ref_conf  # noqa
        return ref_conf
    except Exception as e:
        pytest.skip(f"reference confidence not importable: {e}")


class TestWeakPerspective:
    def test_fit_recovers_synthetic(self):
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.2, -0.1, 0.3])))
        M_true = R[:, :2]  # orthonormal columns
        s_true, t_true = 2.5, np.array([100.0, -50.0])
        # large N so XcᵀXc ≈ N·I and the Procrustes M is near-exact (the
        # orthonormal-constrained fit is only asymptotically unbiased —
        # same property as the reference's fit_weakpersp_3d_to_2d)
        X = rng.normal(size=(4000, 3))
        U = s_true * X @ M_true + t_true
        s, M, t = fit_weak_perspective(jnp.asarray(X), jnp.asarray(U))
        # reference semantics (fuse/confidence.py:55): scale divides by the
        # full 3-D variance, not the projected 2-D one ⇒ E[s_est] = 2/3·s
        # for isotropic points. We match the reference exactly.
        np.testing.assert_allclose(float(s), 2.0 / 3.0 * s_true, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(M), M_true, atol=3e-2)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=2.0)

    def test_matches_reference_fit(self):
        ref_conf = _import_reference_confidence()
        X = rng.normal(size=(17, 3))
        U = rng.normal(size=(17, 2)) * 100
        s_ref, M_ref, t_ref, _ = ref_conf.fit_weakpersp_3d_to_2d(X, U)
        s, M, t = fit_weak_perspective(jnp.asarray(X), jnp.asarray(U))
        np.testing.assert_allclose(float(s), s_ref, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(M), M_ref, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), t_ref, atol=1e-2)

    def test_confidence_perfect_fit_is_one(self):
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.1, 0.0, 0.2])))
        X = rng.normal(size=(5, 17, 3))
        U = 3.0 * X @ R[:, :2] + np.array([10.0, 20.0])
        conf, err = weakpersp_reproj_confidence(jnp.asarray(X), jnp.asarray(U))
        # J=17 finite-sample Procrustes residual bounds conf below 1 —
        # identical to the reference's behavior on the same data
        assert float(jnp.min(conf)) > 0.9
        assert float(jnp.mean(conf)) > 0.98

    def test_confidence_invalid_joints_zero(self):
        X = rng.normal(size=(3, 17, 3))
        U = rng.normal(size=(3, 17, 2))
        valid = np.ones((3, 17), bool)
        valid[:, 5] = False
        conf, _ = weakpersp_reproj_confidence(jnp.asarray(X), jnp.asarray(U),
                                              valid=jnp.asarray(valid))
        assert float(jnp.max(conf[:, 5])) == 0.0


class TestCanonicalConfidence:
    def test_identical_views_full_confidence(self):
        X = rng.normal(size=(4, 70, 3))
        conf, dist = crossview_consistency_confidence(
            jnp.asarray(X), jnp.asarray(X), root_idx=0, left_hip_idx=1,
            right_hip_idx=2, left_shoulder_idx=16, right_shoulder_idx=17)
        assert float(jnp.min(conf)) > 0.999

    def test_rotated_translated_view_still_consistent(self):
        # canonicalization removes similarity transforms
        X = rng.normal(size=(4, 70, 3))
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.4, 0.2, -0.6])))
        Y = 1.7 * X @ R.T + np.array([3.0, 4.0, 5.0])
        conf, _ = crossview_consistency_confidence(
            jnp.asarray(X), jnp.asarray(Y), root_idx=0, left_hip_idx=1,
            right_hip_idx=2, left_shoulder_idx=16, right_shoulder_idx=17)
        assert float(jnp.min(conf)) > 0.99

    def test_matches_reference_canonicalization(self):
        ref_conf = _import_reference_confidence()
        from skix.fuse.confidence import canonicalize_pose_3d

        X = rng.normal(size=(70, 3))
        Xc_ref, R_ref, s_ref = ref_conf.canonicalize_pose_3d(
            X, 0, 1, 2, 16, 17, scale_mode="hip")
        Xc, ok = canonicalize_pose_3d(jnp.asarray(X), 0, 1, 2, 16, 17)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(Xc), Xc_ref, atol=1e-4)


class TestQualityScores:
    def test_softmax2(self):
        wa, wb = softmax2(jnp.asarray([0.0, 2.0]), jnp.asarray([0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(wa[0]), 0.5, atol=1e-6)
        assert float(wa[1]) > 0.8
        np.testing.assert_allclose(np.asarray(wa + wb), 1.0, atol=1e-5)

    def test_q_bone_penalizes_stretched(self):
        edges = [(0, 1), (1, 2)]
        X = np.zeros((3, 3, 3))
        X[:, 1, 0] = 1.0
        X[:, 2, 0] = 2.0
        X[2, 2, 0] = 5.0  # stretched bone in frame 2
        med = np.asarray(median_bone_lengths(jnp.asarray(X), edges))
        np.testing.assert_allclose(med, [1.0, 1.0], atol=1e-6)
        q = np.asarray(q_from_bone_deviation(jnp.asarray(X), edges,
                                             jnp.asarray(med)))
        assert q[2, 2] < q[0, 2] - 1.0  # much worse quality

    def test_q_temporal(self):
        prev = np.zeros((2, 4, 3))
        curr = np.zeros((2, 4, 3))
        curr[:, 1] = 2.0
        q = np.asarray(q_from_temporal(jnp.asarray(prev), jnp.asarray(curr)))
        np.testing.assert_allclose(q[:, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(q[:, 1], -np.sqrt(12.0), rtol=1e-5)

    def test_q_2d_sanity(self):
        U = np.array([[[5.0, 5.0], [-1.0, 5.0], [5.0, 1e9]]])
        q = np.asarray(q_2d_sanity(jnp.asarray(U), 100, 100))
        np.testing.assert_allclose(q[0], [0.0, -50.0, -50.0])

    def test_body_side_bias(self):
        lm = np.array([True, False, False])
        rm = np.array([False, True, False])
        b = np.asarray(body_side_bias(lm, rm, 1.5))
        np.testing.assert_allclose(b, [1.5, -1.5, 0.0])

    def test_combine_q(self):
        q = combine_q(jnp.asarray([1.0]), jnp.asarray([2.0]), jnp.asarray([3.0]),
                      w_bone=1.0, w_temp=0.3, w_san=0.2)
        np.testing.assert_allclose(float(q[0]), 1.0 + 0.6 + 0.6, rtol=1e-6)


class TestFusion:
    def test_align_right_to_left_exact(self):
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.3, -0.5, 0.1])))
        L = rng.normal(size=(6, 17, 3))
        Rv = (L - L.mean(axis=1, keepdims=True)) @ R + L.mean(axis=1, keepdims=True) + 2.0
        aligned = align_right_to_left(jnp.asarray(L), jnp.asarray(Rv))
        np.testing.assert_allclose(np.asarray(aligned), L, atol=1e-4)

    def test_fuse_two_views_fallback(self):
        Xl = np.ones((2, 3, 3))
        Xr = 3 * np.ones((2, 3, 3))
        vl = np.array([[True, True, False], [True, True, True]])
        vr = np.array([[True, False, True], [True, True, True]])
        q = np.zeros((2, 3))
        fused, fv = fuse_two_views(jnp.asarray(Xl), jnp.asarray(Xr),
                                   jnp.asarray(q), jnp.asarray(q),
                                   jnp.asarray(vl), jnp.asarray(vr))
        fused = np.asarray(fused)
        np.testing.assert_allclose(fused[0, 0], 2.0)   # both → mean
        np.testing.assert_allclose(fused[0, 1], 1.0)   # only left
        np.testing.assert_allclose(fused[0, 2], 3.0)   # only right
        assert bool(jnp.all(fv))

    def test_fuse_sequence_end_to_end(self):
        T, J = 30, 17
        L = rng.normal(size=(T, J, 3)).cumsum(0) * 0.05
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.2, 0.4, -0.1])))
        Rv = L @ R.T + np.array([1.0, -2.0, 0.5]) + rng.normal(size=L.shape) * 0.01
        res = fuse_sequence(jnp.asarray(L), jnp.asarray(Rv))
        assert res.fused.shape == (T, J, 3)
        assert bool(jnp.all(jnp.isfinite(res.fused)))
        assert bool(jnp.all(jnp.isfinite(res.smoothed)))
        # fused should be closer to L than the unaligned right view was
        assert float(jnp.mean(jnp.linalg.norm(res.fused - L, axis=-1))) < 0.05

    def test_no_extrinsics_h36m_route(self):
        from skix.geometry.skeletons import H36M

        T = 12
        L = rng.normal(size=(T, 17, 3))
        R3 = np.asarray(rotvec_to_matrix(jnp.asarray([0.1, 0.7, 0.2])))
        Rv = 2.0 * L @ R3.T + 5.0
        fused, diag = fuse_pose_no_extrinsics(jnp.asarray(L), jnp.asarray(Rv))
        Ln, _ = center_scale_h36m(jnp.asarray(L))
        # same underlying pose ⇒ fused ≈ normalized left
        np.testing.assert_allclose(np.asarray(fused), np.asarray(Ln), atol=1e-3)
        assert float(diag["mean_disagreement"]) < 1e-3

    def test_no_extrinsics_tau_gating(self):
        L = rng.normal(size=(1, 17, 3))
        Rv = L.copy()
        Rv[0, 13] += 10.0  # wild outlier on left wrist in right view
        wL = np.full((1, 17), 2.0)
        wR = np.ones((1, 17))
        fused, _ = fuse_pose_no_extrinsics(jnp.asarray(L), jnp.asarray(Rv),
                                           tau=0.08, wL=jnp.asarray(wL),
                                           wR=jnp.asarray(wR))
        Ln, _ = center_scale_h36m(jnp.asarray(L))
        # gated joint must equal the (higher-weight) left view exactly
        np.testing.assert_allclose(np.asarray(fused[0, 13]),
                                   np.asarray(Ln[0, 13]), atol=1e-4)


class TestEvaluation:
    def test_bone_cv_zero_for_rigid(self):
        from skix.metrics.evaluation import bone_length_cv

        X0 = rng.normal(size=(1, 17, 3))
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.0, 0.1, 0.0])))
        seq = np.stack([X0[0] @ np.linalg.matrix_power(R, k).T for k in range(10)])
        cv = float(bone_length_cv(jnp.asarray(seq), [(0, 1), (1, 2)]))
        assert cv < 1e-5

    def test_before_after_report(self):
        from skix.metrics.evaluation import before_after_fusion_report

        gt = rng.normal(size=(8, 17, 3))
        left = gt + rng.normal(size=gt.shape) * 0.05
        right = gt + rng.normal(size=gt.shape) * 0.08
        fused = gt + rng.normal(size=gt.shape) * 0.02
        rep = before_after_fusion_report(jnp.asarray(gt), jnp.asarray(left),
                                         jnp.asarray(right), jnp.asarray(fused))
        assert rep["mpjpe_fused"] < rep["mpjpe_left"]
        assert rep["improvement_pct"] > 0
        assert rep["per_joint_fused"].shape == (17,)

    def test_temporal_metrics(self):
        from skix.metrics.evaluation import temporal_metrics

        const = np.ones((10, 5, 3))
        m = temporal_metrics(jnp.asarray(const))
        assert float(m["jitter"]) == 0.0
        assert float(m["accel"]) == 0.0


class TestBiomech:
    def _straight_pose(self, T=5):
        """Simple standing pose in the 15-joint target layout."""
        from skix.angle.biomech import TARGET_IDS, ID_TO_INDEX

        J = len(TARGET_IDS)
        k = np.zeros((T, J, 3))
        place = {
            9: (-0.2, 1.0, 0), 10: (0.2, 1.0, 0),       # hips
            11: (-0.2, 0.5, 0), 12: (0.2, 0.5, 0),      # knees
            13: (-0.2, 0.0, 0), 14: (0.2, 0.0, 0),      # feet
            5: (-0.3, 1.6, 0), 6: (0.3, 1.6, 0),        # shoulders
            7: (-0.35, 1.2, 0), 8: (0.35, 1.2, 0),      # elbows
            62: (-0.4, 0.9, 0), 41: (0.4, 0.9, 0),      # hands
            69: (0.0, 1.7, 0),                           # neck
            1: (-0.05, 1.8, 0.05), 2: (0.05, 1.8, 0.05),
        }
        for jid, pos in place.items():
            k[:, ID_TO_INDEX[jid]] = pos
        return k

    def test_straight_knee_is_180(self):
        from skix.angle import compute_angles

        k = self._straight_pose()
        angles = compute_angles(jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(angles["knee_l"]), 180.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(angles["knee_r"]), 180.0, atol=1e-3)

    def test_right_angle_synthetic(self):
        from skix.angle.biomech import joint_angle_deg

        a = jnp.asarray([1.0, 0, 0])
        b = jnp.asarray([0.0, 0, 0])
        c = jnp.asarray([0.0, 1.0, 0])
        np.testing.assert_allclose(float(joint_angle_deg(a, b, c)), 90.0, atol=1e-4)

    def test_tilt_upright_zero(self):
        from skix.angle import compute_tilt_angles

        k = self._straight_pose()
        tilts = compute_tilt_angles(jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(tilts["tilt_upper"]), 0.0, atol=1e-3)

    def test_heading_and_turns(self):
        from skix.angle import compute_facing_heading, detect_turn_segments
        from skix.angle.biomech import ID_TO_INDEX

        T = 120
        k = self._straight_pose(T)
        # rotate the skier about the vertical axis: sinusoidal heading
        ang = np.radians(40 * np.sin(np.linspace(0, 4 * np.pi, T)))
        for t in range(T):
            c, s = np.cos(ang[t]), np.sin(ang[t])
            Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            k[t] = k[t] @ Ry.T
        heading = np.asarray(compute_facing_heading(jnp.asarray(k)))
        assert np.all(np.isfinite(heading))
        turns = detect_turn_segments(heading)
        assert 2 <= len(turns) <= 6  # ~4 half-period turns
        assert all(t["num_frames"] >= 12 for t in turns)

    def test_knee_diff_symmetric_zero(self):
        from skix.angle import compute_knee_difference

        k = self._straight_pose()
        d = compute_knee_difference(jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(d["knee_diff_lr"]), 0.0, atol=1e-3)

    def test_elbow_distance(self):
        from skix.angle import compute_elbow_distance

        k = self._straight_pose()
        d = compute_elbow_distance(jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(d["elbow_distance_l"]), 0.35, atol=1e-4)

    def test_all_series(self):
        from skix.angle import compute_all_series

        k = self._straight_pose(30)
        series, turns = compute_all_series(jnp.asarray(k))
        assert "knee_l" in series and "heading_deg" in series
        assert all(v.shape == (30,) for v in series.values())


class TestReferenceNpzInterop:
    def test_outputs_object_array_format(self, tmp_path):
        """Read the reference's np.savez(outputs=[dict,...]) files."""
        from skix.pipelines.fuse import load_sam3d_sequence

        outs = [{"pred_keypoints_3d": np.full((70, 3), float(t)),
                 "pred_keypoints_2d": np.full((70, 2), float(t))}
                for t in range(4)]
        p = tmp_path / "seq_sam_3d_body_outputs.npz"
        np.savez_compressed(p, outputs=np.asarray(outs, dtype=object))
        k3, k2 = load_sam3d_sequence(p)
        assert k3.shape == (4, 70, 3) and k2.shape == (4, 70, 2)
        np.testing.assert_allclose(k3[2], 2.0)
