"""Geometry core unit tests vs tiny numpy oracles (SURVEY.md §4 strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.geometry import (
    camera,
    epipolar,
    rigid,
    rotations,
    skeletons,
    smoothing,
    triangulate,
)

rng = np.random.default_rng(0)


def random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


# --------------------------------------------------------------------------
# rotations
# --------------------------------------------------------------------------
class TestRotations:
    def test_rotvec_roundtrip(self):
        rv = rng.normal(size=(32, 3)).astype(np.float32)
        R = rotations.rotvec_to_matrix(rv)
        rv2 = rotations.matrix_to_rotvec(R)
        R2 = rotations.rotvec_to_matrix(rv2)
        np.testing.assert_allclose(R, R2, atol=2e-4)

    def test_rotvec_zero(self):
        R = rotations.rotvec_to_matrix(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_rotvec_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rv = rng.normal(size=(16, 3))
        ours = np.asarray(rotations.rotvec_to_matrix(jnp.asarray(rv, jnp.float32)))
        ref = Rotation.from_rotvec(rv).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_rotvec_grad_finite_at_zero(self):
        g = jax.grad(lambda v: jnp.sum(rotations.rotvec_to_matrix(v)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_qrot_matches_matrix(self):
        from scipy.spatial.transform import Rotation

        q_xyzw = Rotation.random(10, rng=1).as_quat()
        q = np.concatenate([q_xyzw[:, 3:], q_xyzw[:, :3]], axis=1)  # wxyz
        v = rng.normal(size=(10, 3))
        ours = np.asarray(rotations.qrot(jnp.asarray(q), jnp.asarray(v)))
        ref = Rotation.from_quat(q_xyzw).apply(v)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_rot6d(self):
        R = np.stack([random_rotation(rng) for _ in range(8)])
        six = rotations.matrix_to_rot6d(jnp.asarray(R))
        R2 = rotations.rot6d_to_matrix(six)
        np.testing.assert_allclose(R, R2, atol=1e-5)


# --------------------------------------------------------------------------
# camera
# --------------------------------------------------------------------------
class TestCamera:
    def test_normalize_roundtrip(self):
        uv = rng.uniform(0, 1920, size=(7, 17, 2)).astype(np.float32)
        n = camera.normalize_screen_coordinates(uv, 1920, 1080)
        back = camera.image_coordinates(n, 1920, 1080)
        np.testing.assert_allclose(back, uv, atol=1e-3)
        # [0,w]→[-1,1] mapping endpoints
        ends = camera.normalize_screen_coordinates(
            jnp.asarray([[0.0, 0.0], [1920.0, 1080.0]]), 1920, 1080)
        np.testing.assert_allclose(ends[0], [-1.0, -1080 / 1920], atol=1e-6)
        np.testing.assert_allclose(ends[1], [1.0, 1080 / 1920], atol=1e-6)

    def test_project_points_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        K = np.array([[1116.9, 0, 955.8], [0, 1117.3, 538.9], [0, 0, 1]])
        R = random_rotation(rng)
        t = np.array([0.3, -0.2, 5.0])
        X = rng.normal(size=(20, 3)) + np.array([0, 0, 10.0])
        Xw = (np.linalg.inv(R) @ (X - t).T).T  # ensure points in front
        dist = np.array([0.1, -0.05, 1e-3, -2e-3, 0.01])
        ours = np.asarray(camera.project_points(
            jnp.asarray(Xw), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
            dist=jnp.asarray(dist)))
        ref, _ = cv2.projectPoints(Xw.reshape(-1, 1, 3), cv2.Rodrigues(R)[0],
                                   t.reshape(3, 1), K, dist)
        np.testing.assert_allclose(ours, ref.reshape(-1, 2), rtol=1e-4, atol=1e-2)

    def test_h36m_projection_pinhole_limit(self):
        # with zero distortion it reduces to pinhole
        X = np.abs(rng.normal(size=(5, 3))) + np.array([0, 0, 4.0])
        cp = np.array([1000.0, 1000.0, 500.0, 400.0, 0, 0, 0, 0, 0])
        got = np.asarray(camera.project_to_2d_h36m(jnp.asarray(X), jnp.asarray(cp[None])))
        want = X[:, :2] / X[:, 2:] * 1000 + np.array([500, 400])
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_world_camera_roundtrip(self):
        from scipy.spatial.transform import Rotation

        q_xyzw = Rotation.random(rng=3).as_quat()
        q = np.r_[q_xyzw[3], q_xyzw[:3]]
        t = rng.normal(size=3)
        X = rng.normal(size=(6, 3))
        cam = camera.world_to_camera(jnp.asarray(X), jnp.asarray(q), jnp.asarray(t))
        back = camera.camera_to_world(cam, jnp.asarray(q), jnp.asarray(t))
        np.testing.assert_allclose(back, X, atol=1e-5)


# --------------------------------------------------------------------------
# rigid
# --------------------------------------------------------------------------
class TestRigid:
    def test_umeyama_exact_recovery(self):
        R = random_rotation(rng)
        s, t = 1.7, np.array([0.4, -2.0, 3.0])
        Y = rng.normal(size=(17, 3))
        X = s * Y @ R.T + t
        tr = rigid.umeyama(jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32),
                           allow_scale=True)
        np.testing.assert_allclose(tr.R, R, atol=1e-4)
        np.testing.assert_allclose(float(tr.s), s, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(tr.apply(jnp.asarray(Y, jnp.float32))), X, atol=1e-3)

    def test_kabsch_no_scale(self):
        R = random_rotation(rng)
        Y = rng.normal(size=(10, 3))
        X = Y @ R.T + 1.0
        tr = rigid.kabsch(jnp.asarray(X), jnp.asarray(Y))
        assert float(tr.s) == 1.0
        np.testing.assert_allclose(tr.R, R, atol=1e-5)

    def test_masked_outlier_rejection(self):
        R = random_rotation(rng)
        Y = rng.normal(size=(12, 3))
        X = Y @ R.T
        Xc = X.copy()
        Xc[3] += 100.0  # huge outlier
        w = np.ones(12)
        w[3] = 0.0
        tr = rigid.umeyama(jnp.asarray(Xc), jnp.asarray(Y), w=jnp.asarray(w))
        np.testing.assert_allclose(tr.R, R, atol=1e-5)

    def test_validity_report(self):
        R = random_rotation(rng)
        Y = rng.normal(size=(8, 3))
        X = Y @ R.T + 0.5
        tr = rigid.kabsch(jnp.asarray(X), jnp.asarray(Y))
        rep = rigid.rigid_validity(tr, jnp.asarray(X), jnp.asarray(Y))
        assert float(rep["ortho_error"]) < 1e-4
        assert abs(float(rep["det"]) - 1) < 1e-4
        assert float(rep["rms_residual"]) < 1e-4

    def test_reflection_fix(self):
        # mirrored data must still produce det(R) = +1
        Y = rng.normal(size=(9, 3))
        X = Y * np.array([-1.0, 1.0, 1.0])
        tr = rigid.kabsch(jnp.asarray(X), jnp.asarray(Y))
        assert float(jnp.linalg.det(tr.R)) > 0


# --------------------------------------------------------------------------
# triangulation
# --------------------------------------------------------------------------
class TestTriangulate:
    def setup_method(self):
        self.K = np.array([[1116.9, 0, 955.8], [0, 1117.3, 538.9], [0, 0, 1]])
        self.R = random_rotation(np.random.default_rng(7))
        # keep rotation mild so points stay in front of both cameras
        self.R = np.asarray(rotations.rotvec_to_matrix(jnp.asarray([0.05, 0.4, 0.02])))
        self.t = np.array([-3.0, 0.1, 0.5])

    def _project(self, X, R, t):
        Xc = X @ R.T + t
        uv = Xc[..., :2] / Xc[..., 2:]
        return uv * np.array([self.K[0, 0], self.K[1, 1]]) + np.array(
            [self.K[0, 2], self.K[1, 2]])

    def test_dlt_roundtrip(self):
        X = rng.normal(size=(30, 17, 3)) * 0.5 + np.array([0, 0, 12.0])
        uv1 = self._project(X, np.eye(3), np.zeros(3))
        uv2 = self._project(X, self.R, self.t)
        got = triangulate.triangulate_sequence(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(self.K),
            jnp.asarray(self.R), jnp.asarray(self.t))
        np.testing.assert_allclose(np.asarray(got), X, atol=1e-2)

    def test_dlt_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        X = rng.normal(size=(9, 3)) + np.array([0, 0, 15.0])
        uv1 = self._project(X, np.eye(3), np.zeros(3))
        uv2 = self._project(X, self.R, self.t)
        P1 = self.K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = self.K @ np.hstack([self.R, self.t.reshape(3, 1)])
        ref_h = cv2.triangulatePoints(P1, P2, uv1.T, uv2.T)
        ref = (ref_h[:3] / ref_h[3]).T
        got = triangulate.triangulate_dlt(
            jnp.asarray(np.stack([uv1, uv2], axis=1)),
            jnp.asarray(np.stack([P1, P2])))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3)

    def test_weighted_view_dropout(self):
        # 3 views, one corrupted but weighted to 0 → still exact
        X = rng.normal(size=(5, 3)) + np.array([0, 0, 10.0])
        R3 = np.asarray(rotations.rotvec_to_matrix(jnp.asarray([0.0, -0.3, 0.0])))
        t3 = np.array([3.0, 0.0, 0.2])
        uv = np.stack([
            self._project(X, np.eye(3), np.zeros(3)),
            self._project(X, self.R, self.t),
            self._project(X, R3, t3) + 300.0,  # corrupt
        ], axis=1)
        P = np.stack([
            self.K @ np.hstack([np.eye(3), np.zeros((3, 1))]),
            self.K @ np.hstack([self.R, self.t.reshape(3, 1)]),
            self.K @ np.hstack([R3, t3.reshape(3, 1)]),
        ])
        w = np.tile(np.array([1.0, 1.0, 0.0]), (5, 1))
        got = triangulate.triangulate_dlt(jnp.asarray(uv), jnp.asarray(P), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(got), X, atol=1e-2)

    def test_undistort_roundtrip(self):
        from skix.geometry.camera import distort_rational

        dist = np.array([0.05, -0.02, 1e-3, -1e-3, 0.005])
        xn = rng.uniform(-0.4, 0.4, size=(50, 2))
        xd = np.asarray(distort_rational(jnp.asarray(xn), jnp.asarray(dist)))
        uv_d = xd * np.array([self.K[0, 0], self.K[1, 1]]) + np.array(
            [self.K[0, 2], self.K[1, 2]])
        uv_u = triangulate.undistort_points(jnp.asarray(uv_d), jnp.asarray(self.K),
                                            jnp.asarray(dist))
        want = xn * np.array([self.K[0, 0], self.K[1, 1]]) + np.array(
            [self.K[0, 2], self.K[1, 2]])
        np.testing.assert_allclose(np.asarray(uv_u), want, atol=1e-3)

    def test_positive_depth(self):
        X = np.array([[0.0, 0.0, 5.0], [0.0, 0.0, -5.0]])
        m = triangulate.positive_depth_mask(jnp.asarray(X), jnp.eye(3), jnp.zeros(3))
        assert bool(m[0]) and not bool(m[1])


# --------------------------------------------------------------------------
# epipolar
# --------------------------------------------------------------------------
class TestEpipolar:
    def test_pose_recovery_synthetic(self):
        K = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]])
        R = np.asarray(rotations.rotvec_to_matrix(jnp.asarray([0.1, 0.3, -0.05])))
        t = np.array([-1.0, 0.2, 0.3])
        t_unit = t / np.linalg.norm(t)
        X = rng.normal(size=(60, 3)) * 2 + np.array([0, 0, 10.0])
        uv1 = (X / X[:, 2:]) @ K.T
        Xc2 = X @ R.T + t
        uv2 = (Xc2 / Xc2[:, 2:]) @ K.T
        pose = epipolar.estimate_relative_pose(
            jnp.asarray(uv1[:, :2]), jnp.asarray(uv2[:, :2]), jnp.asarray(K),
            key=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(pose.R), R, atol=1e-2)
        np.testing.assert_allclose(np.asarray(pose.t), t_unit, atol=1e-2)
        assert int(pose.num_inliers) >= 55

    def test_ransac_with_outliers(self):
        K = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]])
        R = np.asarray(rotations.rotvec_to_matrix(jnp.asarray([-0.05, 0.25, 0.1])))
        t = np.array([-2.0, 0.0, 0.4])
        X = rng.normal(size=(80, 3)) * 2 + np.array([0, 0, 12.0])
        uv1 = (X / X[:, 2:]) @ K.T
        Xc2 = X @ R.T + t
        uv2 = (Xc2 / Xc2[:, 2:]) @ K.T
        uv2 = uv2.copy()
        uv2[::5, :2] += rng.normal(size=(16, 2)) * 200  # 20% outliers
        pose = epipolar.estimate_relative_pose(
            jnp.asarray(uv1[:, :2]), jnp.asarray(uv2[:, :2]), jnp.asarray(K),
            key=jax.random.PRNGKey(2), num_hypotheses=512)
        np.testing.assert_allclose(np.asarray(pose.R), R, atol=2e-2)

    def test_baseline_scaling(self):
        t = epipolar.scale_translation_to_baseline(jnp.asarray([3.0, 0.0, 4.0]), 20.0)
        np.testing.assert_allclose(float(jnp.linalg.norm(t)), 20.0, rtol=1e-6)


# --------------------------------------------------------------------------
# smoothing
# --------------------------------------------------------------------------
class TestSmoothing:
    def test_ema_matches_loop(self):
        x = rng.normal(size=(50, 4)).astype(np.float32)
        got = np.asarray(smoothing.ema(jnp.asarray(x), 0.3))
        want = x.copy()
        for i in range(1, 50):
            want[i] = 0.3 * x[i] + 0.7 * want[i - 1]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_adaptive_ema_reference_semantics(self):
        # mirrors reference fuse/fuse.py:329 temporal_smooth_ema on dense data
        T, J = 30, 5
        x = rng.normal(size=(T, J, 3))
        alpha, amin, amax, gain = 0.7, 0.45, 0.92, 0.25
        got = np.asarray(smoothing.adaptive_ema(
            jnp.asarray(x), alpha=alpha, alpha_min=amin, alpha_max=amax,
            speed_gain=gain))
        want = np.empty_like(x)
        want[0] = x[0]
        aj = np.full(J, alpha)
        for t in range(1, T):
            speed = np.linalg.norm(x[t] - want[t - 1], axis=1)
            a = np.clip(aj + gain * speed, amin, amax)
            want[t] = a[:, None] * x[t] + (1 - a)[:, None] * want[t - 1]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_adaptive_ema_carry_forward(self):
        x = np.ones((5, 2, 3))
        x[2] = 999.0  # invalid frame, masked out
        valid = np.ones((5, 2), bool)
        valid[2] = False
        got = np.asarray(smoothing.adaptive_ema(jnp.asarray(x), valid=jnp.asarray(valid)))
        np.testing.assert_allclose(got[2], got[1])  # carried forward
        assert np.all(np.isfinite(got))

    def test_savgol_matches_scipy(self):
        from scipy.signal import savgol_filter

        x = rng.normal(size=(60, 3)).astype(np.float64).cumsum(0)
        got = np.asarray(smoothing.savgol_smooth(jnp.asarray(x), window=11, polyorder=3))
        want = savgol_filter(x, 11, 3, axis=0, mode="mirror")
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_moving_average_constant(self):
        x = np.ones((20, 2))
        got = np.asarray(smoothing.moving_average(jnp.asarray(x), 5))
        np.testing.assert_allclose(got, 1.0, atol=1e-6)


# --------------------------------------------------------------------------
# skeletons
# --------------------------------------------------------------------------
class TestSkeletons:
    def test_coco_to_h36m_synthesis(self):
        x = rng.normal(size=(4, 17, 3))
        h = np.asarray(skeletons.coco_to_h36m(jnp.asarray(x)))
        assert h.shape == (4, 17, 3)
        np.testing.assert_allclose(
            h[:, 0], 0.5 * (x[:, 11] + x[:, 12]), atol=1e-6)  # pelvis
        np.testing.assert_allclose(
            h[:, 8], 0.5 * (x[:, 5] + x[:, 6]), atol=1e-6)  # thorax
        np.testing.assert_allclose(h[:, 9], x[:, 0], atol=1e-6)  # neck=nose
        # spine = mid(pelvis, thorax)
        np.testing.assert_allclose(h[:, 7], 0.5 * (h[:, 0] + h[:, 8]), atol=1e-6)
        # head = nose + 0.5 (nose - mid eyes)
        eyes = 0.5 * (x[:, 1] + x[:, 2])
        np.testing.assert_allclose(h[:, 10], x[:, 0] + 0.5 * (x[:, 0] - eyes), atol=1e-6)

    def test_limbs_pass_through(self):
        x = rng.normal(size=(17, 2))
        h = np.asarray(skeletons.coco_to_h36m(jnp.asarray(x)))
        np.testing.assert_allclose(h[3], x[16])  # r_ankle
        np.testing.assert_allclose(h[13], x[9])  # l_wrist

    def test_flip_involution(self):
        x = rng.normal(size=(3, 17, 3))
        f = skeletons.flip_keypoints(jnp.asarray(x), skeletons.H36M_LEFT,
                                     skeletons.H36M_RIGHT)
        ff = skeletons.flip_keypoints(f, skeletons.H36M_LEFT, skeletons.H36M_RIGHT)
        np.testing.assert_allclose(np.asarray(ff), x, atol=1e-6)

    def test_bone_lengths(self):
        x = np.zeros((17, 3))
        x[1] = [3.0, 4.0, 0.0]
        L = np.asarray(skeletons.bone_lengths(jnp.asarray(x), ((0, 1),)))
        np.testing.assert_allclose(L, [5.0])


# --------------------------------------------------------------------------
# contracts
# --------------------------------------------------------------------------
class TestContracts:
    def test_roundtrip_and_validation(self, tmp_path):
        from skix.io import PTInfo, check_pt_info_shapes, load_pt_info, save_pt_info

        T, H, W = 8, 32, 48
        info = PTInfo(
            video_name="clip", video_path="/x/clip.mp4", frame_count=T,
            img_shape=(H, W), fps=30.0, duration=T / 30.0,
            frames=rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8),
            depth=rng.normal(size=(T, 1, H, W)).astype(np.float32),
            optical_flow=rng.normal(size=(T - 1, 2, H, W)).astype(np.float32),
            none_index=np.array([2], np.int64),
            yolo_bbox=rng.normal(size=(T, 4)).astype(np.float32),
            yolo_keypoints=rng.normal(size=(T, 17, 3)).astype(np.float32),
            yolo_keypoints_score=rng.random((T, 17)).astype(np.float32),
            d2_bbox=rng.normal(size=(T, 4)).astype(np.float32),
            d2_keypoints=rng.normal(size=(T, 17, 3)).astype(np.float32),
            d2_keypoints_score=rng.random((T, 17)).astype(np.float32),
        )
        assert check_pt_info_shapes(info) == []
        p = tmp_path / "clip.npz"
        save_pt_info(p, info)
        back = load_pt_info(p)
        assert back.frame_count == T
        assert back.img_shape == (H, W)
        np.testing.assert_array_equal(back.frames, info.frames)
        np.testing.assert_allclose(back.yolo_keypoints, info.yolo_keypoints)

    def test_shape_violation_raises(self):
        from skix.io import PTInfo, check_pt_info_shapes

        info = PTInfo(frame_count=5, img_shape=(10, 10),
                      yolo_keypoints=np.zeros((4, 17, 3), np.float32))
        with pytest.raises(ValueError, match="YOLO/keypoints"):
            check_pt_info_shapes(info)

    def test_reads_reference_pt_format(self, tmp_path):
        torch = pytest.importorskip("torch")
        from skix.io import load_pt_info

        raw = {
            "video_name": "v", "video_path": "p", "frame_count": 3,
            "img_shape": (4, 6), "fps": 30.0, "duration": 0.1,
            "frames": torch.zeros(3, 4, 6, 3, dtype=torch.uint8),
            "none_index": [1],
            "YOLO": {"keypoints": torch.ones(3, 17, 3)},
            "detectron2": {"bbox": torch.zeros(3, 4)},
        }
        p = tmp_path / "ref.pt"
        torch.save(raw, p)
        info = load_pt_info(p)
        assert info.frame_count == 3
        assert info.yolo_keypoints.shape == (3, 17, 3)
        assert info.d2_bbox.shape == (3, 4)


class TestConfig:
    def test_load_override_interp(self, tmp_path):
        from skix.config import load_config

        (tmp_path / "stage.yaml").write_text(
            "paths:\n  root: /data\n  out: ${paths.root}/out\n"
            "model:\n  depth: 4\n  lr: 0.001\n")
        cfg = load_config("stage", ["model.depth=8", "paths.root=/tmp/x"],
                          config_dir=tmp_path)
        assert cfg.model.depth == 8
        assert cfg.paths.out == "/tmp/x/out"
        assert cfg.model.lr == 0.001

    def test_missing_key_raises(self, tmp_path):
        from skix.config import load_config

        (tmp_path / "s.yaml").write_text("a: 1\n")
        cfg = load_config("s", config_dir=tmp_path)
        with pytest.raises(AttributeError):
            _ = cfg.nope


class TestICP:
    def test_recovers_rigid_transform(self):
        from skix.geometry import icp as icp_mod
        from skix.geometry.rotations import rotvec_to_matrix

        r = np.random.default_rng(3)
        target = r.normal(size=(200, 3)).astype(np.float32)
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.1, 0.15, -0.05])))
        t = np.array([0.2, -0.1, 0.3], np.float32)
        # source = target moved by the inverse transform (so R,t map back)
        source = ((target - t) @ R).astype(np.float32)
        res = icp_mod.icp(jnp.asarray(source), jnp.asarray(target),
                          iterations=15)
        np.testing.assert_allclose(np.asarray(res.R), R, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-3)
        assert float(res.rms) < 1e-2

    def test_valid_masks_exclude_outliers(self):
        from skix.geometry import icp as icp_mod

        r = np.random.default_rng(4)
        target = r.normal(size=(100, 3)).astype(np.float32)
        source = target + np.array([0.5, 0, 0], np.float32)
        sv = np.ones(100, bool)
        src = source.copy()
        src[:20] += 50.0  # gross outliers, masked out
        sv[:20] = False
        res = icp_mod.icp(jnp.asarray(src), jnp.asarray(target),
                          source_valid=jnp.asarray(sv), iterations=10)
        np.testing.assert_allclose(np.asarray(res.t), [-0.5, 0, 0],
                                   atol=2e-2)

    def test_bbox_gate(self):
        from skix.geometry.icp import bbox_gate_mask

        uv = jnp.asarray([[5.0, 5.0], [50.0, 5.0], [15.0, 25.0]])
        m = np.asarray(bbox_gate_mask(uv, jnp.asarray([0.0, 0, 20, 30])))
        np.testing.assert_array_equal(m, [True, False, True])
