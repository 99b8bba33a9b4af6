"""SAM-3D-Body-family tests: rig FK, crop math, model, estimator, CLI."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.sam3d_body import (
    MHR70_PARENTS,
    SAM3DBody,
    SAM3DBodyEstimator,
    bbox_center_scale,
    crop_resize,
    crop_to_image_coords,
    mhr_forward_kinematics,
    select_closest_person,
)

rng = np.random.default_rng(61)

_ID6 = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (70, 1))


class TestRig:
    def test_tree_is_valid(self):
        assert MHR70_PARENTS[0] == -1
        for j in range(1, 70):
            assert 0 <= MHR70_PARENTS[j] < j or MHR70_PARENTS[j] < j, \
                f"joint {j} parent {MHR70_PARENTS[j]}"

    def test_tpose_identity(self):
        j = mhr_forward_kinematics(jnp.asarray(_ID6[None]),
                                   jnp.zeros((1, 10)), jnp.ones(1))
        j = np.asarray(j)[0]
        assert j.shape == (70, 3)
        np.testing.assert_allclose(j[0], 0.0, atol=1e-6)  # root at origin
        # knees below hips, head above neck (y-down offsets chosen negative
        # for legs, positive for spine)
        assert j[4][1] < j[1][1]
        assert j[15][1] > j[12][1] > j[3][1]

    def test_scale_linear(self):
        j1 = np.asarray(mhr_forward_kinematics(jnp.asarray(_ID6[None]),
                                               jnp.zeros((1, 10)),
                                               jnp.ones(1)))
        j2 = np.asarray(mhr_forward_kinematics(jnp.asarray(_ID6[None]),
                                               jnp.zeros((1, 10)),
                                               2.0 * jnp.ones(1)))
        np.testing.assert_allclose(j2, 2 * j1, atol=1e-5)

    def test_root_rotation_rotates_everything(self):
        from skix.geometry.rotations import matrix_to_rot6d, rotvec_to_matrix

        R = rotvec_to_matrix(jnp.asarray([0.0, 0.0, np.pi / 2]))
        pose = _ID6.copy()
        pose[0] = np.asarray(matrix_to_rot6d(R))
        j_rot = np.asarray(mhr_forward_kinematics(jnp.asarray(pose[None]),
                                                  jnp.zeros((1, 10)),
                                                  jnp.ones(1)))[0]
        j_id = np.asarray(mhr_forward_kinematics(jnp.asarray(_ID6[None]),
                                                 jnp.zeros((1, 10)),
                                                 jnp.ones(1)))[0]
        np.testing.assert_allclose(j_rot, j_id @ np.asarray(R).T, atol=1e-4)

    def test_betas_change_bone_lengths(self):
        j0 = np.asarray(mhr_forward_kinematics(jnp.asarray(_ID6[None]),
                                               jnp.zeros((1, 10)),
                                               jnp.ones(1)))[0]
        b = jnp.zeros((1, 10)).at[0, 0].set(2.0)
        j1 = np.asarray(mhr_forward_kinematics(jnp.asarray(_ID6[None]), b,
                                               jnp.ones(1)))[0]
        assert not np.allclose(j0, j1)


class TestCrop:
    def test_center_scale(self):
        c, s = bbox_center_scale(jnp.asarray([10.0, 20, 50, 100]))
        np.testing.assert_allclose(np.asarray(c), [30, 60])
        np.testing.assert_allclose(np.asarray(s), [100.0, 100.0])  # max side ×1.25

    def test_crop_roundtrip_coords(self):
        center = jnp.asarray([120.0, 90.0])
        scale = jnp.asarray([80.0, 80.0])
        pts_img = jnp.asarray([[120.0, 90.0], [160.0, 130.0]])
        # image → crop: inverse of crop_to_image_coords
        pts_crop = (pts_img - center) * (256.0 / scale) + 128.0
        back = crop_to_image_coords(pts_crop, center, scale, 256)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts_img),
                                   atol=1e-4)

    def test_crop_resize_picks_region(self):
        frame = np.zeros((100, 100, 3), np.float32)
        frame[40:60, 40:60] = 1.0  # white square at center
        crop = crop_resize(jnp.asarray(frame), jnp.asarray([50.0, 50.0]),
                           jnp.asarray([20.0, 20.0]), 32)
        assert float(jnp.mean(crop)) > 0.9  # crop fully inside the square
        crop2 = crop_resize(jnp.asarray(frame), jnp.asarray([10.0, 10.0]),
                            jnp.asarray([20.0, 20.0]), 32)
        assert float(jnp.mean(crop2)) < 0.1


class TestModel:
    def _tiny(self):
        return SAM3DBody(crop_size=64, patch_size=16, embed_dim=32, depth=2,
                         num_heads=2, decoder_depth=1, decoder_dim=32,
                         n_betas=4)

    def test_forward_shapes(self):
        model = self._tiny()
        crops = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), crops)
        out = model.apply(v, crops)
        assert out.pose_rot6d.shape == (2, 70, 6)
        assert out.joints_3d.shape == (2, 70, 3)
        assert out.joints_2d_crop.shape == (2, 70, 2)
        assert float(jnp.min(out.cam_t[:, 2])) > 0  # positive depth
        for leaf in out:
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_prompts_change_output(self):
        model = self._tiny()
        crops = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        prompts = jnp.asarray(rng.random((1, 8, 3)), jnp.float32)
        pv = jnp.zeros((1, 8), bool).at[0, 0].set(True)
        v = model.init(jax.random.PRNGKey(0), crops, prompts, pv)
        out_np = model.apply(v, crops, prompts, jnp.zeros((1, 8), bool))
        out_p = model.apply(v, crops, prompts, pv)
        assert not np.allclose(np.asarray(out_np.joints_3d),
                               np.asarray(out_p.joints_3d))


class TestEstimator:
    def test_process_clip_schema(self):
        model = SAM3DBody(crop_size=64, patch_size=16, embed_dim=32, depth=2,
                          num_heads=2, decoder_depth=1, decoder_dim=32,
                          n_betas=4)
        est = SAM3DBodyEstimator(model)
        frames = rng.integers(0, 255, (5, 80, 96, 3)).astype(np.uint8)
        bboxes = np.tile(np.array([20.0, 10, 70, 75], np.float32), (5, 1))
        outs = est.process_clip(frames, bboxes, batch_size=2)
        assert len(outs) == 5
        o = outs[0]
        assert o["pred_keypoints_2d"].shape == (70, 2)
        assert o["pred_keypoints_3d"].shape == (70, 3)
        assert o["pred_cam_t"].shape == (3,)
        assert o["pred_global_rots"].shape == (70, 3, 3)
        assert float(o["focal_length"]) > 0

    def test_select_closest_person(self):
        near = {"pred_cam_t": np.array([0.0, 0, 3.0])}
        far = {"pred_cam_t": np.array([0.0, 0, 9.0])}
        assert select_closest_person([far, near]) is near
        # continuity pulls toward the previous person's position
        prev = {"pred_cam_t": np.array([0.0, 0, 8.8])}
        pick = select_closest_person([far, near], previous_person=prev,
                                     continuity_weight=3.0)
        assert pick is far

    def test_empty(self):
        assert select_closest_person([]) is None


class TestCLI:
    def test_end_to_end(self, tmp_path):
        from skix.io import PTInfo, save_pt_info
        from skix.pipelines.prepare_side_results import main

        T, H, W = 4, 64, 64
        pdir = tmp_path / "pt" / "p01"
        pdir.mkdir(parents=True)
        info = PTInfo(
            video_name="osmo_1", frame_count=T, img_shape=(H, W), fps=30.0,
            duration=T / 30.0,
            frames=rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8),
            yolo_bbox=np.tile(np.array([10.0, 10, 50, 60], np.float32),
                              (T, 1)))
        save_pt_info(pdir / "osmo_1.npz", info)
        out_root = tmp_path / "out"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "sam3d_body.yaml").write_text(f"""
paths:
  pt_root: {tmp_path / 'pt'}
  out_root: {out_root}
checkpoint: null
crop_size: 64
patch_size: 16
embed_dim: 32
vit_depth: 2
num_heads: 2
decoder_depth: 1
batch_size: 2
""")
        main([f"--config-dir={cdir}"])
        frames = sorted((out_root / "p01" / "osmo_1").glob("frame_*.npz"))
        assert len(frames) == T
        with np.load(frames[0]) as z:
            assert z["pred_keypoints_3d"].shape == (70, 3)
        # and the fuse loader can read this directory directly
        from skix.pipelines.fuse import load_sam3d_sequence

        k3, k2 = load_sam3d_sequence(out_root / "p01" / "osmo_1")
        assert k3.shape == (T, 70, 3)
        assert k2.shape == (T, 70, 2)
