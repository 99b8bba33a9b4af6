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
    hand_boxes_from_keypoints,
    refine_hands_params,
    select_closest_person,
    wrist_angle_gate,
)

rng = np.random.default_rng(61)


class TestRigIntegration:
    """Deep rig tests live in test_mhr.py; here: model-level wiring."""

    def test_real_hierarchy_exported(self):
        # finger chains hang off the wrists (real MHR-70 metadata names)
        assert MHR70_PARENTS[24] == 41 and MHR70_PARENTS[45] == 62
        assert (MHR70_PARENTS == -1).sum() == 1

    def test_hand_box_and_gate(self):
        j2 = jnp.asarray(rng.uniform(0, 256, (2, 70, 2)), jnp.float32)
        lbox, rbox = hand_boxes_from_keypoints(j2)
        assert lbox.shape == (2, 4) and rbox.shape == (2, 4)
        assert bool(jnp.all(lbox[:, 2:] > lbox[:, :2]))
        eye = jnp.tile(jnp.eye(3), (2, 70, 1, 1))
        gate = wrist_angle_gate(eye, eye)
        assert bool(jnp.all(gate))  # identical rotations always pass
        # a 180° flipped wrist must fail the 1.4 rad gate
        from skix.models import mhr as M

        flip = eye.at[:, 41].set(jnp.asarray(
            M.euler_xyz_to_matrix(jnp.asarray([np.pi, 0.0, 0.0]))))
        gate2 = wrist_angle_gate(eye, flip)
        assert not bool(gate2[0, 1])

    def test_refine_hands_params_blend(self):
        body = jnp.zeros((2, 108))
        branch = jnp.ones((2, 108))
        out = refine_hands_params(body, branch,
                                  jnp.asarray([True, False]),
                                  jnp.asarray([False, True]))
        assert float(out[0, :54].sum()) == 54.0   # left accepted in b0
        assert float(out[0, 54:].sum()) == 0.0
        assert float(out[1, 54:].sum()) == 54.0   # right accepted in b1


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
                         num_heads=2, decoder_depth=1, decoder_dim=32)

    def test_forward_shapes(self):
        model = self._tiny()
        crops = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), crops)
        out = model.apply(v, crops)
        assert out.mhr.pred_pose_raw.shape == (2, 266)  # 6 + 260 cont
        assert out.mhr.body_pose.shape == (2, 133)
        assert out.mhr.hand.shape == (2, 108)
        assert out.joints_3d.shape == (2, 70, 3)
        assert out.joints_2d_crop.shape == (2, 70, 2)
        assert out.vertices_3d.shape[0] == 2 and out.vertices_3d.shape[2] == 3
        assert float(jnp.min(out.cam_t[:, 2])) > 0  # positive depth
        for leaf in jax.tree.leaves(out):
            assert np.all(np.isfinite(np.asarray(leaf)))
        # hands + jaw zeroed in the body pose (mhr_head.py:305-307)
        from skix.models import mhr as M

        assert float(jnp.abs(
            out.mhr.body_pose[:, M.MHR_PARAM_HAND_IDXS]).max()) == 0.0
        assert float(jnp.abs(out.mhr.body_pose[:, -3:]).max()) == 0.0

    def test_hand_decoder_branch(self):
        model = self._tiny()
        crops = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), crops)
        vh = model.init(jax.random.PRNGKey(1), crops, decoder_type="hand")
        merged = dict(v["params"])
        for key, val in vh["params"].items():
            merged.setdefault(key, val)
        out_b = model.apply({"params": merged}, crops)
        out_h = model.apply({"params": merged}, crops, decoder_type="hand")
        assert not np.allclose(np.asarray(out_b.mhr.hand),
                               np.asarray(out_h.mhr.hand))

    def test_hand_override_changes_fingers_only(self):
        model = self._tiny()
        crops = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), crops)
        out0 = model.apply(v, crops)
        out1 = model.apply(v, crops,
                           hand_override=jnp.ones((1, 108)) * 0.3)
        d = np.linalg.norm(np.asarray(out1.joints_3d - out0.joints_3d),
                           axis=-1)[0]
        assert d[25] > 1e-6 or d[30] > 1e-6  # finger joints move
        assert d[9] < 1e-6                   # root unaffected

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
                          num_heads=2, decoder_depth=1, decoder_dim=32)
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
        assert o["pred_vertices"].ndim == 2 and o["pred_vertices"].shape[1] == 3
        assert o["body_pose_params"].shape == (133,)
        assert o["hand_pose_params"].shape == (108,)
        assert float(o["focal_length"]) > 0

    def test_full_inference_runs_hand_refinement(self):
        model = SAM3DBody(crop_size=64, patch_size=16, embed_dim=32, depth=2,
                          num_heads=2, decoder_depth=1, decoder_dim=32)
        est = SAM3DBodyEstimator(model)
        frames = rng.integers(0, 255, (2, 80, 96, 3)).astype(np.uint8)
        bboxes = np.tile(np.array([20.0, 10, 70, 75], np.float32), (2, 1))
        outs = est.process_clip(frames, bboxes, batch_size=2,
                                inference_type="full")
        assert len(outs) == 2
        assert np.all(np.isfinite(outs[0]["pred_keypoints_3d"]))
        assert np.all(np.isfinite(outs[0]["hand_pose_params"]))

    def test_image_focal_rescales_translation_consistently(self):
        """An overridden per-frame focal (the MoGe path) must re-express
        the camera translation under that focal — the reference overrides
        cam_int BEFORE estimation (sam_3d_body_estimator.py:169-175), so
        tz ∝ f and the saved (focal, cam_t) pair reprojects identically.
        Pairing a MoGe focal with a crop-focal translation would shift
        every downstream reprojection."""
        model = SAM3DBody(crop_size=64, patch_size=16, embed_dim=32, depth=2,
                          num_heads=2, decoder_depth=1, decoder_dim=32)
        est = SAM3DBodyEstimator(model)
        frames = rng.integers(0, 255, (2, 80, 96, 3)).astype(np.uint8)
        bboxes = np.tile(np.array([20.0, 10, 70, 75], np.float32), (2, 1))
        base = est.process_clip(frames, bboxes, batch_size=2)
        f0 = float(base[0]["focal_length"])
        outs = est.process_clip(frames, bboxes, batch_size=2,
                                image_focal=2.0 * f0)
        for b, o in zip(base, outs):
            np.testing.assert_allclose(float(o["focal_length"]), 2.0 * f0)
            np.testing.assert_allclose(o["pred_cam_t"][2],
                                       2.0 * b["pred_cam_t"][2], rtol=1e-5)
            np.testing.assert_allclose(o["pred_cam_t"][:2],
                                       b["pred_cam_t"][:2], rtol=1e-5)
            # camera-frame joints/vertices shift by the same depth delta
            # (tz·(r−1)), keeping them consistent with the new cam_t
            delta = b["pred_cam_t"][2]          # tz·(2−1)
            np.testing.assert_allclose(
                o["pred_keypoints_3d"] - b["pred_keypoints_3d"]
                - np.array([0, 0, delta]), 0.0, atol=1e-5 * abs(delta))
            np.testing.assert_allclose(
                o["pred_vertices"] - b["pred_vertices"]
                - np.array([0, 0, delta]), 0.0, atol=1e-5 * abs(delta))

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

    def test_fov_estimator_feeds_focal(self, tmp_path):
        """fov_name: moge2 routes the MoGe vertical focal into the saved
        focal_length (reference sam_3d_body_estimator.py:169-175)."""
        from skix.io import PTInfo, save_pt_info
        from skix.models.moge import MoGeFovEstimator, MoGePointModel
        from skix.pipelines.prepare_side_results import main

        T, H, W = 3, 28, 28
        pdir = tmp_path / "pt" / "p01"
        pdir.mkdir(parents=True)
        frames = rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8)
        info = PTInfo(
            video_name="osmo_1", frame_count=T, img_shape=(H, W), fps=30.0,
            duration=T / 30.0, frames=frames,
            yolo_bbox=np.tile(np.array([4.0, 4, 24, 26], np.float32),
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
crop_size: 32
patch_size: 16
embed_dim: 32
vit_depth: 2
num_heads: 2
decoder_depth: 1
batch_size: 2
fov_name: moge2
fov_stride: 2
fov_patch_size: 14
fov_embed_dim: 16
fov_depth: 2
fov_num_heads: 2
""")
        main([f"--config-dir={cdir}"])
        files = sorted((out_root / "p01" / "osmo_1").glob("frame_*.npz"))
        assert len(files) == T
        # oracle: same smoke model (PRNGKey(0) lazy init) on the same frames
        est = MoGeFovEstimator(MoGePointModel(
            patch_size=14, embed_dim=16, depth=2, num_heads=2,
            taps=(0, 0, 0, 1)))
        Ks = est.intrinsics_for_clip(frames[::2])
        want = np.repeat(Ks[:, 1, 1], 2)[:T]
        got = np.array([float(np.load(f)["focal_length"]) for f in files])
        np.testing.assert_allclose(got, want, rtol=1e-5)
        assert np.all(got > 0)


class TestMaskConditioning:
    """Reference mask-prompt conditioning (_get_mask_prompt,
    sam3d_body.py:766-789 + :1107 'v1: non-iterative'): downscaled mask
    embeddings, gated by mask_score, added to the image embeddings."""

    def _tiny(self):
        return SAM3DBody(crop_size=64, patch_size=16, embed_dim=32, depth=2,
                         num_heads=2, decoder_depth=1, decoder_dim=32)

    def test_mask_downscaler_torch_parity(self):
        """convert_mask_downscaling maps the reference's SAM-style
        Conv/LayerNorm2d Sequential (prompt_encoder.py:50-58) 1:1."""
        torch = pytest.importorskip("torch")
        from skix.models.sam3d_body import (MaskDownscaler,
                                            convert_mask_downscaling)

        class LayerNorm2d(torch.nn.Module):
            def __init__(self, c, eps=1e-6):
                super().__init__()
                self.weight = torch.nn.Parameter(torch.ones(c))
                self.bias = torch.nn.Parameter(torch.zeros(c))
                self.eps = eps

            def forward(self, x):
                u = x.mean(1, keepdim=True)
                s = (x - u).pow(2).mean(1, keepdim=True)
                x = (x - u) / torch.sqrt(s + self.eps)
                return x * self.weight[:, None, None] + \
                    self.bias[:, None, None]

        torch.manual_seed(3)
        seq = torch.nn.Sequential(
            torch.nn.Conv2d(1, 4, kernel_size=4, stride=4),
            LayerNorm2d(4), torch.nn.GELU(),
            torch.nn.Conv2d(4, 16, kernel_size=4, stride=4),
            LayerNorm2d(16), torch.nn.GELU(),
            torch.nn.Conv2d(16, 24, kernel_size=1))
        for p in seq.parameters():
            torch.nn.init.normal_(p, std=0.3)
        mask = rng.random((2, 64, 64, 1)).astype(np.float32)
        with torch.no_grad():
            want = seq(torch.from_numpy(
                mask.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        sd = {f"mask_downscaling.{k}": v.detach().numpy()
              for k, v in seq.state_dict().items()}
        params = convert_mask_downscaling(sd)
        got = MaskDownscaler(embed_dim=24).apply({"params": params},
                                                 jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_score_gate_semantics(self):
        """score=0 + any mask == mask=None (no_mask_embed path);
        score=1 + a real mask conditions the output (reference
        torch.where(mask_score > 0, ...) :784-788)."""
        model = self._tiny()
        crops = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), crops)
        mask = jnp.ones((1, 64, 64, 1), jnp.float32)
        out_none = model.apply(v, crops)
        out_zero = model.apply(v, crops, mask=mask,
                               mask_score=jnp.zeros((1,)))
        np.testing.assert_allclose(np.asarray(out_zero.joints_3d),
                                   np.asarray(out_none.joints_3d),
                                   atol=1e-6)
        out_one = model.apply(v, crops, mask=mask,
                              mask_score=jnp.ones((1,)))
        assert not np.allclose(np.asarray(out_one.joints_3d),
                               np.asarray(out_none.joints_3d))

    def test_estimator_mask_conditioning_and_graft(self):
        model = self._tiny()
        est = SAM3DBodyEstimator(model)
        frames = rng.integers(0, 255, (3, 80, 96, 3)).astype(np.uint8)
        bboxes = np.tile(np.array([20.0, 10, 70, 75], np.float32), (3, 1))
        masks = np.zeros((3, 1, 80, 96), np.uint8)  # pt-contract layout
        masks[:, 0, 15:70, 25:65] = 1
        base = est.process_clip(frames, bboxes, batch_size=2)
        cond = est.process_clip(frames, bboxes, batch_size=2, masks=masks)
        assert len(cond) == 3
        assert cond[0]["pred_keypoints_3d"].shape == (70, 3)
        assert np.all(np.isfinite(cond[0]["pred_keypoints_3d"]))
        assert not np.allclose(cond[0]["pred_keypoints_3d"],
                               base[0]["pred_keypoints_3d"])
        # graft: variables from a run predating the mask encoder still
        # work (and accept masks) through the estimator's merge
        old = {"params": {k: val for k, val in est.variables["params"]
                          .items()
                          if k not in ("mask_prompt", "no_mask_embed")}}
        est2 = SAM3DBodyEstimator(model, old)
        outs = est2.process_clip(frames, bboxes, batch_size=2, masks=masks)
        assert np.all(np.isfinite(outs[0]["pred_keypoints_3d"]))


class TestDinoBackbone:
    """backbone='dino' routes the trunk through the shared DINOv2-shaped
    VisionTransformer (reference create_backbone's Dinov3Backbone slot,
    backbones/__init__.py:21-31 + dinov3.py:25-37 normalized patch
    tokens)."""

    def _dino(self):
        return SAM3DBody(crop_size=64, patch_size=16, embed_dim=32,
                         depth=2, num_heads=2, decoder_depth=1,
                         decoder_dim=32, backbone="dino")

    def test_forward_and_mask_alignment(self):
        model = self._dino()
        crops = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), crops)
        assert "dino_backbone" in v["params"]
        assert "patch_embed" not in v["params"]     # vit_hmr trunk absent
        out = model.apply(v, crops)
        assert out.joints_3d.shape == (2, 70, 3)
        for leaf in jax.tree.leaves(out):
            assert np.all(np.isfinite(np.asarray(leaf)))
        # the 16x mask downscale lands on the dino patch grid too
        mask = jnp.ones((2, 64, 64, 1), jnp.float32)
        out_m = model.apply(v, crops, mask=mask, mask_score=jnp.ones((2,)))
        assert not np.allclose(np.asarray(out_m.joints_3d),
                               np.asarray(out.joints_3d))

    def test_dinov2_converter_seam(self):
        """convert_dinov2_backbone output slots 1:1 into the
        dino_backbone subtree (the checkpoint seam for hub DINO
        weights)."""
        from skix.models.vggt_convert import convert_dinov2_backbone

        model = self._dino()
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        want = v["params"]["dino_backbone"]
        P = (64 // 16) ** 2
        lrng = np.random.default_rng(0)
        sd = {
            "cls_token": lrng.standard_normal((1, 1, 32)),
            "register_tokens": lrng.standard_normal((1, 4, 32)),
            "pos_embed": lrng.standard_normal((1, P + 1, 32)),
            "patch_embed.proj.weight": lrng.standard_normal((32, 3, 16, 16)),
            "patch_embed.proj.bias": lrng.standard_normal((32,)),
            "norm.weight": np.ones(32), "norm.bias": np.zeros(32),
        }
        for i in range(2):
            p = f"blocks.{i}"
            sd.update({
                f"{p}.norm1.weight": np.ones(32),
                f"{p}.norm1.bias": np.zeros(32),
                f"{p}.attn.qkv.weight": lrng.standard_normal((96, 32)),
                f"{p}.attn.qkv.bias": lrng.standard_normal((96,)),
                f"{p}.attn.proj.weight": lrng.standard_normal((32, 32)),
                f"{p}.attn.proj.bias": lrng.standard_normal((32,)),
                f"{p}.ls1.gamma": lrng.standard_normal((32,)),
                f"{p}.norm2.weight": np.ones(32),
                f"{p}.norm2.bias": np.zeros(32),
                f"{p}.mlp.fc1.weight": lrng.standard_normal((128, 32)),
                f"{p}.mlp.fc1.bias": lrng.standard_normal((128,)),
                f"{p}.mlp.fc2.weight": lrng.standard_normal((32, 128)),
                f"{p}.mlp.fc2.bias": lrng.standard_normal((32,)),
                f"{p}.ls2.gamma": lrng.standard_normal((32,)),
            })
        sd = {k: np.asarray(val, np.float32) for k, val in sd.items()}
        got = convert_dinov2_backbone(sd, depth=2)
        flat_w = dict(jax.tree_util.tree_flatten_with_path(want)[0])
        flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
        assert set(flat_g) == set(flat_w)
        for k in flat_w:
            assert flat_g[k].shape == flat_w[k].shape, k
        merged = dict(v["params"])
        merged["dino_backbone"] = got
        out = model.apply({"params": merged},
                          jnp.full((1, 64, 64, 3), 0.5))
        assert np.all(np.isfinite(np.asarray(out.joints_3d)))
