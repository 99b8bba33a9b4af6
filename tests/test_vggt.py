"""VGGT model-family tests (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.vggt import (
    Aggregator,
    CameraHead,
    DPTHead,
    VGGT,
    activate_head_output,
    extri_intri_to_pose_encoding,
    pose_encoding_to_extri_intri,
    unproject_depth_to_points,
)

rng = np.random.default_rng(77)

TINY = dict(img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=2)


class TestPoseEncoding:
    def test_roundtrip(self):
        from skix.geometry.rotations import rotvec_to_matrix

        B, S = 2, 3
        rv = rng.normal(size=(B, S, 3)) * 0.5
        R = np.asarray(rotvec_to_matrix(jnp.asarray(rv)))
        t = rng.normal(size=(B, S, 3))
        extr = np.concatenate([R, t[..., None]], axis=-1)
        K = np.zeros((B, S, 3, 3))
        K[..., 0, 0] = 800.0
        K[..., 1, 1] = 820.0
        K[..., 0, 2] = 320.0
        K[..., 1, 2] = 240.0
        K[..., 2, 2] = 1.0
        enc = extri_intri_to_pose_encoding(jnp.asarray(extr), jnp.asarray(K),
                                           (480, 640))
        extr2, K2 = pose_encoding_to_extri_intri(enc, (480, 640))
        np.testing.assert_allclose(np.asarray(extr2), extr, atol=1e-4)
        np.testing.assert_allclose(np.asarray(K2[..., 0, 0]), 800.0, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(K2[..., 1, 1]), 820.0, rtol=1e-4)

    def test_activations(self):
        x = jnp.asarray([-1.0, 0.0, 2.0])
        np.testing.assert_allclose(np.asarray(activate_head_output(x, "linear")), [-1, 0, 2])
        np.testing.assert_allclose(
            np.asarray(activate_head_output(x, "inv_log")),
            [-(np.e - 1), 0.0, np.exp(2) - 1], rtol=1e-5)
        assert float(activate_head_output(jnp.asarray([0.0]), "expp1")[0]) == 2.0


class TestAggregator:
    def test_shapes_and_intermediates(self):
        model = Aggregator(**TINY, output_layers=(0, 1))
        B, S, H, W = 1, 3, 28, 28
        imgs = jnp.asarray(rng.random((B, S, H, W, 3)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), imgs)
        outs, psi = model.apply(vars_, imgs)
        assert psi == 3  # 1 camera + 2 register
        P = psi + (28 // 14) ** 2
        assert len(outs) == 2
        assert outs[0].shape == (B, S, P, 2 * 32)

    def test_first_frame_token_split(self):
        """Camera token for frame 0 differs from frames 1..S−1 (the
        reference's slice_expand_and_flatten semantics)."""
        model = Aggregator(**TINY, output_layers=(1,))
        imgs = jnp.asarray(np.tile(rng.random((1, 1, 28, 28, 3)), (1, 3, 1, 1, 1)),
                           jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(1), imgs)
        # identical image content for every frame ⇒ any difference in the
        # camera token across frames comes from the first/rest token split
        # (global attention also mixes, so just check frames 1,2 agree more
        # with each other than with frame 0)
        outs, _ = model.apply(vars_, imgs)
        cam = np.asarray(outs[-1][0, :, 0, :])  # (S, 2C)
        d01 = np.linalg.norm(cam[0] - cam[1])
        d12 = np.linalg.norm(cam[1] - cam[2])
        assert d12 < d01

    def test_permutation_of_rest_frames_equivariant(self):
        """Frames 1..S−1 share tokens → swapping them permutes outputs."""
        model = Aggregator(**TINY, output_layers=(1,))
        imgs = jnp.asarray(rng.random((1, 3, 28, 28, 3)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(2), imgs)
        outs, _ = model.apply(vars_, imgs)
        swapped = imgs[:, [0, 2, 1]]
        outs_sw, _ = model.apply(vars_, swapped)
        np.testing.assert_allclose(np.asarray(outs_sw[-1][:, 1]),
                                   np.asarray(outs[-1][:, 2]), atol=1e-4)


class TestHeads:
    def _taps(self, B=1, S=2, P=7, C=64, n=4):
        return [jnp.asarray(rng.normal(size=(B, S, P, C)), jnp.float32)
                for _ in range(n)]

    def test_camera_head_iterates(self):
        head = CameraHead(dim_in=64, trunk_depth=1, num_heads=2,
                          num_iterations=3)
        tokens = jnp.asarray(rng.normal(size=(2, 3, 64)), jnp.float32)
        vars_ = head.init(jax.random.PRNGKey(0), tokens)
        preds = head.apply(vars_, tokens)
        assert len(preds) == 3
        assert preds[-1].shape == (2, 3, 9)
        # fov activation (relu) keeps it nonneg
        assert float(jnp.min(preds[-1][..., 7:])) >= 0.0

    def test_dpt_head_resolution(self):
        H = W = 28
        head = DPTHead(dim_in=64, patch_size=14, output_dim=2,
                       out_channels=(16, 32, 48, 48), features=16,
                       activation="exp")
        taps = self._taps(P=3 + 4, C=64)
        vars_ = head.init(jax.random.PRNGKey(0), taps, (H, W), 3)
        pred, conf = head.apply(vars_, taps, (H, W), 3)
        assert pred.shape == (1, 2, H, W, 1)
        assert conf.shape == (1, 2, H, W)
        assert float(jnp.min(pred)) > 0  # exp activation
        assert float(jnp.min(conf)) > 1  # expp1


class TestFullModel:
    def test_forward_shapes(self):
        model = VGGT(img_size=28, patch_size=14, embed_dim=32, depth=4,
                     num_heads=2, intermediate_layer_idx=(0, 1, 2, 3))
        imgs = jnp.asarray(rng.random((1, 2, 28, 28, 3)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), imgs)
        out = model.apply(vars_, imgs)
        assert out["pose_enc"].shape == (1, 2, 9)
        assert out["depth"].shape == (1, 2, 28, 28, 1)
        assert out["world_points"].shape == (1, 2, 28, 28, 3)
        assert out["depth_conf"].shape == (1, 2, 28, 28)
        for v in jax.tree.leaves(out):
            assert np.all(np.isfinite(np.asarray(v)))

    def test_jit_compiles(self):
        model = VGGT(img_size=28, patch_size=14, embed_dim=32, depth=2,
                     num_heads=2, intermediate_layer_idx=(0, 0, 1, 1),
                     enable_point=False)
        imgs = jnp.zeros((1, 2, 28, 28, 3))
        vars_ = model.init(jax.random.PRNGKey(0), imgs)
        out = jax.jit(model.apply)(vars_, imgs)
        assert out["pose_enc"].shape == (1, 2, 9)


class TestUnproject:
    def test_identity_camera(self):
        H = W = 8
        depth = np.full((H, W), 2.0, np.float32)
        K = np.array([[4.0, 0, 4.0], [0, 4.0, 4.0], [0, 0, 1]], np.float32)
        extr = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
        pts = np.asarray(unproject_depth_to_points(
            jnp.asarray(depth), jnp.asarray(extr), jnp.asarray(K)))
        assert pts.shape == (H, W, 3)
        np.testing.assert_allclose(pts[..., 2], 2.0, atol=1e-6)
        # integer pixel coords (reference utils/geometry.py:107 convention):
        # pixel (4, 4) sits exactly on the principal point
        np.testing.assert_allclose(pts[4, 4, :2], [0.0, 0.0], atol=1e-5)
        # one pixel right of the principal point: x = 1/fx·z = 0.5
        np.testing.assert_allclose(pts[4, 5, :2], [0.5, 0.0], atol=1e-5)

    def test_inverts_projection(self):
        from skix.geometry.rotations import rotvec_to_matrix

        H = W = 6
        K = np.array([[10.0, 0, 3.0], [0, 10.0, 3.0], [0, 0, 1]])
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.1, -0.2, 0.3])))
        t = np.array([0.5, -0.3, 1.0])
        extr = np.concatenate([R, t[:, None]], 1)
        depth = rng.uniform(1, 5, size=(H, W))
        pts = np.asarray(unproject_depth_to_points(
            jnp.asarray(depth), jnp.asarray(extr), jnp.asarray(K)))
        # reproject: R p + t should have z == depth
        cam = pts @ R.T + t
        np.testing.assert_allclose(cam[..., 2], depth, rtol=1e-5)


class TestOddGrid:
    def test_dpt_head_odd_grid(self):
        """518/14 = 37-wide grids: fusion levels must align (the 2x
        upsample of an odd-sized coarse level overshoots by one)."""
        H = W = 70  # grid 5 (odd) → down2 gives 3 → up2 gives 6 vs 5
        head = DPTHead(dim_in=32, patch_size=14, output_dim=2,
                       out_channels=(8, 8, 8, 8), features=8,
                       activation="exp")
        taps = [jnp.asarray(rng.normal(size=(1, 1, 3 + 25, 32)), jnp.float32)
                for _ in range(4)]
        vars_ = head.init(jax.random.PRNGKey(0), taps, (H, W), 3)
        pred, conf = head.apply(vars_, taps, (H, W), 3)
        assert pred.shape == (1, 1, H, W, 1)
        assert np.all(np.isfinite(np.asarray(pred)))
