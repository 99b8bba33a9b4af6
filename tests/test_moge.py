"""MoGe-shaped FOV estimation: point-map model, geometric focal
recovery, reference run_moge semantics (VERDICT r2 weak #6)."""

import numpy as np

import jax
import jax.numpy as jnp

from skix.models.moge import (MoGeFovEstimator, MoGePointModel, image_uv,
                              recover_focal_shift)


def _synthetic_pointmap(H, W, f_true, dz_true, seed=0):
    """Points whose perspective projection with (f_true, dz_true) lands
    exactly on the pixel grid — the recovery oracle."""
    rng = np.random.default_rng(seed)
    u, v = [np.asarray(t) for t in image_uv(H, W)]
    z_true = 1.0 + 2.0 * rng.random((H, W)).astype(np.float32)
    x = u * z_true / f_true
    y = v * z_true / f_true
    z_aff = z_true - dz_true
    assert z_aff.min() > 0
    return np.stack([x, y, z_aff], -1).astype(np.float32)


class TestFocalRecovery:
    def test_recovers_known_camera(self):
        pts = _synthetic_pointmap(24, 32, f_true=0.9, dz_true=0.4)
        f, dz = recover_focal_shift(jnp.asarray(pts))
        assert abs(float(f) - 0.9) / 0.9 < 0.01, float(f)
        assert abs(float(dz) - 0.4) < 0.02, float(dz)

    def test_respects_mask(self):
        pts = _synthetic_pointmap(24, 32, f_true=0.7, dz_true=0.2, seed=1)
        pts[:6] = 1e3  # corrupt a band; mask must exclude it
        mask = np.ones((24, 32), bool)
        mask[:6] = False
        f, dz = recover_focal_shift(jnp.asarray(pts), jnp.asarray(mask))
        assert abs(float(f) - 0.7) / 0.7 < 0.02, float(f)

    def test_jit_and_vmap_clean(self):
        pts = np.stack([_synthetic_pointmap(14, 14, 0.8, 0.3, seed=i)
                        for i in range(3)])
        f, dz = jax.jit(jax.vmap(recover_focal_shift))(jnp.asarray(pts))
        assert f.shape == (3,)
        np.testing.assert_allclose(np.asarray(f), 0.8, rtol=0.02)

    def test_empty_mask_falls_back_finite(self):
        """An all-False validity mask (untrained weights / rejected
        frame) must not drive the golden-section bracket to -inf and the
        focal to NaN — it falls back to uniform weights."""
        pts = _synthetic_pointmap(16, 16, f_true=0.8, dz_true=0.3)
        f, dz = recover_focal_shift(jnp.asarray(pts),
                                    jnp.zeros((16, 16), bool))
        assert np.isfinite(float(f)) and np.isfinite(float(dz))
        np.testing.assert_allclose(float(f), 0.8, rtol=0.02)


class TestMoGeModel:
    def _tiny(self):
        return MoGePointModel(patch_size=14, embed_dim=32, depth=2,
                              num_heads=2, taps=(0, 1), features=16)

    def test_forward_contract(self):
        rng = np.random.default_rng(5)
        m = self._tiny()
        x = jnp.asarray(rng.random((1, 56, 70, 3)), jnp.float32)
        v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
        pts, msk = m.apply(v, x)
        assert pts.shape == (1, 56, 70, 3)
        assert msk.shape == (1, 56, 70)
        assert float(pts[..., 2].min()) > 0          # depth-like z
        assert np.isfinite(np.asarray(pts)).all()

    def test_estimator_reference_semantics(self):
        """fx is overridden by the vertical focal and K is in pixels
        (run_moge / denormalize_f)."""
        rng = np.random.default_rng(6)
        m = self._tiny()
        x = jnp.zeros((1, 56, 56, 3))
        v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
        est = MoGeFovEstimator(m, v)
        frames = rng.integers(0, 255, (2, 50, 56, 3)).astype(np.uint8)
        Ks = est.intrinsics_for_clip(frames, batch_size=2)
        assert Ks.shape == (2, 3, 3)
        assert np.all(Ks[:, 0, 0] == Ks[:, 1, 1])    # fx := v_focal
        np.testing.assert_allclose(Ks[:, 0, 2], 56 / 2)
        np.testing.assert_allclose(Ks[:, 1, 2], 50 / 2)
        assert np.all(Ks[:, 0, 0] > 0)

    def test_one_estimator_serves_multiple_resolutions(self):
        """One MoGeFovEstimator instance across clips of DIFFERENT
        resolutions: the ViT pos-embed is interpolated per padded grid
        instead of crashing on the first clip's shape (and real
        converted weights trained at one size serve any input)."""
        rng = np.random.default_rng(8)
        m = self._tiny()
        est = MoGeFovEstimator(m)                  # lazy init (smoke)
        big = rng.integers(0, 255, (1, 56, 56, 3)).astype(np.uint8)
        small = rng.integers(0, 255, (1, 28, 42, 3)).astype(np.uint8)
        K_big = est.intrinsics_for_clip(big, batch_size=1)
        K_small = est.intrinsics_for_clip(small, batch_size=1)
        assert K_big.shape == (1, 3, 3) and K_small.shape == (1, 3, 3)
        assert np.isfinite(K_small).all()
        np.testing.assert_allclose(K_small[0, 0, 2], 42 / 2)
        # cached per grid: a second same-size clip reuses the variables
        assert (28 // 14 * 2, 42 // 14) != est._grid
        K_again = est.intrinsics_for_clip(small, batch_size=1)
        assert K_again.shape == (1, 3, 3)

    def test_resize_pos_embed_preserves_constant_field(self):
        from skix.models.moge import resize_pos_embed

        pos = np.concatenate([np.full((1, 1, 8), 7.0),
                              np.full((1, 12, 8), 3.0)], 1)
        out = resize_pos_embed(jnp.asarray(pos, jnp.float32), (3, 4),
                               (5, 2))
        assert out.shape == (1, 11, 8)
        np.testing.assert_allclose(np.asarray(out[:, 0]), 7.0)
        np.testing.assert_allclose(np.asarray(out[:, 1:]), 3.0, atol=1e-5)

    def test_backbone_converter_seam(self):
        """The trunk consumes the parity-tested DINOv2 seam: converted
        params match the model's backbone subtree structurally."""
        from skix.models.moge import convert_moge_backbone

        rng = np.random.default_rng(7)
        D, depth, heads, regs = 32, 2, 2, 4
        sd = {"backbone.cls_token": rng.normal(size=(1, 1, D)),
              "backbone.register_tokens": rng.normal(size=(1, regs, D)),
              "backbone.pos_embed": rng.normal(size=(1, 17, D)),
              "backbone.patch_embed.proj.weight":
                  rng.normal(size=(D, 3, 14, 14)),
              "backbone.patch_embed.proj.bias": rng.normal(size=(D,)),
              "backbone.norm.weight": rng.normal(size=(D,)),
              "backbone.norm.bias": rng.normal(size=(D,))}
        for i in range(depth):
            pre = f"backbone.blocks.{i}"
            for nm, shp in (("norm1.weight", (D,)), ("norm1.bias", (D,)),
                            ("attn.qkv.weight", (3 * D, D)),
                            ("attn.qkv.bias", (3 * D,)),
                            ("attn.proj.weight", (D, D)),
                            ("attn.proj.bias", (D,)),
                            ("norm2.weight", (D,)), ("norm2.bias", (D,)),
                            ("mlp.fc1.weight", (4 * D, D)),
                            ("mlp.fc1.bias", (4 * D,)),
                            ("mlp.fc2.weight", (D, 4 * D)),
                            ("mlp.fc2.bias", (D,)),
                            ("ls1.gamma", (D,)), ("ls2.gamma", (D,))):
                sd[f"{pre}.{nm}"] = rng.normal(size=shp)
        conv = convert_moge_backbone(sd, depth=depth)

        m = MoGePointModel(patch_size=14, embed_dim=D, depth=depth,
                           num_heads=heads, taps=(0, 1), features=16)
        x = jnp.zeros((1, 56, 56, 3))
        v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
        bb = v["params"]["backbone"]
        pi = {jax.tree_util.keystr(p): q.shape for p, q in
              jax.tree_util.tree_leaves_with_path(bb)}
        pc = {jax.tree_util.keystr(p): np.asarray(q).shape for p, q in
              jax.tree_util.tree_leaves_with_path(conv)}
        assert set(pi) == set(pc), (sorted(set(pi) ^ set(pc))[:6])
        v2 = {"params": {**v["params"], "backbone": jax.tree.map(
            jnp.asarray, conv)}}
        pts, _ = m.apply(v2, x)
        assert np.isfinite(np.asarray(pts)).all()
