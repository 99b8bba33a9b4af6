"""DINOv3-shaped trunk: RoPE invariants, converter round-trip, SAM3DBody
seam (reference backbones/__init__.py:22-29 dinov3_* variants +
backbones/dinov3.py Dinov3Backbone)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skix.models.dinov3 import (
    Dinov3Trunk, convert_dinov3_trunk, dinov3_reference_state_dict_spec,
    dinov3_rope_coords, dinov3_rope_periods, dinov3_rope_tables)


class TestRope:
    def test_periods_base(self):
        p = dinov3_rope_periods(16, base=100.0)
        assert p.shape == (4,)
        assert p[0] == 1.0
        # geometric in base^(2i/(hd/2))
        np.testing.assert_allclose(p[1:] / p[:-1], 100.0 ** (2.0 / 8.0),
                                   rtol=1e-6)

    def test_periods_minmax(self):
        p = dinov3_rope_periods(16, base=None, min_period=0.5,
                                max_period=8.0)
        assert p[0] == pytest.approx(0.5)
        assert p[-1] == pytest.approx(8.0)
        # log-spaced
        np.testing.assert_allclose(np.diff(np.log(p)),
                                   np.log(p[1] / p[0]), rtol=1e-5)

    def test_coords_range_and_order(self):
        hh, ww = dinov3_rope_coords(2, 3)
        assert hh.shape == (6,)
        # row-major: h repeats per row, w tiles
        np.testing.assert_allclose(hh[:3], hh[0])
        np.testing.assert_allclose(ww[:3], ww[3:])
        assert hh.min() >= -1.0 and hh.max() <= 1.0
        # patch centers: (i + 0.5)/n → 2c − 1 is symmetric around 0
        np.testing.assert_allclose(hh[:3] + hh[3:], 0.0, atol=1e-6)

    def test_norm_preserved(self):
        """RoPE is a rotation: per-pair norms (hence the full vector
        norm) are preserved."""
        rng = np.random.default_rng(0)
        periods = dinov3_rope_periods(16)
        cos, sin = dinov3_rope_tables(4, 4, periods)
        x = rng.normal(size=(16, 16)).astype(np.float32)
        x1, x2 = x[:, :8], x[:, 8:]
        rot = np.concatenate([-x2, x1], -1)
        y = x * cos + rot * sin
        np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                                   np.linalg.norm(x, axis=-1), rtol=1e-5)

    def test_relative_phase(self):
        """q·k after RoPE depends only on the coordinate DIFFERENCE —
        the defining rotary property, per frequency pair."""
        periods = dinov3_rope_periods(8)
        cos, sin = dinov3_rope_tables(4, 1, periods)  # 1D column grid

        def rot(v, i):
            v1, v2 = v[:4], v[4:]
            return v * cos[i] + np.concatenate([-v2, v1]) * sin[i]

        rng = np.random.default_rng(1)
        q = rng.normal(size=8).astype(np.float32)
        k = rng.normal(size=8).astype(np.float32)
        # pairs (0,1) and (2,3) have the same coord difference
        d01 = rot(q, 0) @ rot(k, 1)
        d23 = rot(q, 2) @ rot(k, 3)
        np.testing.assert_allclose(d01, d23, rtol=1e-4)


class TestTrunk:
    def _trunk(self, **kw):
        cfg = dict(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                   n_storage_tokens=4)
        cfg.update(kw)
        return Dinov3Trunk(**cfg)

    def test_forward_shape(self):
        m = self._trunk()
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 32, 32, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (2, 16, 32)
        assert np.isfinite(np.asarray(y)).all()

    def test_swiglu_variant(self):
        m = self._trunk(ffn="swiglu")
        x = jnp.zeros((1, 16, 16, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        assert "w1" in v["params"]["block_0"]["mlp"]
        assert m.apply(v, x).shape == (1, 4, 32)

    def test_no_learned_pos_table(self):
        m = self._trunk()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        names = jax.tree_util.tree_leaves_with_path(v["params"])
        flat = ["/".join(str(p) for p in path) for path, _ in names]
        assert not any("pos_embed" in f for f in flat)
        assert any("rope_periods" in f for f in flat)
        assert any("storage_tokens" in f for f in flat)

    def test_prefix_tokens_skip_rope_behaviorally(self):
        """Dinov3Attention output equals a manual oracle that rotates
        ONLY the patch slice of q/k; rotating the prefix slice too gives
        a different answer — the cls/storage tokens really bypass rope."""
        from skix.models.dinov3 import Dinov3Attention, _rotate_half

        rng = np.random.default_rng(11)
        B, n_prefix, n_patch, C, H = 1, 3, 8, 16, 2
        hd = C // H
        attn = Dinov3Attention(num_heads=H, n_prefix=n_prefix)
        x = jnp.asarray(rng.normal(size=(B, n_prefix + n_patch, C)),
                        jnp.float32)
        ang = jnp.asarray(rng.uniform(0, 3.0, (n_patch, hd)), jnp.float32)
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        v = attn.init(jax.random.PRNGKey(0), x, cos, sin)
        out = attn.apply(v, x, cos, sin)

        def oracle(rotate_prefix: bool):
            Wq = np.asarray(v["params"]["qkv"]["kernel"])
            bq = np.asarray(v["params"]["qkv"]["bias"])
            qkv = np.asarray(x) @ Wq + bq
            qkv = qkv.reshape(B, -1, 3, H, hd).transpose(2, 0, 3, 1, 4)
            q, k, vv = qkv[0], qkv[1], qkv[2]

            def rot(t):
                if rotate_prefix:
                    full_cos = np.concatenate(
                        [np.asarray(cos)[:n_prefix] * 0 + np.asarray(cos)[:1],
                         np.asarray(cos)], 0)[:t.shape[2]]
                    full_sin = np.concatenate(
                        [np.asarray(sin)[:1].repeat(n_prefix, 0),
                         np.asarray(sin)], 0)[:t.shape[2]]
                    return (t * full_cos + np.asarray(
                        _rotate_half(jnp.asarray(t))) * full_sin)
                pre, pat = t[:, :, :n_prefix], t[:, :, n_prefix:]
                pat = (pat * np.asarray(cos)
                       + np.asarray(_rotate_half(jnp.asarray(pat)))
                       * np.asarray(sin))
                return np.concatenate([pre, pat], 2)

            qr, kr = rot(q), rot(k)
            logits = np.einsum("bhqd,bhkd->bhqk", qr, kr) / np.sqrt(hd)
            w = np.exp(logits - logits.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            o = np.einsum("bhqk,bhkd->bhqd", w, vv)
            o = o.transpose(0, 2, 1, 3).reshape(B, -1, C)
            return o @ np.asarray(v["params"]["proj"]["kernel"]) + \
                np.asarray(v["params"]["proj"]["bias"])

        np.testing.assert_allclose(np.asarray(out), oracle(False),
                                   atol=1e-5, rtol=1e-5)
        assert not np.allclose(np.asarray(out), oracle(True), atol=1e-4)

    def test_rope_periods_stop_gradient(self):
        """Gradients through the trunk must not reach rope_periods
        (upstream holds them as a non-learned buffer)."""
        m = self._trunk()
        x = jnp.asarray(np.random.default_rng(3).normal(
            size=(1, 16, 16, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(
            v["params"])
        np.testing.assert_allclose(np.asarray(g["rope_periods"]), 0.0)
        # other params do receive gradient
        assert float(jnp.abs(g["block_0"]["attn"]["qkv"]["kernel"]).max()) > 0

    def test_explicit_ffn_hidden_width(self):
        m = self._trunk(ffn="swiglu", ffn_hidden=24)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        assert v["params"]["block_0"]["mlp"]["w1"]["kernel"].shape == (32, 24)


class TestConverter:
    @pytest.mark.parametrize("ffn", ["mlp", "swiglu"])
    def test_round_trip_tree_exact(self, ffn):
        rng = np.random.default_rng(2)
        spec = dinov3_reference_state_dict_spec(
            embed_dim=32, depth=2, num_heads=2, n_storage_tokens=4,
            patch_size=8, ffn=ffn)
        sd = {k: rng.normal(size=s).astype(np.float32)
              for k, s in spec.items()}
        variables = convert_dinov3_trunk(sd, ffn=ffn)
        m = Dinov3Trunk(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                        n_storage_tokens=4, ffn=ffn)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
        ref = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
        conv_tree = jax.tree_util.tree_structure(variables)
        init_tree = jax.tree_util.tree_structure(ref)
        assert conv_tree == init_tree
        # shapes match leaf-for-leaf
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(variables),
                jax.tree_util.tree_leaves_with_path(ref)):
            assert pa == pb and a.shape == b.shape, (pa, a.shape, b.shape)
        y = m.apply(variables, x)
        assert y.shape == (1, 16, 32)
        assert np.isfinite(np.asarray(y)).all()

    def test_encoder_prefix_and_periods(self):
        rng = np.random.default_rng(3)
        spec = dinov3_reference_state_dict_spec(
            embed_dim=32, depth=1, num_heads=2, patch_size=8)
        per = np.asarray([1.0, 3.0, 9.0, 27.0], np.float32)
        sd = {f"encoder.{k}": rng.normal(size=s).astype(np.float32)
              for k, s in spec.items()}
        sd["encoder.rope_embed.periods"] = per
        variables = convert_dinov3_trunk(sd)
        np.testing.assert_allclose(
            np.asarray(variables["params"]["rope_periods"]), per)

    def test_missing_periods_needs_head_dim(self):
        rng = np.random.default_rng(4)
        spec = dinov3_reference_state_dict_spec(
            embed_dim=32, depth=1, num_heads=2, patch_size=8)
        spec.pop("rope_embed.periods")
        sd = {k: rng.normal(size=s).astype(np.float32)
              for k, s in spec.items()}
        with pytest.raises(ValueError):
            convert_dinov3_trunk(sd)
        v = convert_dinov3_trunk(sd, head_dim=16)
        np.testing.assert_allclose(
            np.asarray(v["params"]["rope_periods"]),
            dinov3_rope_periods(16))


class TestSam3dBodySeam:
    def test_backbone_dinov3(self):
        from skix.models.sam3d_body import SAM3DBody

        m = SAM3DBody(crop_size=64, patch_size=16, embed_dim=32, depth=2,
                      num_heads=2, decoder_depth=1, decoder_dim=32,
                      backbone="dinov3")
        x = jnp.asarray(np.random.default_rng(5).uniform(
            size=(1, 64, 64, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        assert "rope_periods" in v["params"]["dino_backbone"]
        out = m.apply(v, x)
        assert np.isfinite(np.asarray(out.joints_3d)).all()

    def test_named_variant_routes_to_v3_trunk(self):
        """Reference factory names (dinov3_vits16, ...) must select the
        DINOv3-exact trunk with the published hyperparameters — not fall
        through to the DINOv2-shaped stand-in (ADVICE r4)."""
        from skix.models.sam3d_body import SAM3DBody

        m = SAM3DBody(crop_size=64, patch_size=16, embed_dim=384, depth=1,
                      num_heads=2, decoder_depth=1, decoder_dim=32,
                      backbone="dinov3_vits16")
        x = jnp.zeros((1, 64, 64, 3))
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
        bb = v["params"]["dino_backbone"]
        assert "rope_periods" in bb            # v3 trunk, not v2 ViT
        # variant table overrides depth/heads: ViT-S/16 = 384 × 12 layers
        assert bb["cls_token"].shape[-1] == 384
        assert "block_11" in bb

        # mismatched embed_dim must fail loudly, not silently reshape
        bad = SAM3DBody(crop_size=64, patch_size=16, embed_dim=32, depth=1,
                        num_heads=2, decoder_depth=1, decoder_dim=32,
                        backbone="dinov3_vits16")
        with pytest.raises(ValueError, match="set SAM3DBody embed_dim"):
            bad.init(jax.random.PRNGKey(0), x)

    def test_unknown_dinov3_variant_raises(self):
        from skix.models.sam3d_body import SAM3DBody

        m = SAM3DBody(crop_size=64, patch_size=16, embed_dim=32, depth=1,
                      num_heads=2, decoder_depth=1, decoder_dim=32,
                      backbone="dinov3_vitq99")
        with pytest.raises(ValueError, match="unknown dinov3 variant"):
            m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def test_infer_config_from_state_dict(self):
        from skix.models.dinov3 import infer_dinov3_config

        rng = np.random.default_rng(8)
        spec = dinov3_reference_state_dict_spec(
            embed_dim=32, depth=3, num_heads=2, n_storage_tokens=5,
            patch_size=8, ffn="swiglu")
        sd = {k: rng.normal(size=s).astype(np.float32)
              for k, s in spec.items()}
        cfg = infer_dinov3_config(sd)
        assert cfg["embed_dim"] == 32 and cfg["depth"] == 3
        assert cfg["n_storage_tokens"] == 5 and cfg["patch_size"] == 8
        assert cfg["ffn"] == "swiglu" and cfg["num_heads"] == 2
        assert cfg["ffn_hidden"] == sd["blocks.0.mlp.w1.weight"].shape[0]
