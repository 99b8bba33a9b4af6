"""Numerical parity of the VGGT converter vs the reference torch model.

The reference vggt package (read-only, torch CPU) is used purely as an
oracle: random-init a tiny conv-patch-embed Aggregator + CameraHead there,
convert the state dict, and compare forward outputs.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

rng = np.random.default_rng(131)


def _import_reference_vggt():
    sys.path.insert(0, "/root/reference")
    try:
        from vggt.vggt.models.aggregator import Aggregator as RefAggregator
        from vggt.vggt.heads.camera_head import CameraHead as RefCameraHead
        return RefAggregator, RefCameraHead
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference vggt not importable: {e}")


class TestAggregatorParity:
    def test_conv_patch_embed_aggregator(self):
        torch = pytest.importorskip("torch")
        RefAggregator, _ = _import_reference_vggt()
        from skix.models.vggt import Aggregator
        from skix.models.vggt_convert import convert_aggregator

        torch.manual_seed(0)
        depth = 2
        ref = RefAggregator(img_size=28, patch_size=14, embed_dim=64,
                            depth=depth, num_heads=4, num_register_tokens=2,
                            patch_embed="conv", rope_freq=100,
                            init_values=0.01, qk_norm=True).eval()
        imgs = rng.random((1, 3, 3, 28, 28)).astype(np.float32)  # B,S,C,H,W
        with torch.no_grad():
            ref_out, ref_psi = ref(torch.from_numpy(imgs))
        want_last = ref_out[-1].numpy()  # (B, S, P, 2C)

        model = Aggregator(img_size=28, patch_size=14, embed_dim=64,
                           depth=depth, num_heads=4, num_register_tokens=2,
                           patch_embed_kind="conv",
                           output_layers=tuple(range(depth)))
        sd = {k: v for k, v in ref.state_dict().items()}
        params = convert_aggregator(sd, depth, prefix="")
        imgs_j = jnp.asarray(imgs.transpose(0, 1, 3, 4, 2))  # B,S,H,W,C
        outs, psi = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                                imgs_j)
        assert psi == ref_psi
        got_last = np.asarray(outs[-1])
        assert got_last.shape == want_last.shape
        np.testing.assert_allclose(got_last, want_last, atol=2e-4)

    def test_camera_head_parity(self):
        torch = pytest.importorskip("torch")
        _, RefCameraHead = _import_reference_vggt()
        from skix.models.vggt import CameraHead
        from skix.models.vggt_convert import convert_camera_head

        torch.manual_seed(1)
        ref = RefCameraHead(dim_in=64, trunk_depth=2, num_heads=4,
                            mlp_ratio=4, init_values=0.01).eval()
        # reference expects the aggregated token list; camera token at idx 0
        tokens = rng.normal(size=(1, 3, 5, 64)).astype(np.float32)
        with torch.no_grad():
            preds_ref = ref([torch.from_numpy(tokens)], num_iterations=4)
        want = preds_ref[-1].numpy()

        head = CameraHead(dim_in=64, trunk_depth=2, num_heads=4,
                          num_iterations=4)
        params = convert_camera_head(ref.state_dict(), trunk_depth=2,
                                     prefix="")
        got = head.apply({"params": jax.tree.map(jnp.asarray, params)},
                         jnp.asarray(tokens[:, :, 0, :]))[-1]
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestDinov2BackboneParity:
    def test_backbone_conversion(self):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference")
        try:
            from vggt.vggt.layers.vision_transformer import DinoVisionTransformer
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference dinov2 not importable: {e}")
        from skix.models.layers import VisionTransformer
        from skix.models.vggt_convert import convert_dinov2_backbone

        torch.manual_seed(3)
        depth = 2
        ref = DinoVisionTransformer(
            img_size=28, patch_size=14, embed_dim=48, depth=depth,
            num_heads=4, num_register_tokens=2, init_values=1.0,
            block_chunks=0).eval()
        x = rng.random((2, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            out = ref.forward_features(torch.from_numpy(x))
        want = out["x_norm_patchtokens"].numpy()

        model = VisionTransformer(patch_size=14, embed_dim=48, depth=depth,
                                  num_heads=4, num_register_tokens=2,
                                  init_values=1.0)
        params = convert_dinov2_backbone(ref.state_dict(), depth)
        got = np.asarray(model.apply(
            {"params": jax.tree.map(jnp.asarray, params)},
            jnp.asarray(x.transpose(0, 2, 3, 1))))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4)
