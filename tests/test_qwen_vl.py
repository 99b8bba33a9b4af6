"""Qwen2.5-VL vision tower + multimodal splice: converter parity vs a
tiny random ``transformers.Qwen2_5_VLForConditionalGeneration`` — the
reference's image-edit conditioning runs images + prompt through this
exact architecture (pipeline_qwenimage_edit_plus.py:230)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from skix.models.qwen_text import QwenTextEncoder
from skix.models.qwen_vl import (QwenVLEncoder, QwenVisionTower,
                                 convert_hf_qwen2_5_vl,
                                 get_rope_index_images)

VISION_START, VISION_END, IMAGE_PAD = 248, 249, 250


@pytest.fixture(scope="module")
def tiny_hf():
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration)

    cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            window_size=16, fullatt_block_indexes=[1],
            out_hidden_size=48, in_channels=3, hidden_act="silu"),
        text_config=dict(
            hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=96, vocab_size=256,
            rope_theta=1_000_000.0, rms_norm_eps=1e-6,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]}),
        image_token_id=IMAGE_PAD, vision_start_token_id=VISION_START,
        vision_end_token_id=VISION_END,
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return cfg, model


@pytest.fixture(scope="module")
def skix_pair(tiny_hf):
    cfg, model = tiny_hf
    vision = QwenVisionTower(
        depth=2, hidden=32, heads=2, intermediate=64, out_hidden=48,
        patch_size=4, temporal_patch_size=2, window_size=16,
        fullatt_block_indexes=(1,))
    text = QwenTextEncoder(vocab_size=256, hidden=48, layers=2, heads=4,
                           kv_heads=2, intermediate=96,
                           rope_theta=1_000_000.0)
    variables = convert_hf_qwen2_5_vl(model.state_dict())
    return QwenVLEncoder(vision, text, variables,
                         mrope_section=(2, 2, 2),
                         image_token_id=IMAGE_PAD,
                         vision_start_token_id=VISION_START)


def _inputs(seed=1, grid=(1, 8, 8)):
    rng = np.random.default_rng(seed)
    t, h, w = grid
    n_patches = t * h * w
    n_merged = n_patches // 4
    pixels = rng.normal(0, 1, (n_patches, 3 * 2 * 4 * 4)).astype(
        np.float32)
    ids = np.array([[5, 9, VISION_START] + [IMAGE_PAD] * n_merged
                    + [VISION_END, 17, 23, 31]], np.int64)
    return pixels, ids, grid


class TestVisionTowerParity:
    def test_vision_tower_matches_hf(self, tiny_hf, skix_pair):
        _, model = tiny_hf
        pixels, _, grid = _inputs()
        with torch.no_grad():
            want = model.model.visual(
                torch.from_numpy(pixels),
                grid_thw=torch.tensor([list(grid)])).numpy()
        got = skix_pair.vision.apply(skix_pair.variables["vision"],
                                     jnp.asarray(pixels), (grid,))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_window_vs_full_blocks_differ(self, skix_pair):
        """The window mask must actually restrict attention: zeroing
        fullatt_block_indexes changes the output (guards against a
        degenerate all-ones mask)."""
        pixels, _, grid = _inputs(seed=2)
        v = skix_pair.variables["vision"]
        got = skix_pair.vision.apply(v, jnp.asarray(pixels), (grid,))
        allfull = QwenVisionTower(
            depth=2, hidden=32, heads=2, intermediate=64, out_hidden=48,
            patch_size=4, temporal_patch_size=2, window_size=16,
            fullatt_block_indexes=(0, 1))
        got2 = allfull.apply(v, jnp.asarray(pixels), (grid,))
        assert not np.allclose(np.asarray(got), np.asarray(got2))


class TestMultimodalParity:
    def test_rope_index_matches_hf(self, tiny_hf):
        cfg, model = tiny_hf
        _, ids, grid = _inputs()
        want, _ = model.model.get_rope_index(
            torch.from_numpy(ids),
            image_grid_thw=torch.tensor([list(grid)]))
        got = get_rope_index_images(
            ids, (grid,), image_token_id=IMAGE_PAD,
            vision_start_token_id=VISION_START)
        np.testing.assert_array_equal(got, want.numpy())

    def test_full_multimodal_hidden_states(self, tiny_hf, skix_pair):
        """End-to-end encode_prompt parity: ids + image through the
        full VL model vs our spliced encoder, last hidden states."""
        _, model = tiny_hf
        pixels, ids, grid = _inputs()
        with torch.no_grad():
            out = model(
                input_ids=torch.from_numpy(ids),
                pixel_values=torch.from_numpy(pixels),
                image_grid_thw=torch.tensor([list(grid)]),
                output_hidden_states=True)
        want = out.hidden_states[-1].numpy()
        got = skix_pair.encode(ids, pixels, (grid,))
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)

    def test_text_only_matches_hf(self, tiny_hf, skix_pair):
        _, model = tiny_hf
        ids = np.array([[5, 9, 17, 23, 31, 2]], np.int64)
        with torch.no_grad():
            out = model(input_ids=torch.from_numpy(ids),
                        output_hidden_states=True)
        want = out.hidden_states[-1].numpy()
        got = skix_pair.encode(ids)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestPatchify:
    def test_layout_matches_hf_processor(self):
        """patchify_image reproduces Qwen2VLImageProcessor's flattening
        (image_processing_qwen2_vl.py:281-293) exactly, layout-only
        (rescale/normalize off)."""
        from transformers.models.qwen2_vl.image_processing_qwen2_vl \
            import Qwen2VLImageProcessor

        from skix.models.qwen_vl import patchify_image

        rng = np.random.default_rng(3)
        img = rng.random((32, 24, 3)).astype(np.float32)  # mult of 4*2
        proc = Qwen2VLImageProcessor(
            patch_size=4, merge_size=2, temporal_patch_size=2,
            do_resize=False, do_rescale=False, do_normalize=False,
            do_convert_rgb=False)
        out = proc(images=[img], return_tensors="np")
        got, grid = patchify_image(img, patch_size=4, merge=2,
                                   temporal_patch_size=2)
        np.testing.assert_array_equal(
            out["image_grid_thw"][0], np.asarray(grid))
        np.testing.assert_allclose(got, out["pixel_values"], atol=1e-6)

    def test_preprocess_shapes(self):
        from skix.models.qwen_vl import preprocess_image_qwen

        img = (np.random.default_rng(4).random((100, 80, 3))
               * 255).astype(np.uint8)
        patches, grid = preprocess_image_qwen(
            img, patch_size=4, merge=2, target_tokens=16)
        assert grid == (1, 8, 8)
        assert patches.shape == (64, 3 * 2 * 4 * 4)
        assert np.isfinite(patches).all()
