"""SAM prompt encoder + interactive image predictor tests.

Reference: sam3/sam/prompt_encoder.py (PromptEncoder,
PositionEmbeddingRandom) and sam3/model/sam1_task_predictor.py
(SAM3InteractiveImagePredictor).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.tracking.sam_prompt_encoder import (InteractiveSegmenter,
                                              RandomPositionEmbedding,
                                              SamImagePredictor,
                                              SamPromptEncoder)


class TestRandomPE:
    def test_range_and_shape(self):
        pe = RandomPositionEmbedding(8)
        v = pe.init(jax.random.PRNGKey(0), jnp.zeros((3, 2)))
        out = pe.apply(v, jnp.asarray([[0.2, 0.7]]))
        assert out.shape == (1, 16)
        assert float(jnp.abs(out).max()) <= 1.0 + 1e-6  # sin/cos bounded

    def test_grid_matches_pointwise(self):
        pe = RandomPositionEmbedding(8)
        v = pe.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
        grid = pe.apply(v, 4, 6, method=pe.grid)
        assert grid.shape == (4, 6, 16)
        # grid cell (1, 2) == encoding of its center coordinate
        direct = pe.apply(v, jnp.asarray([(2 + 0.5) / 6, (1 + 0.5) / 4]))
        np.testing.assert_allclose(np.asarray(grid[1, 2]),
                                   np.asarray(direct), atol=1e-6)


class TestPromptEncoder:
    def _enc(self):
        enc = SamPromptEncoder(embed_dim=32, input_image_size=64)
        pts = jnp.asarray([[[10.0, 20.0], [40.0, 8.0]]])
        lab = jnp.asarray([[1, -1]])
        v = enc.init(jax.random.PRNGKey(0), (8, 8), pts, lab)
        return enc, v, pts, lab

    def test_pad_label_uses_not_a_point(self):
        enc, v, pts, lab = self._enc()
        sparse, dense, pe = enc.apply(v, (8, 8), pts, lab)
        assert sparse.shape == (1, 2, 32)
        nap = v["params"]["not_a_point_embed"]
        np.testing.assert_allclose(np.asarray(sparse[0, 1]),
                                   np.asarray(nap), atol=1e-6)
        # positive point ≠ the same point with a negative label
        sparse_neg, _, _ = enc.apply(v, (8, 8), pts,
                                     jnp.asarray([[0, -1]]))
        assert not np.allclose(np.asarray(sparse[0, 0]),
                               np.asarray(sparse_neg[0, 0]))

    def test_no_mask_embedding_broadcast(self):
        enc, v, pts, lab = self._enc()
        _, dense, _ = enc.apply(v, (8, 8), pts, lab)
        assert dense.shape == (1, 8, 8, 32)
        nm = v["params"]["no_mask_embed"]
        np.testing.assert_allclose(np.asarray(dense[0, 3, 5]),
                                   np.asarray(nm), atol=1e-6)

    def test_box_adds_corner_tokens(self):
        enc, v, pts, lab = self._enc()
        box = jnp.asarray([[8.0, 8.0, 40.0, 48.0]])
        sparse, _, _ = enc.apply(v, (8, 8), pts, lab, box)
        assert sparse.shape == (1, 4, 32)  # 2 points + 2 corners

    def test_mask_prompt_changes_dense(self):
        enc, v0, pts, lab = self._enc()
        m = jnp.ones((1, 32, 32, 1))
        v = enc.init(jax.random.PRNGKey(1), (8, 8), pts, lab, None, m)
        _, dense, _ = enc.apply(v, (8, 8), pts, lab, None, m)
        assert dense.shape == (1, 8, 8, 32)


class TestPromptEncoderConverter:
    def test_parity_vs_reference(self):
        """Converted random reference PromptEncoder weights reproduce the
        reference's sparse AND dense embeddings (oracle import of
        sam3/sam/prompt_encoder.py)."""
        import importlib.util
        import sys
        import types

        import pytest as _pytest
        torch = _pytest.importorskip("torch")

        from skix.tracking.sam_prompt_encoder import (
            convert_sam_prompt_encoder)

        ref_dir = "/root/reference/prepare_front_results/sam3/sam"
        pkg = types.ModuleType("refsam1")
        pkg.__path__ = [ref_dir]
        sys.modules.setdefault("refsam1", pkg)
        for name in ("common", "prompt_encoder"):
            spec = importlib.util.spec_from_file_location(
                f"refsam1.{name}", f"{ref_dir}/{name}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refsam1.{name}"] = mod
            spec.loader.exec_module(mod)
        RefPE = sys.modules["refsam1.prompt_encoder"].PromptEncoder

        torch.manual_seed(3)
        C, feat, img = 32, 8, 64
        ref = RefPE(embed_dim=C, image_embedding_size=(feat, feat),
                    input_image_size=(img, img), mask_in_chans=16).eval()

        pts = np.array([[[10.0, 20.0], [40.0, 8.0]]], np.float32)
        lab = np.array([[1, 0]], np.float32)
        box = np.array([[8.0, 8.0, 40.0, 48.0]], np.float32)
        with torch.no_grad():
            # pass a box so the reference does NOT append its pad point
            ref_sparse, ref_dense = ref(
                (torch.tensor(pts), torch.tensor(lab)),
                torch.tensor(box), None)

        enc = SamPromptEncoder(embed_dim=C, mask_in_chans=16,
                               input_image_size=img)
        v = convert_sam_prompt_encoder(ref.state_dict())
        sparse, dense, pe_grid = enc.apply(
            v, (feat, feat), jnp.asarray(pts),
            jnp.asarray(lab).astype(jnp.int32), jnp.asarray(box))

        np.testing.assert_allclose(np.asarray(sparse),
                                   ref_sparse.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dense).transpose(0, 3, 1, 2),
            ref_dense.detach().numpy(), atol=1e-5)
        # dense positional grid matches get_dense_pe
        with torch.no_grad():
            ref_pe = ref.get_dense_pe().numpy()
        np.testing.assert_allclose(
            np.asarray(pe_grid).transpose(2, 0, 1)[None], ref_pe,
            atol=1e-5)

    def test_mask_prompt_parity(self):
        import importlib.util
        import sys

        import pytest as _pytest
        torch = _pytest.importorskip("torch")
        from skix.tracking.sam_prompt_encoder import (
            convert_sam_prompt_encoder)

        RefPE = sys.modules["refsam1.prompt_encoder"].PromptEncoder \
            if "refsam1.prompt_encoder" in sys.modules else None
        if RefPE is None:
            _pytest.skip("reference import happens in the previous test")

        torch.manual_seed(4)
        C, feat, img = 32, 8, 64
        ref = RefPE(embed_dim=C, image_embedding_size=(feat, feat),
                    input_image_size=(img, img), mask_in_chans=16).eval()
        rng = np.random.default_rng(11)
        m = rng.normal(0, 1, (1, 1, 4 * feat, 4 * feat)).astype(np.float32)
        with torch.no_grad():
            _, ref_dense = ref(None, None, torch.tensor(m))
        enc = SamPromptEncoder(embed_dim=C, mask_in_chans=16,
                               input_image_size=img)
        v = convert_sam_prompt_encoder(ref.state_dict())
        _, dense, _ = enc.apply(v, (feat, feat), None, None, None,
                                jnp.asarray(m.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(dense).transpose(0, 3, 1, 2), ref_dense.detach().numpy(),
            atol=1e-5)


class TestInteractivePredictor:
    def test_set_image_predict_api(self):
        """The SAM-1 interactive loop: set_image once, click twice."""
        rng = np.random.default_rng(5)
        model = InteractiveSegmenter(features=32, img_size=64,
                                     num_heads=4)
        img = rng.uniform(0, 255, (48, 96, 3)).astype(np.uint8)
        pts = jnp.zeros((1, 8, 2))
        lab = jnp.full((1, 8), -1, jnp.int32)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3)), pts, lab)

        pred = SamImagePredictor(model, v)
        with pytest.raises(RuntimeError):
            pred.predict([[10, 10]], [1])
        pred.set_image(img)
        masks, iou, lowres = pred.predict([[30, 20]], [1],
                                          multimask_output=True)
        assert masks.shape == (4, 48, 96) and masks.dtype == bool
        assert iou.shape == (4,)
        # a second click reuses the cached embedding (no re-encode)
        masks2, _, _ = pred.predict([[30, 20], [80, 40]], [1, 0])
        assert masks2.shape == (4, 48, 96)
        # single-mask mode
        m1, iou1, _ = pred.predict([[30, 20]], [1], multimask_output=False)
        assert m1.shape == (1, 48, 96)
        pred.reset_predictor()
        with pytest.raises(RuntimeError):
            pred.predict([[10, 10]], [1])

    def test_box_prompt(self):
        """predict(pts, labels, box=...) — the reference predict
        signature; the box conditions the output."""
        rng = np.random.default_rng(7)
        model = InteractiveSegmenter(features=32, img_size=64, num_heads=4)
        pts = jnp.zeros((1, 8, 2))
        lab = jnp.full((1, 8), -1, jnp.int32)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3)), pts, lab)
        pred = SamImagePredictor(model, v)
        pred.set_image(rng.uniform(0, 255, (50, 70, 3)).astype(np.uint8))
        m_box, iou_box, lo_box = pred.predict(
            [[30, 20]], [1], box=[10, 10, 60, 45])
        assert m_box.shape == (4, 50, 70)
        _, _, lo_pts = pred.predict([[30, 20]], [1])
        assert not np.allclose(lo_box, lo_pts)
        # box-ONLY prompting (reference allows points=None)
        m_only, _, _ = pred.predict(None, None, box=[10, 10, 60, 45])
        assert m_only.shape == (4, 50, 70)

    def test_prompt_changes_output(self):
        rng = np.random.default_rng(6)
        model = InteractiveSegmenter(features=32, img_size=64, num_heads=4)
        pts = jnp.zeros((1, 8, 2))
        lab = jnp.full((1, 8), -1, jnp.int32)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3)), pts, lab)
        pred = SamImagePredictor(model, v)
        pred.set_image(rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8))
        _, _, a = pred.predict([[10, 10]], [1])
        _, _, b = pred.predict([[50, 50]], [1])
        assert not np.allclose(a, b)
