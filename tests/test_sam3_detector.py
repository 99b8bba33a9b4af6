"""SAM3 detector at reference capability: windowed ViT-Det, VL fusion,
geometry prompts, maskformer head."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.tracking.sam3_detector import (
    GeometryPromptEncoder,
    PixelDecoder,
    Sam3Detector,
    bilinear_sample,
    box_grid_sample,
    pool_prompt,
)
from skix.tracking.vitdet import (
    SimpleFPNNeck,
    ViTDetBackbone,
    window_partition,
    window_unpartition,
)



class TestWindowing:
    def test_partition_roundtrip(self):
        rng = np.random.default_rng(900)
        x = jnp.asarray(rng.normal(size=(2, 10, 14, 8)), jnp.float32)
        w, pad_hw = window_partition(x, 4)
        back = window_unpartition(w, 4, pad_hw, (10, 14))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_window_equals_global_when_window_covers_grid(self):
        """A window block whose window spans the whole grid must equal the
        global block exactly (same params, same RoPE coords)."""
        rng = np.random.default_rng(901)
        m_win = ViTDetBackbone(img_size=56, patch_size=14, embed_dim=32,
                               depth=1, num_heads=2, mlp_ratio=2.0,
                               window_size=4, global_att_blocks=())
        m_glob = ViTDetBackbone(img_size=56, patch_size=14, embed_dim=32,
                                depth=1, num_heads=2, mlp_ratio=2.0,
                                window_size=4, global_att_blocks=(0,))
        imgs = jnp.asarray(rng.normal(size=(1, 56, 56, 3)), jnp.float32)
        v = m_win.init(jax.random.PRNGKey(0), imgs)
        out_w = m_win.apply(v, imgs)
        out_g = m_glob.apply(v, imgs)  # identical param structure
        np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_g),
                                   atol=1e-5)

    def test_window_flash_matches_round2_path(self):
        """window_flash routes window blocks through table-form rope with
        WINDOW-LOCAL coordinates (single Pallas tile on TPU). Axial-rope
        logits depend only on coordinate differences, so outputs must be
        identical to the round-2 path (global per-window coords, rope_2d
        at the XLA level) on a multi-window grid."""
        rng = np.random.default_rng(903)
        kw = dict(img_size=112, patch_size=14, embed_dim=32, depth=2,
                  num_heads=2, mlp_ratio=2.0, window_size=4,
                  global_att_blocks=(1,))
        m_new = ViTDetBackbone(**kw, window_flash=True)
        m_old = ViTDetBackbone(**kw, window_flash=False)
        imgs = jnp.asarray(rng.normal(size=(2, 112, 112, 3)), jnp.float32)
        v = m_new.init(jax.random.PRNGKey(0), imgs)
        np.testing.assert_allclose(np.asarray(m_new.apply(v, imgs)),
                                   np.asarray(m_old.apply(v, imgs)),
                                   atol=2e-5)

    def test_window_flash_sam3_style_runs(self):
        """sam3-rope windows pass an explicit single-tile block size; the
        two routes agree (same table rope either way — only the kernel
        engagement differs, which the CPU XLA fallback normalizes)."""
        rng = np.random.default_rng(904)
        kw = dict(img_size=112, patch_size=14, embed_dim=32, depth=1,
                  num_heads=2, mlp_ratio=2.0, window_size=4,
                  global_att_blocks=(), rope_style="sam3")
        m_new = ViTDetBackbone(**kw, window_flash=True)
        m_old = ViTDetBackbone(**kw, window_flash=False)
        imgs = jnp.asarray(rng.normal(size=(1, 112, 112, 3)), jnp.float32)
        v = m_new.init(jax.random.PRNGKey(0), imgs)
        np.testing.assert_allclose(np.asarray(m_new.apply(v, imgs)),
                                   np.asarray(m_old.apply(v, imgs)),
                                   atol=2e-5)

    def test_windowed_differs_on_larger_grid(self):
        rng = np.random.default_rng(902)
        m_win = ViTDetBackbone(img_size=112, patch_size=14, embed_dim=32,
                               depth=1, num_heads=2, mlp_ratio=2.0,
                               window_size=4, global_att_blocks=())
        m_glob = ViTDetBackbone(img_size=112, patch_size=14, embed_dim=32,
                                depth=1, num_heads=2, mlp_ratio=2.0,
                                window_size=4, global_att_blocks=(0,))
        imgs = jnp.asarray(rng.normal(size=(1, 112, 112, 3)), jnp.float32)
        v = m_win.init(jax.random.PRNGKey(0), imgs)
        out_w = m_win.apply(v, imgs)
        out_g = m_glob.apply(v, imgs)
        assert not np.allclose(np.asarray(out_w), np.asarray(out_g),
                               atol=1e-4)


class TestNeckAndPixelDecoder:
    def test_fpn_levels(self):
        rng = np.random.default_rng(903)
        neck = SimpleFPNNeck(d_model=32)
        feat = jnp.asarray(rng.normal(size=(1, 8, 8, 64)), jnp.float32)
        v = neck.init(jax.random.PRNGKey(0), feat)
        feats, poss = neck.apply(v, feat)
        assert [f.shape[1] for f in feats] == [32, 16, 8, 4]
        assert all(f.shape[-1] == 32 for f in feats)
        assert all(p.shape == f.shape[1:] for p, f in zip(poss, feats))

    def test_pixel_decoder_output_at_finest(self):
        rng = np.random.default_rng(904)
        pd = PixelDecoder(hidden_dim=16)
        feats = [jnp.asarray(rng.normal(size=(1, s, s, 16)), jnp.float32)
                 for s in (16, 8, 4)]
        v = pd.init(jax.random.PRNGKey(0), feats)
        out = pd.apply(v, feats)
        assert out.shape == (1, 16, 16, 16)


class TestGeometry:
    def test_bilinear_sample_exact_at_centers(self):
        rng = np.random.default_rng(905)
        feat = jnp.asarray(rng.normal(size=(6, 8, 3)), jnp.float32)
        # pixel-center coordinates: exact values
        pts = jnp.asarray([[(1 + 0.5) / 8, (2 + 0.5) / 6],
                           [(4 + 0.5) / 8, (0 + 0.5) / 6]])
        out = bilinear_sample(feat, pts)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(feat[2, 1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]),
                                   np.asarray(feat[0, 4]), atol=1e-6)

    def test_box_pool_constant_field(self):
        feat = jnp.ones((8, 8, 4)) * 3.0
        boxes = jnp.asarray([[0.5, 0.5, 0.4, 0.4]])
        out = box_grid_sample(feat, boxes)
        np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)

    def test_prompt_encoder_masks_invalid(self):
        rng = np.random.default_rng(906)
        enc = GeometryPromptEncoder(d_model=16, max_points=4, max_boxes=2)
        feat = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32)
        pts = jnp.asarray(rng.uniform(0, 1, (1, 4, 2)), jnp.float32)
        bxs = jnp.asarray(rng.uniform(0.2, 0.6, (1, 2, 4)), jnp.float32)
        v = enc.init(jax.random.PRNGKey(0), feat, pts,
                     jnp.ones((1, 4), jnp.int32), jnp.zeros((1, 4), bool),
                     bxs, jnp.ones((1, 2), jnp.int32),
                     jnp.zeros((1, 2), bool))
        tok, pad = enc.apply(v, feat, pts, jnp.ones((1, 4), jnp.int32),
                             jnp.zeros((1, 4), bool), bxs,
                             jnp.ones((1, 2), jnp.int32),
                             jnp.zeros((1, 2), bool))
        assert float(jnp.abs(tok).max()) == 0.0  # all invalid → zeroed
        assert bool(jnp.all(pad))

    def test_pool_prompt_masked(self):
        p = jnp.asarray([[[1.0, 1], [3, 3], [100, 100]]])
        mask = jnp.asarray([[False, False, True]])
        np.testing.assert_allclose(np.asarray(pool_prompt(p, mask)),
                                   [[2.0, 2.0]])


class TestDetector:
    def _setup(self):
        rng = np.random.default_rng(907)
        m = Sam3Detector.tiny()
        imgs = jnp.asarray(rng.uniform(0, 1, (1, 112, 112, 3)), jnp.float32)
        text = jnp.asarray(rng.normal(0, 0.1, (1, 4, 64)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), imgs, text)
        return m, imgs, text, v

    def test_output_contract(self):
        m, imgs, text, v = self._setup()
        out = m.apply(v, imgs, text)
        Q = m.num_queries
        assert out.boxes_cxcywh.shape == (1, Q, 4)
        assert out.scores.shape == (1, Q)
        assert out.mask_logits.shape[:2] == (1, Q)
        assert out.presence.shape == (1,)
        assert len(out.aux_boxes) == m.decoder_layers
        assert float(out.boxes_cxcywh.min()) >= 0.0
        assert float(out.boxes_cxcywh.max()) <= 1.0
        for leaf in jax.tree.leaves(out):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_sam3_rope_style_plumbs_to_trunk(self):
        """A converted SAM3 checkpoint needs the trunk in the reference
        rope convention — rope_style/pretrain_img_size reach the
        backbone through the full detector (regression: they used to be
        backbone-only knobs, unreachable from Sam3Detector)."""
        rng = np.random.default_rng(915)
        m = Sam3Detector.tiny(rope_style="sam3", pretrain_img_size=56)
        imgs = jnp.asarray(rng.uniform(0, 1, (1, 112, 112, 3)), jnp.float32)
        text = jnp.asarray(rng.normal(0, 0.1, (1, 4, 64)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), imgs, text)
        # pretrain grid 56/14 = 4 → tiled pos-embed table is (1, 4, 4, C)
        pe = v["params"]["backbone"]["pos_embed"]
        assert pe.shape[1:3] == (4, 4)
        out = m.apply(v, imgs, text)
        assert np.all(np.isfinite(np.asarray(out.scores)))

    def test_text_prompt_conditions_output(self):
        m, imgs, text, v = self._setup()
        s1 = m.apply(v, imgs, text).scores
        s2 = m.apply(v, imgs, text * -1.0).scores
        assert not np.allclose(np.asarray(s1), np.asarray(s2))

    def test_mask_resolution_is_fpn_finest(self):
        m, imgs, text, v = self._setup()
        out = m.apply(v, imgs, text)
        gh = 112 // 14
        assert out.mask_logits.shape[2:] == (gh * 4, gh * 4)

    def test_session_sam3_text_without_clip_raises(self):
        """VERDICT-r3 #7: the sam3 path must not silently hash-embed text
        prompts — no CLIP tower and no smoke_prompts=True → raise."""
        from skix.tracking.session import VideoPredictor

        det = Sam3Detector.tiny(d_model=64)
        pred = VideoPredictor(det, batch_size=2)
        sid = pred.start_session(np.zeros((1, 64, 64, 3), np.uint8))
        with pytest.raises(ValueError, match="smoke_prompts"):
            pred.add_prompt(sid, "person")

    def test_session_predictor_with_sam3_and_clip(self):
        """The session API (start_session/add_prompt/propagate) drives the
        full-capability detector with CLIP prompt memory end-to-end."""
        rng = np.random.default_rng(908)
        import jax.numpy as jnp

        from skix.tracking.clip_text import VETextEncoder
        from skix.tracking.clip_tokenizer import ClipTokenizer
        from skix.tracking.session import VideoPredictor

        det = Sam3Detector.tiny(d_model=64)
        tok = ClipTokenizer(context_length=8)
        enc = VETextEncoder(d_model=64, width=32, heads=2, layers=1,
                            context_length=8)
        enc_vars = enc.init(jax.random.PRNGKey(0),
                            jnp.asarray(tok(["person"])))
        pred = VideoPredictor(det, clip=(tok, enc, enc_vars), batch_size=2)
        frames = (rng.uniform(0, 255, (3, 112, 112, 3))).astype(np.uint8)
        sid = pred.start_session(frames)
        pred.add_prompt(sid, "person")
        outs = list(pred.propagate_in_video(sid, "person"))
        assert len(outs) == 3
        o = outs[0]["outputs"]
        assert np.all(np.isfinite(o["bbox"]))
        assert o["bbox"].shape[-1] == 4

    def test_session_geometric_prompts(self):
        """add_prompt(points=..., boxes_xyxy=...) — the reference video
        request protocol (sam3_video_predictor.py:131-157): geometry
        conditions detection on the prompted frame; geometry-only
        sessions fall back to the 'visual' concept."""
        rng = np.random.default_rng(909)
        from skix.tracking.session import VideoPredictor

        det = Sam3Detector.tiny(d_model=64)
        pred = VideoPredictor(det, batch_size=2, smoke_prompts=True)
        frames = (rng.uniform(0, 255, (2, 112, 112, 3))).astype(np.uint8)

        sid = pred.start_session(frames)
        pred.add_prompt(sid, "person")
        base = [o["outputs"]["score"].copy()
                for o in pred.propagate_in_video(sid, "person")]

        sid2 = pred.start_session(frames)
        pred.add_prompt(sid2, "person", frame_idx=0,
                        points=[[30.0, 40.0]], point_labels=[1],
                        boxes_xyxy=[[10.0, 10.0, 60.0, 80.0]])
        assert pred.session_stats(sid2)["geometry_frames"] == [0]
        geo = [o["outputs"]["score"].copy()
               for o in pred.propagate_in_video(sid2, "person")]
        assert len(geo) == 2
        # geometry changes the prompted-frame detections
        assert not np.allclose(base[0], geo[0])

        # geometry-only session uses the 'visual' concept token
        sid3 = pred.start_session(frames)
        pred.add_prompt(sid3, points=[[30.0, 40.0]], point_labels=[1])
        outs = list(pred.propagate_in_video(sid3))
        assert len(outs) == 2
        assert "visual" in pred.session_stats(sid3)["prompts"]

        # repeated add_prompt on the same frame ACCUMULATES (regression:
        # a second call used to overwrite the first prompt's slots)
        sid4 = pred.start_session(frames)
        pred.add_prompt(sid4, points=[[30.0, 40.0]], point_labels=[1])
        pred.add_prompt(sid4, boxes_xyxy=[[10.0, 10.0, 60.0, 80.0]])
        g = pred.sessions[sid4].geometry[0]
        assert g["point_valid"].sum() == 1 and g["box_valid"].sum() == 1
        pred.add_prompt(sid4, points=[[50.0, 50.0]], point_labels=[0])
        assert pred.sessions[sid4].geometry[0]["point_valid"].sum() == 2

    def test_differentiable(self):
        m, imgs, text, v = self._setup()

        def loss(v):
            out = m.apply(v, imgs, text)
            return (jnp.sum(out.scores ** 2)
                    + jnp.sum(out.boxes_cxcywh ** 2)
                    + jnp.sum(out.mask_logits ** 2) * 1e-4)

        g = jax.grad(loss)(v)
        leaves = jax.tree.leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
        # the backbone receives gradient (end-to-end trainable)
        gb = jax.tree.leaves(g["params"]["backbone"])
        assert any(float(jnp.abs(x).max()) > 0 for x in gb)


class TestMHAFlashDispatch:
    def test_flash_branch_matches_einsum_branch(self):
        """The _MHA self-attention flash dispatch (fusion-encoder tail)
        must be numerically identical to the einsum branch on the same
        parameters — the branches differ only in execution strategy."""
        from skix.tracking.sam3_detector import _MHA

        rng = np.random.default_rng(99)
        x = jnp.asarray(rng.normal(0, 1, (2, 72, 32)), jnp.float32)
        v_src = jnp.asarray(rng.normal(0, 1, (2, 72, 32)), jnp.float32)
        m_ein = _MHA(num_heads=4, flash_min_seq=1 << 30)
        m_flash = _MHA(num_heads=4, flash_min_seq=1)
        variables = m_ein.init(jax.random.PRNGKey(0), x, x, v_src)
        ref = m_ein.apply(variables, x, x, v_src)
        got = m_flash.apply(variables, x, x, v_src)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_bias_or_mask_keeps_einsum_branch(self):
        """boxRPB-biased / padded attention may NOT take the flash path
        (the kernel has no bias operand) — results must stay exact."""
        from skix.tracking.sam3_detector import _MHA

        rng = np.random.default_rng(100)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 32)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 1, (1, 4, 16, 16)), jnp.float32)
        pad = jnp.zeros((1, 16), bool).at[0, -3:].set(True)
        m = _MHA(num_heads=4, flash_min_seq=1)
        variables = m.init(jax.random.PRNGKey(0), x, x, x)
        out_b = m.apply(variables, x, x, x, attn_bias=bias)
        out_p = m.apply(variables, x, x, x, key_padding_mask=pad)
        assert np.isfinite(np.asarray(out_b)).all()
        assert np.isfinite(np.asarray(out_p)).all()


class TestDAC:
    """DAC (divide-and-conquer) one-to-many training queries — reference
    decoder.py:114-145 + sam3_image.py:268 (train-time only, dac=True in
    model_builder.py:178)."""

    def _setup(self):
        rng = np.random.default_rng(911)
        m = Sam3Detector.tiny()
        imgs = jnp.asarray(rng.uniform(0, 1, (1, 112, 112, 3)), jnp.float32)
        text = jnp.asarray(rng.normal(0, 0.1, (1, 4, 64)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), imgs, text)
        return m, imgs, text, v

    def test_dac_adds_no_parameters(self):
        m, imgs, text, v = self._setup()
        v_dac = m.init(jax.random.PRNGKey(0), imgs, text, apply_dac=True)
        assert jax.tree.structure(v) == jax.tree.structure(v_dac)

    def test_o2o_outputs_invariant_to_dac(self):
        """Self-attention excludes the o2m half, so the o2o outputs are
        identical with and without DAC (the reference property that lets
        dac models run inference with apply_dac=False)."""
        m, imgs, text, v = self._setup()
        base = m.apply(v, imgs, text)
        dac = m.apply(v, imgs, text, apply_dac=True)
        for a, b in [(base.boxes_cxcywh, dac.boxes_cxcywh),
                     (base.scores, dac.scores),
                     (base.mask_logits, dac.mask_logits),
                     (base.presence, dac.presence)]:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_o2m_outputs_shapes_and_divergence(self):
        m, imgs, text, v = self._setup()
        out = m.apply(v, imgs, text, apply_dac=True)
        Q = m.num_queries
        assert out.o2m_boxes.shape == (1, Q, 4)
        assert out.o2m_scores.shape == (1, Q)
        assert out.o2m_mask_logits.shape == out.mask_logits.shape
        assert len(out.o2m_aux_boxes) == m.decoder_layers
        for leaf in (out.o2m_boxes, out.o2m_scores, out.o2m_mask_logits):
            assert np.all(np.isfinite(np.asarray(leaf)))
        # o2m skips self-attention → diverges from the o2o half
        assert not np.allclose(np.asarray(out.o2m_boxes),
                               np.asarray(out.boxes_cxcywh), atol=1e-4)

    def test_o2m_supervision_differentiable(self):
        m, imgs, text, v = self._setup()
        from skix.tracking.matcher import detection_loss

        gt_boxes = jnp.asarray([[[0.4, 0.4, 0.2, 0.2],
                                 [0.7, 0.6, 0.1, 0.3]]])
        gt_valid = jnp.asarray([[True, True]])

        def loss(v):
            out = m.apply(v, imgs, text, apply_dac=True)
            o2o = detection_loss(out.boxes_cxcywh[0], out.scores[0],
                                 gt_boxes[0], gt_valid[0]).total
            o2m = detection_loss(out.o2m_boxes[0], out.o2m_scores[0],
                                 gt_boxes[0], gt_valid[0],
                                 repeats=3).total
            return o2o + 1.0 * o2m

        g = jax.grad(loss)(v)
        assert all(bool(jnp.all(jnp.isfinite(x)))
                   for x in jax.tree.leaves(g))
        gb = jax.tree.leaves(g["params"]["backbone"])
        assert any(float(jnp.abs(x).max()) > 0 for x in gb)


class TestPostprocess:
    """COCO-style result prep — reference PostProcessImage
    (postprocessors.py:30)."""

    def _outs(self):
        rng = np.random.default_rng(77)
        B, Q = 2, 12
        boxes = jnp.asarray(rng.uniform(0.2, 0.8, (B, Q, 4)) * 0.5)
        logits = jnp.asarray(rng.normal(0, 2, (B, Q)))
        presence = jnp.asarray([3.0, -3.0])
        masks = jnp.asarray(rng.normal(0, 1, (B, Q, 8, 8)))
        return boxes, logits, presence, masks

    def test_topk_scaling_and_presence(self):
        from skix.tracking.postprocess import postprocess_detections
        boxes, logits, presence, masks = self._outs()
        out = postprocess_detections(boxes, logits, presence, masks,
                                     target_size=(100, 200), max_dets=5)
        assert out.boxes_xyxy.shape == (2, 5, 4)
        assert out.masks.shape == (2, 5, 100, 200)
        assert out.masks.dtype == jnp.bool_
        # scores sorted descending and presence-gated: image 1 has
        # presence logit −3 → all its scores crushed below image 0's top
        s = np.asarray(out.scores)
        assert np.all(np.diff(s, axis=1) <= 1e-6)
        assert s[1].max() < s[0].max()
        # xyxy in pixels: x within [0, 200], y within [0, 100]
        b = np.asarray(out.boxes_xyxy)
        assert b[..., 2].max() <= 200 + 1e-3 and b[..., 3].max() <= 100 + 1e-3
        assert np.all(b[..., 2] >= b[..., 0]) and np.all(b[..., 3] >= b[..., 1])

    def test_threshold_gives_valid_mask_not_ragged(self):
        from skix.tracking.postprocess import postprocess_detections
        boxes, logits, presence, _ = self._outs()
        out = postprocess_detections(boxes, logits, presence,
                                     detection_threshold=0.5,
                                     use_presence=False, max_dets=0)
        assert out.valid.shape == out.scores.shape
        np.testing.assert_array_equal(
            np.asarray(out.valid), np.asarray(out.scores) > 0.5)

    def test_jit_compatible(self):
        from skix.tracking.postprocess import postprocess_detections
        import functools
        boxes, logits, presence, masks = self._outs()
        f = jax.jit(functools.partial(postprocess_detections,
                                      target_size=(50, 50), max_dets=4))
        out = f(boxes, logits, presence, masks)
        assert out.scores.shape == (2, 4)

    def test_matches_reference_semantics_manually(self):
        """sigmoid(logit)·sigmoid(presence), cxcywh→xyxy·[W,H]."""
        from skix.tracking.postprocess import postprocess_detections
        boxes = jnp.asarray([[[0.5, 0.5, 0.2, 0.4]]])
        logits = jnp.asarray([[0.0]])
        presence = jnp.asarray([0.0])
        out = postprocess_detections(boxes, logits, presence,
                                     target_size=(100, 200), max_dets=1)
        np.testing.assert_allclose(np.asarray(out.scores), [[0.25]],
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.boxes_xyxy)[0, 0],
            [0.4 * 200, 0.3 * 100, 0.6 * 200, 0.7 * 100], atol=1e-5)


class TestFusionEncoderConverter:
    def test_layer_parity_vs_reference(self):
        """Converted reference TransformerEncoderLayer weights reproduce
        the reference forward_pre to 1e-4 (oracle import of encoder.py)."""
        import importlib.util
        import sys
        import types

        torch = pytest.importorskip("torch")
        ref_dir = "/root/reference/prepare_front_results/sam3/model"
        pkg = types.ModuleType("refsam3e")
        pkg.__path__ = [ref_dir]
        sys.modules.setdefault("refsam3e", pkg)
        spec = importlib.util.spec_from_file_location(
            "refsam3e.encoder", f"{ref_dir}/encoder.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refsam3e.encoder"] = mod
        spec.loader.exec_module(mod)

        torch.manual_seed(0)
        C, H_, FF = 32, 4, 64
        ref = mod.TransformerEncoderLayer(
            activation="relu", d_model=C, dim_feedforward=FF, dropout=0.0,
            pos_enc_at_attn=True, pos_enc_at_cross_attn_keys=False,
            pos_enc_at_cross_attn_queries=False, pre_norm=True,
            self_attention=torch.nn.MultiheadAttention(C, H_,
                                                       batch_first=True),
            cross_attention=torch.nn.MultiheadAttention(C, H_,
                                                        batch_first=True))
        ref.eval()
        r = np.random.default_rng(2)
        src = r.normal(size=(2, 10, C)).astype(np.float32)
        pos = r.normal(size=(2, 10, C)).astype(np.float32)
        prompt = r.normal(size=(2, 5, C)).astype(np.float32)
        with torch.no_grad():
            want = ref.forward_pre(
                torch.from_numpy(src), torch.from_numpy(prompt),
                pos=None, query_pos=torch.from_numpy(pos)).numpy()

        from skix.tracking.sam3_detector import (FusionEncoderLayer,
                                                 convert_fusion_encoder_layer)

        layer = FusionEncoderLayer(num_heads=H_, dim_feedforward=FF)
        variables = {"params": convert_fusion_encoder_layer(
            ref.state_dict())}
        got = layer.apply(variables, jnp.asarray(src), jnp.asarray(pos),
                          jnp.asarray(prompt))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestViTDetConverter:
    def test_converted_random_weights_match_reference(self):
        """Converted reference ViT-Det weights reproduce the reference
        forward to 1e-4, including window/global blocks, tiled pos-embed
        with a cls entry, ln_pre, and the interleaved axial rope."""
        import importlib.util
        import sys
        import types

        torch = pytest.importorskip("torch")

        # stub timm (not installed): DropPath/Mlp/trunc_normal_
        class _Mlp(torch.nn.Module):
            def __init__(self, in_features, hidden_features=None,
                         act_layer=torch.nn.GELU, drop=0.0, **kw):
                super().__init__()
                self.fc1 = torch.nn.Linear(in_features, hidden_features)
                self.act = act_layer()
                self.fc2 = torch.nn.Linear(hidden_features, in_features)

            def forward(self, x):
                return self.fc2(self.act(self.fc1(x)))

        timm = types.ModuleType("timm")
        timm.__spec__ = importlib.machinery.ModuleSpec("timm", loader=None)
        layers_mod = types.ModuleType("timm.layers")
        layers_mod.__spec__ = importlib.machinery.ModuleSpec(
            "timm.layers", loader=None)
        layers_mod.DropPath = torch.nn.Identity
        layers_mod.Mlp = _Mlp
        layers_mod.trunc_normal_ = torch.nn.init.trunc_normal_
        sys.modules.setdefault("timm", timm)
        sys.modules.setdefault("timm.layers", layers_mod)
        import importlib.machinery  # noqa: F401

        ref_dir = "/root/reference/prepare_front_results/sam3/model"
        pkg = types.ModuleType("refsam3v")
        pkg.__path__ = [ref_dir]
        sys.modules.setdefault("refsam3v", pkg)
        spec = importlib.util.spec_from_file_location(
            "refsam3v.vitdet", f"{ref_dir}/vitdet.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refsam3v.vitdet"] = mod
        spec.loader.exec_module(mod)

        torch.manual_seed(0)
        ref = mod.ViT(
            img_size=56, pretrain_img_size=28, patch_size=14, embed_dim=32,
            depth=2, num_heads=2, mlp_ratio=2.0, qkv_bias=True,
            use_abs_pos=True, tile_abs_pos=True, rel_pos_blocks=(),
            global_att_blocks=(1,), use_rope=True, use_interp_rope=False,
            window_size=2, pretrain_use_cls_token=True,
            retain_cls_token=False, ln_pre=True, ln_post=False,
            bias_patch_embed=False, use_act_checkpoint=False,
            drop_path_rate=0.0)
        with torch.no_grad():
            for prm in ref.parameters():
                prm.copy_(torch.randn_like(prm) * 0.05)
        ref.eval()

        r = np.random.default_rng(8)
        img = r.normal(size=(1, 3, 56, 56)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(img))[-1].numpy()  # (B, C, h, w)

        from skix.tracking.vitdet import convert_vitdet_state_dict

        model = ViTDetBackbone(
            img_size=56, pretrain_img_size=28, patch_size=14, embed_dim=32,
            depth=2, num_heads=2, mlp_ratio=2.0, window_size=2,
            global_att_blocks=(1,), rope_style="sam3", ln_pre=True)
        variables = convert_vitdet_state_dict(ref.state_dict())
        got = model.apply(variables,
                          jnp.asarray(img.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=1e-4)


class TestBoxRPB:
    def test_bias_peaks_inside_the_box(self):
        """A head-summed RPB for a box centered at (0.25, 0.25) must differ
        between feature cells inside vs far from the box."""
        from skix.tracking.sam3_detector import BoxRPB

        rpb = BoxRPB(num_heads=2, d_model=16)
        boxes = jnp.asarray([[[0.25, 0.25, 0.3, 0.3]]])
        v = rpb.init(jax.random.PRNGKey(0), boxes, 8, 8)
        bias = rpb.apply(v, boxes, 8, 8)  # (1, 2, 1, 64)
        assert bias.shape == (1, 2, 1, 64)
        grid = np.asarray(bias[0].sum(0)[0]).reshape(8, 8)
        # the map must vary with position (a constant bias would be useless)
        assert grid.std() > 1e-4
        # symmetric-by-construction inputs: moving the box moves the map
        boxes2 = jnp.asarray([[[0.75, 0.75, 0.3, 0.3]]])
        grid2 = np.asarray(rpb.apply(v, boxes2, 8, 8)[0].sum(0)[0]).reshape(
            8, 8)
        assert not np.allclose(grid, grid2)
        # translational structure: the (0.25,0.25) map at cell (2,2)
        # matches the (0.75,0.75) map at cell (6,6)
        np.testing.assert_allclose(grid[2, 2], grid2[6, 6], atol=1e-5)

    def test_disabled_rpb_changes_nothing_structurally(self):
        m = Sam3Detector.tiny(box_rpb="none")
        rng = np.random.default_rng(905)
        imgs = jnp.asarray(rng.uniform(0, 1, (1, 112, 112, 3)), jnp.float32)
        text = jnp.asarray(rng.normal(0, 0.1, (1, 4, 64)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), imgs, text)
        out = m.apply(v, imgs, text)
        assert np.all(np.isfinite(np.asarray(out.scores)))
        assert "box_rpb" not in v["params"]["decoder"]


class TestSam3Processor:
    def test_request_protocol(self):
        """set_image → text prompt → incremental box/point prompts →
        threshold update → reset (reference Sam3Processor protocol)."""
        from skix.tracking.image_processor import Sam3Processor

        rng = np.random.default_rng(910)
        det = Sam3Detector.tiny(d_model=64)
        proc = Sam3Processor(det, confidence_threshold=0.0)
        img = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
        state = proc.set_image(img)
        out = proc.set_text_prompt("person", state)
        assert out["all_boxes_xyxy"].shape == (det.num_queries, 4)
        assert np.isfinite(out["all_scores"]).all()
        # boxes scale back to ORIGINAL image pixels
        assert float(out["all_boxes_xyxy"][:, 2].max()) <= 300 + 1e-3

        before = out["all_scores"].copy()
        out2 = proc.add_geometric_prompt([0.5, 0.5, 0.4, 0.6], True, state)
        assert not np.allclose(out2["all_scores"], before)
        out3 = proc.add_point_prompt([0.3, 0.4], True, state)
        assert out3["all_scores"].shape == before.shape

        proc.set_confidence_threshold(1.1, state)
        assert len(state.results["boxes_xyxy"]) == 0  # nothing passes 1.1

        state = proc.reset_all_prompts(state)
        assert state.results is None and state.boxes is None

    def test_geometric_only_prompting_uses_visual_text(self):
        from skix.tracking.image_processor import Sam3Processor

        rng = np.random.default_rng(911)
        det = Sam3Detector.tiny(d_model=64)
        proc = Sam3Processor(det, confidence_threshold=0.0)
        state = proc.set_image(
            rng.integers(0, 255, (112, 112, 3)).astype(np.uint8))
        out = proc.add_geometric_prompt([0.5, 0.5, 0.3, 0.3], True, state)
        assert "all_scores" in out  # ran with the "visual" stand-in text
        assert state.text_memory is not None
