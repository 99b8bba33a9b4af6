"""Cascade Mask R-CNN ViT-Det human detector (skix/models/cascade_rcnn.py)
vs reference prepare_side_results/tools/build_detector.py +
cascade_mask_rcnn_vitdet_h_75ep.py semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skix.models.cascade_rcnn import (
    CascadeMaskRCNN, D2Attention, HumanDetector, add_decomposed_rel_pos,
    cascade_reference_state_dict_spec, convert_detectron2_cascade_vitdet,
    postprocess_human_boxes, rel_pos_index)


def tiny_model(**kw):
    defaults = dict(embed_dim=32, depth=2, num_heads=2, window_size=2,
                    global_indexes=(1,), num_classes=3, pre_nms_topk=64,
                    post_nms_topk=16, detections=4)
    defaults.update(kw)
    return CascadeMaskRCNN(**defaults)


class TestRelPos:
    def test_index_matches_d2_formula(self):
        # detectron2 get_rel_pos (modeling/backbone/utils.py): equal sizes
        # → coords[i, j] = i - j + (k - 1)
        for q, k in ((5, 5), (3, 7), (7, 3)):
            idx = rel_pos_index(q, k)
            rq = max(k / q, 1.0)
            rk = max(q / k, 1.0)
            want = (np.arange(q)[:, None] * rq - np.arange(k)[None, :] * rk
                    + (k - 1) * rk).astype(np.int64)
            np.testing.assert_array_equal(idx, want)
            assert idx.min() >= 0 and idx.max() <= 2 * max(q, k) - 2

    def test_decomposed_bias_vs_loop(self):
        rng = np.random.default_rng(0)
        h = w = 3
        C = 4
        q = rng.standard_normal((2, h * w, C)).astype(np.float32)
        attn = rng.standard_normal((2, h * w, h * w)).astype(np.float32)
        rel_h = rng.standard_normal((2 * h - 1, C)).astype(np.float32)
        rel_w = rng.standard_normal((2 * w - 1, C)).astype(np.float32)
        got = np.asarray(add_decomposed_rel_pos(
            jnp.asarray(attn), jnp.asarray(q), jnp.asarray(rel_h),
            jnp.asarray(rel_w), (h, w), (h, w)))
        want = attn.reshape(2, h, w, h, w).copy()
        for b in range(2):
            for qh in range(h):
                for qw in range(w):
                    for kh in range(h):
                        for kw in range(w):
                            want[b, qh, qw, kh, kw] += (
                                q[b, qh * w + qw] @ rel_h[qh - kh + h - 1]
                                + q[b, qh * w + qw] @ rel_w[qw - kw + w - 1])
        np.testing.assert_allclose(got, want.reshape(2, h * w, h * w),
                                   rtol=1e-5, atol=1e-5)

    def test_attention_vs_torch_transcription(self):
        """D2Attention == a torch transcription of detectron2's
        ``Attention.forward`` with ``use_rel_pos=True`` on the same
        weights (the converter's layout contract)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        dim, heads, h, w = 8, 2, 3, 3
        hd = dim // heads
        x = rng.standard_normal((2, h * w, dim)).astype(np.float32)
        qkv_w = rng.standard_normal((3 * dim, dim)).astype(np.float32)
        qkv_b = rng.standard_normal((3 * dim,)).astype(np.float32)
        pr_w = rng.standard_normal((dim, dim)).astype(np.float32)
        pr_b = rng.standard_normal((dim,)).astype(np.float32)
        rel_h = rng.standard_normal((2 * h - 1, hd)).astype(np.float32)
        rel_w = rng.standard_normal((2 * w - 1, hd)).astype(np.float32)

        tx = torch.tensor(x)
        qkv = tx @ torch.tensor(qkv_w).T + torch.tensor(qkv_b)
        qkv = qkv.reshape(2, h * w, 3, heads, hd).permute(
            2, 0, 3, 1, 4).reshape(3, 2 * heads, h * w, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        coords = (torch.arange(h)[:, None] - torch.arange(h)[None, :]
                  + h - 1)
        Rh = torch.tensor(rel_h)[coords]
        Rw = torch.tensor(rel_w)[coords]
        r_q = q.reshape(-1, h, w, hd)
        attn = (attn.view(-1, h, w, h, w)
                + torch.einsum("bhwc,hkc->bhwk", r_q, Rh)[:, :, :, :, None]
                + torch.einsum("bhwc,wkc->bhwk", r_q, Rw)[:, :, :, None, :]
                ).view(-1, h * w, h * w)
        out = (attn.softmax(-1) @ v).view(2, heads, h * w, hd)
        out = out.permute(0, 2, 1, 3).reshape(2, h * w, dim)
        want = (out @ torch.tensor(pr_w).T + torch.tensor(pr_b)).numpy()

        mod = D2Attention(dim, heads, input_size=(h, w))
        params = {"params": {
            "qkv": {"kernel": jnp.asarray(qkv_w.T),
                    "bias": jnp.asarray(qkv_b)},
            "proj": {"kernel": jnp.asarray(pr_w.T),
                     "bias": jnp.asarray(pr_b)},
            "rel_pos_h": jnp.asarray(rel_h),
            "rel_pos_w": jnp.asarray(rel_w)}}
        got = np.asarray(mod.apply(params, jnp.asarray(x), (h, w)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestModel:
    def test_forward_shapes(self):
        m = tiny_model()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        out = jax.jit(m.apply)(v, jnp.full((2, 64, 64, 3), 0.4))
        assert out.boxes_xyxy.shape == (2, 4, 4)
        assert out.scores.shape == (2, 4)
        assert out.classes.shape == (2, 4)
        assert out.masks.shape == (2, 4, 28, 28)
        b = np.asarray(out.boxes_xyxy)
        assert (b[..., 0] <= b[..., 2] + 1e-3).all()
        assert b.min() >= 0.0 and b.max() <= 64.0

    def test_converter_layout_exact(self):
        """Synthesized d2 cascade state dict (torch shapes per the
        published LazyConfig layout) converts with ZERO param-tree
        mismatches and the converted model runs."""
        m = tiny_model()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        spec = cascade_reference_state_dict_spec(
            embed_dim=32, depth=2, num_heads=2, window_size=2,
            global_grid=4, num_classes=3, global_indexes=(1,))
        rng = np.random.default_rng(0)
        sd = {k: (0.05 * rng.standard_normal(s)).astype(np.float32)
              for k, s in spec.items()}
        cv = convert_detectron2_cascade_vitdet(sd)

        flat_w = jax.tree_util.tree_flatten_with_path(v["params"])[0]
        flat_g = dict(jax.tree_util.tree_flatten_with_path(
            cv["params"])[0])
        assert len(flat_w) == len(flat_g)
        for path, arr in flat_w:
            assert path in flat_g, f"converter missing {path}"
            assert flat_g[path].shape == arr.shape, (
                f"{path}: {flat_g[path].shape} != {arr.shape}")
        out = m.apply(cv, jnp.full((1, 64, 64, 3), 0.4))
        assert np.isfinite(np.asarray(out.scores)).all()

    def test_cls_token_pos_embed_stripped(self):
        spec = cascade_reference_state_dict_spec(
            embed_dim=32, depth=2, num_heads=2, window_size=2,
            global_grid=4, num_classes=3, global_indexes=(1,),
            cls_token=True)
        assert spec["backbone.net.pos_embed"] == (1, 197, 32)
        rng = np.random.default_rng(0)
        sd = {k: rng.standard_normal(s).astype(np.float32)
              for k, s in spec.items()}
        cv = convert_detectron2_cascade_vitdet(sd)
        pe = cv["params"]["net"]["pos_embed"]
        assert pe.shape == (1, 14, 14, 32)
        # grid content = tokens AFTER the cls token
        np.testing.assert_allclose(
            np.asarray(pe).reshape(196, 32),
            sd["backbone.net.pos_embed"][0, 1:], rtol=1e-6)


class TestPostprocess:
    """run_detectron2_vitdet postprocessing parity
    (build_detector.py:60-97)."""

    def _np_reference(self, boxes, scores, classes, hw, det_cat_id,
                      bbox_thr, default_to_full_image):
        height, width = hw
        valid = (classes == det_cat_id) & (scores > bbox_thr)
        if valid.sum() == 0 and default_to_full_image:
            out = np.array([0, 0, width, height]).reshape(1, 4)
        else:
            out = boxes[valid]
        order = np.lexsort((out[:, 3], out[:, 2], out[:, 1], out[:, 0]))
        return out[order]

    def test_parity_with_reference_transcription(self):
        rng = np.random.default_rng(3)
        boxes = np.sort(rng.uniform(0, 100, (12, 4)), axis=-1)
        scores = rng.uniform(0, 1, 12)
        classes = rng.integers(0, 3, 12)
        for thr in (0.2, 0.5, 0.99):
            want = self._np_reference(boxes, scores, classes, (50, 80), 0,
                                      thr, True)
            got = postprocess_human_boxes(boxes, scores, classes,
                                          np.ones(12, bool), (50, 80),
                                          det_cat_id=0, bbox_thr=thr)
            np.testing.assert_allclose(got, want)

    def test_lexsort_primary_key_is_x1(self):
        boxes = np.array([[5.0, 0, 10, 10], [1.0, 9, 10, 10],
                          [1.0, 2, 10, 10]])
        got = postprocess_human_boxes(boxes, np.ones(3), np.zeros(3, int),
                                      np.ones(3, bool), (20, 20))
        np.testing.assert_allclose(got[:, :2],
                                   [[1.0, 2], [1.0, 9], [5.0, 0]])

    def test_full_image_fallback_and_empty(self):
        boxes = np.zeros((2, 4))
        low = np.array([0.1, 0.2])
        got = postprocess_human_boxes(boxes, low, np.zeros(2, int),
                                      np.ones(2, bool), (30, 40))
        np.testing.assert_allclose(got, [[0, 0, 40, 30]])
        got = postprocess_human_boxes(boxes, low, np.zeros(2, int),
                                      np.ones(2, bool), (30, 40),
                                      default_to_full_image=False)
        assert got.shape == (0, 4)

    def test_invalid_slots_dropped(self):
        boxes = np.array([[1.0, 1, 2, 2], [3.0, 3, 4, 4]])
        got = postprocess_human_boxes(boxes, np.ones(2), np.zeros(2, int),
                                      np.array([True, False]), (10, 10))
        np.testing.assert_allclose(got, boxes[:1])


class TestHumanDetector:
    def test_resize_shortest_edge_rule(self):
        det = HumanDetector.__new__(HumanDetector)
        det.image_size = 1024
        # 1080p: short edge would give 1.82× width overflow → cap by max
        assert det._scale(1080, 1920) == pytest.approx(1024 / 1920)
        assert det._scale(512, 512) == pytest.approx(2.0)
        assert det._scale(1024, 1024) == pytest.approx(1.0)

    def test_run_and_clip(self):
        det = HumanDetector(tiny_model(), image_size=64)
        img = np.full((40, 60, 3), 128, np.uint8)
        boxes = det.run_human_detection(img, bbox_thr=2.0)  # nothing passes
        np.testing.assert_allclose(boxes, [[0, 0, 60, 40]])
        frames = np.full((3, 40, 60, 3), 128, np.uint8)
        b, valid = det.detect_clip(frames, batch_size=2, bbox_thr=2.0,
                                   max_people=2)
        assert b.shape == (3, 2, 4) and valid.shape == (3, 2)
        assert valid[:, 0].all()          # full-image fallback per frame
        np.testing.assert_allclose(b[:, 0], [[0, 0, 60, 40]] * 3)


class TestPipeline:
    def test_detector_fills_missing_bboxes(self, tmp_path):
        """A record WITHOUT person bboxes + detector_name: vitdet runs the
        detector-in-the-loop path (reference
        sam_3d_body_estimator.py:110-121 + infer.py athlete pick)."""
        from skix.io import PTInfo, save_pt_info
        from skix.pipelines.prepare_side_results import main

        rng = np.random.default_rng(7)
        T, H, W = 3, 64, 64
        pdir = tmp_path / "pt" / "p01"
        pdir.mkdir(parents=True)
        info = PTInfo(
            video_name="osmo_1", frame_count=T, img_shape=(H, W), fps=30.0,
            duration=T / 30.0,
            frames=rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8))
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
detector_name: vitdet
detector_embed_dim: 32
detector_depth: 2
detector_num_heads: 2
detector_window: 2
detector_global_indexes: [1]
detector_image_size: 64
detector_batch: 2
max_people: 2
""")
        main([f"--config-dir={cdir}"])
        frames = sorted((out_root / "p01" / "osmo_1").glob("frame_*.npz"))
        assert len(frames) == T
        with np.load(frames[0]) as z:
            assert z["pred_keypoints_3d"].shape == (70, 3)
            assert np.isfinite(z["bbox"]).all()

    def test_full_image_fallback_without_detector(self, tmp_path):
        """No bboxes, no detector → one full-image crop per frame
        (reference else-branch, sam_3d_body_estimator.py:123-125)."""
        from skix.io import PTInfo, save_pt_info
        from skix.pipelines.prepare_side_results import main

        rng = np.random.default_rng(8)
        T, H, W = 2, 48, 64
        pdir = tmp_path / "pt" / "p01"
        pdir.mkdir(parents=True)
        info = PTInfo(
            video_name="osmo_1", frame_count=T, img_shape=(H, W), fps=30.0,
            duration=T / 30.0,
            frames=rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8))
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
            np.testing.assert_allclose(z["bbox"], [0, 0, W, H])
