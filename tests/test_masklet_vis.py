"""Masklet overlay visualization (reference sam3/visualization_utils.py
semantics) + checkpoint pattern kernels (train/utils/checkpoint_utils.py)."""

import numpy as np
import pytest

from skix.vis.masklet import (
    masklet_outputs_from_session,
    pascal_color_map,
    prepare_masks_for_visualization,
    render_masklet_frame,
    save_masklet_image,
    save_masklet_video,
    save_side_by_side,
)


def _outputs(H=32, W=32):
    m0 = np.zeros((H, W), bool)
    m0[4:12, 4:12] = True
    m1 = np.zeros((H, W), bool)
    m1[20:28, 16:30] = True
    return {
        "out_boxes_xywh": np.array([[4 / W, 4 / H, 8 / W, 8 / H],
                                    [16 / W, 20 / H, 14 / W, 8 / H]]),
        "out_probs": np.array([0.9, 0.7]),
        "out_obj_ids": np.array([3, 5]),
        "out_binary_masks": np.stack([m0, m1]),
    }


class TestMaskletRender:
    def test_pascal_palette(self):
        cm = pascal_color_map()
        assert cm.shape == (256, 3) and cm.dtype == np.uint8
        np.testing.assert_array_equal(cm[0], [0, 0, 0])
        np.testing.assert_array_equal(cm[1], [128, 0, 0])  # VOC class 1

    def test_overlay_changes_masked_pixels_only(self):
        H = W = 32
        img = np.full((H, W, 3), 100, np.uint8)
        out = _outputs(H, W)
        # strip boxes/labels to isolate the mask blend
        out["out_boxes_xywh"] = np.zeros((2, 4))
        ov = render_masklet_frame(img, out, alpha=0.5)
        assert ov.shape == (H, W, 3) and ov.dtype == np.uint8
        masks = out["out_binary_masks"]
        union = masks.any(0)
        changed = (ov != img).any(-1)
        # masked pixels recolored; the band between the two masks (away
        # from the degenerate top-left boxes/labels) stays untouched
        assert changed[union].mean() > 0.9
        assert not changed[13:19, :].any()

    def test_distinct_objects_get_distinct_colors(self):
        img = np.zeros((32, 32, 3), np.uint8)
        out = _outputs()
        out["out_boxes_xywh"] = np.zeros((2, 4))
        ov = render_masklet_frame(img, out, alpha=1.0)
        c0 = ov[8, 8]
        c1 = ov[24, 20]
        assert not np.array_equal(c0, c1)

    def test_lowres_mask_resized_and_float_img(self):
        out = _outputs(8, 8)  # masks at 8×8, image at 32×32
        img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
        ov = render_masklet_frame(img, out, frame_idx=7)
        assert ov.shape == (32, 32, 3) and ov.dtype == np.uint8

    def test_session_adapter(self):
        H = W = 16
        out = {
            "mask": np.zeros((3, H, W), bool),
            "bbox": np.array([[2, 2, 10, 12], [0, 0, 4, 4], [1, 1, 2, 2]],
                             np.float32),
            "score": np.array([0.8, 0.6, 0.1]),
            "active": np.array([True, True, False]),
            "obj_id": np.array([1, 2, 3]),
        }
        adapted = masklet_outputs_from_session(out, (H, W))
        assert len(adapted["out_obj_ids"]) == 2  # inactive slot dropped
        np.testing.assert_allclose(adapted["out_boxes_xywh"][0],
                                   [2 / W, 2 / H, 8 / W, 10 / H])

    def test_prepare_masks(self):
        fo = {0: _outputs()}
        fo[0]["out_binary_masks"][1][:] = False  # obj 5 empty
        per_obj = prepare_masks_for_visualization(fo)
        assert list(per_obj[0].keys()) == [3]

    def test_save_video_and_image(self, tmp_path):
        frames = np.random.default_rng(1).integers(
            0, 255, (3, 32, 32, 3)).astype(np.uint8)
        outputs = {i: _outputs() for i in range(3)}
        vp = save_masklet_video(frames, outputs, tmp_path / "m.mp4", fps=3)
        assert vp.exists() and vp.stat().st_size > 0
        ip = save_masklet_image(frames[0], outputs[0], tmp_path / "m.png")
        assert ip.exists()
        sp = save_side_by_side(frames[0], outputs[0], outputs[1],
                               tmp_path / "sbs.png", title="gt vs pred")
        assert sp.exists()
        import cv2

        panel = cv2.imread(str(sp))
        assert panel.shape[1] == 64  # two 32-px panels


class TestCkptKernels:
    def _tree(self):
        return {"params": {
            "backbone": {"w": np.ones((2, 2)), "b": np.zeros(2)},
            "head": {"w": np.full((2,), 3.0)},
        }}

    def test_names_and_pattern_selection(self):
        from skix.utils.checkpointing import (
            tree_param_names, unix_pattern_to_parameter_names)

        names = tree_param_names(self._tree())
        assert "params/backbone/w" in names and "params/head/w" in names
        sel = unix_pattern_to_parameter_names(["params/backbone/*"], names)
        assert sel == {"params/backbone/w", "params/backbone/b"}
        with pytest.raises(AssertionError):
            unix_pattern_to_parameter_names(["nope*"], names)

    def test_filter_exclude_and_merge(self):
        from skix.utils.checkpointing import (
            CkptExcludeKernel, CkptIncludeKernel,
            exclude_params_matching_unix_pattern,
            filter_params_matching_unix_pattern, merge_params)

        tree = self._tree()
        kept = filter_params_matching_unix_pattern(["*head*"], tree)
        assert kept["params"]["head"]["w"] is not None
        assert kept["params"]["backbone"]["w"] is None
        dropped = exclude_params_matching_unix_pattern(["*head*"], tree)
        assert dropped["params"]["head"]["w"] is None
        # empty patterns: filter → nothing, exclude → unchanged (reference)
        assert filter_params_matching_unix_pattern(
            [], tree)["params"]["head"]["w"] is None
        assert exclude_params_matching_unix_pattern(
            [], tree)["params"]["head"]["w"] is not None

        base = {"params": {
            "backbone": {"w": np.zeros((2, 2)), "b": np.ones(2)},
            "head": {"w": np.zeros(2)},
        }}
        merged = merge_params(base, CkptIncludeKernel(["*head*"])(tree))
        np.testing.assert_array_equal(merged["params"]["head"]["w"],
                                      [3.0, 3.0])
        np.testing.assert_array_equal(merged["params"]["backbone"]["b"],
                                      [1.0, 1.0])
        merged2 = merge_params(base, CkptExcludeKernel(["*head*"])(tree))
        np.testing.assert_array_equal(merged2["params"]["head"]["w"],
                                      [0.0, 0.0])
        np.testing.assert_array_equal(merged2["params"]["backbone"]["w"],
                                      np.ones((2, 2)))

    def test_load_checkpoint_and_apply_kernels(self, tmp_path):
        from skix.utils.checkpointing import (
            CkptExcludeKernel, load_checkpoint_and_apply_kernels,
            merge_params, save_pytree)

        tree = self._tree()
        save_pytree(tmp_path / "ck", tree)
        loaded = load_checkpoint_and_apply_kernels(
            tmp_path / "ck", tree,
            checkpoint_kernels=[CkptExcludeKernel(["params/head/*"])])
        assert loaded["params"]["head"]["w"] is None
        fresh = {"params": {
            "backbone": {"w": np.zeros((2, 2)), "b": np.full(2, 9.0)},
            "head": {"w": np.full(2, 9.0)},
        }}
        merged = merge_params(fresh, loaded)
        np.testing.assert_array_equal(merged["params"]["backbone"]["w"],
                                      np.ones((2, 2)))
        np.testing.assert_array_equal(merged["params"]["head"]["w"],
                                      [9.0, 9.0])
