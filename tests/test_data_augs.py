"""Photometric + mosaic augmentation tests (reference
sam3/train/transforms/basic_for_api.py: ColorJitter:959,
RandomGrayscale:941, MotionBlur:1289, RandomMosaicVideoAPI:715)."""

import numpy as np
import pytest

from skix.data import (CocoDataset, CocoLoader, color_jitter_record,
                       grayscale_record, mosaic_record,
                       motion_blur_record)


def _rec(h=40, w=60, n=2, seed=0):
    rng = np.random.default_rng(seed)
    masks = np.zeros((n, h, w), bool)
    masks[0, 5:15, 10:25] = True
    masks[1, 20:32, 30:50] = True
    return {
        "image": rng.integers(0, 255, (h, w, 3)).astype(np.uint8),
        "boxes": np.array([[10, 5, 25, 15], [30, 20, 50, 32]], np.float32),
        "cls": np.zeros(n, np.int32),
        "keypoints": np.concatenate(
            [rng.uniform(5, 35, (n, 17, 2)), np.ones((n, 17, 1))],
            -1).astype(np.float32),
        "masks": masks,
        "image_id": 1,
    }


class TestPhotometric:
    def test_color_jitter_changes_pixels_not_geometry(self):
        rec = _rec()
        out = color_jitter_record(rec, np.random.default_rng(3))
        assert out["image"].shape == rec["image"].shape
        assert out["image"].dtype == np.uint8
        assert not np.array_equal(out["image"], rec["image"])
        np.testing.assert_array_equal(out["boxes"], rec["boxes"])
        np.testing.assert_array_equal(out["masks"], rec["masks"])

    def test_brightness_only_is_scalar_multiply(self):
        """With contrast/saturation/hue disabled the jitter reduces to
        torchvision adjust_brightness = clip(img * f)."""
        rec = _rec()
        rng = np.random.default_rng(11)
        out = color_jitter_record(rec, rng, brightness=0.5, contrast=0.0,
                                  saturation=0.0, hue=0.0)
        # replay the factor draw: same uniform stream
        rng2 = np.random.default_rng(11)
        fb = float(rng2.uniform(0.5, 1.5))
        want = (rec["image"].astype(np.float32) * fb).clip(0, 255)
        np.testing.assert_allclose(out["image"].astype(int),
                                   want.astype(int), atol=2)

    def test_grayscale(self):
        out = grayscale_record(_rec())
        img = out["image"]
        np.testing.assert_array_equal(img[..., 0], img[..., 1])
        np.testing.assert_array_equal(img[..., 1], img[..., 2])

    def test_motion_blur_spreads_energy(self):
        rec = _rec()
        rec["image"] = np.zeros_like(rec["image"])
        rec["image"][20, 30] = 255
        out = motion_blur_record(rec, np.random.default_rng(0),
                                 kernel_size=5)
        # the impulse spreads along exactly one 5-px line
        nz = np.argwhere(out["image"][..., 0] > 0)
        assert 2 <= len(nz) <= 5
        assert out["image"].max() < 255


class TestMosaic:
    def test_annotations_follow_target_cell(self):
        rec = _rec()
        h, w = rec["image"].shape[:2]
        out = mosaic_record(rec, np.random.default_rng(4), grid=2)
        assert out["image"].shape == rec["image"].shape
        # boxes scaled to half size and inside exactly one cell
        bw = out["boxes"][:, 2] - out["boxes"][:, 0]
        np.testing.assert_allclose(
            bw, (rec["boxes"][:, 2] - rec["boxes"][:, 0]) / 2, atol=1.0)
        cells = set()
        for box in out["boxes"]:
            cx = (box[0] + box[2]) / 2
            cy = (box[1] + box[3]) / 2
            cells.add((int(cy // (h / 2)), int(cx // (w / 2))))
        assert len(cells) == 1
        # masks live in the same cell, area ~1/4
        assert out["masks"].sum() == pytest.approx(rec["masks"].sum() / 4,
                                                   rel=0.2)
        # all four tiles contain a copy of the (resized) image: each
        # quadrant correlates with the downsized original
        import cv2
        small = cv2.resize(rec["image"], (w // 2, h // 2))
        for gy in range(2):
            for gx in range(2):
                tile = out["image"][gy * (h // 2):(gy + 1) * (h // 2),
                                    gx * (w // 2):(gx + 1) * (w // 2)]
                diff = np.abs(tile.astype(int) - small.astype(int)).mean()
                assert diff < 10, (gy, gx, diff)

    def test_keypoints_remap(self):
        rec = _rec()
        out = mosaic_record(rec, np.random.default_rng(4), grid=2)
        h, w = rec["image"].shape[:2]
        # kpt coordinates compress by 2 relative to their cell origin
        k_in = rec["keypoints"][..., :2]
        k_out = out["keypoints"][..., :2]
        rel = k_out - k_out.min((0, 1))
        assert rel.max() <= max(h, w) / 2 + 1


class TestLoaderWiring:
    def test_loader_photometric_mosaic_shapes(self, tmp_path):
        from tests.test_yolo_pose import _write_coco_fixture

        jp, _ = _write_coco_fixture(tmp_path, n_images=3, size=96)
        ds = CocoDataset(jp, image_root=tmp_path)
        loader = CocoLoader(ds, batch_size=3, image_size=96,
                            max_objects=4, augment=True, photometric=True,
                            p_mosaic=1.0, p_grayscale=1.0,
                            p_motion_blur=1.0, seed=0)
        batch = next(iter(loader))
        assert batch["images"].shape == (3, 96, 96, 3)
        assert batch["valid"].any()
        assert np.isfinite(batch["boxes"]).all()
