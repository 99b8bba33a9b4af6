"""COCO results export tests (reference coco_writer.py interop)."""

import json

import numpy as np

from skix.io.coco_export import (detections_to_coco, mask_to_rle,
                                 rle_to_mask, write_coco_results)


class TestRLE:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(5)
        m = rng.uniform(size=(13, 7)) > 0.6
        np.testing.assert_array_equal(rle_to_mask(mask_to_rle(m)), m)

    def test_known_encoding(self):
        # 2×2 mask with only (0,1) set: column-major flat = [m00, m10,
        # m01, m11] = [0, 0, 1, 0] → counts [2, 1, 1]
        m = np.zeros((2, 2), bool)
        m[0, 1] = True
        rle = mask_to_rle(m)
        assert rle == {"size": [2, 2], "counts": [2, 1, 1]}

    def test_all_foreground_starts_with_zero_run(self):
        m = np.ones((3, 3), bool)
        rle = mask_to_rle(m)
        assert rle["counts"][0] == 0 and sum(rle["counts"]) == 9


class TestCocoResults:
    def test_entries_and_filtering(self, tmp_path):
        boxes = np.array([[10.0, 20, 50, 60], [0, 0, 5, 5]])
        scores = np.array([0.9, 0.1])
        masks = np.zeros((2, 16, 16), bool)
        masks[0, 2:6, 3:9] = True
        res = detections_to_coco(boxes, scores, image_id=7,
                                 category_id=3, masks=masks,
                                 score_threshold=0.5)
        assert len(res) == 1
        e = res[0]
        assert e["image_id"] == 7 and e["category_id"] == 3
        assert e["bbox"] == [10.0, 20.0, 40.0, 40.0]  # xywh
        np.testing.assert_array_equal(
            rle_to_mask(e["segmentation"]), masks[0])

        p = tmp_path / "results.json"
        write_coco_results(p, res)
        loaded = json.loads(p.read_text())
        assert loaded[0]["score"] == 0.9

    def test_valid_mask_filter(self):
        boxes = np.array([[0.0, 0, 10, 10], [0, 0, 10, 10]])
        scores = np.array([0.9, 0.9])
        res = detections_to_coco(boxes, scores, image_id=0,
                                 valid=np.array([True, False]))
        assert len(res) == 1
