"""YTVIS-format video data layer (reference sam3_video_dataset.py):
clip loading with persistent masklet slots, the reference's frame
sampler, single-image tiling, fixed-slot collation, and the wire into
the association losses."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.data.video import (VideoDataset, collate_clips,
                             sample_clip_frames, tile_image_clip)


def _write_ytvis_fixture(root, T=6, hw=(32, 48)):
    cv2 = pytest.importorskip("cv2")
    h, w = hw
    frames_dir = root / "frames"
    frames_dir.mkdir()
    rng = np.random.default_rng(0)
    file_names = []
    for t in range(T):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"frames/{t:03d}.png"
        cv2.imwrite(str(root / name), img)
        file_names.append(name)

    def xywh(t, dx):
        return [4 + 2 * t + dx, 6, 10, 12]

    anns = [
        {  # masklet 7: present every frame, polygon masks
            "id": 7, "video_id": 1, "category_id": 2,
            "bboxes": [xywh(t, 0) for t in range(T)],
            "segmentations": [
                [[4 + 2 * t, 6, 14 + 2 * t, 6, 14 + 2 * t, 18,
                  4 + 2 * t, 18]] for t in range(T)],
        },
        {  # masklet 3: misses frames 2-3 (None boxes)
            "id": 3, "video_id": 1, "category_id": 1,
            "bboxes": [xywh(t, 20) if t not in (2, 3) else None
                       for t in range(T)],
            "segmentations": [None] * T,
        },
    ]
    d = {
        "videos": [{"id": 1, "file_names": file_names,
                    "height": h, "width": w}],
        "annotations": anns,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }
    p = root / "ytvis.json"
    p.write_text(json.dumps(d))
    return p


class TestVideoDataset:
    def test_clip_fixed_slots(self, tmp_path):
        ds = VideoDataset(_write_ytvis_fixture(tmp_path))
        assert len(ds) == 1 and ds.num_frames(0) == 6
        c = ds.clip(0, [0, 2, 5])
        assert c["images"].shape == (3, 32, 48, 3)
        assert c["boxes"].shape == (3, 2, 4)
        # slots sorted by annotation id: slot0 = id 3, slot1 = id 7
        assert c["track_ids"].tolist() == [3, 7]
        assert c["cls"].tolist() == [0, 1]
        # id-3 masklet absent on frame 2
        assert c["valid"].tolist() == [[True, True], [False, True],
                                       [True, True]]
        # boxes follow the motion (xywh -> xyxy)
        np.testing.assert_allclose(c["boxes"][0, 1], [4, 6, 14, 18])
        np.testing.assert_allclose(c["boxes"][2, 1], [14, 6, 24, 18])
        # polygon mask decoded, aligned with its box
        assert c["masks"][0, 1, 7, 5] and not c["masks"][0, 1, 2, 2]
        assert not c["masks"][0, 0].any()  # None segmentation

    def test_max_masklets_skips_video(self, tmp_path):
        p = _write_ytvis_fixture(tmp_path)
        assert len(VideoDataset(p, max_masklets=1)) == 0
        assert len(VideoDataset(p, max_masklets=2)) == 1

    def test_sample_clip_runs(self, tmp_path):
        ds = VideoDataset(_write_ytvis_fixture(tmp_path))
        rng = np.random.default_rng(3)
        c = ds.sample_clip(0, rng, num_frames=3, stride_min=1,
                           stride_max=2)
        assert c["images"].shape[0] == 3


class TestFrameSampler:
    def test_window_and_stride(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            ids = sample_clip_frames(20, rng, num_frames=4, stride_min=2,
                                     stride_max=3, random_reverse=False)
            assert len(ids) == 4
            d = np.diff(ids)
            assert (d == d[0]).all() and d[0] in (2, 3)
            assert ids.min() >= 0 and ids.max() <= 19

    def test_stride_clamped_on_short_video(self):
        # reference :173-181: T=5, n=4, stride 5 -> clamp to (5-1)//3 = 1
        rng = np.random.default_rng(1)
        ids = sample_clip_frames(5, rng, num_frames=4, stride_min=5,
                                 stride_max=5, random_reverse=False)
        assert np.diff(ids).tolist() == [1, 1, 1]

    def test_reversal_happens(self):
        rng = np.random.default_rng(2)
        seen = set()
        for _ in range(40):
            ids = sample_clip_frames(10, rng, num_frames=3, stride_min=1,
                                     stride_max=1)
            seen.add(bool(ids[0] > ids[-1]))
        assert seen == {True, False}

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            sample_clip_frames(2, np.random.default_rng(0), num_frames=3)


class TestTileAndCollate:
    def _rec(self):
        rng = np.random.default_rng(5)
        return {
            "image": rng.integers(0, 255, (16, 24, 3), np.uint8),
            "boxes": np.asarray([[1, 2, 5, 8], [3, 3, 9, 9]], np.float32),
            "cls": np.asarray([0, 1], np.int32),
            "masks": rng.random((2, 16, 24)) < 0.3,
            "image_id": 42,
        }

    def test_tile_image_clip(self):
        c = tile_image_clip(self._rec(), 4)
        assert c["images"].shape == (4, 16, 24, 3)
        assert (c["images"][0] == c["images"][3]).all()
        assert c["valid"].all() and c["track_ids"].tolist() == [1, 2]

    def test_collate_pads_slots(self):
        c1 = tile_image_clip(self._rec(), 3)
        rec2 = self._rec()
        rec2["boxes"] = rec2["boxes"][:1]
        rec2["cls"] = rec2["cls"][:1]
        rec2["masks"] = rec2["masks"][:1]
        c2 = tile_image_clip(rec2, 3)
        b = collate_clips([c1, c2], max_objects=4)
        assert b["images"].shape == (2, 3, 16, 24, 3)
        assert b["boxes"].shape == (2, 3, 4, 4)
        assert b["masks"].shape == (2, 3, 4, 16, 24)
        assert b["valid"][0].sum() == 6 and b["valid"][1].sum() == 3
        assert b["track_ids"][1].tolist() == [1, -1, -1, -1]

    def test_collate_rejects_mismatched_clips(self):
        c1 = tile_image_clip(self._rec(), 3)
        c2 = tile_image_clip(self._rec(), 2)
        with pytest.raises(ValueError):
            collate_clips([c1, c2])


class TestFeedsAssociationLoss:
    def test_det2trk_labels_from_slots(self, tmp_path):
        """The data layer's persistent slot ids ARE the identity labels
        the video association loss consumes: drive det2trk_assoc_loss
        from a loaded clip and check the gradient is finite and the loss
        decreases toward the slot-truth logits."""
        from skix.tracking.matcher import det2trk_assoc_loss

        ds = VideoDataset(_write_ytvis_fixture(tmp_path))
        clip = ds.clip(0, [0, 1])
        b = collate_clips([clip], max_objects=4)
        # frame 1 detections matched to the slot ids; tracks from frame 0
        det_ids = jnp.asarray(np.where(b["valid"][:, 1],
                                       b["track_ids"], -1))   # (1, 4)
        trk_ids = jnp.asarray(np.where(b["valid"][:, 0],
                                       b["track_ids"], -1))
        Q = det_ids.shape[1]
        rng = np.random.default_rng(0)
        logits0 = jnp.asarray(rng.normal(0, 0.1, (1, Q, Q + 2)),
                              jnp.float32)

        def loss(lg):
            return det2trk_assoc_loss(lg, det_ids, trk_ids,
                                      num_boxes=jnp.asarray(2.0))

        l0 = float(loss(logits0))
        g = jax.grad(loss)(logits0)
        assert np.isfinite(np.asarray(g)).all() and l0 > 0
        # perfect logits (det slot -> same trk slot) drive the loss down
        perfect = jnp.full((1, Q, Q + 2), -10.0)
        for q in range(Q):
            perfect = perfect.at[0, q, q].set(10.0)
        assert float(loss(perfect)) < 0.05 * l0
