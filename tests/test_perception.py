"""Athlete-selection, hole-filling, video IO, prepare_dataset CLI tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from skix.perception import fill_invalid_frames, select_person_sequence

rng = np.random.default_rng(55)


class TestSelection:
    def test_single_detection_passthrough(self):
        T, N = 5, 3
        boxes = np.zeros((T, N, 4), np.float32)
        kpts = np.zeros((T, N, 17, 3), np.float32)
        valid = np.zeros((T, N), bool)
        boxes[:, 1] = [100, 100, 50, 80]
        kpts[:, 1, :, :2] = 7.0
        kpts[:, 1, :, 2] = 0.9
        valid[:, 1] = True
        sel = select_person_sequence(jnp.asarray(boxes), jnp.asarray(kpts),
                                     det_valid=jnp.asarray(valid))
        assert bool(jnp.all(sel.valid))
        np.testing.assert_allclose(np.asarray(sel.keypoints), 7.0)
        np.testing.assert_allclose(np.asarray(sel.scores), 0.9)

    def test_prev_center_priority(self):
        """Frame 0 picks the biggest box; frame 1 follows the previous
        center, not the bigger far-away person."""
        T, N = 2, 2
        boxes = np.zeros((T, N, 4), np.float32)
        kpts = np.zeros((T, N, 17, 2), np.float32)
        valid = np.ones((T, N), bool)
        # frame 0: person A at (100,100) big, person B at (500,500) small
        boxes[0, 0] = [100, 100, 60, 120]
        boxes[0, 1] = [500, 500, 30, 60]
        # frame 1: A moved slightly; B became huge
        boxes[1, 0] = [110, 105, 60, 120]
        boxes[1, 1] = [500, 500, 200, 400]
        kpts[:, 0] = 1.0
        kpts[:, 1] = 2.0
        sel = select_person_sequence(jnp.asarray(boxes), jnp.asarray(kpts),
                                     det_valid=jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(sel.keypoints[0]), 1.0)  # area
        np.testing.assert_allclose(np.asarray(sel.keypoints[1]), 1.0)  # center

    def test_track_id_priority_beats_center(self):
        T, N = 2, 2
        boxes = np.zeros((T, N, 4), np.float32)
        kpts = np.zeros((T, N, 17, 2), np.float32)
        valid = np.ones((T, N), bool)
        tids = np.full((T, N), -1, np.int32)
        boxes[0, 0] = [100, 100, 50, 100]
        boxes[0, 1] = [300, 300, 20, 40]
        tids[0] = [7, 8]
        # frame 1: id 7 jumped far away; id 8 now sits at old center of 7
        boxes[1, 0] = [400, 400, 50, 100]
        boxes[1, 1] = [100, 100, 20, 40]
        tids[1] = [7, 8]
        kpts[:, 0] = 1.0
        kpts[:, 1] = 2.0
        sel = select_person_sequence(jnp.asarray(boxes), jnp.asarray(kpts),
                                     det_valid=jnp.asarray(valid),
                                     track_ids=jnp.asarray(tids))
        np.testing.assert_allclose(np.asarray(sel.keypoints[1]), 1.0)  # id 7

    def test_empty_frames_marked(self):
        T, N = 4, 2
        boxes = np.zeros((T, N, 4), np.float32)
        kpts = np.zeros((T, N, 17, 2), np.float32)
        valid = np.zeros((T, N), bool)
        valid[0, 0] = valid[3, 0] = True
        sel = select_person_sequence(jnp.asarray(boxes), jnp.asarray(kpts),
                                     det_valid=jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(sel.none_index),
                                      [False, True, True, False])


class TestFillInvalid:
    def test_copy_next(self):
        x = np.arange(5, dtype=np.float32)[:, None]
        valid = np.array([True, False, False, True, True])
        got = np.asarray(fill_invalid_frames(jnp.asarray(x), jnp.asarray(valid)))
        # holes at 1,2 take the NEXT valid frame (index 3)
        np.testing.assert_allclose(got.ravel(), [0, 3, 3, 3, 4])

    def test_tail_uses_previous(self):
        x = np.arange(4, dtype=np.float32)[:, None]
        valid = np.array([True, True, False, False])
        got = np.asarray(fill_invalid_frames(jnp.asarray(x), jnp.asarray(valid)))
        np.testing.assert_allclose(got.ravel(), [0, 1, 1, 1])

    def test_all_invalid_stays_finite(self):
        x = np.ones((3, 2), np.float32)
        got = np.asarray(fill_invalid_frames(jnp.asarray(x),
                                             jnp.zeros(3, bool)))
        assert np.all(np.isfinite(got))


class TestVideoIO:
    def _make_clip(self, tmp_path, T=12, H=32, W=48, fps=10.0):
        from skix.io.video import write_video

        frames = (np.arange(T)[:, None, None, None]
                  * np.ones((T, H, W, 3)) * 20).astype(np.uint8)
        p = tmp_path / "clip.mp4"
        write_video(p, frames, fps=fps)
        return p, frames

    def test_roundtrip(self, tmp_path):
        from skix.io.video import probe_video, read_video

        p, frames = self._make_clip(tmp_path)
        meta = probe_video(p)
        assert meta.frame_count == 12
        assert (meta.height, meta.width) == (32, 48)
        back = read_video(p)
        assert back.shape == frames.shape
        # lossy codec: frame means must still track the ramp
        means = back.mean(axis=(1, 2, 3))
        assert np.all(np.diff(means) > 5)

    def test_chunked_matches_whole(self, tmp_path):
        from skix.io.video import read_video, read_video_chunks

        p, _ = self._make_clip(tmp_path)
        whole = read_video(p)
        chunks = np.concatenate(list(read_video_chunks(p, chunk_size=5)), 0)
        np.testing.assert_array_equal(whole, chunks)

    def test_image_folder_as_video(self, tmp_path):
        """A directory of image frames reads like a video in sorted-name
        order (reference io_utils image-folder loader) — chunking and
        max_frames included."""
        import cv2

        from skix.io.video import read_video, read_video_chunks

        d = tmp_path / "frames"
        d.mkdir()
        T, H, W = 7, 16, 20
        frames = (np.arange(T)[:, None, None, None]
                  * np.ones((T, H, W, 3)) * 30).astype(np.uint8)
        for t in range(T):
            cv2.imwrite(str(d / f"{t:05d}.png"),
                        cv2.cvtColor(frames[t], cv2.COLOR_RGB2BGR))
        from skix.io.video import probe_video

        meta = probe_video(d)
        assert (meta.frame_count, meta.height, meta.width) == (T, H, W)
        back = read_video(d)
        np.testing.assert_array_equal(back, frames)    # png: lossless
        chunks = np.concatenate(list(read_video_chunks(d, chunk_size=3)), 0)
        np.testing.assert_array_equal(chunks, frames)
        assert read_video(d, max_frames=4).shape[0] == 4
        with pytest.raises(FileNotFoundError):
            read_video(tmp_path / "empty_dir_nope")

    def test_max_frames(self, tmp_path):
        from skix.io.video import read_video

        p, _ = self._make_clip(tmp_path)
        assert read_video(p, max_frames=4).shape[0] == 4

    def test_merge_frames(self, tmp_path):
        import cv2

        from skix.io.video import merge_frames_to_video, probe_video

        fdir = tmp_path / "frames"
        fdir.mkdir()
        for i in range(6):
            cv2.imwrite(str(fdir / f"{i:03d}.png"),
                        np.full((16, 16, 3), i * 30, np.uint8))
        n = merge_frames_to_video(fdir, tmp_path / "m.mp4", fps=5)
        assert n == 6
        assert probe_video(tmp_path / "m.mp4").frame_count == 6


class TestPrepareDatasetCLI:
    def test_end_to_end(self, tmp_path):
        from skix.io.video import write_video
        from skix.pipelines.prepare_dataset import main

        # synth video + sidecar detections
        T, H, W, N = 10, 32, 48, 3
        root = tmp_path / "videos" / "p01"
        root.mkdir(parents=True)
        frames = rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8)
        write_video(root / "osmo_1.mp4", frames, fps=10)
        boxes = np.zeros((T, N, 4), np.float32)
        kpts = np.zeros((T, N, 17, 3), np.float32)
        valid = np.zeros((T, N), bool)
        boxes[:, 0] = [24, 16, 10, 20]
        kpts[:, 0, :, 0] = 24
        kpts[:, 0, :, 1] = 16
        kpts[:, 0, :, 2] = 0.8
        valid[:, 0] = True
        valid[4] = False  # one missing frame
        np.savez(root / "osmo_1.detections.npz", boxes=boxes, keypoints=kpts,
                 det_valid=valid)

        out_root = tmp_path / "pt"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "prepare_dataset.yaml").write_text(f"""
paths:
  video_root: {tmp_path / 'videos'}
  out_root: {out_root}
backend: precomputed
chunk_size: 4
store_frames: true
""")
        main([f"--config-dir={cdir}"])
        from skix.io import load_pt_info

        rec = load_pt_info(out_root / "p01" / "osmo_1.npz")
        assert rec.frame_count == T
        assert rec.yolo_keypoints.shape == (T, 17, 3)
        assert rec.frames.shape == (T, H, W, 3)
        np.testing.assert_array_equal(rec.none_index, [4])
        # hole filled with neighbor values
        np.testing.assert_allclose(rec.yolo_keypoints[4, :, 0], 24.0)

    def test_skip_if_exists(self, tmp_path, caplog):
        # second run with overwrite=false must skip
        self.test_end_to_end(tmp_path)
        from skix.pipelines.prepare_dataset import main

        out = tmp_path / "pt" / "p01" / "osmo_1.npz"
        mtime = out.stat().st_mtime_ns
        main([f"--config-dir={tmp_path / 'configs'}"])
        assert out.stat().st_mtime_ns == mtime
