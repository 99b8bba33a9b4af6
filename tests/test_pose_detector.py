"""Pose detector + skix perception-backend tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.pose_detector import PoseDetector, detect_clip

rng = np.random.default_rng(47)


class TestPoseDetector:
    def _tiny(self):
        return PoseDetector(width=16, depth=1, top_k=4,
                            score_threshold=-1.0)

    def test_forward_shapes(self):
        model = self._tiny()
        imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), imgs)
        det = model.apply(v, imgs)
        assert det.boxes_cxcywh.shape == (2, 4, 4)
        assert det.keypoints.shape == (2, 4, 17, 3)
        assert det.scores.shape == (2, 4)
        assert det.mask_logits.shape == (2, 8, 8)
        assert np.all(np.isfinite(np.asarray(det.boxes_cxcywh)))
        # width/height nonneg (softplus ltrb)
        assert float(jnp.min(det.boxes_cxcywh[..., 2:])) >= 0

    def test_score_threshold_invalidates(self):
        model = PoseDetector(width=16, depth=1, top_k=4,
                             score_threshold=2.0)  # impossible
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), imgs)
        det = model.apply(v, imgs)
        assert not bool(jnp.any(det.valid))

    def test_detect_clip(self):
        model = self._tiny()
        imgs = jnp.zeros((1, 64, 64, 3))
        v = model.init(jax.random.PRNGKey(0), imgs)
        frames = rng.integers(0, 255, (5, 64, 64, 3)).astype(np.uint8)
        boxes, kpts, valid, scores = detect_clip(model, v, frames,
                                                 batch_size=2)
        assert boxes.shape == (5, 4, 4)
        assert kpts.shape == (5, 4, 17, 3)
        assert valid.shape == (5, 4)
        assert scores.shape == (5, 4)

    def test_feeds_selection(self):
        from skix.perception import select_person_sequence

        model = self._tiny()
        imgs = jnp.zeros((1, 64, 64, 3))
        v = model.init(jax.random.PRNGKey(0), imgs)
        frames = rng.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
        boxes, kpts, valid, _ = detect_clip(model, v, frames)
        sel = select_person_sequence(jnp.asarray(boxes), jnp.asarray(kpts),
                                     det_valid=jnp.asarray(valid))
        assert sel.keypoints.shape == (3, 17, 2)


class TestSkixBackendCLI:
    def test_prepare_dataset_with_skix_backend(self, tmp_path):
        from skix.io import load_pt_info
        from skix.io.video import write_video
        from skix.pipelines.prepare_dataset import main

        T, H, W = 4, 64, 64
        root = tmp_path / "videos" / "p01"
        root.mkdir(parents=True)
        write_video(root / "osmo_1.mp4",
                    rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8),
                    fps=4)
        out_root = tmp_path / "pt"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "prepare_dataset.yaml").write_text(f"""
paths:
  video_root: {tmp_path / 'videos'}
  out_root: {out_root}
backend: skix
tasks: [pose, optical_flow]
detector_width: 16
detector_depth: 1
top_k: 4
score_threshold: -1.0
flow_hidden: 32
flow_context: 32
flow_iters: 2
chunk_size: 4
store_frames: false
""")
        main([f"--config-dir={cdir}"])
        rec = load_pt_info(out_root / "p01" / "osmo_1.npz")
        assert rec.yolo_keypoints.shape == (T, 17, 3)
        assert rec.optical_flow.shape == (T - 1, 2, H, W)
        assert np.all(np.isfinite(rec.optical_flow))


class TestSkixBackendDepth:
    def test_depth_task(self, tmp_path):
        from skix.io import load_pt_info
        from skix.io.video import write_video
        from skix.pipelines.prepare_dataset import main

        T, H, W = 3, 64, 64
        root = tmp_path / "videos" / "p01"
        root.mkdir(parents=True)
        write_video(root / "a.mp4",
                    rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8),
                    fps=3)
        out_root = tmp_path / "pt"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "prepare_dataset.yaml").write_text(f"""
paths:
  video_root: {tmp_path / 'videos'}
  out_root: {out_root}
backend: skix
tasks: [pose, depth]
detector_width: 16
detector_depth: 1
top_k: 4
score_threshold: -1.0
depth_dim: 32
depth_layers: 4
depth_heads: 2
depth_features: 16
depth_batch: 2
chunk_size: 4
""")
        main([f"--config-dir={cdir}"])
        rec = load_pt_info(out_root / "p01" / "a.npz")
        assert rec.depth.shape == (T, 1, H, W)
        assert np.all(np.isfinite(rec.depth))


@pytest.mark.slow
class TestTwoSourceBackend:
    def test_yolo_plus_rcnn_fill_independent_slots(self, tmp_path):
        """pose_model=yolo + d2_model=rcnn → yolo_* and d2_* carry two
        INDEPENDENT 2D sources (reference: YOLO + detectron2;
        VERDICT r2 #4)."""
        from skix.io import load_pt_info
        from skix.io.video import write_video
        from skix.pipelines.prepare_dataset import main

        T, H, W = 2, 64, 64
        root = tmp_path / "videos" / "p01"
        root.mkdir(parents=True)
        write_video(root / "osmo_1.mp4",
                    rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8),
                    fps=2)
        out_root = tmp_path / "pt"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "prepare_dataset.yaml").write_text(f"""
paths:
  video_root: {tmp_path / 'videos'}
  out_root: {out_root}
backend: skix
tasks: [pose]
pose_model: yolo
yolo_scale: n
d2_model: rcnn
d2_pre_nms_topk: 32
d2_post_nms_topk: 8
d2_score_threshold: -1.0
d2_batch: 2
top_k: 4
score_threshold: -1.0
det_batch: 2
chunk_size: 4
""")
        main([f"--config-dir={cdir}"])
        rec = load_pt_info(out_root / "p01" / "osmo_1.npz")
        assert rec.yolo_keypoints.shape == (T, 17, 3)
        assert rec.d2_keypoints.shape == (T, 17, 3)
        assert rec.yolo_bbox.shape == (T, 4)
        assert rec.d2_bbox.shape == (T, 4)
        assert np.isfinite(rec.d2_keypoints).all()
        # two different architectures (random-init smoke) → different 2D
        assert not np.allclose(rec.yolo_keypoints, rec.d2_keypoints)

    def test_mask_task_fills_contract_slot(self, tmp_path):
        """tasks: [pose, mask] → the YOLO/mask (T, 1, H, W) contract slot
        carries the seg model's selected-athlete mask (reference
        YOLOv11Mask, prepare_dataset/model/yolov11_mask.py:75)."""
        from skix.io import load_pt_info
        from skix.io.video import write_video
        from skix.pipelines.prepare_dataset import main

        T, H, W = 2, 64, 64
        root = tmp_path / "videos" / "p01"
        root.mkdir(parents=True)
        write_video(root / "osmo_1.mp4",
                    rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8),
                    fps=2)
        out_root = tmp_path / "pt"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "prepare_dataset.yaml").write_text(f"""
paths:
  video_root: {tmp_path / 'videos'}
  out_root: {out_root}
backend: skix
tasks: [pose, mask]
pose_model: yolo
yolo_scale: n
seg_scale: n
top_k: 4
score_threshold: -1.0
seg_score_threshold: -1.0
det_batch: 2
chunk_size: 4
""")
        main([f"--config-dir={cdir}"])
        rec = load_pt_info(out_root / "p01" / "osmo_1.npz")
        assert rec.yolo_mask is not None
        assert rec.yolo_mask.shape == (T, 1, H, W)
        assert rec.yolo_mask.dtype == np.uint8
        assert set(np.unique(rec.yolo_mask)) <= {0, 1}
