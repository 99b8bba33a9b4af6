"""Stage CLI: video → per-video record (.npz pt_info contract).

Reference entry: prepare_dataset/main.py:162 — iterate persons/videos,
decode, run the configured tasks {yolo, detectron2, depth, optical_flow}
(process/preprocess.py:50 ``Preprocess.__call__`` multiplexer), assemble the
``pt_info`` schema, validate shapes, atomic save, skip-if-exists resume
(main.py:133), per-video try/except isolation (main.py:137-147).

TPU-first redesign:
- streaming chunked decode (skix.io.video) instead of whole-clip
  ``torchvision.io.read_video``;
- perception models behind a small registry; each backend maps
  ``frames (T, H, W, 3) uint8`` → task outputs. Backends:
  * ``precomputed`` — sidecar ``<video>.detections.npz`` with raw padded
    per-frame detections (the BASELINE config-1 pathway);
  * ``skix`` — JAX models (DPT-style depth via skix.models.dpt, RAFT-style
    flow via skix.models.raft) when weights are configured;
  * anything callable registered by the user.
- athlete selection + hole filling as one jitted scan
  (skix.perception.selection).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Dict

import numpy as np

from skix.config import cli_main
from skix.io import PTInfo, check_pt_info_shapes, save_pt_info
from skix.io.video import probe_video, read_video_chunks

log = logging.getLogger(__name__)

# task registry: name -> factory(cfg) -> callable(frames_u8) -> dict
_BACKENDS: Dict[str, Callable] = {}


def register_backend(name: str):
    def deco(fn):
        _BACKENDS[name] = fn
        return fn

    return deco


@register_backend("precomputed")
def _precomputed_backend(cfg, video_path: Path):
    """Loads padded raw detections from ``<video>.detections.npz``:
    boxes (T,N,4) cxcywh, keypoints (T,N,17,3), det_valid (T,N),
    optional depth (T,1,H,W), optical_flow (T-1,2,H,W)."""
    sidecar = video_path.with_suffix(".detections.npz")

    def run(frames: np.ndarray) -> dict:
        if not sidecar.exists():
            raise FileNotFoundError(
                f"precomputed backend needs {sidecar}")
        with np.load(sidecar, allow_pickle=False) as z:
            return dict(z)

    return run


def _select_and_fill(det: dict) -> dict:
    """Jitted athlete selection + hole filling on raw padded detections."""
    import jax
    import jax.numpy as jnp

    from skix.perception import fill_invalid_frames, select_person_sequence

    @jax.jit
    def run(boxes, kpts, valid):
        sel = select_person_sequence(boxes, kpts, det_valid=valid)
        kp = fill_invalid_frames(sel.keypoints, sel.valid)
        sc = fill_invalid_frames(sel.scores, sel.valid)
        bx = fill_invalid_frames(sel.boxes, sel.valid)
        return kp, sc, bx, sel.none_index

    kp, sc, bx, none_mask = run(jnp.asarray(det["boxes"], jnp.float32),
                                jnp.asarray(det["keypoints"], jnp.float32),
                                jnp.asarray(det["det_valid"], bool))
    none_index = np.where(np.asarray(none_mask))[0].astype(np.int64)
    kp = np.asarray(kp)
    sc = np.asarray(sc)
    # xyxy bbox from cxcywh for contract parity
    bx = np.asarray(bx)
    xyxy = np.stack([bx[:, 0] - bx[:, 2] / 2, bx[:, 1] - bx[:, 3] / 2,
                     bx[:, 0] + bx[:, 2] / 2, bx[:, 1] + bx[:, 3] / 2], -1)
    kpts3 = np.concatenate([kp, sc[..., None]], axis=-1)
    return {"keypoints": kpts3.astype(np.float32),
            "scores": sc.astype(np.float32),
            "bbox": xyxy.astype(np.float32),
            "none_index": none_index}


def process_video(cfg, video_path: Path, out_path: Path) -> PTInfo:
    meta = probe_video(video_path)
    max_frames = cfg.get("max_frames")
    chunks = list(read_video_chunks(video_path,
                                    chunk_size=int(cfg.get("chunk_size", 64)),
                                    max_frames=max_frames))
    frames = (np.concatenate(chunks, 0) if chunks
              else np.zeros((0, meta.height, meta.width, 3), np.uint8))
    T = frames.shape[0]

    backend_name = str(cfg.get("backend", "precomputed"))
    backend = _BACKENDS[backend_name](cfg, video_path)
    det = backend(frames)
    sel = _select_and_fill(det)

    info = PTInfo(
        video_name=video_path.stem,
        video_path=str(video_path),
        frame_count=T,
        img_shape=(frames.shape[1], frames.shape[2]),
        fps=meta.fps,
        duration=T / meta.fps if meta.fps else 0.0,
        frames=frames if bool(cfg.get("store_frames", False)) else None,
        depth=det.get("depth"),
        optical_flow=det.get("optical_flow"),
        none_index=sel["none_index"],
        yolo_bbox=sel["bbox"],
        yolo_keypoints=sel["keypoints"],
        yolo_keypoints_score=sel["scores"],
        d2_bbox=sel["bbox"],
        d2_keypoints=sel["keypoints"],
        d2_keypoints_score=sel["scores"],
    )
    check_pt_info_shapes(info)
    save_pt_info(out_path, info)
    return info


@cli_main("prepare_dataset")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    root = Path(cfg.paths.video_root)
    out_root = Path(cfg.paths.out_root)
    done, failed, skipped = 0, 0, 0
    for person_dir in sorted(d for d in root.iterdir() if d.is_dir()):
        for video in sorted(person_dir.glob("*.mp4")):
            out_path = out_root / person_dir.name / f"{video.stem}.npz"
            if out_path.exists() and not bool(cfg.get("overwrite", False)):
                skipped += 1
                continue
            try:
                process_video(cfg, video, out_path)
                done += 1
                log.info("processed %s/%s", person_dir.name, video.name)
            except Exception:  # noqa: BLE001 — per-video isolation
                failed += 1
                log.exception("video %s failed", video)
    log.info("prepare_dataset: %d done, %d skipped, %d failed",
             done, skipped, failed)


if __name__ == "__main__":
    main()
