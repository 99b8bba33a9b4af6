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

from skix.config import cli_main, iter_person_dirs
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


@register_backend("skix")
def _skix_backend(cfg, video_path: Path):
    """On-device perception: PoseDetector (bbox + 17-kpt pose + mask),
    optional MonocularDepth and RAFT flow — the TPU-native equivalents of
    the reference's {yolo, detectron2, depth, optical_flow} task set
    (process/preprocess.py:50). Each sub-model loads converted weights
    when configured, random-init (smoke mode) otherwise."""
    import jax
    import jax.numpy as jnp

    from skix.models.pose_detector import PoseDetector, detect_clip

    det_model = PoseDetector(
        width=int(cfg.get("detector_width", 64)),
        depth=int(cfg.get("detector_depth", 4)),
        top_k=int(cfg.get("top_k", 8)),
        score_threshold=float(cfg.get("score_threshold", 0.3)))

    def load_vars(key, init_fn):
        ckpt = cfg.get(key)
        if ckpt and Path(ckpt).exists():
            from skix.pipelines.videopose3d import load_checkpoint

            return load_checkpoint(ckpt)
        log.warning("%s not configured — random init (smoke mode)", key)
        return init_fn()

    tasks = set(cfg.get("tasks", ["pose"]))

    def run(frames: np.ndarray) -> dict:
        H, W = frames.shape[1:3]
        det_vars = load_vars("detector_checkpoint", lambda: jax.jit(
            det_model.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, H, W, 3))))
        boxes, kpts, valid = detect_clip(det_model, det_vars, frames,
                                         batch_size=int(cfg.get("det_batch", 8)))
        out = {"boxes": boxes, "keypoints": kpts, "det_valid": valid}
        if "depth" in tasks:
            from skix.models.dpt import MonocularDepth, estimate_depth_batched

            n_layers = int(cfg.get("depth_layers", 12))
            # 4 evenly spaced taps over the configured depth
            taps = tuple(sorted({max(0, (n_layers * (i + 1)) // 4 - 1)
                                 for i in range(4)}))
            while len(taps) < 4:  # tiny configs: pad with the last layer
                taps = taps + (n_layers - 1,)
            dm = MonocularDepth(patch_size=16,
                                embed_dim=int(cfg.get("depth_dim", 384)),
                                depth=n_layers,
                                num_heads=int(cfg.get("depth_heads", 6)),
                                taps=taps,
                                features=int(cfg.get("depth_features", 256)))
            dv = load_vars("depth_checkpoint", lambda: jax.jit(dm.init)(
                jax.random.PRNGKey(1), jnp.zeros((1, (H // 16) * 16,
                                                  (W // 16) * 16, 3))))
            fr = frames[:, : (H // 16) * 16, : (W // 16) * 16]
            d = estimate_depth_batched(dm, dv, fr,
                                       batch_size=int(cfg.get("depth_batch", 4)))
            out["depth"] = np.pad(d, ((0, 0), (0, 0),
                                      (0, H - d.shape[2]),
                                      (0, W - d.shape[3])), mode="edge")
        if "optical_flow" in tasks:
            from skix.models.raft import RAFT, compute_flow_sequence

            rm = RAFT(hidden=int(cfg.get("flow_hidden", 96)),
                      context=int(cfg.get("flow_context", 64)),
                      corr_levels=3, corr_radius=3,
                      iters=int(cfg.get("flow_iters", 8)))
            ph, pw = (-H) % 8, (-W) % 8
            rv = load_vars("flow_checkpoint", lambda: jax.jit(rm.init)(
                jax.random.PRNGKey(2),
                jnp.zeros((1, H + ph, W + pw, 3)),
                jnp.zeros((1, H + ph, W + pw, 3))))
            out["optical_flow"] = compute_flow_sequence(
                rm, rv, frames, chunk_size=int(cfg.get("flow_batch", 2)))
        return out

    return run


def _select_core(boxes, kpts, valid):
    from skix.perception import fill_invalid_frames, select_person_sequence

    sel = select_person_sequence(boxes, kpts, det_valid=valid)
    kp = fill_invalid_frames(sel.keypoints, sel.valid)
    sc = fill_invalid_frames(sel.scores, sel.valid)
    bx = fill_invalid_frames(sel.boxes, sel.valid)
    return kp, sc, bx, sel.none_index


def _select_and_fill(det: dict) -> dict:
    """Jitted athlete selection + hole filling on raw padded detections
    (jit cached across videos — not a per-call closure)."""
    import jax
    import jax.numpy as jnp

    if not hasattr(_select_and_fill, "_jit"):
        _select_and_fill._jit = jax.jit(_select_core)
    run = _select_and_fill._jit

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
    for person_dir in iter_person_dirs(root, cfg):
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
