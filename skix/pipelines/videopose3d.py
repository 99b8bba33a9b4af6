"""Stage CLI: 2D→3D lifting + no-extrinsics two-view fusion.

Reference entry: VideoPose3D/main.py:106 (per person: lift left+right views,
per-frame Umeyama fusion, npz + metrics export). Input is the per-video
record (.npz contract or reference .pt); output ``<video>.npy`` camera-space
3D predictions (reference run.py:1089) plus ``*_fused.npz`` and a metrics
report.

TPU-first: the whole clip lifts in one jitted batched call (both views +
flip augmentation in a single batch of 4 sequences); fusion is one vmapped
program (skix.fuse.fuse_pose_no_extrinsics).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from skix.config import cli_main, iter_person_dirs

log = logging.getLogger(__name__)


def load_2d_keypoints(path: str, source: str = "detectron2"):
    """Load (T,17,3|2) COCO keypoints + scores from a record file."""
    from skix.io import load_pt_info

    info = load_pt_info(path)
    if source == "detectron2":
        kpts, score = info.d2_keypoints, info.d2_keypoints_score
    else:
        kpts, score = info.yolo_keypoints, info.yolo_keypoints_score
    if kpts is None:
        raise ValueError(f"{path} has no {source} keypoints")
    if kpts.shape[-1] == 3 and score is None:
        score = kpts[..., 2]
    kpts = kpts[..., :2]
    if score is None:
        score = np.ones(kpts.shape[:-1], np.float32)
    H, W = info.img_shape
    return np.asarray(kpts, np.float32), np.asarray(score, np.float32), (H, W)


def lift_clip(kpts_coco_2d, img_wh, variables, model=None, flip_augment=True):
    """COCO-2D pixels → H36M-3D camera-space, full clip, one jit."""
    import jax.numpy as jnp

    from skix.geometry.camera import normalize_screen_coordinates
    from skix.geometry.skeletons import coco_to_h36m
    from skix.models.videopose3d import TemporalLifter, infer_sequence

    model = model or TemporalLifter()
    w, h = img_wh
    kpts_h36m = coco_to_h36m(jnp.asarray(kpts_coco_2d))
    norm = normalize_screen_coordinates(kpts_h36m, w, h)
    return infer_sequence(model, variables, norm, flip_augment=flip_augment)


def load_checkpoint(path: str):
    """Load lifter weights: native .npz (flax) or reference torch .bin."""
    from skix.models.videopose3d import convert_reference_state_dict

    p = Path(path)
    if p.suffix in (".bin", ".pth", ".pt"):
        import torch

        try:  # state dicts load under the safe unpickler
            ckpt = torch.load(p, map_location="cpu", weights_only=True)
        except Exception:
            import warnings

            warnings.warn(
                f"{p}: falling back to full pickle deserialization (can "
                "execute arbitrary code); only load trusted checkpoints.",
                stacklevel=2)
            ckpt = torch.load(p, map_location="cpu", weights_only=False)
        state = ckpt.get("model_pos", ckpt)
        return convert_reference_state_dict(state)
    import jax.numpy as jnp

    with np.load(p, allow_pickle=False) as z:
        flat = dict(z)
    # keys like "params/expand_conv/kernel"
    out: dict = {}
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(v)
    return out


def save_checkpoint(path: str, variables) -> None:
    import jax

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", jax.tree.map(lambda x: x, variables))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def run_one_person(cfg, person_dir: Path, out_dir: Path, variables, model):
    import jax.numpy as jnp

    from skix.fuse import fuse_pose_no_extrinsics
    from skix.metrics.evaluation import eval_fused_sequence
    from skix.geometry.skeletons import H36M_BONES, H36M_SYMMETRIC_BONES

    records = sorted(person_dir.glob("*.npz")) + sorted(person_dir.glob("*.pt"))
    if len(records) < 2:
        log.warning("person %s: need 2 views, found %d — skipping",
                    person_dir.name, len(records))
        return None
    left_p, right_p = records[0], records[1]
    preds = {}
    for name, p in (("left", left_p), ("right", right_p)):
        kpts, score, (H, W) = load_2d_keypoints(str(p), cfg.get("kpt_source", "detectron2"))
        pred = lift_clip(kpts, (W, H), variables, model,
                         flip_augment=bool(cfg.get("test_time_augmentation", True)))
        preds[name] = np.asarray(pred)
        np.save(out_dir / f"{p.stem}_{name}.npy", preds[name])

    T = min(preds["left"].shape[0], preds["right"].shape[0])
    fused, diag = fuse_pose_no_extrinsics(
        jnp.asarray(preds["left"][:T]), jnp.asarray(preds["right"][:T]),
        tau=float(cfg.get("fuse_tau", 0.08)))
    fused = np.asarray(fused)
    np.savez(out_dir / f"{person_dir.name}_fused.npz", fused=fused,
             mean_disagreement=float(diag["mean_disagreement"]))
    report = eval_fused_sequence(jnp.asarray(fused),
                                 jnp.asarray(preds["left"][:T]),
                                 jnp.asarray(preds["right"][:T]),
                                 H36M_BONES, H36M_SYMMETRIC_BONES)
    report = {k: float(v) for k, v in report.items()}
    (out_dir / f"{person_dir.name}_metrics.json").write_text(
        json.dumps(report, indent=2))
    return report


@cli_main("videopose3d")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    from skix.models.videopose3d import TemporalLifter

    model = TemporalLifter(
        filter_widths=tuple(cfg.get("filter_widths", (3, 3, 3, 3, 3))),
        channels=int(cfg.get("channels", 1024)))
    ckpt = cfg.get("checkpoint")
    if ckpt:
        variables = load_checkpoint(ckpt)
    else:
        import jax

        log.warning("no checkpoint configured — random init (smoke mode)")
        variables = model.init(jax.random.PRNGKey(0),
                               np.zeros((1, model.rf, 17, 2), np.float32),
                               train=False)
    root = Path(cfg.paths.pt_root)
    out_root = Path(cfg.paths.out_root)
    results = {}
    for person_dir in iter_person_dirs(root, cfg):
        out_dir = out_root / person_dir.name
        out_dir.mkdir(parents=True, exist_ok=True)
        try:
            rep = run_one_person(cfg, person_dir, out_dir, variables, model)
            if rep:
                results[person_dir.name] = rep
        except Exception:  # noqa: BLE001 — per-person isolation like reference
            log.exception("person %s failed", person_dir.name)
    (out_root / "summary.json").write_text(json.dumps(results, indent=2))
    log.info("done: %d persons", len(results))


if __name__ == "__main__":
    main()
