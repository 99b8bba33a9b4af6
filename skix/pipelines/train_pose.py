"""Stage CLI: train the YOLO-class pose detector on COCO-format data.

Reference capability: the ultralytics training loop behind
prepare_dataset/model/yolov11_pose.py:42 (``YOLO(pose_ckpt)`` checkpoints
are produced by `yolo pose train` on COCO-keypoints data) — the
reference repo consumes such checkpoints but cannot produce them without
the pip dep; this stage is the in-framework counterpart.

TPU-first: host-side COCO loader feeds ONE jitted train step at a fixed
(B, S, S, 3) shape; BatchNorm state threads functionally; AdamW + cosine
decay; checkpoints in the flat-npz format every skix model CLI loads
(prepare_dataset's ``detector_checkpoint`` consumes them directly).

Run: ``python -m skix.pipelines.train_pose coco_json=... image_root=...``
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import numpy as np

from skix.config import cli_main

log = logging.getLogger(__name__)


def build_train_step(model, optimizer):
    import jax
    import jax.numpy as jnp
    import optax

    from skix.models.yolo_loss import pose_detection_loss

    def loss_fn(params, stats, batch):
        images = batch["images"].astype(jnp.float32) / 255.0
        raw, upd = model.apply(
            {"params": params, "batch_stats": stats}, images, train=True,
            mutable=["batch_stats"])
        total, aux = pose_detection_loss(
            raw, batch["boxes"], batch["keypoints"], batch["valid"],
            gt_cls=batch["cls"])
        return total, (aux, upd["batch_stats"])

    @jax.jit
    def step(params, stats, opt_state, batch):
        (loss, (aux, stats2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, batch)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, stats2, opt_state2, loss, aux

    return step


def evaluate_keypoint_error(model, variables, loader, max_batches: int = 8):
    """Mean pixel error of the best-scoring detection's keypoints vs the
    largest GT object, over eval batches (augment off)."""
    import jax.numpy as jnp

    from skix.models.yolo_pose import detect
    from skix.utils.jitapply import apply_model

    errs = []
    for bi, batch in enumerate(loader.epoch()):
        if bi >= max_batches:
            break
        raw = apply_model(model, None, variables,
                          jnp.asarray(batch["images"], jnp.float32) / 255.0)
        det = detect(raw, top_k=4, score_threshold=0.0)
        kp = np.asarray(det.keypoints)          # (B, K, 17, 3)
        sc = np.asarray(det.scores)
        for b in range(kp.shape[0]):
            if not batch["valid"][b, 0]:
                continue
            gt = batch["keypoints"][b, 0]       # largest object first
            vis = gt[:, 2] > 0
            if not vis.any():
                continue
            best = int(np.argmax(sc[b]))
            d = np.linalg.norm(kp[b, best, :, :2] - gt[:, :2], axis=-1)
            errs.append(float(d[vis].mean()))
    return float(np.mean(errs)) if errs else float("nan")


@cli_main("train_pose")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import optax

    from skix.data import CocoDataset, CocoLoader
    from skix.models.yolo_pose import YoloPose, convert_ultralytics_pose
    from skix.pipelines.videopose3d import save_checkpoint

    ds = CocoDataset(cfg.coco_json, image_root=cfg.get("image_root"))
    size = int(cfg.get("image_size", 640))
    loader = CocoLoader(
        ds, batch_size=int(cfg.get("batch_size", 8)), image_size=size,
        max_objects=int(cfg.get("max_objects", 16)),
        augment=bool(cfg.get("augment", True)),
        scale_range=tuple(cfg.get("scale_range", (0.6, 1.4))),
        seed=int(cfg.get("seed", 0)))
    model = YoloPose(scale=str(cfg.get("scale", "s")),
                     num_classes=int(cfg.get("num_classes", 1)),
                     version=int(cfg.get("version", 8)))

    init_ckpt = cfg.get("init_checkpoint")
    if init_ckpt and Path(init_ckpt).exists():
        if str(init_ckpt).endswith((".pt", ".pth")):
            import torch

            sd = torch.load(init_ckpt, map_location="cpu",
                            weights_only=True)
            sd = sd.get("model", sd)
            sd = sd.state_dict() if hasattr(sd, "state_dict") else sd
            variables = convert_ultralytics_pose(
                sd, scale=str(cfg.get("scale", "s")),
                version=int(cfg.get("version", 8)))
            log.info("initialized from ultralytics checkpoint %s",
                     init_ckpt)
        else:
            from skix.pipelines.videopose3d import load_checkpoint

            variables = load_checkpoint(init_ckpt)
    else:
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(int(cfg.get("seed", 0))),
            jnp.zeros((1, size, size, 3)), train=True))()
    params, stats = variables["params"], variables["batch_stats"]

    steps = int(cfg.get("steps", 1000))
    lr = optax.cosine_decay_schedule(float(cfg.get("lr", 1e-3)), steps,
                                     alpha=0.05)
    optimizer = optax.chain(
        optax.clip_by_global_norm(float(cfg.get("grad_clip", 10.0))),
        optax.adamw(lr, weight_decay=float(cfg.get("weight_decay", 5e-4))))
    opt_state = optimizer.init(params)
    step = build_train_step(model, optimizer)

    ckpt_dir = Path(cfg.paths.checkpoint_dir)
    t0 = time.time()
    it = iter(loader)
    for i in range(steps):
        batch = next(it)
        params, stats, opt_state, loss, aux = step(params, stats,
                                                   opt_state, batch)
        if i % int(cfg.get("log_every", 50)) == 0 or i == steps - 1:
            log.info("step %d loss %.4f %s (%.1fs)", i, float(loss),
                     {k: round(float(v), 4) for k, v in aux.items()},
                     time.time() - t0)
        if (i + 1) % int(cfg.get("ckpt_every", 500)) == 0 or i == steps - 1:
            out = ckpt_dir / f"yolo_pose_{i + 1:06d}.npz"
            save_checkpoint(str(out), {"params": params,
                                       "batch_stats": stats})
            log.info("saved %s", out)

    if bool(cfg.get("final_eval", True)):
        eval_loader = CocoLoader(ds, batch_size=loader.batch_size,
                                 image_size=size,
                                 max_objects=loader.max_objects,
                                 augment=False)
        err = evaluate_keypoint_error(
            model, {"params": params, "batch_stats": stats}, eval_loader)
        log.info("final mean keypoint error: %.2f px", err)
        (ckpt_dir / "final_eval.txt").write_text(f"{err}\n")
    return {"params": params, "batch_stats": stats}


if __name__ == "__main__":
    main()
