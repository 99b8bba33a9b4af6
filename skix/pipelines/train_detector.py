"""Stage CLI: train the SAM3 promptable detector on COCO-format data.

Reference capability: the SAM3 train stack
(prepare_front_results/sam3/train/: trainer.py loop, data/
coco_json_loaders.py + collator.py datasets, loss/sam3_loss.py matched
losses) — the reference ships the infrastructure that produced its
detector checkpoint; this stage is the TPU-native counterpart wired to
skix's fixed-shape COCO loader.

TPU-first: one jitted train step at a static (B, S, S, 3) shape fed by
:class:`skix.data.CocoLoader` slots; losses are the in-repo
sam3_detection_loss (o2o + per-layer aux + DAC o2m) and the matched
mask CE+dice term; AdamW + cosine decay; flat-npz checkpoints.

Run: ``python -m skix.pipelines.train_detector coco_json=... ``
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

from skix.config import cli_main

log = logging.getLogger(__name__)


def build_detector(cfg):
    from skix.tracking.sam3_detector import Sam3Detector

    preset = str(cfg.get("preset", "tiny"))
    kw = dict(cfg.get("model", {}) or {})
    if preset == "full":
        return Sam3Detector.full_size(**kw)
    return Sam3Detector.tiny(**kw)


def evaluate_train_ap(model, params, loader, max_batches: int = 8,
                      iou_threshold: float = 0.5):
    """Class-agnostic box AP@iou on (deterministic) loader batches."""
    import jax.numpy as jnp

    from skix.metrics.detection_eval import average_precision
    from skix.tracking.matcher import cxcywh_to_xyxy
    from skix.utils.jitapply import apply_model

    S = loader.image_size
    pb, ps, gb = [], [], []
    for bi, batch in enumerate(loader.epoch()):
        if bi >= max_batches:
            break
        imgs = jnp.asarray(batch["images"], jnp.float32) / 255.0
        out = apply_model(model, None, {"params": params}, imgs)
        boxes = np.asarray(cxcywh_to_xyxy(out.boxes_cxcywh)) * S
        scores = np.asarray(1 / (1 + np.exp(-np.asarray(out.scores))))
        for b in range(imgs.shape[0]):
            pb.append(boxes[b])
            ps.append(scores[b])
            gb.append(batch["boxes"][b][batch["valid"][b]])
    return float(average_precision(pb, ps, gb,
                                   iou_threshold=iou_threshold))


def build_optimizer(cfg, params, steps: int):
    """Optimizer from config. ``optim.scheme=sam3`` reproduces the
    reference full-ft recipe (sam3/train/configs/roboflow_v100/
    roboflow_v100_full_ft_100_images.yaml:339-396): inverse-sqrt LR
    with a separate (lower) backbone LR, BEiT layer decay on the ViT
    trunk with ``*pos_embed*`` pinned to 1.0, zero weight decay on
    biases and norm scales, global grad clip. Default scheme: AdamW +
    cosine decay (the pre-existing behavior)."""
    import optax

    ocfg = dict(cfg.get("optim", {}) or {})
    clip = float(cfg.get("grad_clip", ocfg.get("grad_clip", 1.0)))
    if str(ocfg.get("scheme", "simple")) != "sam3":
        lr = optax.cosine_decay_schedule(float(cfg.get("lr", 1e-4)), steps,
                                         alpha=0.05)
        return optax.chain(
            optax.clip_by_global_norm(clip),
            optax.adamw(lr,
                        weight_decay=float(cfg.get("weight_decay", 1e-4))))

    from skix.models.optim import (LayerDecay, OptionRule,
                                   construct_optimizer,
                                   inverse_sqrt_schedule)

    warmup = int(ocfg.get("warmup_steps", max(steps // 20, 1)))
    cooldown = int(ocfg.get("cooldown_steps", 0))
    timescale = int(ocfg.get("timescale", max(warmup, 1)))

    def isr(base):
        return inverse_sqrt_schedule(base, warmup, cooldown, timescale,
                                     total_steps=steps)

    lr = float(cfg.get("lr", 1e-4))
    lr_backbone = float(ocfg.get("lr_backbone", lr * 0.1))
    wd = float(cfg.get("weight_decay", 1e-4))

    # built-in patterns are best-effort: drop the ones this particular
    # model has no params for (construct_optimizer is strict, matching
    # the reference's matches-no-params assert — right for user config,
    # wrong for a canned scheme)
    import fnmatch

    from flax.traverse_util import flatten_dict
    paths = ["/".join(map(str, k)) for k in flatten_dict(params)]

    def live(pats):
        return [p for p in pats if fnmatch.filter(paths, p)]

    def scoped_rule(sched, pats):
        pats = live(pats)
        return OptionRule(sched, pats) if pats else None

    options = {
        "lr": [r for r in (OptionRule(isr(lr)),
                           scoped_rule(isr(lr_backbone), ["backbone/*"]))
               if r is not None],
        "weight_decay": [r for r in (
            OptionRule(wd),
            scoped_rule(0.0, ["*/bias", "*/scale"])) if r is not None],
    }
    ld = None
    lrd = float(ocfg.get("layer_decay", 0.0))
    if lrd:
        ld = LayerDecay(value=lrd, apply_to="backbone",
                        minimum=(float(ocfg["layer_decay_min"])
                                 if "layer_decay_min" in ocfg else None),
                        overrides={"*pos_embed*": 1.0})
    tx, groups = construct_optimizer(params, options, grad_clip_norm=clip,
                                     layer_decay=ld)
    log.info("sam3 optim scheme: %d param groups (lr=%g backbone=%g "
             "wd=%g layer_decay=%g)", len(groups), lr, lr_backbone, wd, lrd)
    return tx


@cli_main("train_detector")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import optax

    from skix.data import CocoDataset, CocoLoader
    from skix.pipelines.videopose3d import load_checkpoint, save_checkpoint
    from skix.tracking.matcher import sam3_detection_loss, sam3_mask_loss

    model = build_detector(cfg)
    size = model.img_size
    ds = CocoDataset(cfg.coco_json, image_root=cfg.get("image_root"))
    mask_stride = int(cfg.get("mask_stride", 4))
    loader = CocoLoader(
        ds, batch_size=int(cfg.get("batch_size", 4)), image_size=size,
        max_objects=int(cfg.get("max_objects", 8)),
        mask_stride=mask_stride,
        augment=bool(cfg.get("augment", True)),
        scale_range=tuple(cfg.get("scale_range", (0.6, 1.4))),
        seed=int(cfg.get("seed", 0)))

    init_ckpt = cfg.get("init_checkpoint")
    if init_ckpt and Path(init_ckpt).exists():
        params = load_checkpoint(init_ckpt)["params"]
    else:
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(int(cfg.get("seed", 0))),
            jnp.zeros((1, size, size, 3))))()["params"]

    steps = int(cfg.get("steps", 1000))
    optimizer = build_optimizer(cfg, params, steps)
    opt_state = optimizer.init(params)
    apply_dac = bool(cfg.get("dac", True))
    mask_w = float(cfg.get("mask_weight", 1.0))
    lcfg = dict(cfg.get("loss", {}) or {})
    cls_kind = str(lcfg.get("cls", "focal"))
    w_class = float(lcfg.get("w_class", 20.0 if cls_kind == "iabce"
                             else 1.0))
    w_presence = float(lcfg.get("w_presence",
                                20.0 if cls_kind == "iabce" else 0.0))
    exact_match = bool(lcfg.get("exact_match", False))
    mask_points = lcfg.get("mask_points")  # None = full-grid mask loss
    mask_points = int(mask_points) if mask_points else None
    mask_rng = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 1)

    def loss_fn(p, batch, rng):
        imgs = batch["images"].astype(jnp.float32) / 255.0
        out = model.apply({"params": p}, imgs, apply_dac=apply_dac,
                          with_aux_scores=True)
        gt_cxcywh = jnp.stack(
            [(batch["boxes"][..., 0] + batch["boxes"][..., 2]) / 2,
             (batch["boxes"][..., 1] + batch["boxes"][..., 3]) / 2,
             batch["boxes"][..., 2] - batch["boxes"][..., 0],
             batch["boxes"][..., 3] - batch["boxes"][..., 1]], -1) / size
        det = sam3_detection_loss(out, gt_cxcywh, batch["valid"],
                                  exact=exact_match, cls=cls_kind,
                                  w_class=w_class,
                                  w_presence=w_presence)
        msk = sam3_mask_loss(out, gt_cxcywh, batch["masks"],
                             batch["valid"],
                             num_sample_points=mask_points, rng=rng)
        return det + mask_w * msk, (det, msk)

    @jax.jit
    def step(p, o, batch, rng):
        rng, sub = jax.random.split(rng)
        (loss, (det, msk)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, batch, sub)
        updates, o2 = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss, det, msk, rng

    ckpt_dir = Path(cfg.paths.checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    eval_loader = CocoLoader(ds, batch_size=loader.batch_size,
                             image_size=size,
                             max_objects=loader.max_objects,
                             mask_stride=mask_stride, augment=False)
    ap0 = (evaluate_train_ap(model, params, eval_loader)
           if bool(cfg.get("eval_ap", True)) else None)
    if ap0 is not None:
        log.info("AP@0.5 before training: %.4f", ap0)

    t0 = time.time()
    it = iter(loader)
    loss = float("nan")
    for i in range(steps):
        batch = next(it)
        params, opt_state, loss, det, msk, mask_rng = step(
            params, opt_state, batch, mask_rng)
        if i % int(cfg.get("log_every", 50)) == 0 or i == steps - 1:
            log.info("step %d loss %.4f (det %.4f mask %.4f) %.1fs", i,
                     float(loss), float(det), float(msk),
                     time.time() - t0)
        if (i + 1) % int(cfg.get("ckpt_every", 500)) == 0 or i == steps - 1:
            out_path = ckpt_dir / f"sam3_detector_{i + 1:06d}.npz"
            save_checkpoint(str(out_path), {"params": params})
            log.info("saved %s", out_path)

    result = {"final_loss": float(loss)}
    if ap0 is not None:
        ap1 = evaluate_train_ap(model, params, eval_loader)
        log.info("AP@0.5 after training: %.4f (was %.4f)", ap1, ap0)
        result.update({"ap_before": ap0, "ap_after": ap1})
    (ckpt_dir / "final_eval.json").write_text(json.dumps(result))
    return params


if __name__ == "__main__":
    main()
