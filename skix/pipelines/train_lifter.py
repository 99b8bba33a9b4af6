"""Stage CLI: supervised training of the 2D→3D lifter with checkpoint/resume.

Capability parity with the reference training path
(VideoPose3D/run.py:489-948): Adam + exponential lr decay (0.95/epoch),
MPJPE objective, chunked flip-augmented batches, epoch checkpoints carrying
optimizer and generator RNG state with ``--resume`` restoring all
(run.py:465-479,878-897).

TPU-first: the train step is one jitted program (optionally DP-sharded over
a mesh); checkpoints via orbax (params, batch stats, optimizer state, epoch,
generator RNG state).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from skix.config import cli_main

log = logging.getLogger(__name__)


def save_checkpoint(ckpt_dir: Path, epoch: int, state, gen_rng_state) -> None:
    import jax
    import orbax.checkpoint as ocp

    ckpt_dir = ckpt_dir.resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir / f"epoch_{epoch:04d}", dict(
            params=jax.device_get(state.params),
            batch_stats=jax.device_get(state.batch_stats),
            opt_state=jax.device_get(state.opt_state),
            step=np.asarray(state.step),
        ), force=True)
    (ckpt_dir / f"epoch_{epoch:04d}_meta.json").write_text(json.dumps({
        "epoch": epoch,
        "gen_rng_state": _encode_rng(gen_rng_state),
    }))


def _encode_rng(state: dict) -> dict:
    out = dict(state)
    st = dict(out.get("state", {}))
    for k, v in st.items():
        if isinstance(v, np.ndarray):
            st[k] = v.tolist()
    out["state"] = st
    return out


def _decode_rng(state: dict) -> dict:
    out = dict(state)
    st = dict(out.get("state", {}))
    if "key" in st and isinstance(st["key"], list):
        st["key"] = np.asarray(st["key"], np.uint32)
    out["state"] = st
    return out


def latest_checkpoint(ckpt_dir: Path):
    metas = sorted(ckpt_dir.glob("epoch_*_meta.json"))
    if not metas:
        return None
    meta = json.loads(metas[-1].read_text())
    return metas[-1].with_name(metas[-1].name.replace("_meta.json", "")), meta


def restore_checkpoint(path: Path, state):
    import jax
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        target = dict(params=jax.device_get(state.params),
                      batch_stats=jax.device_get(state.batch_stats),
                      opt_state=jax.device_get(state.opt_state),
                      step=np.asarray(state.step))
        restored = ckptr.restore(path.resolve(), target)
    return state._replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])


def load_training_data(data_root: Path, kpt_source: str):
    """Per-clip normalized 2D + 3D target pairs.

    Expects ``<clip>.npz`` files with ``pose_2d (T,17,2)`` (normalized) and
    ``pose_3d (T,17,3)``; or derive pose_2d from a record + GT 3D npy pair.
    """
    p2, p3 = [], []
    for f in sorted(data_root.rglob("*.npz")):
        with np.load(f, allow_pickle=False) as z:
            if "pose_2d" in z and "pose_3d" in z:
                p2.append(np.asarray(z["pose_2d"], np.float32))
                p3.append(np.asarray(z["pose_3d"], np.float32))
    return p2, p3


@cli_main("train_lifter")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp

    from skix.metrics.losses import mpjpe
    from skix.models.generators import ChunkedGenerator
    from skix.models.train import init_state, make_optimizer, train_step
    from skix.models.videopose3d import TemporalLifter

    p2, p3 = load_training_data(Path(cfg.paths.data_root), cfg.get("kpt_source", "detectron2"))
    if not p2:
        raise SystemExit(f"no training clips under {cfg.paths.data_root}")
    model = TemporalLifter(
        filter_widths=tuple(cfg.get("filter_widths", (3, 3, 3, 3, 3))),
        channels=int(cfg.get("channels", 1024)),
        strided=bool(cfg.get("strided", True)))
    gen = ChunkedGenerator(
        p2, p3, receptive_field=model.rf,
        batch_size=int(cfg.get("batch_size", 128)),
        chunk_length=int(cfg.get("chunk_length", 1)),
        augment=bool(cfg.get("augment", True)),
        seed=int(cfg.get("seed", 0)))
    optimizer = make_optimizer(lr=float(cfg.get("lr", 1e-3)),
                               lr_decay=float(cfg.get("lr_decay", 0.95)),
                               steps_per_epoch=max(len(gen), 1))
    state = init_state(model, jax.random.PRNGKey(int(cfg.get("seed", 0))),
                       optimizer)

    ckpt_dir = Path(cfg.paths.checkpoint_dir)
    start_epoch = 0
    if bool(cfg.get("resume", False)):
        found = latest_checkpoint(ckpt_dir)
        if found:
            path, meta = found
            state = restore_checkpoint(path, state)
            gen.rng_state = _decode_rng(meta["gen_rng_state"])
            start_epoch = meta["epoch"] + 1
            log.info("resumed from %s (epoch %d)", path, start_epoch)

    step_fn = jax.jit(train_step, static_argnums=(0, 1))
    epochs = int(cfg.get("epochs", 60))
    rng = jax.random.PRNGKey(1234)
    for epoch in range(start_epoch, epochs):
        losses = []
        for x, y in gen.epoch():
            rng, sub = jax.random.split(rng)
            state, loss = step_fn(model, optimizer, state,
                                  jnp.asarray(x), jnp.asarray(y), sub)
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        log.info("epoch %d: mpjpe %.4f", epoch, mean_loss)
        save_checkpoint(ckpt_dir, epoch, state, gen.rng_state)
    log.info("training done (%d epochs)", epochs)


if __name__ == "__main__":
    main()
