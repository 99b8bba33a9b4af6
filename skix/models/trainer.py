"""Generic training loop: grad accumulation, clipping, checkpoint/resume,
validation.

Capability parity with the reference's SAM3 ``Trainer``
(sam3/train/trainer.py:145,306,374,556 — AMP, grad accumulation, gradient
clipping, checkpoint save/resume, val loop; SURVEY.md §2.8) without the
DDP/NCCL machinery: data parallelism is a sharded batch axis, mixed
precision is the model's compute dtype, and the whole update (including
accumulation) is one jitted program.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Callable, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from skix.utils.checkpointing import (latest_checkpoint_path, restore_pytree,
                                      save_pytree)

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    grad_clip_norm: float = 1.0
    grad_accum_steps: int = 1
    max_steps: int = 1000
    log_every: int = 50
    checkpoint_every: int = 500
    keep_last: int = 3
    val_every: int = 0  # 0 = no validation


class TrainerState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


class Trainer:
    """Minimal functional trainer: give it ``loss_fn(params, batch, rng)``
    returning a scalar, an initial params pytree and a batch iterator."""

    def __init__(self, loss_fn: Callable, params, cfg: TrainerConfig,
                 ckpt_dir: Optional[str | Path] = None,
                 tx: Optional[optax.GradientTransformation] = None):
        """``tx`` overrides the config-built optimizer — pass the result
        of :func:`skix.models.optim.construct_optimizer` for
        pattern-scoped param groups / schedulers / layer decay
        (reference construct_optimizer semantics)."""
        self.loss_fn = loss_fn
        self.cfg = cfg
        self.ckpt_dir = Path(ckpt_dir) if ckpt_dir else None
        if tx is not None:
            self.optimizer = tx
        else:
            chain = [optax.clip_by_global_norm(cfg.grad_clip_norm)]
            if cfg.weight_decay > 0:
                chain.append(optax.adamw(cfg.lr,
                                         weight_decay=cfg.weight_decay))
            else:
                chain.append(optax.adam(cfg.lr))
            self.optimizer = optax.chain(*chain)
        if cfg.grad_accum_steps > 1:
            self.optimizer = optax.MultiSteps(self.optimizer,
                                              cfg.grad_accum_steps)
        self.state = TrainerState(params=params,
                                  opt_state=self.optimizer.init(params),
                                  step=jnp.asarray(0))
        self._step_fn = jax.jit(self._step)

    def _step(self, state: TrainerState, batch, rng):
        loss, grads = jax.value_and_grad(self.loss_fn)(state.params, batch,
                                                       rng)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainerState(params=params, opt_state=opt_state,
                            step=state.step + 1), loss

    # ------------------ checkpointing ------------------
    def save(self, step: int) -> None:
        if self.ckpt_dir is None:
            return
        save_pytree(self.ckpt_dir / f"step_{step:08d}",
                    {"params": self.state.params,
                     "opt_state": self.state.opt_state},
                    metadata={"step": step},
                    keep_last=self.cfg.keep_last)

    def try_resume(self) -> int:
        if self.ckpt_dir is None:
            return 0
        found = latest_checkpoint_path(self.ckpt_dir)
        if not found:
            return 0
        path, meta = found
        restored = restore_pytree(path, {"params": self.state.params,
                                         "opt_state": self.state.opt_state})
        self.state = TrainerState(params=restored["params"],
                                  opt_state=restored["opt_state"],
                                  step=jnp.asarray(meta.get("step", 0)))
        log.info("resumed from %s (step %d)", path, int(self.state.step))
        return int(meta.get("step", 0))

    # ------------------ loops ------------------
    def fit(self, batches: Iterable, rng=None,
            val_fn: Optional[Callable] = None) -> dict:
        """Run up to cfg.max_steps over ``batches``; returns history."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        start = self.try_resume()
        history = {"loss": [], "val": []}
        step = start
        for batch in batches:
            if step >= self.cfg.max_steps:
                break
            rng, sub = jax.random.split(rng)
            self.state, loss = self._step_fn(self.state, batch, sub)
            step += 1
            if step % self.cfg.log_every == 0 or step == self.cfg.max_steps:
                lv = float(loss)
                history["loss"].append((step, lv))
                log.info("step %d: loss %.5f", step, lv)
            if self.cfg.checkpoint_every and \
                    step % self.cfg.checkpoint_every == 0:
                self.save(step)
            if val_fn and self.cfg.val_every and \
                    step % self.cfg.val_every == 0:
                v = float(val_fn(self.state.params))
                history["val"].append((step, v))
                log.info("step %d: val %.5f", step, v)
        self.save(step)
        return history
