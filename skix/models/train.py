"""Training step for the 2D→3D lifter, sharded over a device mesh.

Capability parity with the reference training loop
(VideoPose3D/run.py:489-948: Adam, lr 1e-3 ×0.95/epoch exponential decay,
MPJPE loss, BN-momentum decay, chunked batches) — redesigned as a pure
jitted step over a ``Mesh``:

- batch axis sharded over ``data`` (replaces DataLoader+DDP),
- optional tensor-parallel channel sharding over ``model``
  (skix.parallel.shard_params_tp),
- BN statistics updated functionally (mutable collection), psum'd by XLA
  automatically under ``jit`` because the batch axis is sharded.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from skix.metrics.losses import mpjpe
from skix.models.videopose3d import TemporalLifter


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-3, lr_decay: float = 0.95,
                   steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    """Adam with the reference's per-epoch exponential decay
    (common/arguments.py:37-41)."""
    sched = optax.exponential_decay(lr, transition_steps=steps_per_epoch,
                                    decay_rate=lr_decay, staircase=True)
    return optax.adam(sched, eps=1e-8)


def init_state(model: TemporalLifter, rng, optimizer=None,
               example_len: Optional[int] = None) -> TrainState:
    T = example_len or model.rf
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.zeros((1, T, model.num_joints_in, model.in_features)), train=True)
    optimizer = optimizer or make_optimizer()
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.asarray(0),
    )


def train_step(model: TemporalLifter, optimizer, state: TrainState,
               batch_2d, batch_3d, dropout_rng):
    """One supervised step. ``batch_2d (B, rf, J, 2)``,
    ``batch_3d (B, out_len, J, 3)`` (out_len = rf−rf+1 = 1 for strided
    training, or any matching length)."""

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch_2d, train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        return mpjpe(out, batch_3d), mutated["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(params=new_params, batch_stats=new_stats,
                      opt_state=new_opt, step=state.step + 1), loss
