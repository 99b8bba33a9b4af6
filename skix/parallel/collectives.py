"""Collective helpers over a device mesh (shard_map wrappers).

Capability parity with the reference's distributed utilities
(sam3/train/utils/distributed.py:230-287 all_reduce mean/sum/min/max
wrappers; :487 ``GatherLayer`` autograd-aware all-gather; the CPU gloo
side-group for seed agreement :90): under JAX these are one-liners inside
``shard_map`` — XLA compiles them onto ICI, autodiff works through
``all_gather`` natively, and "seed agreement" is a non-problem because a
single process drives all chips.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.7 moved shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def all_reduce_mean(x, mesh: Mesh, axis: str = "data"):
    """Mean over the ``axis`` shards of a fully-sharded leading dim."""
    fn = shard_map(lambda v: jax.lax.pmean(v, axis),
                   mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    return fn(x)


def all_reduce_sum(x, mesh: Mesh, axis: str = "data"):
    fn = shard_map(lambda v: jax.lax.psum(v, axis),
                   mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    return fn(x)


def all_gather(x, mesh: Mesh, axis: str = "data"):
    """Gather shards of the leading dim to every device (differentiable —
    the reference needs a custom autograd.Function for this)."""
    fn = shard_map(lambda v: jax.lax.all_gather(v, axis, tiled=True),
                   mesh=mesh, in_specs=P(axis), out_specs=P(),
                   check_vma=False)
    return fn(x)


def psum_scalar(x, mesh: Mesh, axis: str = "data"):
    """Cross-shard scalar reduction (e.g. global loss/metric totals)."""
    fn = shard_map(lambda v: jax.lax.psum(jnp.sum(v), axis),
                   mesh=mesh, in_specs=P(axis), out_specs=P(),
                   check_vma=False)
    return fn(x)


def data_parallel_map(fn: Callable, mesh: Mesh, axis: str = "data"):
    """Run ``fn`` independently per shard of the leading axis — the
    replacement for the reference's one-video-per-GPU thread pool
    (prepare_side_results/main.py:20 GPUManager): clips sharded over the
    mesh, one jitted program, no threads or queues."""
    return shard_map(fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
