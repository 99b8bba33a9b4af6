"""Pipeline parallelism: GPipe-schedule stage execution over a mesh axis.

The reference has no pipeline machinery (its distributed surface is
DDP/NCCL data parallelism — SURVEY.md §2.16, sam3/train/trainer.py); this
is the TPU-native scaling mode the reference COULD NOT express: a deep
homogeneous stack (VGGT's 24 alternating aggregator blocks, a lifter's
residual tower, SAM3's 32 ViT-Det blocks) whose per-stage weights live on
different chips, with activations flowing stage→stage over ICI via
``jax.lax.ppermute`` — no process groups, no send/recv threads, one
compiled XLA program.

Schedule: GPipe (fill–steady–drain). With S stages and M microbatches the
loop runs T = M + S − 1 ticks; every tick each chip applies ITS stage to
the activation it holds and the ring shifts everything one hop. Bubble
fraction = (S−1)/(M+S−1) — pick M ≥ 4·S for >80% utilisation. All ticks
run inside one ``lax.scan`` under ``shard_map``, so the whole pipeline
(forward AND backward — ``ppermute``/``scan`` transpose cleanly) jits to a
single program; reverse-mode AD yields the standard reverse pipeline
schedule automatically.

Layout contract:

- stage parameters are STACKED on a new leading axis of size S and
  sharded over the pipe axis (each chip materialises only its own
  stage's weights — pipeline parallelism's memory win);
- ``stage_fn(params_one_stage, h) → h`` must preserve the activation
  shape (homogeneous stages; heterogeneous embed/head layers run outside
  the pipeline, replicated or DP-sharded);
- microbatches ride a leading axis of size M on the (replicated) input.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 moved shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def stack_stage_params(params_list):
    """[per-stage params pytree, …] → one pytree with a leading stage
    axis (the layout ``pipeline_apply`` shards over the pipe axis).
    All stages must share a tree structure and leaf shapes."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def sequential_apply(stage_fn: Callable, stacked_params, x):
    """Single-device reference semantics: fold ``stage_fn`` over the
    stage axis with ``lax.scan`` (exactly what the pipeline computes,
    minus the mesh). ``x`` may carry a leading microbatch axis or not —
    stages see it unchanged."""

    def body(h, p):
        return stage_fn(p, h), None

    out, _ = jax.lax.scan(body, x, stacked_params)
    return out


def pipeline_apply(stage_fn: Callable, stacked_params, x, mesh: Mesh,
                   axis: str = "pipe", *, data_axis: str | None = None,
                   remat: bool = False):
    """Run ``x`` through S pipelined stages sharded over ``mesh[axis]``.

    Args:
      stage_fn: ``(params_one_stage, h) → h``, shape-preserving.
      stacked_params: pytree, leaves ``(S, …)`` — stage-major (see
        ``stack_stage_params``). S must equal the pipe-axis size.
      x: microbatched activation — an array ``(M, …)`` or any pytree
        whose leaves carry a leading microbatch axis M (e.g.
        ``{"tokens": (M, …), "outs": (M, n_layers, …)}`` when stages
        also fill per-layer output buffers). Replicated over the pipe
        axis; see ``data_axis`` to shard it.
      mesh / axis: the pipe mesh axis.
      data_axis: optional second mesh axis sharding every activation
        leaf's SECOND dimension (the batch inside a microbatch) — DP×PP
        on one mesh: each (data, pipe) chip holds its batch slice of its
        stage, ppermute moves slices stage→stage within a data shard.
        stage_fn must be elementwise over that dimension (true for
        batch-parallel networks).
      remat: rematerialize each stage in the backward pass
        (``jax.checkpoint`` around ``stage_fn``) — the standard PP
        memory bound: activations are stored once per (tick, stage)
        boundary, not per layer inside a stage.

    Returns the same structure: microbatch i holds
    stage_{S−1}(…stage_0(x_i)…). Differentiable (the reverse pipeline
    runs in the same scan's transpose).
    """
    S = mesh.shape[axis]
    leaves = jax.tree.leaves(x)
    M = leaves[0].shape[0]
    n_ticks = M + S - 1
    fwd_perm = [(i, i + 1) for i in range(S - 1)]
    if remat:
        stage_fn = jax.checkpoint(stage_fn)

    def local(params, xs):
        # params leaves (1, …): this chip's stage. xs leaves (M, …).
        my_params = jax.tree.map(lambda p: p[0], params)
        stage_id = jax.lax.axis_index(axis)
        is_first = stage_id == 0
        is_last = stage_id == S - 1
        zero = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xs)

        def tick(carry, t):
            buf, out = carry
            # Stage 0 feeds microbatch t (clipped in the drain phase —
            # results there are masked out by the write below).
            feed_idx = jnp.minimum(t, M - 1)
            feed = jax.tree.map(
                lambda a, b: jnp.where(
                    is_first,
                    jax.lax.dynamic_index_in_dim(a, feed_idx,
                                                 keepdims=False), b),
                xs, buf)
            h = stage_fn(my_params, feed)
            # The last stage owns microbatch t−(S−1) at tick t.
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            write = is_last & (t >= S - 1)

            def put(o, hv):
                cur = jax.lax.dynamic_index_in_dim(o, out_idx,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(write, hv, cur), out_idx, 0)

            out = jax.tree.map(put, out, h)
            # Shift the ring: chip i → i+1 (chip 0 receives zeros and
            # ignores them — it reads from xs).
            buf = jax.tree.map(
                lambda hv: jax.lax.ppermute(hv, axis, fwd_perm), h)
            return (buf, out), None

        out0 = jax.tree.map(jnp.zeros_like, xs)
        (_, out), _ = jax.lax.scan(tick, (zero, out0),
                                   jnp.arange(n_ticks))
        # (1, M, …) per chip; concatenated over pipe by out_specs
        return jax.tree.map(lambda o: o[None], out)

    param_specs = jax.tree.map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), stacked_params)
    x_spec = P() if data_axis is None else P(None, data_axis)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(param_specs, x_spec),
                   out_specs=(P(axis) if data_axis is None
                              else P(axis, None, data_axis)),
                   check_vma=False)
    stacked_out = fn(stacked_params, x)      # leaves (S, M, …)
    return jax.tree.map(lambda o: o[S - 1], stacked_out)


def shard_params_pipeline(stacked_params, mesh: Mesh, axis: str = "pipe"):
    """Place stage-stacked params so each chip holds ONE stage's weights
    (leading axis over the pipe axis) — do this before the train loop so
    the pipeline never gathers weights."""
    from jax.sharding import NamedSharding

    def put(p):
        return jax.device_put(
            p, NamedSharding(mesh, P(axis, *([None] * (p.ndim - 1)))))

    return jax.tree.map(put, stacked_params)
