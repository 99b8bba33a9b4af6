"""Device-mesh / sharding utilities (DP + TP + SP over ICI).

The reference's distributed surface is NCCL process groups, spawn-based
workers, queues and barriers (SURVEY.md §2.16: SAM3's multi-GPU predictor,
GPUManager thread pools, DDP trainer). The TPU-native replacement is a
single JAX program over a ``jax.sharding.Mesh``:

- **data axis**   — clips/frames sharded for batch inference & training
  (replaces the GPUManager one-video-per-GPU thread pool and DDP);
- **model axis**  — channel/head sharding of large models (VGGT-1B
  attention heads, lifter channels) — tensor parallelism XLA lowers onto
  ICI collectives automatically from these annotations;
- object/"expert" sharding for tracking (SAM3's per-object GPU map) becomes
  an extra mesh axis over the object slots when that subsystem is built.

No process management: collectives are compiled into the program (psum /
all_gather / reduce_scatter over ICI), one Python process drives all chips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Optional[dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a named mesh. ``axes`` maps axis name → size; a size of −1
    absorbs the remaining devices (like a reshape). Default: all devices on
    a single ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axes is None:
        axes = {"data": n}
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f"mesh axes {dict(zip(names, sizes))} need {total} "
                         f"devices, have {n}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/clip) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel parameter sharding for conv/dense kernels: shard the
    output-feature (last) dimension over the ``model`` axis when divisible,
    replicate otherwise. Activations then carry a sharded feature axis and
    XLA inserts the all-gathers/reduce-scatters on ICI.

    Works on any flax params pytree.
    """
    size = mesh.shape[axis]

    def spec_for(x):
        if x.ndim >= 1 and x.shape[-1] % size == 0 and x.shape[-1] >= size:
            return P(*([None] * (x.ndim - 1)), axis)
        return P()

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x))), params)


def shard_params_fsdp(params, mesh: Mesh, axis: str = "data",
                      min_size: int = 2 ** 14):
    """FSDP / ZeRO-style parameter + optimizer-state sharding: each
    tensor shards its LARGEST axis divisible by the ``axis`` mesh size
    (small tensors below ``min_size`` elements stay replicated — the
    gather latency would dominate). Under ``jit`` XLA then all-gathers
    each weight right before use and reduce-scatters its gradient — the
    weight-update-sharding recipe, cutting per-device param + optimizer
    memory by ~axis-size. The reference trains DDP with fully
    replicated weights (sam3/train/trainer.py:306); this is the
    TPU-native upgrade for models whose AdamW state would not fit one
    chip. Works on any pytree (params AND optimizer state — pass both).
    """
    size = mesh.shape[axis]

    def spec_for(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.size < min_size:
            return P()
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % size == 0 and x.shape[d] >= size:
                spec = [None] * x.ndim
                spec[d] = axis
                return P(*spec)
        return P()

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x))),
        params)


def visualize(x) -> str:
    """Debug helper: sharding layout of an array as text."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        jax.debug.visualize_array_sharding(x)
    return buf.getvalue()
