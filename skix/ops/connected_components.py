"""Connected-component labeling as iterative label propagation under jit.

TPU-native replacement for the reference's Triton union-find CCL kernels
(sam3/perflib/triton/connected_components.py:9-430: 2-pass label/merge +
pointer jumping) and the CPU fallback (perflib/connected_components.py).

Union-find is pointer-chasing — hostile to a vector machine. The TPU shape
is **min-label propagation**: every foreground pixel takes the min label of
its 4-neighborhood each sweep; with pointer-jumping-style re-indexing
(label ← label[label]) convergence is O(log diameter) sweeps. All masked
array ops inside ``lax.while_loop`` — no host sync, batched over masks with
``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.iinfo(jnp.int32).max


def connected_components(mask, max_iters: int = 64):
    """Label 4-connected components of a bool ``(H, W)`` mask.

    Returns ``labels (H, W) int32``: background −1, components labeled by
    the linear index of their first (row-major) pixel — deterministic and
    order-stable, matching the reference semantics of union-find roots.
    ``vmap`` over a leading axis for batches.
    """
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape
    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    labels0 = jnp.where(mask, idx, _INF)

    def neighbor_min(lbl):
        up = jnp.concatenate([jnp.full((1, W), _INF, jnp.int32), lbl[:-1]], 0)
        down = jnp.concatenate([lbl[1:], jnp.full((1, W), _INF, jnp.int32)], 0)
        left = jnp.concatenate([jnp.full((H, 1), _INF, jnp.int32), lbl[:, :-1]], 1)
        right = jnp.concatenate([lbl[:, 1:], jnp.full((H, 1), _INF, jnp.int32)], 1)
        m = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.where(mask, jnp.minimum(lbl, m), _INF)

    def jump(lbl):
        """pointer jumping: label <- label at the pixel the label points to"""
        flat = lbl.ravel()
        safe = jnp.where(flat == _INF, 0, flat)
        hop = jnp.where(flat == _INF, _INF, flat[safe])
        return hop.reshape(H, W)

    def cond(state):
        lbl, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lbl, _, it = state
        new = neighbor_min(lbl)
        new = jump(jump(new))
        return new, jnp.any(new != lbl), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.asarray(True),
                                                   jnp.asarray(0)))
    return jnp.where(mask, labels, -1)


def component_sizes(labels, max_components: int):
    """Histogram of component sizes keyed by root label order of appearance.

    Returns ``(roots (max_components,), sizes (max_components,))`` padded
    with −1/0 — static shapes for downstream jit consumers.
    """
    labels = jnp.asarray(labels)
    flat = labels.ravel()
    fg = flat >= 0
    # unique roots in order of appearance = those whose label == own index
    idx = jnp.arange(flat.shape[0], dtype=flat.dtype)
    is_root = fg & (flat == idx)
    root_rank = jnp.cumsum(is_root) - 1
    order = jnp.where(is_root, root_rank, max_components)
    roots = jnp.full((max_components + 1,), -1, flat.dtype).at[
        jnp.clip(order, 0, max_components)].max(jnp.where(is_root, flat, -1))
    roots = roots[:max_components]
    sizes = jnp.sum(
        (flat[None, :] == roots[:, None]) & (roots[:, None] >= 0), axis=1)
    return roots, sizes
