"""Sequence/context-parallel attention over a device mesh.

The reference has no long-context machinery (SURVEY.md §5.7): VideoPose3D
handles time with dilated convs and SAM3 streams with bounded memory. The
one place a sequence axis can outgrow a chip is VGGT's global attention
(all frames × all patches in one context — aggregator.py:284); SURVEY
marks that as the natural cut point for a ring/all-gather KV pattern.

Two SP schedules over a named mesh axis:

- ``allgather_kv_attention`` — queries stay sharded; K/V are all-gathered
  once per layer (one ICI collective), then the local flash kernel runs on
  the full KV. Right when the gathered KV fits per chip (the common VGGT
  case).
- ``ring_attention`` — K/V shards rotate around the ring with
  ``jax.lax.ppermute`` while an online-softmax accumulator
  (numerator, denominator, running max) merges each arriving block; peak
  memory stays at one KV shard per chip. Right when KV must stay sharded.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.7 moved shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from skix.ops.attention import flash_attention


def allgather_kv_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                           sm_scale: float | None = None):
    """``q, k, v (B, H, S, D)`` with S sharded over ``axis`` → attention
    output sharded the same way."""

    def local(qs, ks, vs):
        kk = jax.lax.all_gather(ks, axis, axis=2, tiled=True)
        vv = jax.lax.all_gather(vs, axis, axis=2, tiled=True)
        return flash_attention(qs, kk, vv, sm_scale=sm_scale)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, None, axis, None),) * 3,
                   out_specs=P(None, None, axis, None),
                   check_vma=False)
    return fn(q, k, v)


def _block_stats(q, k, v, sm_scale):
    """Per-KV-block softmax pieces relative to the block max:
    (o = Σ exp(s−m)·v, l = Σ exp(s−m), m = rowmax(s))."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return o, l, m


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                   sm_scale: float | None = None):
    """Ring-scheduled exact attention with online-softmax merging.

    ``q, k, v (B, H, S, D)`` with S sharded over ``axis``; output sharded
    the same way. n−1 ``ppermute`` hops; each chip only ever holds one KV
    shard.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n = mesh.shape[axis]

    def local(qs, ks, vs):
        perm = [(i, (i + 1) % n) for i in range(n)]
        num, den, m = _block_stats(qs, ks, vs, sm_scale)

        def body(_, carry):
            num, den, m, kc, vc = carry
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            o_i, l_i, m_i = _block_stats(qs, kc, vc, sm_scale)
            m_new = jnp.maximum(m, m_i)
            w_old = jnp.exp(m - m_new)
            w_new = jnp.exp(m_i - m_new)
            num = num * w_old[..., None] + o_i * w_new[..., None]
            den = den * w_old + l_i * w_new
            return num, den, m_new, kc, vc

        num, den, m, _, _ = jax.lax.fori_loop(0, n - 1, body,
                                              (num, den, m, ks, vs))
        return (num / jnp.maximum(den, 1e-30)[..., None]).astype(qs.dtype)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, None, axis, None),) * 3,
                   out_specs=P(None, None, axis, None),
                   check_vma=False)
    return fn(q, k, v)
