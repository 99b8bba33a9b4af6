"""Flash attention for TPU (Pallas) with an XLA fallback.

This is the TPU-native replacement for every attention path in the
reference stack (SURVEY.md §2.9): FlashAttention-3 custom ops
(sam3/perflib/fa3.py, image_edit/qwenimage/qwen_fa3_processor.py),
``F.scaled_dot_product_attention`` throughout VGGT
(vggt/vggt/layers/attention.py:61), SAM3 and SAM-3D-Body's FlashAttention
class (models/backbones/vit.py:238).

Design (see /opt/skills/guides/boom_attention_tricks.md):
- grid ``(B, H, num_q_tiles, num_kv_tiles)`` — KV innermost so the f32
  online-softmax statistics (m, l) and the output accumulator live in VMEM
  scratch across KV tiles;
- QKᵀ and P·V on the MXU with ``preferred_element_type=f32``; inputs may be
  bf16;
- static-shape padding to tile multiples with in-kernel iota masking (no
  dynamic shapes under jit);
- backward pass via ``jax.custom_vjp`` recomputation through the XLA
  reference implementation (training path; inference is the hot path).

On non-TPU backends (tests run on a virtual CPU mesh) the XLA reference
implementation is used automatically.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _attention_reference(q, k, v, sm_scale: float, bias=None):
    """XLA attention in f32 statistics; shapes (B, H, S, D)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  sm_scale: float, kv_tiles: int, kv_len: int, block_k: int):
    """One (q-tile × kv-tile) step of the online-softmax accumulation."""
    from jax.experimental import pallas as pl

    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # (block_q, d)
    k = k_ref[0, 0]  # (block_k, d)
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (bq, bk)

    # mask out KV padding (static true length)
    col = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)      # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next

    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_tiles - 1)
    def _store():
        l = l_scr[...]
        o_ref[0, 0] = (acc_scr[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype)


def _flash_forward_tpu(q, k, v, sm_scale: float, block_q: int, block_k: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    pq = (-Sq) % block_q
    pk = (-Sk) % block_k
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    nq = (Sq + pq) // block_q
    nk = (Sk + pk) // block_k

    kernel = functools.partial(_flash_kernel, sm_scale=sm_scale, kv_tiles=nk,
                               kv_len=Sk, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, D), jnp.float32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(qp, kp, vp)
    return out[:, :, :Sq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, sm_scale, block_q, block_k):
    # backend choice is static at trace time
    if jax.default_backend() != "tpu":
        return _attention_reference(q, k, v, sm_scale)
    return _flash_forward_tpu(q, k, v, sm_scale, block_q, block_k)


def _fwd(q, k, v, sm_scale, block_q, block_k):
    return _flash_attention(q, k, v, sm_scale, block_q, block_k), (q, k, v)


def _bwd(sm_scale, block_q, block_k, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _attention_reference(a, b, c, sm_scale),
                     q, k, v)
    return vjp(g)


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, sm_scale: float | None = None,
                    block_q: int = 512, block_k: int = 1024):
    """Multi-head attention, shapes ``(B, H, S, D)`` → ``(B, H, Sq, D)``.

    Uses the Pallas TPU kernel when running on TPU, the fused-XLA reference
    otherwise. ``sm_scale`` defaults to 1/√D.
    """
    q = jnp.asarray(q)
    k = jnp.asarray(k)
    v = jnp.asarray(v)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    # small sequences: tiling overhead dominates — use the XLA path.
    # Defaults (512, 1024) measured best on v5e at S=8192 (37 TF/s; the
    # outer KV tile amortizes HBM reads, docs/PERF.md).
    if q.shape[2] < block_q or k.shape[2] < block_k:
        return _attention_reference(q, k, v, sm_scale)
    return _flash_attention(q, k, v, sm_scale, block_q, block_k)
