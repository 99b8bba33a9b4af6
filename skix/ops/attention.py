"""Flash attention for TPU (Pallas): fused forward AND backward kernels.

This is the TPU-native replacement for every attention path in the
reference stack (SURVEY.md §2.9): FlashAttention-3 custom ops
(sam3/perflib/fa3.py, image_edit/qwenimage/qwen_fa3_processor.py),
``F.scaled_dot_product_attention`` throughout VGGT
(vggt/vggt/layers/attention.py:61), SAM3 and SAM-3D-Body's FlashAttention
class (models/backbones/vit.py:238) — including the training path, which
the reference gets from FA3's fused backward.

Design (see /opt/skills/guides/boom_attention_tricks.md):

Forward
- grid ``(B, H, num_q_tiles, num_kv_major_tiles)`` — KV innermost so the
  f32 online-softmax statistics (m, l) and the output accumulator live in
  VMEM scratch across KV tiles;
- **two-level KV tiling**: the outer ``block_k_major`` tile sizes the HBM
  DMA; an inner unrolled loop over ``block_k`` sub-tiles sizes the MXU
  matmuls and bounds the f32 scores tile in VMEM;
- QKᵀ and P·V on the MXU with ``preferred_element_type=f32``; inputs may
  be bf16; softmax statistics always f32;
- static-shape padding to tile multiples with in-kernel iota masking;
- the forward optionally emits the log-sum-exp ``lse = m + log l`` as a
  residual for the backward.

Backward (the flash backward, not recompute-through-XLA)
- residuals are ``(q, k, v, o, lse)`` — the scores matrix is never stored;
- ``di = Σ_d o·do`` precomputed once in XLA, shared by both kernels;
- **dKV kernel**: grid ``(B, H, num_kv_tiles, num_q_tiles)``, dK/dV f32
  accumulators in VMEM across the inner Q sweep;
- **dQ kernel**: grid ``(B, H, num_q_tiles, num_kv_tiles)``, dQ
  accumulator in VMEM across the inner KV sweep;
- each tile recomputes ``p = exp(s − lse)`` from the residuals.

On non-TPU backends the XLA reference implementation is used
automatically; ``interpret=True`` forces the Pallas kernels through the
interpreter so CI exercises the kernel path off-chip (VERDICT r1 weak #2).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
_LANES = 128  # TPU lane width: per-row softmax stats are lane-replicated
_LOG2E = math.log2(math.e)  # exp(x) = exp2(x·log2e): exp2 is cheaper on
# the VPU, and the ·log2e folds into the Q pre-scale for free (FA2 trick).
# All in-kernel softmax statistics (m, lse residual) are BASE-2.


def _attention_reference(q, k, v, sm_scale: float, bias=None):
    """XLA attention in f32 statistics; shapes (B, H, S, D)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# --------------------------------------------------------------------------
# fused rotary embedding (rope) support
# --------------------------------------------------------------------------
def rotate_half_matrix(d: int, num_halves: int = 2) -> np.ndarray:
    """Static signed-permutation matrix R with ``x @ R == rotate_half(x)``
    applied independently within each of ``num_halves`` contiguous D
    segments (the VGGT 2D-rope convention: rotate-half per axis half,
    reference rope.py:129). On TPU the lane shuffle becomes one cheap
    64-deep MXU matmul inside the kernel instead of an XLA relayout."""
    assert d % num_halves == 0
    m = d // num_halves
    assert m % 2 == 0
    R = np.zeros((d, d), np.float32)
    for h in range(num_halves):
        o = h * m
        for j in range(m // 2):
            R[o + j + m // 2, o + j] = -1.0   # y[j]      = -x[j + m/2]
            R[o + j, o + j + m // 2] = 1.0    # y[m/2 + j] = x[j]
    return R


def interleaved_rotate_matrix(d: int) -> np.ndarray:
    """Signed permutation for the INTERLEAVED-pair rope convention
    (SAM3 ViT-Det, reference vitdet.py:68 apply_rotary_enc):
    ``y[2i] = -x[2i+1], y[2i+1] = x[2i]`` as ``x @ R``."""
    assert d % 2 == 0
    R = np.zeros((d, d), np.float32)
    for i in range(d // 2):
        R[2 * i + 1, 2 * i] = -1.0
        R[2 * i, 2 * i + 1] = 1.0
    return R


def segmented_rotate_half_matrix(d: int, segments) -> np.ndarray:
    """Rotate-half independently within contiguous segments of sizes
    ``segments`` (the MMDiT 3D-rope convention: one segment per (t, y, x)
    axis); features past ``sum(segments)`` are untouched (their table
    rows carry sin = 0, so the zero R block is never felt)."""
    R = np.zeros((d, d), np.float32)
    o = 0
    for m in segments:
        assert m % 2 == 0 and o + m <= d
        for j in range(m // 2):
            R[o + j + m // 2, o + j] = -1.0
            R[o + j, o + j + m // 2] = 1.0
        o += m
    return R


def _rot_matrix(d: int, style) -> np.ndarray:
    if style == "half":
        return rotate_half_matrix(d)
    if style == "interleaved":
        return interleaved_rotate_matrix(d)
    if isinstance(style, tuple) and style and style[0] == "segments":
        return segmented_rotate_half_matrix(d, style[1])
    raise ValueError(f"unknown rope_rotate style: {style}")


def interleaved_rope_tables(angles):
    """Per-pair angles (N, D/2) → full-width (cos, sin) tables (N, D)
    for the interleaved convention: each pair shares its angle."""
    cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
    return cos, sin


def rope_3d_tables(pos, d: int, axes_dim, base_freq: float = 10000.0):
    """Full-width cos/sin tables for the 3D rope (skix.models.mmdit
    rope_3d convention): ``pos (N, 3)`` (t, y, x) coords; segment ``i`` of
    width ``axes_dim[i]`` rotates with axis ``i``'s positions (rotate-half
    within the segment, matching ``_rope_1d``); any tail features stay
    untouched (cos = 1, sin = 0). Use with
    ``rope_rotate=("segments", tuple(axes_dim))``."""
    parts_c, parts_s = [], []
    for ax, m in enumerate(axes_dim):
        exponents = jnp.arange(0, m, 2, dtype=jnp.float32) / m
        inv_freq = 1.0 / (base_freq ** exponents)      # (m/2,)
        ang = pos[..., ax:ax + 1].astype(jnp.float32) * inv_freq
        ang = jnp.concatenate([ang, ang], axis=-1)     # (N, m)
        parts_c.append(jnp.cos(ang))
        parts_s.append(jnp.sin(ang))
    tail = d - sum(axes_dim)
    if tail:
        N = pos.shape[0]
        parts_c.append(jnp.ones((N, tail)))
        parts_s.append(jnp.zeros((N, tail)))
    return (jnp.concatenate(parts_c, axis=-1),
            jnp.concatenate(parts_s, axis=-1))


def rope_2d_tables(pos, d: int, base_freq: float):
    """Full-width cos/sin tables for the 2D rope (skix.models.layers
    rope_2d convention): ``pos (N, 2)`` integer (y, x) coords →
    ``(cos, sin)`` each (N, d); the first d/2 features carry the y
    rotation, the second the x rotation. ``x∘cos + (x@R)∘sin`` with
    ``R = rotate_half_matrix(d)`` equals ``rope_2d(x, pos)`` exactly."""
    half = d // 2
    exponents = jnp.arange(0, half, 2, dtype=jnp.float32) / half
    inv_freq = 1.0 / (base_freq ** exponents)          # (d/4,)
    ay = pos[..., 0:1].astype(jnp.float32) * inv_freq  # (N, d/4)
    ax = pos[..., 1:2].astype(jnp.float32) * inv_freq
    angles = jnp.concatenate([ay, ay, ax, ax], axis=-1)  # (N, d)
    return jnp.cos(angles), jnp.sin(angles)


def _apply_rope_tables(x, cos, sin, R):
    """XLA-level rope via the matmul trick (fallback + backward path);
    ``x (B, H, S, D)``, tables ``(S, D)``."""
    xr = jnp.einsum("bhsd,de->bhse", x.astype(jnp.float32), R)
    out = (x.astype(jnp.float32) * cos[None, None] + xr * sin[None, None])
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------
def _fwd_kernel(q_ref, k_ref, v_ref, *refs,
                sm_scale: float, kv_tiles: int, kv_len: int,
                block_k_major: int, block_k: int, needs_mask: bool,
                fixed_max: float | None = None, with_rope: bool = False,
                save_residuals: bool = True,
                lsum_col: int | None = None):
    """One (q-tile × kv-major-tile) step of online-softmax accumulation,
    sub-tiled over ``block_k`` chunks for the MXU.

    ``sm_scale`` is folded into Q once per tile (saves a full (bq, bk)
    multiply per KV step); the padding mask is elided entirely at trace
    time when S divides the tile (``needs_mask=False``) — both measured
    wins on v5e. ``with_rope``: extra (cos, sin, R) operands apply the
    rotary embedding to the q/k tiles IN-KERNEL — the lane shuffle runs
    as one 64-deep MXU matmul (``x @ R``) on VMEM tiles instead of XLA
    relayout copies (measured ~12 ms/pair on VGGT-1B).
    """
    from jax.experimental import pallas as pl

    # unpack the variadic refs: [cosq, sinq, cosk, sink, R]? (rope) +
    # outputs + scratch
    idx = 0
    if with_rope:
        cosq_ref, sinq_ref, cosk_ref, sink_ref, r_ref = refs[idx:idx + 5]
        idx += 5
    o_ref = refs[idx]
    idx += 1
    lse_ref = refs[idx] if save_residuals else None
    idx += 1 if save_residuals else 0
    m_scr, l_scr, acc_scr = refs[idx:idx + 3]

    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_raw = q_ref[0, 0]
    if with_rope:
        R = r_ref[...].astype(q_raw.dtype)
        qrot = jax.lax.dot(q_raw, R, preferred_element_type=jnp.float32)
        q32 = (q_raw.astype(jnp.float32) * cosq_ref[...]
               + qrot * sinq_ref[...])
        q = (q32 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
    else:
        q = (q_raw.astype(jnp.float32)
             * (sm_scale * _LOG2E)).astype(q_raw.dtype)

    for sub in range(block_k_major // block_k):
        if block_k == block_k_major:
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            if with_rope:
                kc, ks = cosk_ref[...], sink_ref[...]
        else:
            k = k_ref[0, 0, sub * block_k:(sub + 1) * block_k, :]
            v = v_ref[0, 0, sub * block_k:(sub + 1) * block_k, :]
            if with_rope:
                kc = cosk_ref[sub * block_k:(sub + 1) * block_k, :]
                ks = sink_ref[sub * block_k:(sub + 1) * block_k, :]
        if with_rope:
            krot = jax.lax.dot(k, R, preferred_element_type=jnp.float32)
            k = (k.astype(jnp.float32) * kc + krot * ks).astype(k.dtype)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, bk)

        if needs_mask:  # static: only when KV padding exists
            col = (kv_idx * block_k_major + sub * block_k
                   + jax.lax.broadcasted_iota(jnp.int32, s.shape,
                                              dimension=1))
            s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)

        if fixed_max is not None:
            # softmax is exactly shift-invariant: with a static bound on
            # the logits (qk-normed models) the online-max bookkeeping —
            # a full (bq, bk) lane reduction + compare + two rescales per
            # KV step — is pure overhead. Over/underflow-safe as long as
            # |s − M| < 126 in base-2.
            p = jnp.exp2(s - fixed_max * _LOG2E)
            if lsum_col is None:
                l_scr[...] += jnp.sum(p, axis=1, keepdims=True)
            # else: V carries a ones column at lsum_col — Σp accumulates
            # inside the same MXU matmul, no VPU reduction at all
            acc_scr[...] += jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        else:
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)      # (bq, 1)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_next
            l_scr[...] = l_next

            acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_tiles - 1)
    def _store():
        if lsum_col is None:
            l = l_scr[...]
            acc = acc_scr[...]
        else:
            l = acc_scr[:, lsum_col:lsum_col + 1]
            acc = acc_scr[:, :o_ref.shape[-1]]
        o_ref[0, 0] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype)
        if lse_ref is not None:
            if fixed_max is not None:
                m = jnp.full_like(l, fixed_max * _LOG2E)
            else:
                m = m_scr[...]
            lse = jnp.where(l > 0.0, m + jnp.log2(l), 0.0)  # (bq, 1) base-2
            # lane-replicated (block_q, LANES) layout — scalar-per-row
            # stats must tile as (8, 128) on TPU
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


# single-tile fast path: heads per grid cell (0 disables the path; the
# window A/B bench sweeps it). 8 measured best on v5e — see docs/PERF.md.
SINGLE_TILE_HEAD_GROUP = 8


def _fwd_kernel_single_tile(q_ref, k_ref, v_ref, *refs, sm_scale: float,
                            heads_per_cell: int, with_rope: bool,
                            save_residuals: bool,
                            fixed_max: float | None):
    """Whole-sequence-in-one-tile forward, G heads per grid cell.

    The generic kernel at the ViT-Det window shape (9 windows × 16 heads
    × 576 tokens) runs a 144-cell grid where each cell does one tiny
    (576, 64) attention — per-cell DMA waits and prologues dominate
    (measured 6.4 TF/s). Batching G heads into one cell amortizes them
    and lets the pipeline overlap bigger DMAs with compute. Softmax is
    EXACT single-pass here (no online bookkeeping): the whole score row
    is in VMEM."""
    idx = 0
    if with_rope:
        cos_ref, sin_ref, r_ref = refs[idx:idx + 3]
        idx += 3
    o_ref = refs[idx]
    idx += 1
    lse_ref = refs[idx] if save_residuals else None

    for g in range(heads_per_cell):
        q_raw = q_ref[0, g]
        k_raw = k_ref[0, g]
        v = v_ref[0, g]
        if with_rope:
            R = r_ref[...].astype(q_raw.dtype)
            cos = cos_ref[...]
            sin = sin_ref[...]
            qrot = jax.lax.dot(q_raw, R,
                               preferred_element_type=jnp.float32)
            q32 = q_raw.astype(jnp.float32) * cos + qrot * sin
            q = (q32 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
            krot = jax.lax.dot(k_raw, R,
                               preferred_element_type=jnp.float32)
            k = (k_raw.astype(jnp.float32) * cos
                 + krot * sin).astype(k_raw.dtype)
        else:
            q = (q_raw.astype(jnp.float32)
                 * (sm_scale * _LOG2E)).astype(q_raw.dtype)
            k = k_raw
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if fixed_max is not None:
            m = jnp.full((s.shape[0], 1), fixed_max * _LOG2E, jnp.float32)
        else:
            m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        o_ref[0, g] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype)
        if lse_ref is not None:
            lse = jnp.where(l > 0.0, m + jnp.log2(l), 0.0)
            lse_ref[0, g] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_forward_single_tile(q, k, v, sm_scale: float, interpret: bool,
                               save_residuals: bool, fixed_max,
                               rope_cos, rope_sin, rope_rotate: str,
                               head_group: int):
    """pallas_call wrapper for :func:`_fwd_kernel_single_tile`; caller
    guarantees Sq == Sk == one tile (no padding, no mask)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    G = head_group
    with_rope = rope_cos is not None
    if with_rope:
        assert Sq == Sk, "fused rope expects self-attention layouts"
    kernel = functools.partial(
        _fwd_kernel_single_tile, sm_scale=sm_scale, heads_per_cell=G,
        with_rope=with_rope, save_residuals=save_residuals,
        fixed_max=fixed_max)
    operands = [q, k, v]
    in_specs = [
        pl.BlockSpec((1, G, Sq, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, G, Sk, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, G, Sk, D), lambda b, h: (b, h, 0, 0)),
    ]
    if with_rope:
        R = jnp.asarray(_rot_matrix(D, rope_rotate))
        operands += [rope_cos.astype(jnp.float32),
                     rope_sin.astype(jnp.float32), R]
        in_specs += [pl.BlockSpec((Sq, D), lambda b, h: (0, 0)),
                     pl.BlockSpec((Sq, D), lambda b, h: (0, 0)),
                     pl.BlockSpec((D, D), lambda b, h: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [pl.BlockSpec((1, G, Sq, D), lambda b, h: (b, h, 0, 0))]
    if save_residuals:
        out_shape.append(
            jax.ShapeDtypeStruct((B, H, Sq, _LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, G, Sq, _LANES), lambda b, h: (b, h, 0, 0)))
    outs = pl.pallas_call(
        kernel,
        grid=(B, H // G),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*operands)
    if save_residuals:
        return outs[0], outs[1]
    return outs[0]


def _flash_forward(q, k, v, sm_scale: float, block_q: int,
                   block_k_major: int, block_k: int, interpret: bool,
                   save_residuals: bool, fixed_max: float | None = None,
                   rope_cos=None, rope_sin=None,
                   rope_rotate: str = "half", mxu_lsum: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    with_rope = rope_cos is not None
    # MXU l-sum (fixed-max only): append a ones column to V at lane D so
    # the softmax partition Σp rides the p·V matmul — output lanes ≤ 128
    # cost the same MXU pass, and the per-step (bq, bk) VPU lane
    # reduction disappears (the last reduction fixed-max mode still had).
    lsum = bool(mxu_lsum) and fixed_max is not None and D < _LANES
    block_q = min(block_q, _round_up(Sq, 8))
    block_k_major = min(block_k_major, _round_up(Sk, 8))
    block_k = min(block_k, block_k_major)
    # inner loop requires block_k | block_k_major
    block_k_major = (block_k_major // block_k) * block_k
    pq = (-Sq) % block_q
    pk = (-Sk) % block_k_major
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    if lsum:
        # ones at lane D (padded KV rows too — their p is exactly 0
        # through the padding mask), zeros beyond
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, 0), (0, _LANES - D)))
        vp = vp.at[..., D].set(jnp.asarray(1.0, vp.dtype))
    nq = (Sq + pq) // block_q
    nk = (Sk + pk) // block_k_major

    # single-tile fast path: the whole sequence fits one tile with no
    # padding — run the exact-softmax kernel with G heads per grid cell
    # (the generic kernel's per-cell overheads dominate at this scale:
    # 54.4 → 47.2 ms/frame on the ViT-Det window blocks at G=8)
    if (SINGLE_TILE_HEAD_GROUP and nq == 1 and nk == 1 and pq == 0
            and pk == 0 and not lsum):
        G = math.gcd(H, SINGLE_TILE_HEAD_GROUP)
        # scoped VMEM is 16 MB and Mosaic does NOT reuse the unrolled
        # loop's buffers across heads: the f32 score tile and the rope
        # intermediates are live PER HEAD, and the q/k/v blocks are
        # double-buffered across grid cells. Halve G until the modeled
        # footprint fits (measured: the 9×16×576×64 window shape inside
        # the fused masklet program needs 17.07 MB at G=8 — the model
        # gives 16.5 MB — and compiles at G=4)
        isz = jnp.dtype(q.dtype).itemsize

        def cell_bytes(g):
            qkv = 2 * g * (Sq + 2 * Sk) * D * isz        # double-buffered
            out = 2 * g * Sq * D * 4                     # o + f32 acc
            res = 2 * g * Sq * _LANES * 4 if save_residuals else 0
            scores = g * Sq * Sk * 4                     # per-head, live
            rope = 4 * g * Sq * D * 4 if with_rope else 0
            return qkv + out + res + scores + rope

        while G > 1 and cell_bytes(G) > 14 * 2 ** 20:
            G //= 2
        return _flash_forward_single_tile(
            q, k, v, sm_scale, interpret, save_residuals, fixed_max,
            rope_cos, rope_sin, rope_rotate, G)

    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, kv_tiles=nk, kv_len=Sk,
        block_k_major=block_k_major, block_k=block_k, needs_mask=pk > 0,
        fixed_max=fixed_max, with_rope=with_rope,
        save_residuals=save_residuals, lsum_col=D if lsum else None)

    Dv = _LANES if lsum else D
    operands = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_k_major, D),
                     lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_k_major, Dv),
                     lambda b, h, i, j: (b, h, j, 0)),
    ]
    if with_rope:
        assert Sq == Sk, "fused rope expects self-attention layouts"
        # q and k tables pad to THEIR OWN tile multiples (pq vs pk):
        # with block_q != block_k_major the K BlockSpec indexes
        # nk·block_k_major rows — padding with pq would read past the end
        cq = jnp.pad(rope_cos.astype(jnp.float32), ((0, pq), (0, 0)))
        sq = jnp.pad(rope_sin.astype(jnp.float32), ((0, pq), (0, 0)))
        ck = jnp.pad(rope_cos.astype(jnp.float32), ((0, pk), (0, 0)))
        sk = jnp.pad(rope_sin.astype(jnp.float32), ((0, pk), (0, 0)))
        R = jnp.asarray(_rot_matrix(D, rope_rotate))
        operands += [cq, sq, ck, sk, R]
        in_specs += [
            pl.BlockSpec((block_q, D), lambda b, h, i, j: (i, 0)),
            pl.BlockSpec((block_q, D), lambda b, h, i, j: (i, 0)),
            pl.BlockSpec((block_k_major, D), lambda b, h, i, j: (j, 0)),
            pl.BlockSpec((block_k_major, D), lambda b, h, i, j: (j, 0)),
            pl.BlockSpec((D, D), lambda b, h, i, j: (0, 0)),
        ]

    out_shape = [jax.ShapeDtypeStruct(qp.shape, q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, D),
                              lambda b, h, i, j: (b, h, i, 0))]
    if save_residuals:
        out_shape.append(jax.ShapeDtypeStruct((B, H, Sq + pq, _LANES),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, block_q, _LANES),
                                      lambda b, h, i, j: (b, h, i, 0)))

    outs = pl.pallas_call(
        kernel,
        grid=(B, H, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, Dv), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    o = outs[0][:, :, :Sq, :]
    if save_residuals:
        return o, outs[1]  # lse kept PADDED (bwd kernels slice themselves)
    return o


# --------------------------------------------------------------------------
# backward kernels
# --------------------------------------------------------------------------
def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, *refs,
                    sm_scale: float, q_tiles: int, kv_len: int,
                    block_k: int, needs_mask: bool,
                    with_rope: bool = False):
    from jax.experimental import pallas as pl

    idx = 0
    if with_rope:
        cosq_ref, sinq_ref, cosk_ref, sink_ref, r_ref = refs[idx:idx + 5]
        idx += 5
    dk_ref, dv_ref, dk_scr, dv_scr = refs[idx:idx + 4]

    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]                 # (bq, d) — unscaled, used for dK
    k = k_ref[0, 0]                 # (bk, d)
    v = v_ref[0, 0]
    do = do_ref[0, 0]               # (bq, d)
    lse = lse_ref[0, 0][:, :1]      # (bq, 1) f32 (lane-replicated input)
    di = di_ref[0, 0][:, :1]        # (bq, 1) f32

    if with_rope:
        R = r_ref[...].astype(q.dtype)
        q = (q.astype(jnp.float32) * cosq_ref[...]
             + jax.lax.dot(q, R, preferred_element_type=jnp.float32)
             * sinq_ref[...]).astype(q.dtype)
        k = (k.astype(jnp.float32) * cosk_ref[...]
             + jax.lax.dot(k, R, preferred_element_type=jnp.float32)
             * sink_ref[...]).astype(k.dtype)

    qs = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # base-2
    if needs_mask:
        col = (kv_idx * block_k
               + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1))
        s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp2(s - lse)                                    # (bq, bk) f32

    # dV += Pᵀ dO
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # dP = dO Vᵀ ; dŜ = P ⊙ (dP − di) ; dK += dŜᵀ Q  (·scale at store)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - di)).astype(q.dtype)
    dk_scr[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q_idx == q_tiles - 1)
    def _store():
        dkr = dk_scr[...] * sm_scale
        if with_rope:
            # gradient through the orthogonal rope map (Rᵀ = −R):
            # dk = dkr∘cos − (dkr@R)∘sin, fused at store time
            R32 = r_ref[...]
            dkr = (dkr * cosk_ref[...]
                   - jax.lax.dot(dkr.astype(jnp.float32), R32,
                                 preferred_element_type=jnp.float32)
                   * sink_ref[...])
        dk_ref[0, 0] = dkr.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, *refs,
                   sm_scale: float, kv_tiles: int,
                   kv_len: int, block_k: int, needs_mask: bool,
                   with_rope: bool = False):
    from jax.experimental import pallas as pl

    idx = 0
    if with_rope:
        cosq_ref, sinq_ref, cosk_ref, sink_ref, r_ref = refs[idx:idx + 5]
        idx += 5
    dq_ref, dq_scr = refs[idx:idx + 2]

    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]

    if with_rope:
        R = r_ref[...].astype(q.dtype)
        q = (q.astype(jnp.float32) * cosq_ref[...]
             + jax.lax.dot(q, R, preferred_element_type=jnp.float32)
             * sinq_ref[...]).astype(q.dtype)
        k = (k.astype(jnp.float32) * cosk_ref[...]
             + jax.lax.dot(k, R, preferred_element_type=jnp.float32)
             * sink_ref[...]).astype(k.dtype)

    qs = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # base-2
    if needs_mask:
        col = (kv_idx * block_k
               + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1))
        s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp2(s - lse)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - di)).astype(k.dtype)
    dq_scr[...] += jax.lax.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_tiles - 1)
    def _store():
        dqr = dq_scr[...] * sm_scale
        if with_rope:
            R32 = r_ref[...]
            dqr = (dqr * cosq_ref[...]
                   - jax.lax.dot(dqr.astype(jnp.float32), R32,
                                 preferred_element_type=jnp.float32)
                   * sinq_ref[...])
        dq_ref[0, 0] = dqr.astype(dq_ref.dtype)


def _bwd_kernel_single_tile(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                            *refs, sm_scale: float, heads_per_cell: int,
                            with_rope: bool):
    """Combined dQ/dK/dV for the whole-sequence-in-one-tile case: every
    operand tile is VMEM-resident, so one exact pass replaces the two
    generic kernels (whose 512-capped tiles pad the 576-token window
    blocks to 1024 — 4× wasted score work, twice)."""
    idx = 0
    if with_rope:
        cos_ref, sin_ref, r_ref = refs[idx:idx + 3]
        idx += 3
    dq_ref, dk_ref, dv_ref = refs[idx:idx + 3]

    for g in range(heads_per_cell):
        q_raw = q_ref[0, g]
        k_raw = k_ref[0, g]
        v = v_ref[0, g]
        do = do_ref[0, g]
        lse = lse_ref[0, g][:, :1]       # (Sq, 1) f32, lane-replicated in
        di = di_ref[0, g][:, :1]
        if with_rope:
            R = r_ref[...].astype(q_raw.dtype)
            cos = cos_ref[...]
            sin = sin_ref[...]
            q = (q_raw.astype(jnp.float32) * cos
                 + jax.lax.dot(q_raw, R, preferred_element_type=jnp.float32)
                 * sin).astype(q_raw.dtype)
            k = (k_raw.astype(jnp.float32) * cos
                 + jax.lax.dot(k_raw, R, preferred_element_type=jnp.float32)
                 * sin).astype(k_raw.dtype)
        else:
            q, k = q_raw, k_raw
        qs = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(s - lse)                               # (Sq, Sk) f32
        # dV = Pᵀ dO
        dv = jax.lax.dot_general(p.astype(do.dtype), do,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dP = dO Vᵀ ; dŜ = P ⊙ (dP − di)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - di)).astype(q.dtype)
        dqr = jax.lax.dot(ds, k,
                          preferred_element_type=jnp.float32) * sm_scale
        dkr = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) \
            * sm_scale
        if with_rope:
            # un-rotate through the orthogonal rope map (Rᵀ = −R)
            R32 = r_ref[...]
            dqr = (dqr * cos
                   - jax.lax.dot(dqr.astype(jnp.float32), R32,
                                 preferred_element_type=jnp.float32) * sin)
            dkr = (dkr * cos
                   - jax.lax.dot(dkr.astype(jnp.float32), R32,
                                 preferred_element_type=jnp.float32) * sin)
        dq_ref[0, g] = dqr.astype(dq_ref.dtype)
        dk_ref[0, g] = dkr.astype(dk_ref.dtype)
        dv_ref[0, g] = dv.astype(dv_ref.dtype)


def _flash_backward_single_tile(q, k, v, lse, di, g_out, sm_scale: float,
                                interpret: bool, rope_cos, rope_sin,
                                rope_rotate: str, head_group: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    G = head_group
    with_rope = rope_cos is not None
    dip = jnp.broadcast_to(di[..., None], (*di.shape, _LANES))
    kernel = functools.partial(
        _bwd_kernel_single_tile, sm_scale=sm_scale, heads_per_cell=G,
        with_rope=with_rope)
    operands = [q, k, v, g_out, lse, dip]
    in_specs = [
        pl.BlockSpec((1, G, Sq, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, G, Sk, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, G, Sk, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, G, Sq, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, G, Sq, _LANES), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, G, Sq, _LANES), lambda b, h: (b, h, 0, 0)),
    ]
    if with_rope:
        R = jnp.asarray(_rot_matrix(D, rope_rotate))
        operands += [rope_cos.astype(jnp.float32),
                     rope_sin.astype(jnp.float32), R]
        in_specs += [pl.BlockSpec((Sq, D), lambda b, h: (0, 0)),
                     pl.BlockSpec((Sq, D), lambda b, h: (0, 0)),
                     pl.BlockSpec((D, D), lambda b, h: (0, 0))]
    outs = pl.pallas_call(
        kernel,
        grid=(B, H // G),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, G, Sq, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, G, Sk, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, G, Sk, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*operands)
    return outs[0], outs[1], outs[2]


def _flash_backward(q, k, v, o, lse_padded, g, sm_scale: float,
                    block_q: int, block_k: int, interpret: bool,
                    rope_cos=None, rope_sin=None,
                    rope_rotate="half"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    with_rope = rope_cos is not None
    block_q = min(block_q, _round_up(Sq, 8))
    block_k = min(block_k, _round_up(Sk, 8))
    pq = (-Sq) % block_q
    pk = (-Sk) % block_k
    nq = (Sq + pq) // block_q
    nk = (Sk + pk) // block_k

    # di = Σ_d o · do, once, shared by both kernels (f32)
    di = jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)

    # single-tile fast path: the whole sequence fits one VMEM-budgeted
    # tile — one combined dQ/dK/dV kernel replaces the two generic ones
    # (whose 512-capped blocks pad a 576-token window to 1024: 4× score
    # work, twice). Eligibility is independent of the caller's block cap.
    if SINGLE_TILE_HEAD_GROUP and Sq % 8 == 0 and Sk % 8 == 0:
        G = math.gcd(H, SINGLE_TILE_HEAD_GROUP)
        isz = jnp.dtype(q.dtype).itemsize

        def cell_bytes(gh):
            blocks = 2 * gh * 2 * (Sq + Sk) * D * isz   # q,do,k,v dbl-buf
            outs = 2 * gh * (Sq + 2 * Sk) * D * 4
            scores = 3 * gh * Sq * Sk * 4               # p, dp, ds live
            stats = 4 * gh * Sq * _LANES * 4            # lse + di blocks
            rope = 6 * gh * Sq * D * 4 if with_rope else 0
            return blocks + outs + scores + stats + rope

        while G > 1 and cell_bytes(G) > 14 * 2 ** 20:
            G //= 2
        if cell_bytes(G) <= 14 * 2 ** 20:
            return _flash_backward_single_tile(
                q, k, v, lse_padded[:, :, :Sq, :], di, g, sm_scale,
                interpret, rope_cos, rope_sin, rope_rotate, G)

    pad_q = ((0, 0), (0, 0), (0, pq), (0, 0))
    pad_k = ((0, 0), (0, 0), (0, pk), (0, 0))
    qp = jnp.pad(q, pad_q)
    kp = jnp.pad(k, pad_k)
    vp = jnp.pad(v, pad_k)
    gp = jnp.pad(g, pad_q)
    # lane-replicated (B, H, Sqp, LANES) f32 row stats. Padded q rows get
    # lse=+big so p = exp(s − lse) underflows to exactly 0 (their do is
    # also zero-padded, so dk/dv take no contribution either way).
    dip = jnp.pad(jnp.broadcast_to(di[..., None], (*di.shape, _LANES)),
                  ((0, 0), (0, 0), (0, pq), (0, 0)))
    # lse arrives padded to the FORWARD block_q multiple; re-pad for bwd
    lse = lse_padded[:, :, :Sq, :]
    lsep = jnp.pad(lse, ((0, 0), (0, 0), (0, pq), (0, 0)),
                   constant_values=1e9)

    rope_ops_kv, rope_ops_q = [], []
    rope_specs_kv, rope_specs_q = [], []
    if with_rope:
        cq = jnp.pad(rope_cos.astype(jnp.float32), ((0, pq), (0, 0)))
        sq = jnp.pad(rope_sin.astype(jnp.float32), ((0, pq), (0, 0)))
        ck = jnp.pad(rope_cos.astype(jnp.float32), ((0, pk), (0, 0)))
        sk = jnp.pad(rope_sin.astype(jnp.float32), ((0, pk), (0, 0)))
        R = jnp.asarray(_rot_matrix(D, rope_rotate))
        rope_ops_kv = [cq, sq, ck, sk, R]
        rope_ops_q = [cq, sq, ck, sk, R]
        r_spec = pl.BlockSpec((D, D), lambda b, h, i, j: (0, 0))
        # dkv grid: q tiles indexed by j, kv tiles by i
        rope_specs_kv = [
            pl.BlockSpec((block_q, D), lambda b, h, i, j: (j, 0)),
            pl.BlockSpec((block_q, D), lambda b, h, i, j: (j, 0)),
            pl.BlockSpec((block_k, D), lambda b, h, i, j: (i, 0)),
            pl.BlockSpec((block_k, D), lambda b, h, i, j: (i, 0)),
            r_spec,
        ]
        # dq grid: q tiles indexed by i, kv tiles by j
        rope_specs_q = [
            pl.BlockSpec((block_q, D), lambda b, h, i, j: (i, 0)),
            pl.BlockSpec((block_q, D), lambda b, h, i, j: (i, 0)),
            pl.BlockSpec((block_k, D), lambda b, h, i, j: (j, 0)),
            pl.BlockSpec((block_k, D), lambda b, h, i, j: (j, 0)),
            r_spec,
        ]

    q_spec = pl.BlockSpec((1, 1, block_q, D),
                          lambda b, h, i, j: (b, h, j, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, D),
                           lambda b, h, i, j: (b, h, i, 0))
    vec_q_spec = pl.BlockSpec((1, 1, block_q, _LANES),
                              lambda b, h, i, j: (b, h, j, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, q_tiles=nq,
                          kv_len=Sk, block_k=block_k, needs_mask=pk > 0,
                          with_rope=with_rope),
        grid=(B, H, nk, nq),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, vec_q_spec,
                  vec_q_spec] + rope_specs_kv,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(kp.shape, k.dtype),
            jax.ShapeDtypeStruct(vp.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, lsep, dip, *rope_ops_kv)

    q_spec2 = pl.BlockSpec((1, 1, block_q, D),
                           lambda b, h, i, j: (b, h, i, 0))
    kv_spec2 = pl.BlockSpec((1, 1, block_k, D),
                            lambda b, h, i, j: (b, h, j, 0))
    vec_q_spec2 = pl.BlockSpec((1, 1, block_q, _LANES),
                               lambda b, h, i, j: (b, h, i, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, kv_tiles=nk,
                          kv_len=Sk, block_k=block_k, needs_mask=pk > 0,
                          with_rope=with_rope),
        grid=(B, H, nq, nk),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, vec_q_spec2,
                  vec_q_spec2] + rope_specs_q,
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, lsep, dip, *rope_ops_q)

    return dq[:, :, :Sq, :], dk[:, :, :Sk, :], dv[:, :, :Sk, :]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# custom-vjp wrapper + public API
# --------------------------------------------------------------------------
@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _flash_attention(q, k, v, rope_cos, rope_sin, sm_scale, block_q,
                     block_k_major, block_k, interpret, fixed_max,
                     rope_rotate, mxu_lsum):
    with_rope = rope_cos is not None
    if not (interpret or jax.default_backend() == "tpu"):
        if with_rope:
            R = jnp.asarray(_rot_matrix(q.shape[-1], rope_rotate))
            q = _apply_rope_tables(q, rope_cos, rope_sin, R)
            k = _apply_rope_tables(k, rope_cos, rope_sin, R)
        return _attention_reference(q, k, v, sm_scale)
    return _flash_forward(q, k, v, sm_scale, block_q, block_k_major,
                          block_k, interpret, save_residuals=False,
                          fixed_max=fixed_max, rope_cos=rope_cos,
                          rope_sin=rope_sin, rope_rotate=rope_rotate,
                          mxu_lsum=mxu_lsum)


def _fwd(q, k, v, rope_cos, rope_sin, sm_scale, block_q, block_k_major,
         block_k, interpret, fixed_max, rope_rotate, mxu_lsum):
    with_rope = rope_cos is not None
    if not (interpret or jax.default_backend() == "tpu"):
        o = _flash_attention(q, k, v, rope_cos, rope_sin, sm_scale,
                             block_q, block_k_major, block_k, interpret,
                             fixed_max, rope_rotate, mxu_lsum)
        return o, (q, k, v, None, None, rope_cos, rope_sin)
    o, lse = _flash_forward(q, k, v, sm_scale, block_q, block_k_major,
                            block_k, interpret, save_residuals=True,
                            fixed_max=fixed_max, rope_cos=rope_cos,
                            rope_sin=rope_sin, rope_rotate=rope_rotate,
                            mxu_lsum=mxu_lsum)
    return o, (q, k, v, o, lse, rope_cos, rope_sin)


def _bwd(sm_scale, block_q, block_k_major, block_k, interpret, fixed_max,
         rope_rotate, mxu_lsum, res, g):
    q, k, v, o, lse, rope_cos, rope_sin = res
    with_rope = rope_cos is not None
    # rope tables are non-differentiable constants BY CONVENTION (see the
    # flash_attention docstring): hard-zero cotangents on both paths, so
    # differentiating through table construction yields zero, not garbage.
    zt = ((jnp.zeros_like(rope_cos), jnp.zeros_like(rope_sin))
          if with_rope else (None, None))
    if lse is None:  # non-TPU fallback: recompute through XLA
        def f(a, b, c):
            if with_rope:
                R = jnp.asarray(_rot_matrix(a.shape[-1], rope_rotate))
                a = _apply_rope_tables(a, rope_cos, rope_sin, R)
                b = _apply_rope_tables(b, rope_cos, rope_sin, R)
            return _attention_reference(a, b, c, sm_scale)

        _, vjp = jax.vjp(f, q, k, v)
        return (*vjp(g), *zt)
    # backward tiles: the dKV inner sweep holds (bq×bk) f32 scores plus two
    # f32 (bk, D) accumulators — cap both at 512 regardless of fwd tiling
    bq = min(block_q, 512)
    bk = min(block_k, 512)
    if with_rope:
        # rope + gradient un-rotation run INSIDE the backward kernels
        # (store-time epilogue; Rᵀ = −R for every supported convention)
        dq, dk, dv = _flash_backward(q, k, v, o, lse, g, sm_scale, bq, bk,
                                     interpret, rope_cos=rope_cos,
                                     rope_sin=rope_sin,
                                     rope_rotate=rope_rotate)
        return dq, dk, dv, *zt
    dq, dk, dv = _flash_backward(q, k, v, o, lse, g, sm_scale, bq, bk,
                                 interpret)
    return dq, dk, dv, None, None


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention_with_lse(q, k, v, sm_scale: float | None = None,
                             block_q: int = 1024, block_k_major: int = 1024,
                             block_k: int = 1024, interpret: bool = False):
    """Forward-only attention returning ``(out, lse)`` with
    ``lse[b,h,i] = log2(Σ_j exp(sm_scale·q_i·k_j))`` — the BASE-2
    log-partition the kernel already tracks for its backward.

    The partition function enables exact post-hoc renormalization — e.g.
    subtracting the closed-form softmax mass of constant padding tokens
    (memory_tracker's masked dense fast path). Forward-only: no custom
    VJP is wired for the lse output (the masked-correction use is
    inference)."""
    q = jnp.asarray(q)
    k = jnp.asarray(k)
    v = jnp.asarray(v)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    use_kernel = (interpret or jax.default_backend() == "tpu") \
        and q.shape[2] >= block_q and k.shape[2] >= block_k
    if not use_kernel:
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(s, -1)
        l = jnp.sum(jnp.exp(s - m[..., None]), -1)
        out = _attention_reference(q, k, v, sm_scale)
        return out, (m + jnp.log(l)) * _LOG2E
    o, lse = _flash_forward(q, k, v, sm_scale, block_q, block_k_major,
                            block_k, interpret, save_residuals=True)
    return o, lse[:, :, :q.shape[2], 0]


def flash_attention(q, k, v, sm_scale: float | None = None,
                    block_q: int = 1024, block_k_major: int = 1024,
                    block_k: int = 1024, interpret: bool = False,
                    fixed_max: float | None = None,
                    rope_cos=None, rope_sin=None,
                    rope_rotate: str = "half",
                    mxu_lsum: bool = False):
    """Multi-head attention, shapes ``(B, H, S, D)`` → ``(B, H, Sq, D)``.

    Uses the Pallas flash kernels (fwd + bwd) on TPU, the fused-XLA
    reference otherwise; ``interpret=True`` forces the Pallas path through
    the interpreter on any backend (used by CI). ``sm_scale`` defaults to
    1/√D. Block sizes: ``block_q × block_k_major`` tiles the HBM loads,
    ``block_k`` sub-tiles the MXU matmuls inside a major tile.

    ``rope_cos``/``rope_sin`` ((S, D), see :func:`rope_2d_tables`) fuse
    the rotary embedding of q AND k into the kernel: the rotate-half lane
    shuffle runs as a 64-deep MXU matmul on VMEM tiles instead of XLA
    relayout copies (self-attention layouts only, Sq == Sk).

    ``mxu_lsum`` (fixed-max mode, D < 128 only): append a ones column to
    V so the softmax partition Σp accumulates inside the p·V matmul —
    output lanes ≤ 128 cost the same MXU pass and the last remaining
    per-step VPU lane reduction disappears. Forward-path optimization;
    the backward is unchanged.

    ROPE TABLE INVARIANTS: (1) the sin table must be **pair-symmetric**
    under the chosen ``rope_rotate`` convention — ``sin[s, i] ==
    sin[s, partner(i)]`` for each rotation pair (true for every table
    built by :func:`rope_2d_tables` and friends). The TPU backward
    un-rotates gradients as ``dk∘cos − (dk@R)∘sin``, which equals the
    true VJP ``(dk∘sin)@Rᵀ`` only under that symmetry; a non-symmetric
    table gets a correct forward but a silently wrong TPU backward.
    (2) the tables are treated as **non-differentiable constants** —
    their cotangents are hard zeros (learned-frequency / continuous-
    position tables would need the table VJP added to ``_bwd``).
    """
    q = jnp.asarray(q)
    k = jnp.asarray(k)
    v = jnp.asarray(v)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    # small sequences: tiling overhead dominates — use the XLA path.
    if not interpret and (q.shape[2] < block_q or k.shape[2] < block_k):
        if rope_cos is not None:
            R = jnp.asarray(_rot_matrix(q.shape[-1], rope_rotate))
            q = _apply_rope_tables(q, rope_cos, rope_sin, R)
            k = _apply_rope_tables(k, rope_cos, rope_sin, R)
        return _attention_reference(q, k, v, sm_scale)
    if mxu_lsum and (fixed_max is None or q.shape[-1] >= _LANES):
        import warnings

        warnings.warn(
            "mxu_lsum requested but inapplicable (needs fixed_max set and "
            f"D < {_LANES}; got fixed_max={fixed_max}, D={q.shape[-1]}) — "
            "running the baseline kernel. A/B measurements would silently "
            "compare baseline against itself.", stacklevel=2)
    # wider Q tiles amortize K/V HBM reloads: measured +7% fwd at S=8192
    # (fixed-max, v5e — docs/PERF.md sweep). Applied only when the caller
    # left ALL tiling at defaults (an explicit sub-tiled block_k combined
    # with bq=2048 lands in the measured-loss regime) and Sq divides the
    # tile exactly, so shorter sequences keep the padding-free 1024.
    if (block_q == 1024 and block_k_major == 1024 and block_k == 1024
            and q.shape[2] % 2048 == 0):
        block_q = 2048
    # self-attention just past one tile: the default pads S to 2·1024
    # (S=1374 wastes 49% of the K tiles). Two even S-fitted tiles measured
    # fastest on v5e for both VGGT layouts (scripts/bench_vggt_blocks.py:
    # S=1374 2.26→1.91 ms, S=2748 2.24→2.11 ms; aggregator fwd 65→55
    # ms/pair). Score tile ≤ 1408² f32 ≈ 7.9 MB keeps VMEM safe. Only at
    # full defaults — explicit blocks are the caller's choice.
    elif (block_q == 1024 and block_k_major == 1024 and block_k == 1024
            and q.shape[2] == k.shape[2] and 1024 < q.shape[2] <= 2816):
        block_q = block_k_major = block_k = -(-((q.shape[2] + 1) // 2)
                                              // 8) * 8
    return _flash_attention(q, k, v, rope_cos, rope_sin, sm_scale, block_q,
                            block_k_major, block_k, interpret, fixed_max,
                            rope_rotate, mxu_lsum)
