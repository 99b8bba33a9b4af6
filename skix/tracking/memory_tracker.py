"""Mask-memory video tracker (SAM2-family), fixed-capacity ring memory.

Capability parity with the reference's tracker stack (SURVEY.md §2.8:
sam3_tracker_base.py mask-memory backbone, memory.py:19-158 memory
encoder/fuser, tracker transformer with memory cross-attention, SAM mask
decoder): per tracked object, a bank of encoded (frame-feature, mask)
memories conditions the current frame through cross-attention, producing
the object's mask and an occlusion/objectness score.

TPU-first: the memory bank is a **fixed-capacity ring buffer** (a
conditioning slot + N recent slots) carried through a ``lax.scan`` over
frames — the reference's dynamic per-object memory dicts become static
arrays; object slots batch/vmap and shard over a mesh axis.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from skix.models.layers import Mlp


class ImageEncoder(nn.Module):
    """Frame trunk → (H/stride, W/stride, C) features.

    ``trunk='conv'``: small conv pyramid (stride 8, smoke scale).
    ``trunk='vitdet'``: the windowed ViT-Det backbone shared with the
    detector — the reference's tracker uses the same visual trunk via
    SAM3VLBackbone (model_builder.py:448, backbone_stride 14)."""

    features: int = 64
    trunk: str = "conv"
    vit_embed_dim: int = 1024
    vit_depth: int = 32
    vit_heads: int = 16
    vit_window: int = 24
    vit_patch: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image):
        if self.trunk == "vitdet":
            from skix.tracking.vitdet import ViTDetBackbone

            h = ViTDetBackbone(
                patch_size=self.vit_patch, embed_dim=self.vit_embed_dim,
                depth=self.vit_depth, num_heads=self.vit_heads,
                window_size=self.vit_window, dtype=self.dtype,
                name="vitdet")((image - 0.5) / 0.5)
            return nn.Conv(self.features, (1, 1), name="proj")(h)
        h = image.astype(self.dtype)
        for i, (f, s) in enumerate([(self.features // 2, 2),
                                    (self.features, 2),
                                    (self.features, 2)]):
            h = nn.Conv(f, (3, 3), strides=(s, s), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f"norm_{i}")(h)
            h = nn.silu(h)
        return h.astype(jnp.float32)


class CXBlock(nn.Module):
    """ConvNeXt block (reference memory.py:83): depthwise 7×7 conv →
    per-token LayerNorm → 1×1 expand ×4 → GELU → 1×1 project →
    LayerScale → residual. Channels-last throughout (the torch version
    permutes; here it's the native layout)."""

    dim: int
    kernel_size: int = 7
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (self.kernel_size, self.kernel_size),
                    padding="SAME", feature_group_count=self.dim,
                    name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return x + gamma * h


class MaskDownSampler(nn.Module):
    """Progressive learned mask downsample (reference
    SimpleMaskDownSampler, memory.py:19): stride-4 convs with channel
    growth stride², per-token LN + GELU, final 1×1 to ``embed_dim``."""

    embed_dim: int = 64
    stride: int = 4
    total_stride: int = 4

    @nn.compact
    def __call__(self, m):
        import math

        num_layers = int(math.log2(self.total_stride)
                         // math.log2(self.stride))
        ch = 1
        for i in range(num_layers):
            ch = ch * self.stride ** 2
            m = nn.Conv(ch, (self.stride, self.stride),
                        strides=(self.stride, self.stride), padding="VALID",
                        name=f"conv_{i}")(m)
            m = nn.LayerNorm(epsilon=1e-6, name=f"norm_{i}")(m)
            m = nn.gelu(m, approximate=False)
        return nn.Conv(self.embed_dim, (1, 1), name="out")(m)


class MemoryEncoder(nn.Module):
    """(frame features, mask) → one memory feature map (reference
    SimpleMaskEncoder, memory.py:158): sigmoid mask → learned downsample
    → ADD to projected pixel features → CXBlock fuser → out proj. The
    mask logits arrive at feature resolution, so the learned downsample
    runs on a 4× upsampling of them (the reference downsamples from
    image resolution; total learned stride is the same)."""

    features: int = 64
    fuser_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, mask_logits):
        gh, gw = feats.shape[-3], feats.shape[-2]
        m = nn.sigmoid(mask_logits)[..., None]
        m = jax.image.resize(m, (*m.shape[:-3], gh * 4, gw * 4, 1),
                             "bilinear")
        m = MaskDownSampler(self.features, name="mask_downsampler")(m)
        h = nn.Conv(self.features, (1, 1), name="pix_feat_proj")(feats)
        h = h + m
        for i in range(self.fuser_layers):
            h = CXBlock(self.features, name=f"fuser_{i}")(h)
        return nn.Conv(self.features, (1, 1), name="out_proj")(h)


class _SlotCrossAttention(nn.Module):
    """Cross-attention of query tokens over per-slot memory tokens with an
    online-softmax ``lax.scan`` over slots — the full (Lq, M·L) score tensor
    is never materialized (at 64×64 features × 7 slots × 8 objects that
    tensor is ~30 GB; the per-slot transient is M× smaller). Slot validity
    makes masking exact: an invalid slot contributes zero probability mass.

    Parameter names (query/key/value/out DenseGenerals) match
    ``nn.MultiHeadDotProductAttention`` so existing checkpoints load
    unchanged."""

    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32
    # static fast path: treat the WHOLE bank as one flat KV sequence, run
    # the Pallas flash kernel (3.2× the slot-scan at 8 obj @512 px on
    # v5e, docs/PERF.md), then subtract the CLOSED-FORM softmax mass of
    # the invalid slots. Exact for any validity pattern because invalid
    # slots are all-zero memory: after the caller's LayerNorm every one
    # of their tokens is the same constant (the LN bias), so their keys/
    # values collapse to one (k0, v0) whose total mass is
    # n_invalid·exp(q·k0). Requires ``pad_tok`` (the LN'd zero token).
    # Inference-only (the lse output carries no VJP).
    dense: bool = False

    @nn.compact
    def __call__(self, q_in, mem, slot_valid, pad_tok=None):
        """``q_in (B, Lq, C)``; ``mem (B, M, L, C)``; ``slot_valid (B, M)``
        bool; ``pad_tok (C,)`` the caller's LayerNorm of the zero vector
        (dense path only). Returns ``(B, Lq, C)``."""
        C = q_in.shape[-1]
        H, hd = self.num_heads, C // self.num_heads
        key_proj = nn.DenseGeneral((H, hd), dtype=self.dtype, name="key")
        val_proj = nn.DenseGeneral((H, hd), dtype=self.dtype, name="value")
        q = nn.DenseGeneral((H, hd), dtype=self.dtype, name="query")(q_in)
        k = key_proj(mem)
        v = val_proj(mem)
        q = q * (1.0 / math.sqrt(hd))
        B, Lq = q.shape[0], q.shape[1]

        if self.dense:
            from skix.ops.attention import _LOG2E, flash_attention_with_lse

            M, L = mem.shape[1], mem.shape[2]
            kf = k.reshape(B, M * L, H, hd).transpose(0, 2, 1, 3)
            vf = v.reshape(B, M * L, H, hd).transpose(0, 2, 1, 3)
            qf = q.transpose(0, 2, 1, 3)
            out, lse = flash_attention_with_lse(qf, kf, vf,
                                                sm_scale=1.0)  # q pre-scaled
            out = out.astype(jnp.float32)
            # subtract the invalid-slot mass: r = n_inv·e^{q·k0} / Z
            k0 = key_proj(pad_tok.astype(self.dtype))          # (H, hd)
            v0 = val_proj(pad_tok.astype(self.dtype)).astype(jnp.float32)
            n_inv = (L * jnp.sum(~slot_valid, -1)).astype(jnp.float32)
            s0 = jnp.einsum("bhqd,hd->bhq", qf.astype(jnp.float32),
                            k0.astype(jnp.float32))
            r = n_inv[:, None, None] * jnp.exp2(s0 * _LOG2E - lse)
            r = jnp.minimum(r, 1.0 - 1e-6)[..., None]
            out = (out - r * v0[None, :, None, :]) / (1.0 - r)
            out = out.transpose(0, 2, 1, 3).astype(self.dtype)
            return nn.DenseGeneral(C, axis=(-2, -1), dtype=self.dtype,
                                   name="out")(out)

        def slot_step(carry, xs):
            m_run, l_run, acc = carry
            k_s, v_s, valid_s = xs  # (B, L, H, hd) ×2, (B,)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k_s,
                           preferred_element_type=jnp.float32)
            ok = valid_s[:, None, None, None]
            s = jnp.where(ok, s, -1e30)
            m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
            p = jnp.where(ok, jnp.exp(s - m_new[..., None]), 0.0)
            corr = jnp.exp(m_run - m_new)
            l_new = corr * l_run + jnp.sum(p, axis=-1)
            # p in module dtype for the AV matmul (f32 accumulate) — halves
            # the dominant HBM read at bf16 with no accuracy loss
            acc_new = corr[..., None] * acc + jnp.einsum(
                "bhqk,bkhd->bhqd", p.astype(self.dtype), v_s,
                preferred_element_type=jnp.float32)
            return (m_new, l_new, acc_new), None

        init = (jnp.full((B, H, Lq), -1e30, jnp.float32),
                jnp.zeros((B, H, Lq), jnp.float32),
                jnp.zeros((B, H, Lq, hd), jnp.float32))
        (m, l, acc), _ = jax.lax.scan(
            slot_step, init,
            (jnp.moveaxis(k, 1, 0), jnp.moveaxis(v, 1, 0),
             jnp.moveaxis(slot_valid, 1, 0)))
        out = acc / jnp.maximum(l, 1e-30)[..., None]       # (B, H, Lq, hd)
        out = jnp.moveaxis(out, 1, 2).astype(self.dtype)   # (B, Lq, H, hd)
        return nn.DenseGeneral(C, axis=(-2, -1), dtype=self.dtype,
                               name="out")(out)


class MemoryAttention(nn.Module):
    """Cross-attention of current-frame tokens over the memory bank tokens
    (reference tracker transformer w/ memory cross-attention). Memory is
    passed per-slot (``mem (B, M, L, C)``, ``slot_valid (B, M)``) so the
    attention never materializes the concatenated score tensor."""

    num_heads: int = 4
    layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cur_tokens, mem, slot_valid, dense: bool = False):
        for i in range(self.layers):
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm_q_{i}")(cur_tokens)
            ln_kv = nn.LayerNorm(epsilon=1e-5, name=f"norm_kv_{i}")
            mk = ln_kv(mem)
            # the LN'd zero token — what every invalid (all-zero) slot
            # token equals; lets the dense path correct exactly
            pad_tok = ln_kv(jnp.zeros((mem.shape[-1],))) if dense else None
            attn = _SlotCrossAttention(num_heads=self.num_heads,
                                       dtype=self.dtype, dense=dense,
                                       name=f"cross_{i}")
            cur_tokens = cur_tokens + attn(h, mk, slot_valid, pad_tok)
            h2 = nn.LayerNorm(epsilon=1e-5, name=f"norm_mlp_{i}")(cur_tokens)
            cur_tokens = cur_tokens + Mlp(4 * cur_tokens.shape[-1],
                                          dtype=self.dtype,
                                          name=f"mlp_{i}")(h2)
        return cur_tokens


class MaskDecoder(nn.Module):
    """Tokens → mask logits at feature resolution + objectness score."""

    features: int = 64

    @nn.compact
    def __call__(self, tokens, gh: int, gw: int):
        h = tokens.reshape(tokens.shape[0], gh, gw, tokens.shape[-1])
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(h)
        h = nn.silu(h)
        mask = nn.Conv(1, (1, 1), name="mask_out")(h)[..., 0]
        score = Mlp(self.features, out_features=1, name="score")(
            jnp.mean(tokens, axis=1))[..., 0]
        return mask, score


class MemoryBank(NamedTuple):
    """Conditioning memory (slot 0, never evicted) + recent ring."""

    mem: jnp.ndarray        # (M, gh, gw, C)
    valid: jnp.ndarray      # (M,)
    ring_pos: jnp.ndarray   # () next recent slot to overwrite (1..M−1)


def init_memory(num_slots: int, gh: int, gw: int, c: int) -> MemoryBank:
    return MemoryBank(mem=jnp.zeros((num_slots, gh, gw, c)),
                      valid=jnp.zeros((num_slots,), bool),
                      ring_pos=jnp.asarray(1))


def write_conditioning(bank: MemoryBank, mem_feat) -> MemoryBank:
    return bank._replace(mem=bank.mem.at[0].set(mem_feat),
                         valid=bank.valid.at[0].set(True))


def write_recent(bank: MemoryBank, mem_feat) -> MemoryBank:
    M = bank.mem.shape[0]
    i = bank.ring_pos
    nxt = jnp.where(i + 1 >= M, 1, i + 1)
    return MemoryBank(mem=bank.mem.at[i].set(mem_feat),
                      valid=bank.valid.at[i].set(True),
                      ring_pos=nxt)


class MaskMemoryTracker(nn.Module):
    """Full per-object tracker: encode frame → memory cross-attention →
    mask decode → memory write. ``propagate`` scans a clip.

    Keep ``features / num_heads >= 64``: attention head_dim is the MXU
    lane dimension and head_dim=16 measured ~90× slower than head_dim=64
    at 512px on v5e (docs/PERF.md §tracking)."""

    features: int = 64
    num_heads: int = 1
    mem_slots: int = 4
    trunk: str = "conv"  # "conv" (smoke) | "vitdet" (reference trunk)
    vit_embed_dim: int = 1024
    vit_depth: int = 32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ImageEncoder(self.features, trunk=self.trunk,
                                    vit_embed_dim=self.vit_embed_dim,
                                    vit_depth=self.vit_depth,
                                    dtype=self.dtype)
        self.mem_encoder = MemoryEncoder(self.features, dtype=self.dtype)
        self.mem_attn = MemoryAttention(self.num_heads, 2, self.dtype)
        self.decoder = MaskDecoder(self.features)
        self.in_proj = nn.Dense(self.features, name="in_proj")

    def encode_frame(self, image):
        return self.encoder(image)

    def step(self, image, bank: MemoryBank, write: bool = True,
             dense: bool = False):
        """One frame: returns (mask_logits (B,gh,gw), score (B,), new bank).
        ``image (B, H, W, 3)`` in [0,1]; batch shares one object bank per
        row. For multiple objects encode ONCE and vmap ``step_from_feats``
        over banks — vmapping the whole step re-runs the (shared) frame
        encoder per object. ``dense=True`` (static): flash-kernel fast
        path with the exact invalid-slot correction — 1.5× the slot scan
        at 8 obj @512 px; inference-only (no VJP through the lse)."""
        return self.step_from_feats(self.encoder(image), bank, write,
                                    dense)

    def step_dense(self, image, bank: MemoryBank, write: bool = True):
        """``step`` on the dense fast path (a named method so cached-jit
        drivers can select it statically via ``apply_model``)."""
        return self.step_from_feats(self.encoder(image), bank, write,
                                    dense=True)

    def attend_decode(self, feats, bank: MemoryBank,
                      dense: bool = False):
        """Memory cross-attention + mask decode WITHOUT a memory write —
        the reference's deferred-encoding propagation step
        (sam3_video_base.py:193-197 runs propagation first and encodes
        memory only after suppression heuristics resolve). Returns
        ``(mask_logits (B, gh, gw), score (B,))``."""
        B, gh, gw, C = feats.shape
        cur = self.in_proj(feats.reshape(B, gh * gw, C))
        M = bank.mem.shape[0]
        mem = jnp.broadcast_to(
            bank.mem.reshape(1, M, gh * gw, bank.mem.shape[-1]),
            (B, M, gh * gw, bank.mem.shape[-1]))
        any_mem = jnp.any(bank.valid)
        # with an empty bank, attend to the zero slot instead (frame 0):
        # uniform softmax over identical zero keys/values == one zero token
        slot_valid = jnp.broadcast_to(
            jnp.where(any_mem, bank.valid,
                      jnp.zeros_like(bank.valid).at[0].set(True))[None],
            (B, M))
        tok = self.mem_attn(cur, mem, slot_valid, dense=dense)
        return self.decoder(tok, gh, gw)

    def encode_memory(self, feats_single, mask_logits_single):
        """Memory encoder only: ``feats (gh, gw, C)`` + mask logits
        ``(gh, gw)`` → one memory feature map (for externally managed
        banks, e.g. the masklet lifecycle's post-suppression writes)."""
        return self.mem_encoder(feats_single, mask_logits_single)

    def step_from_feats(self, feats, bank: MemoryBank, write: bool = True,
                        dense: bool = False):
        """Per-object half of ``step``: memory attention + decode + memory
        write on precomputed frame features ``feats (B, gh, gw, C)``."""
        mask_logits, score = self.attend_decode(feats, bank, dense)
        new_mem = self.mem_encoder(feats[0], mask_logits[0])
        bank = jax.lax.cond(write,
                            lambda b: write_recent(b, new_mem),
                            lambda b: b, bank)
        return mask_logits, score, bank

    def init_from_mask(self, image, mask, bank: MemoryBank):
        """Condition on a prompted first-frame mask (reference add-prompt
        path): encode and pin to the conditioning slot."""
        feats = self.encoder(image)
        logits = (jnp.asarray(mask, jnp.float32) * 20.0 - 10.0)
        mem = self.mem_encoder(feats[0], logits[0])
        return write_conditioning(bank, mem)


def propagate_object(model: MaskMemoryTracker, variables, frames, first_mask,
                     mem_slots: int | None = None):
    """Track one prompted object through ``frames (T, H, W, 3)`` uint8/f32;
    ``first_mask (H, W)`` bool at t=0 → (mask_logits (T, gh, gw),
    scores (T,)).

    Streaming design like the session predictor: one jitted step, the
    fixed-shape memory bank carried across calls (the same state threads
    through a lax.scan when embedded in a larger jitted program).
    """
    import numpy as np

    frames = jnp.asarray(frames, jnp.float32)
    if float(frames.max()) > 1.5:
        frames = frames / 255.0
    T = frames.shape[0]
    feats0 = model.apply(variables, frames[:1], method=model.encode_frame)
    gh, gw = feats0.shape[1], feats0.shape[2]
    bank = init_memory(mem_slots or model.mem_slots, gh, gw, model.features)
    bank = model.apply(variables, frames[:1], first_mask[None], bank,
                       method=model.init_from_mask)
    from skix.utils.jitapply import apply_model

    step = lambda v, img, b: apply_model(model, "step_dense", v, img, b)  # noqa: E731
    masks, scores = [], []
    for t in range(T):
        m, s, bank = step(variables, frames[t:t + 1], bank)
        masks.append(np.asarray(m[0]))
        scores.append(float(s[0]))
    return np.stack(masks), np.asarray(scores)


def propagate_objects(model: MaskMemoryTracker, variables, frames,
                      first_masks, mem_slots: int | None = None):
    """Track N prompted objects through ``frames (T, H, W, 3)``;
    ``first_masks (N, H, W)`` bool at t=0 → (mask_logits (T, N, gh, gw),
    scores (T, N)).

    The frame encoder runs ONCE per frame; only the per-object memory
    attention + decode vmaps over objects (the reference runs one tracker
    per object on separate GPUs — here objects are an extra batch axis on
    one chip, or shard the object axis over a mesh like the EP demo in
    __graft_entry__).
    """
    import numpy as np

    frames = jnp.asarray(frames, jnp.float32)
    if float(frames.max()) > 1.5:
        frames = frames / 255.0
    T = frames.shape[0]
    feats0 = model.apply(variables, frames[:1], method=model.encode_frame)
    gh, gw = feats0.shape[1], feats0.shape[2]
    bank0 = init_memory(mem_slots or model.mem_slots, gh, gw, model.features)
    banks = jax.vmap(
        lambda mk: model.apply(variables, frames[:1], mk[None], bank0,
                               method=model.init_from_mask))(
        jnp.asarray(first_masks))

    @functools.partial(jax.jit, static_argnums=0)
    def multi_step(mdl, v, img, bank):
        feats = mdl.apply(v, img, method=mdl.encode_frame)
        return jax.vmap(lambda b: mdl.apply(
            v, feats, b, True, True, method=mdl.step_from_feats))(bank)

    masks, scores = [], []
    for t in range(T):
        m, s, banks = multi_step(model, variables, frames[t:t + 1], banks)
        masks.append(np.asarray(m[:, 0]))
        scores.append(np.asarray(s[:, 0]))
    return np.stack(masks), np.stack(scores)
