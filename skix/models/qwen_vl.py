"""Qwen2.5-VL vision tower + multimodal prompt encoder (Flax,
HF-convertible) — the reference's FULL image-edit conditioning.

Reference capability: the Qwen-Image-Edit pipeline's ``encode_prompt``
is MULTIMODAL (image_edit/qwenimage/pipeline_qwenimage_edit_plus.py:230
``_get_qwen_prompt_embeds``): the input image(s) are spliced into the
prompt via ``Picture i: <|vision_start|><|image_pad|><|vision_end|>``,
``pixel_values``/``image_grid_thw`` run through Qwen2.5-VL's vision
transformer, the resulting tokens replace the ``<|image_pad|>``
positions, and the LM runs with multimodal 3D rope; the last hidden
states (template prefix dropped at index 64) condition the MMDiT.

This module implements that vision tower and the splicing/rope-index
machinery at configurable dims, parity-tested against a tiny random
``transformers.Qwen2_5_VLForConditionalGeneration``
(tests/test_qwen_vl.py); :func:`convert_hf_qwen2_5_vl` consumes the HF
state-dict layout (``visual.blocks.N...`` + ``model.language_model...``
or the legacy ``model.layers...``).

TPU-first: the edit pipeline uses a FIXED image size, so ``grid_thw``
is static — window indexing, the window/full block-diagonal attention
masks, and the rotary tables are all precomputed numpy at trace time;
the whole tower is one fused program with static shapes (HF's ragged
``cu_seqlens`` splits become one additive block mask).

HF semantics transcribed (modeling_qwen2_5_vl.py):
- patch_embed :84 — Conv3d(kernel=stride=(tps, ps, ps), no bias) over
  flattened (C, tps, ps, ps) patches = one matmul;
- rot_pos_emb :336 — per-axis tables at merge-pattern token order,
  h/w halves concatenated then duplicated;
- get_window_index :365 — merge-unit windows of
  ``window_size / merge / patch`` cells, -100-padded, raggedness kept
  as window seqlens;
- forward :406 — tokens permuted to window order, window attention in
  every block except ``fullatt_block_indexes``, merger (RMSNorm → 4×
  concat → Linear/GELU/Linear), inverse permutation at the end;
- get_rope_index :956 — 3D (t, h, w) position ids: text runs
  sequentially, each image block gets constant-t + 2D h/w ids offset
  to the running maximum (images only here; no video path).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.qwen_text import QwenTextEncoder, RMSNorm, _rotate_half


# ---------------------------------------------------------------------------
# static (trace-time) tables: rotary positions, window index, block masks
# ---------------------------------------------------------------------------

def _vision_rot_tables(grid_thw, head_dim: int, theta: float = 10000.0):
    """Per-token (L, head_dim) cos/sin at HF's merge-pattern order
    (rot_pos_emb :336: h/w ids permuted so each 2x2 merge unit is
    contiguous; each axis contributes head_dim/4 frequencies, halves
    concatenated then duplicated)."""
    merge = 2
    pos_ids = []
    for t, h, w in grid_thw:
        hpos = np.arange(h)[:, None].repeat(w, 1)
        hpos = hpos.reshape(h // merge, merge, w // merge, merge)
        hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w)[None, :].repeat(h, 0)
        wpos = wpos.reshape(h // merge, merge, w // merge, merge)
        wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
        pos_ids.append(np.tile(np.stack([hpos, wpos], -1), (t, 1)))
    pos = np.concatenate(pos_ids, 0)                       # (L, 2)
    dim = head_dim // 2
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    max_grid = max(max(h, w) for _, h, w in grid_thw)
    table = np.outer(np.arange(max_grid, dtype=np.float32), inv)
    freqs = table[pos].reshape(pos.shape[0], -1)           # (L, hd/2)
    emb = np.concatenate([freqs, freqs], -1)               # (L, hd)
    return np.cos(emb), np.sin(emb)


def _window_index(grid_thw, window_size: int, patch_size: int,
                  merge: int = 2):
    """HF get_window_index :365 — returns (window_index over merge
    units, per-window PATCH seqlens) for the static grid."""
    ws = window_size // merge // patch_size
    index_all, seqlens_all = [], []
    base = 0
    for t, h, w in grid_thw:
        lh, lw = h // merge, w // merge
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = ws - lh % ws
        pad_w = ws - lw % ws
        nh = (lh + pad_h) // ws
        nw = (lw + pad_w) // ws
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = idx
        padded = padded.reshape(t, nh, ws, nw, ws).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t, nh * nw, ws, ws)
        seqlens = (padded != -100).sum((2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        index_all.append(flat[flat != -100] + base)
        seqlens_all.append(seqlens * merge * merge)
        base += t * lh * lw
    return (np.concatenate(index_all),
            np.concatenate(seqlens_all))


def _segment_mask(seg_lens, total: int) -> np.ndarray:
    """Block-diagonal boolean (total, total) from segment lengths."""
    seg = np.zeros(total, np.int64)
    ends = np.cumsum(seg_lens)
    starts = np.concatenate([[0], ends[:-1]])
    for i, (s, e) in enumerate(zip(starts, ends)):
        seg[s:e] = i
    return seg[:, None] == seg[None, :]


@functools.lru_cache(maxsize=16)
def vision_static_tables(grid_thw: Tuple[Tuple[int, int, int], ...],
                         window_size: int, patch_size: int,
                         head_dim: int):
    """All trace-time tables for one static grid: window permutation
    (patch level), inverse merge-unit permutation, cos/sin in window
    order, window + full additive masks."""
    merge = 2
    unit = merge * merge
    L = sum(t * h * w for t, h, w in grid_thw)
    cos, sin = _vision_rot_tables(grid_thw, head_dim)
    win_idx, win_seqlens = _window_index(grid_thw, window_size,
                                         patch_size, merge)
    # permute at merge-unit granularity (HF reshapes to (L/4, 4, -1))
    patch_perm = (win_idx[:, None] * unit
                  + np.arange(unit)[None, :]).reshape(-1)
    cos = cos[patch_perm]
    sin = sin[patch_perm]
    mask_win = _segment_mask(win_seqlens, L)
    # full attention is still per-FRAME block-diagonal (cu_seqlens :440:
    # h*w per t) — but over the PERMUTED order; map segment ids through
    # the permutation
    frame_lens = [h * w for t, h, w in grid_thw for _ in range(t)]
    seg = np.zeros(L, np.int64)
    ends = np.cumsum(frame_lens)
    starts = np.concatenate([[0], ends[:-1]])
    for i, (s, e) in enumerate(zip(starts, ends)):
        seg[s:e] = i
    seg = seg[patch_perm]
    mask_full = seg[:, None] == seg[None, :]
    rev_unit = np.argsort(win_idx)                # merger output order
    return (patch_perm, rev_unit, cos.astype(np.float32),
            sin.astype(np.float32),
            np.where(mask_win, 0.0, -1e9).astype(np.float32),
            np.where(mask_full, 0.0, -1e9).astype(np.float32))


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class QwenVisionBlock(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    rms_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, bias):
        L, _ = x.shape
        nh = self.heads
        hd = self.hidden // nh
        dt = self.dtype

        h = RMSNorm(self.rms_eps, name="norm1")(x)
        qkv = nn.Dense(3 * self.hidden, dtype=dt, name="qkv")(h)
        q, k, v = (qkv.reshape(L, 3, nh, hd)
                   .transpose(1, 0, 2, 3))                  # (3, L, nh, hd)
        # f32 rope like apply_rotary_pos_emb_vision :130
        q = (q.astype(jnp.float32) * cos[:, None]
             + _rotate_half(q.astype(jnp.float32)) * sin[:, None])
        k = (k.astype(jnp.float32) * cos[:, None]
             + _rotate_half(k.astype(jnp.float32)) * sin[:, None])
        logits = jnp.einsum("qnd,mnd->nqm", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(logits + bias[None], axis=-1).astype(dt)
        out = jnp.einsum("nqm,mnd->qnd", attn, v.astype(dt))
        x = x + nn.Dense(self.hidden, dtype=dt,
                         name="proj")(out.reshape(L, self.hidden))

        h = RMSNorm(self.rms_eps, name="norm2")(x)
        gate = nn.Dense(self.intermediate, dtype=dt, name="gate_proj")(h)
        up = nn.Dense(self.intermediate, dtype=dt, name="up_proj")(h)
        return x + nn.Dense(self.hidden, dtype=dt,
                            name="down_proj")(nn.silu(gate) * up)


class QwenVisionTower(nn.Module):
    """HF-flattened patches (L, C·tps·ps²) + static ``grid_thw`` →
    merged vision tokens (L/4, out_hidden) in original merge-unit order
    (Qwen2_5_VisionTransformerPretrainedModel semantics)."""

    depth: int = 4
    hidden: int = 64
    heads: int = 4
    intermediate: int = 128
    out_hidden: int = 64
    patch_size: int = 14
    temporal_patch_size: int = 2
    in_channels: int = 3
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (3,)
    rms_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches, grid_thw):
        grid_thw = tuple(tuple(int(v) for v in g) for g in grid_thw)
        L = patches.shape[0]
        hd = self.hidden // self.heads
        perm, rev_unit, cos, sin, mwin, mfull = vision_static_tables(
            grid_thw, self.window_size, self.patch_size, hd)
        x = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     name="patch_embed")(patches.astype(self.dtype))
        x = x[jnp.asarray(perm)]
        cos = jnp.asarray(cos)
        sin = jnp.asarray(sin)
        mwin = jnp.asarray(mwin)
        mfull = jnp.asarray(mfull)
        for i in range(self.depth):
            bias = mfull if i in self.fullatt_block_indexes else mwin
            x = QwenVisionBlock(self.hidden, self.heads,
                                self.intermediate, self.rms_eps,
                                self.dtype, name=f"blocks_{i}")(
                x, cos, sin, bias)
        # merger: RMSNorm → (L/4, 4·hidden) → Linear → GELU → Linear
        x = RMSNorm(self.rms_eps, name="ln_q")(x)
        x = x.reshape(L // 4, 4 * self.hidden)
        x = nn.Dense(4 * self.hidden, dtype=self.dtype, name="mlp_0")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_hidden, dtype=self.dtype, name="mlp_2")(x)
        return x[jnp.asarray(rev_unit)]


# ---------------------------------------------------------------------------
# multimodal rope index (images only) — HF get_rope_index :956
# ---------------------------------------------------------------------------

def get_rope_index_images(input_ids, image_grid_thw, *,
                          image_token_id: int,
                          vision_start_token_id: int,
                          spatial_merge_size: int = 2) -> np.ndarray:
    """(B, L) token ids + per-image (t, h, w) grids → (3, B, L) t/h/w
    position ids (host-side numpy; the images-only subset of the
    reference's 3D rope index — text sequential, each image block
    constant-t + 2D h/w, every block offset to the running max + 1).
    Assumes no padding (the edit pipeline pads AFTER encoding)."""
    ids = np.asarray(input_ids)
    B, L = ids.shape
    out = np.zeros((3, B, L), np.int64)
    image_index = 0
    for b in range(B):
        tokens = ids[b].tolist()
        pos_list = []
        st = 0
        n_images = sum(
            1 for i in np.flatnonzero(ids[b] == vision_start_token_id)
            if i + 1 < L and ids[b][i + 1] == image_token_id)
        for _ in range(n_images):
            ed = tokens.index(image_token_id, st)
            t, h, w = (int(v) for v in image_grid_thw[image_index])
            image_index += 1
            lh, lw = h // spatial_merge_size, w // spatial_merge_size
            text_len = ed - st
            st_idx = (pos_list[-1].max() + 1) if pos_list else 0
            pos_list.append(
                np.broadcast_to(np.arange(text_len), (3, text_len))
                + st_idx)
            t_idx = np.zeros(t * lh * lw, np.int64)  # images: t term = 0
            h_idx = np.arange(lh)[None, :, None].repeat(t, 0) \
                .repeat(lw, 2).reshape(-1)
            w_idx = np.arange(lw)[None, None, :].repeat(t, 0) \
                .repeat(lh, 1).reshape(-1)
            pos_list.append(np.stack([t_idx, h_idx, w_idx])
                            + text_len + st_idx)
            st = ed + t * lh * lw
        if st < L:
            st_idx = (pos_list[-1].max() + 1) if pos_list else 0
            pos_list.append(
                np.broadcast_to(np.arange(L - st), (3, L - st)) + st_idx)
        out[:, b] = np.concatenate(pos_list, axis=1)
    return out


# ---------------------------------------------------------------------------
# combined encoder
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _encode_core_mm(vision, text, mrope_section, grid_thw, variables,
                    ids, patches, flat_pos, pos, attention_mask):
    """Module-level jitted multimodal encode (one cache entry per
    (modules, mrope, grid, shapes) — NOT rebuilt per call; eager
    dispatch through the axon relay is ~0.5 s/op)."""
    emb_table = variables["text"]["params"]["embed_tokens"]["embedding"]
    emb = emb_table[ids]
    vis = vision.apply(variables["vision"], patches, grid_thw)
    B, L = ids.shape
    emb = emb.reshape(B * L, -1) \
        .at[flat_pos].set(vis.astype(emb.dtype)).reshape(B, L, -1)
    return text.apply(variables["text"], attention_mask=attention_mask,
                      inputs_embeds=emb, position_ids=pos,
                      mrope_section=mrope_section)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _encode_core_text(text, mrope_section, variables, ids, pos,
                      attention_mask):
    emb_table = variables["text"]["params"]["embed_tokens"]["embedding"]
    return text.apply(variables["text"], attention_mask=attention_mask,
                      inputs_embeds=emb_table[ids], position_ids=pos,
                      mrope_section=mrope_section)


class QwenVLEncoder:
    """Vision tower + text LM glued the reference way: vision tokens
    replace ``<|image_pad|>`` positions, the LM runs with 3D rope, last
    hidden states come back (B, L, hidden).

    ``mrope_section`` must sum to head_dim/2 (HF rope_scaling
    ``mrope_section``, e.g. [16, 24, 24] for the 7B tower)."""

    def __init__(self, vision: QwenVisionTower, text: QwenTextEncoder,
                 variables, *, mrope_section,
                 image_token_id: int, vision_start_token_id: int):
        self.vision = vision
        self.text = text
        self.variables = variables     # {"vision": ..., "text": ...}
        self.mrope_section = tuple(int(s) for s in mrope_section)
        self.image_token_id = int(image_token_id)
        self.vision_start_token_id = int(vision_start_token_id)

    def encode(self, input_ids, patches=None, grid_thw=None,
               attention_mask=None):
        """``input_ids (B, L)`` (numpy/jnp), optional ``patches
        (N, C·tps·ps²)`` + ``grid_thw`` (static) → (B, L, hidden)."""
        ids = np.asarray(input_ids)
        if patches is not None:
            grid_thw = tuple(tuple(int(v) for v in g) for g in grid_thw)
            # tower outputs L/merge² merged tokens (merge=2 throughout)
            n_vis = sum(t * h * w for t, h, w in grid_thw) // 4
            flat_pos = np.flatnonzero(
                ids.reshape(-1) == self.image_token_id)
            if len(flat_pos) != n_vis:
                raise ValueError(
                    f"{len(flat_pos)} <|image_pad|> tokens vs "
                    f"{n_vis} vision tokens")
            pos = get_rope_index_images(
                ids, grid_thw, image_token_id=self.image_token_id,
                vision_start_token_id=self.vision_start_token_id)
            return _encode_core_mm(
                self.vision, self.text, self.mrope_section, grid_thw,
                self.variables, jnp.asarray(ids), jnp.asarray(patches),
                jnp.asarray(flat_pos), jnp.asarray(pos), attention_mask)
        B, L = ids.shape
        pos = np.broadcast_to(np.arange(L), (3, B, L))
        return _encode_core_text(
            self.text, self.mrope_section,
            {"text": self.variables["text"]}, jnp.asarray(ids),
            jnp.asarray(pos), attention_mask)


# ---------------------------------------------------------------------------
# image → flattened patches (Qwen2VLImageProcessor layout)
# ---------------------------------------------------------------------------

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def patchify_image(img, patch_size: int = 14, merge: int = 2,
                   temporal_patch_size: int = 2):
    """(H, W, 3) float image (already normalized; H, W multiples of
    ``patch_size·merge``) → (patches (gh·gw, C·tps·ps²), grid (1, gh, gw))
    in the exact HF flattening order
    (image_processing_qwen2_vl.py:281-293: a still image is repeated
    ``temporal_patch_size`` times, then (t, gh/m, gw/m, m, m, C, tps,
    ps, ps) raster)."""
    img = np.asarray(img, np.float32)
    H, W, C = img.shape
    ps, m, tps = patch_size, merge, temporal_patch_size
    if H % (ps * m) or W % (ps * m):
        raise ValueError(f"image {H}x{W} not a multiple of {ps * m}")
    gh, gw = H // ps, W // ps
    x = img.transpose(2, 0, 1)[None].repeat(tps, 0)       # (tps, C, H, W)
    x = x.reshape(1, tps, C, gh // m, m, ps, gw // m, m, ps)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (x.reshape(gh * gw, C * tps * ps * ps),
            (1, gh, gw))


def preprocess_image_qwen(img, patch_size: int = 14, merge: int = 2,
                          temporal_patch_size: int = 2,
                          target_tokens: int = 64):
    """uint8/float (H, W, 3) → normalized HF patches + grid. Resizes to
    the grid closest to ``target_tokens`` merged tokens (the processor's
    smart-resize role, simplified to a fixed token budget so the jitted
    tower sees ONE static shape), then CLIP-normalizes and patchifies."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    side = int(round(float(np.sqrt(target_tokens)))) * patch_size * merge
    if img.shape[:2] != (side, side):
        import jax

        img = np.asarray(jax.image.resize(
            jnp.asarray(img, jnp.float32), (side, side, img.shape[2]),
            "bilinear"))
    img = (img - np.asarray(OPENAI_CLIP_MEAN, np.float32)) \
        / np.asarray(OPENAI_CLIP_STD, np.float32)
    return patchify_image(img, patch_size, merge, temporal_patch_size)


# ---------------------------------------------------------------------------
# HF converter
# ---------------------------------------------------------------------------

def convert_hf_qwen2_5_vl(state_dict) -> dict:
    """Full ``Qwen2_5_VLForConditionalGeneration.state_dict()`` →
    ``{"vision": ..., "text": ...}`` flax variables. Accepts both the
    modern layout (``model.visual…``/``model.language_model…``) and the
    legacy one (``visual…``/``model.layers…``)."""
    from skix.models.qwen_text import convert_hf_qwen2

    def np_of(t):
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t)

    sd = {k: v for k, v in state_dict.items()}
    # normalize prefixes
    if any(k.startswith("model.visual.") for k in sd):
        vis_sd = {k[len("model.visual."):]: v for k, v in sd.items()
                  if k.startswith("model.visual.")}
    else:
        vis_sd = {k[len("visual."):]: v for k, v in sd.items()
                  if k.startswith("visual.")}
    if any(k.startswith("model.language_model.") for k in sd):
        txt_sd = {k[len("model.language_model."):]: v
                  for k, v in sd.items()
                  if k.startswith("model.language_model.")}
    else:
        txt_sd = {k[len("model."):]: v for k, v in sd.items()
                  if k.startswith("model.") and "visual" not in k}
    text_vars = convert_hf_qwen2(txt_sd, prefix="")

    p: dict = {
        # Conv3d(kernel=stride, no bias) over one flattened patch is a
        # matmul: (embed, C, tps, ps, ps) → (C·tps·ps², embed)
        "patch_embed": {"kernel": jnp.asarray(
            np_of(vis_sd["patch_embed.proj.weight"])
            .reshape(np_of(vis_sd["patch_embed.proj.weight"]).shape[0],
                     -1).T)},
        "ln_q": {"weight": jnp.asarray(
            np_of(vis_sd["merger.ln_q.weight"]))},
        "mlp_0": {"kernel": jnp.asarray(
            np_of(vis_sd["merger.mlp.0.weight"]).T),
            "bias": jnp.asarray(np_of(vis_sd["merger.mlp.0.bias"]))},
        "mlp_2": {"kernel": jnp.asarray(
            np_of(vis_sd["merger.mlp.2.weight"]).T),
            "bias": jnp.asarray(np_of(vis_sd["merger.mlp.2.bias"]))},
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in vis_sd:
        bp = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": {"weight": jnp.asarray(
                np_of(vis_sd[f"{bp}.norm1.weight"]))},
            "norm2": {"weight": jnp.asarray(
                np_of(vis_sd[f"{bp}.norm2.weight"]))},
            "qkv": {"kernel": jnp.asarray(
                np_of(vis_sd[f"{bp}.attn.qkv.weight"]).T),
                "bias": jnp.asarray(
                    np_of(vis_sd[f"{bp}.attn.qkv.bias"]))},
            "proj": {"kernel": jnp.asarray(
                np_of(vis_sd[f"{bp}.attn.proj.weight"]).T),
                "bias": jnp.asarray(
                    np_of(vis_sd[f"{bp}.attn.proj.bias"]))},
            "gate_proj": {"kernel": jnp.asarray(
                np_of(vis_sd[f"{bp}.mlp.gate_proj.weight"]).T),
                "bias": jnp.asarray(
                    np_of(vis_sd[f"{bp}.mlp.gate_proj.bias"]))},
            "up_proj": {"kernel": jnp.asarray(
                np_of(vis_sd[f"{bp}.mlp.up_proj.weight"]).T),
                "bias": jnp.asarray(
                    np_of(vis_sd[f"{bp}.mlp.up_proj.bias"]))},
            "down_proj": {"kernel": jnp.asarray(
                np_of(vis_sd[f"{bp}.mlp.down_proj.weight"]).T),
                "bias": jnp.asarray(
                    np_of(vis_sd[f"{bp}.mlp.down_proj.bias"]))},
        }
        i += 1
    return {"vision": {"params": p}, "text": text_vars}
