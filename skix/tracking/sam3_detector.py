"""SAM3-family open-vocabulary promptable detector at reference capability.

Composes the reference's SAM3 image-detector architecture
(sam3/model/sam3_image.py:36, SURVEY.md §2.8) TPU-first:

- **ViT-Det backbone** with windowed attention + SimpleFPN neck
  (skix.tracking.vitdet; reference vitdet.py:616 + necks.py:13);
- **text encoder**: CLIP text tower via skix.tracking.clip_text (or any
  (B, L, d_model) prompt memory);
- **geometry prompt encoders** for points and boxes: direct projection +
  feature pooling (bilinear / box-grid sampling) + sine position encoding
  + type embeddings, concatenated onto the text prompt sequence
  (reference geometry_encoders.py:481 SequenceGeometryEncoder);
- **vision–language fusion encoder**: 6 pre-norm layers of image
  self-attention (positions added at attention) → cross-attention to the
  prompt sequence → ReLU FFN 2048 (reference encoder.py:13,252,462;
  builder config model_builder.py:117);
- **query decoder**: 200 learned queries + presence token, 6 layers of
  self-attn → text cross-attn → image cross-attn → FFN with iterative
  sigmoid box refinement, **boxRPB** attention bias (default "log", the
  reference builder config) and **DAC** one-to-many training queries
  (reference decoder.py:190 TransformerDecoder with box_refine).
  Deformable attention alone is intentionally absent: the built reference
  model uses standard MultiheadAttention (model_builder.py:161-166 — the
  deformable path is dead code for the shipped config), and plain
  attention maps better onto the MXU;
- **dot-product scoring** against the pooled prompt (reference
  _create_dot_product_scoring, model_builder.py:193);
- **maskformer segmentation head**: top-down PixelDecoder FPN fusion +
  per-query mask-embedding einsum (reference
  maskformer_segmentation.py:172,23).

Everything is static-shape; prompts are fixed-capacity masked slots.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.tracking.vitdet import SimpleFPNNeck, ViTDetBackbone


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------
def _inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


class _MHA(nn.Module):
    """Batch-first multi-head attention with optional additive key padding
    mask (True = PAD, torch convention).

    Unbiased, unmasked self-attention at ``L ≥ flash_min_seq`` routes
    through the Pallas flash kernel: the fusion encoder's image
    self-attention (S = 72² = 5184 at 1008 px) otherwise materializes a
    (heads, S, S) f32 score tensor — ~860 MB of HBM traffic per layer —
    which dominated the detector's non-trunk tail (docs/PERF.md)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    flash_min_seq: int = 2048     # 0/huge to force/disable the flash path

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, attn_bias=None):
        B, Lq, C = q.shape
        hd = C // self.num_heads
        qh = nn.Dense(C, dtype=self.dtype,
                      name="q")(q).reshape(B, Lq, self.num_heads, hd)
        kh = nn.Dense(C, dtype=self.dtype,
                      name="k")(k).reshape(B, k.shape[1],
                                           self.num_heads, hd)
        vh = nn.Dense(C, dtype=self.dtype,
                      name="v")(v).reshape(B, v.shape[1],
                                           self.num_heads, hd)
        if (attn_bias is None and key_padding_mask is None
                and k.shape[1] == Lq and Lq >= self.flash_min_seq):
            from skix.ops.attention import flash_attention

            # pad-free tile when the token count allows (5184 = 9·576 —
            # the same single-window tile the trunk kernel uses)
            blk = 576 if Lq % 576 == 0 else 1024
            out = flash_attention(
                qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3),
                vh.transpose(0, 2, 1, 3), block_q=blk, block_k_major=blk,
                block_k=blk).transpose(0, 2, 1, 3).reshape(B, Lq, C)
        else:
            s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                           preferred_element_type=jnp.float32) / np.sqrt(hd)
            if attn_bias is not None:
                s = s + attn_bias  # (B, heads, Lq, Lk)
            if key_padding_mask is not None:
                s = jnp.where(key_padding_mask[:, None, None, :], -1e9, s)
            p = nn.softmax(s, axis=-1).astype(vh.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, Lq, C)
        return nn.Dense(C, dtype=self.dtype, name="out")(out)


class _FFN(nn.Module):
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     name="linear1")(x)
        h = nn.relu(h)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="linear2")(h)


def pool_prompt(prompt, prompt_pad_mask=None):
    """Masked mean over the prompt sequence (encoder.py:581
    pool_text_feat, pool_with_mask=True)."""
    if prompt_pad_mask is None:
        return jnp.mean(prompt, axis=1)
    valid = (~prompt_pad_mask).astype(prompt.dtype)[..., None]
    n = jnp.clip(jnp.sum(valid, axis=1), 1.0)
    return jnp.sum(prompt * valid, axis=1) / n


# --------------------------------------------------------------------------
# geometry prompt encoders (geometry_encoders.py:481)
# --------------------------------------------------------------------------
def bilinear_sample(feat, pts01):
    """``feat (H, W, C)``, ``pts01 (N, 2)`` (x, y) in [0, 1] → (N, C)."""
    H, W, _ = feat.shape
    x = pts01[:, 0] * W - 0.5
    y = pts01[:, 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def at(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
        return feat[yy, xx]

    return ((1 - wy)[:, None] * ((1 - wx)[:, None] * at(y0, x0)
                                 + wx[:, None] * at(y0, x0 + 1))
            + wy[:, None] * ((1 - wx)[:, None] * at(y0 + 1, x0)
                             + wx[:, None] * at(y0 + 1, x0 + 1)))


def box_grid_sample(feat, boxes_cxcywh, grid: int = 7):
    """Mean of a ``grid×grid`` bilinear sample inside each normalized box —
    the roi_align pooling of the reference box encoder
    (geometry_encoders.py:643). ``boxes (N, 4)`` → (N, C)."""
    N = boxes_cxcywh.shape[0]
    cx, cy, w, h = [boxes_cxcywh[:, i] for i in range(4)]
    lin = (jnp.arange(grid) + 0.5) / grid
    gx = cx[:, None] - w[:, None] / 2 + lin[None] * w[:, None]  # (N, g)
    gy = cy[:, None] - h[:, None] / 2 + lin[None] * h[:, None]
    pts = jnp.stack([jnp.repeat(gx, grid, -1),
                     jnp.tile(gy, (1, grid))], axis=-1)  # (N, g², 2)
    samples = bilinear_sample(feat, pts.reshape(-1, 2))
    return jnp.mean(samples.reshape(N, grid * grid, -1), axis=1)


def _sincos_vec(v, dim: int, temperature: float = 10000.0):
    """1D sine-cosine features of ``v (...,)`` → (..., dim)."""
    dim_t = temperature ** (2 * (jnp.arange(dim // 2)) / dim)
    f = v[..., None] / dim_t
    return jnp.concatenate([jnp.sin(f), jnp.cos(f)], axis=-1)


class GeometryPromptEncoder(nn.Module):
    """Point + box prompts → (B, P, d_model) tokens + pad mask.

    Fixed-capacity slots (``max_points``/``max_boxes``); invalid slots
    masked. Each prompt embeds as direct-projection + pooled image
    feature + sine position encoding + type embedding
    (geometry_encoders.py:600,643)."""

    d_model: int = 256
    max_points: int = 8
    max_boxes: int = 4
    roi_grid: int = 7

    @nn.compact
    def __call__(self, img_feat, points, point_labels, point_valid,
                 boxes, box_labels, box_valid):
        """``img_feat (B, h, w, d)``; ``points (B, Np, 2)`` in [0,1];
        ``boxes (B, Nb, 4)`` normalized cxcywh; labels int (0=neg, 1=pos);
        valid bool masks."""
        label_embed = self.param("label_embed",
                                 nn.initializers.normal(0.02),
                                 (4, self.d_model))  # pt-neg/pt-pos/box-neg/box-pos

        p_direct = nn.Dense(self.d_model, name="points_direct")(points)
        p_pool = jax.vmap(bilinear_sample)(img_feat, points)
        p_pool = nn.Dense(self.d_model, name="points_pool")(p_pool)
        p_pos = jnp.concatenate(
            [_sincos_vec(points[..., 0], self.d_model // 2),
             _sincos_vec(points[..., 1], self.d_model // 2)], axis=-1)
        p_pos = nn.Dense(self.d_model, name="points_pos")(p_pos)
        p_tok = (p_direct + p_pool + p_pos
                 + label_embed[jnp.clip(point_labels, 0, 1)])

        b_direct = nn.Dense(self.d_model, name="boxes_direct")(boxes)
        b_pool = jax.vmap(box_grid_sample, in_axes=(0, 0, None))(
            img_feat, boxes, self.roi_grid)
        b_pool = nn.Dense(self.d_model, name="boxes_pool")(b_pool)
        b_pos = jnp.concatenate(
            [_sincos_vec(boxes[..., i], self.d_model // 4) for i in range(4)],
            axis=-1)
        b_pos = nn.Dense(self.d_model, name="boxes_pos")(b_pos)
        b_tok = (b_direct + b_pool + b_pos
                 + label_embed[2 + jnp.clip(box_labels, 0, 1)])

        tokens = jnp.concatenate([p_tok, b_tok], axis=1)
        valid = jnp.concatenate([point_valid, box_valid], axis=1)
        return jnp.where(valid[..., None], tokens, 0.0), ~valid


# --------------------------------------------------------------------------
# vision-language fusion encoder (encoder.py:13,462)
# --------------------------------------------------------------------------
class FusionEncoderLayer(nn.Module):
    """Pre-norm: image self-attn (pos at attn) → cross-attn to prompt →
    ReLU FFN (TransformerEncoderLayer, builder config)."""

    num_heads: int = 8
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32
    self_flash_min_seq: int = 2048

    @nn.compact
    def __call__(self, src, pos, prompt, prompt_pad_mask=None):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        qk = h + pos
        src = src + _MHA(self.num_heads, dtype=self.dtype,
                         flash_min_seq=self.self_flash_min_seq,
                         name="self_attn")(qk, qk, h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(src)
        src = src + _MHA(self.num_heads, dtype=self.dtype,
                         name="cross_attn_image")(
            h, prompt, prompt, key_padding_mask=prompt_pad_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(src)
        return src + _FFN(self.dim_feedforward, dtype=self.dtype,
                          name="ffn")(h)


class FusionEncoder(nn.Module):
    num_layers: int = 6
    num_heads: int = 8
    dim_feedforward: int = 2048
    add_pooled_text_to_img_feat: bool = False
    dtype: jnp.dtype = jnp.float32
    self_flash_min_seq: int = 2048

    @nn.compact
    def __call__(self, src, pos, prompt, prompt_pad_mask=None):
        if self.add_pooled_text_to_img_feat:
            pooled = pool_prompt(prompt, prompt_pad_mask)
            src = src + nn.Dense(src.shape[-1],
                                 name="text_pooling_proj")(pooled)[:, None]
        for i in range(self.num_layers):
            src = FusionEncoderLayer(self.num_heads, self.dim_feedforward,
                                     dtype=self.dtype,
                                     self_flash_min_seq=self.self_flash_min_seq,
                                     name=f"layer_{i}")(
                src, pos, prompt, prompt_pad_mask)
        return src.astype(jnp.float32)


# --------------------------------------------------------------------------
# query decoder with box refinement + presence token (decoder.py:190)
# --------------------------------------------------------------------------
class DecoderLayer(nn.Module):
    num_heads: int = 8
    dim_feedforward: int = 2048
    use_text_cross_attention: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, query_pos, memory, mem_pos, prompt,
                 prompt_pad_mask=None, attn_bias=None, dac_split=None):
        """``dac_split`` (static int | None): when set, the query axis is
        laid out ``[o2o(dac_split), o2m(dac_split), presence(rest)]`` and
        self-attention runs over o2o + presence only — the o2m queries
        skip it entirely (reference decoder.py:114-145, DAC = divide and
        conquer: one-to-many aux queries get no query↔query interaction).
        Cross-attention and the FFN apply to every query either way."""
        if dac_split is None:
            h = nn.LayerNorm(epsilon=1e-5, name="norm_sa")(q)
            hq = h + query_pos
            q = q + _MHA(self.num_heads, dtype=self.dtype,
                         name="self_attn")(hq, hq, h)
        else:
            Qo = dac_split
            sa = jnp.concatenate([q[:, :Qo], q[:, 2 * Qo:]], axis=1)
            sa_pos = jnp.concatenate(
                [query_pos[:, :Qo], query_pos[:, 2 * Qo:]], axis=1)
            h = nn.LayerNorm(epsilon=1e-5, name="norm_sa")(sa)
            hq = h + sa_pos
            upd = _MHA(self.num_heads, dtype=self.dtype,
                       name="self_attn")(hq, hq, h)
            q = jnp.concatenate(
                [q[:, :Qo] + upd[:, :Qo], q[:, Qo:2 * Qo],
                 q[:, 2 * Qo:] + upd[:, Qo:]], axis=1)
        if self.use_text_cross_attention:
            h = nn.LayerNorm(epsilon=1e-5, name="norm_ta")(q)
            q = q + _MHA(self.num_heads, dtype=self.dtype,
                         name="text_cross_attn")(
                h + query_pos, prompt, prompt,
                key_padding_mask=prompt_pad_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="norm_ca")(q)
        q = q + _MHA(self.num_heads, dtype=self.dtype,
                     name="image_cross_attn")(
            h + query_pos, memory + mem_pos, memory, attn_bias=attn_bias)
        h = nn.LayerNorm(epsilon=1e-5, name="norm_ffn")(q)
        return q + _FFN(self.dim_feedforward, dtype=self.dtype,
                        name="ffn")(h)


class BoxRPB(nn.Module):
    """Box relative position bias, 'log' mode (reference decoder.py:331):
    per query box, signed-log deltas from each feature row/column to the
    box's y/x edges go through per-axis 2-layer MLPs producing per-head
    biases, combined separably over (H, W)."""

    num_heads: int = 8
    d_model: int = 256

    @nn.compact
    def __call__(self, boxes_cxcywh, h: int, w: int):
        """``boxes (B, Q, 4)`` normalized → bias (B, heads, Q, h·w)."""
        cx, cy, bw, bh = [boxes_cxcywh[..., i] for i in range(4)]
        x1, x2 = cx - bw / 2, cx + bw / 2
        y1, y2 = cy - bh / 2, cy + bh / 2
        coords_h = (jnp.arange(h) + 0.5) / h
        coords_w = (jnp.arange(w) + 0.5) / w
        dy = coords_h[None, None, :, None] - jnp.stack(
            [y1, y2], -1)[:, :, None, :]                   # (B, Q, h, 2)
        dx = coords_w[None, None, :, None] - jnp.stack(
            [x1, x2], -1)[:, :, None, :]                   # (B, Q, w, 2)

        def logmap(d):
            d = d * 8.0
            return jnp.sign(d) * jnp.log2(jnp.abs(d) + 1.0) / np.log2(8.0)

        def axis_mlp(d, name):
            hdn = nn.Dense(self.d_model, name=f"{name}_fc1")(d)
            hdn = nn.relu(hdn)
            return nn.Dense(self.num_heads, name=f"{name}_fc2")(hdn)

        by = axis_mlp(logmap(dy), "embed_y")               # (B, Q, h, heads)
        bx = axis_mlp(logmap(dx), "embed_x")               # (B, Q, w, heads)
        bias = by[:, :, :, None, :] + bx[:, :, None, :, :]  # (B,Q,h,w,heads)
        B, Q = boxes_cxcywh.shape[:2]
        return bias.reshape(B, Q, h * w, self.num_heads).transpose(
            0, 3, 1, 2)


class _BoxHead(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Dense(x.shape[-1], name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(x.shape[-1], name="fc2")(h)
        h = nn.relu(h)
        return nn.Dense(4, name="fc3")(h)


class DecoderOut(NamedTuple):
    queries: jnp.ndarray        # (B, Q, C) final-layer o2o features
    boxes: jnp.ndarray          # (B, Q, 4) refined o2o boxes
    all_boxes: tuple            # per-layer o2o boxes
    presence: jnp.ndarray       # (B, C) presence feature (or None)
    all_queries: tuple = ()     # per-layer o2o features (aux supervision)
    o2m_queries: jnp.ndarray = None   # (B, Q, C) when apply_dac
    o2m_boxes: jnp.ndarray = None     # (B, Q, 4) when apply_dac
    o2m_all_boxes: tuple = ()         # per-layer o2m boxes when apply_dac
    o2m_all_queries: tuple = ()       # per-layer o2m features


class QueryDecoder(nn.Module):
    num_queries: int = 200
    num_layers: int = 6
    num_heads: int = 8
    dim_feedforward: int = 2048
    presence_token: bool = True
    box_rpb: str = "none"  # "none" | "log" (reference builder: "log")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, mem_pos, prompt, prompt_pad_mask=None,
                 feat_hw=None, apply_dac: bool = False):
        """``apply_dac`` (reference decoder.py:449-467, builder dac=True):
        DAC tiles the queries ×2 at TRAINING time — the first half (o2o)
        behaves exactly as without DAC (self-attention excludes the o2m
        half, so the o2o outputs are invariant to the flag); the second
        half (o2m) skips self-attention and is supervised one-to-many.
        Inference always runs with ``apply_dac=False`` (sam3_image.py:268:
        ``apply_dac = dac and self.training``)."""
        B = memory.shape[0]
        C = memory.shape[-1]
        Q = self.num_queries
        query_pos = self.param("query_pos", nn.initializers.normal(0.02),
                               (1, Q + int(self.presence_token), C))
        init_boxes = jax.nn.sigmoid(
            self.param("init_boxes", nn.initializers.normal(0.5), (1, Q, 4)))
        if apply_dac:
            # layout: [o2o(Q), o2m(Q), presence]; o2m reuses the o2o
            # query-pos and initial reference boxes (reference .repeat(2,1,1))
            query_pos = jnp.concatenate(
                [query_pos[:, :Q], query_pos[:, :Q], query_pos[:, Q:]],
                axis=1)
            boxes = jnp.concatenate([init_boxes, init_boxes], axis=1)
            nq = 2 * Q
        else:
            boxes = init_boxes
            nq = Q
        query_pos = jnp.broadcast_to(query_pos, (B, *query_pos.shape[1:]))
        q = jnp.zeros((B, nq + int(self.presence_token), C))
        boxes = jnp.broadcast_to(boxes, (B, nq, 4))
        box_head = _BoxHead(name="box_head")  # shared across layers

        rpb = None
        if self.box_rpb == "log":
            assert feat_hw is not None, "box_rpb needs the memory (h, w)"
            rpb = BoxRPB(self.num_heads, C, name="box_rpb")
        all_boxes = []
        all_q = []
        dac_split = Q if apply_dac else None
        for i in range(self.num_layers):
            attn_bias = None
            if rpb is not None:
                # bias from the CURRENT reference boxes (refined per layer);
                # the presence token attends unbiased (zero rows)
                bias_q = rpb(boxes, *feat_hw)
                if self.presence_token:
                    attn_bias = jnp.concatenate(
                        [bias_q, jnp.zeros_like(bias_q[:, :, :1])], axis=2)
                else:
                    attn_bias = bias_q
            q = DecoderLayer(self.num_heads, self.dim_feedforward,
                             dtype=self.dtype, name=f"layer_{i}")(
                q, query_pos, memory, mem_pos, prompt, prompt_pad_mask,
                attn_bias=attn_bias, dac_split=dac_split)
            hq = nn.LayerNorm(epsilon=1e-5, name=f"norm_out_{i}")(q)
            delta = box_head(hq[:, :nq])
            boxes = jax.nn.sigmoid(_inverse_sigmoid(boxes) + delta)
            all_boxes.append(boxes)
            all_q.append(hq[:, :nq])
        presence = hq[:, nq] if self.presence_token else None
        if apply_dac:
            return DecoderOut(
                queries=hq[:, :Q], boxes=boxes[:, :Q],
                all_boxes=tuple(b[:, :Q] for b in all_boxes),
                presence=presence,
                all_queries=tuple(x[:, :Q] for x in all_q),
                o2m_queries=hq[:, Q:2 * Q], o2m_boxes=boxes[:, Q:],
                o2m_all_boxes=tuple(b[:, Q:] for b in all_boxes),
                o2m_all_queries=tuple(x[:, Q:] for x in all_q))
        return DecoderOut(queries=hq[:, :Q], boxes=boxes,
                          all_boxes=tuple(all_boxes), presence=presence,
                          all_queries=tuple(all_q))


# --------------------------------------------------------------------------
# scoring + segmentation heads
# --------------------------------------------------------------------------
class DotProductScoring(nn.Module):
    """Query ↔ pooled-prompt dot product (model_misc.py:37 + builder
    model_builder.py:193): residual 2-layer prompt MLP with output LN
    applied PER TOKEN, masked mean pool, projections to d_proj, scaled
    inner product, logits clamped to ±12 (the reference's numerical
    guard for matcher/loss)."""

    d_proj: int = 256
    clamp_max_val: float = 12.0

    @nn.compact
    def __call__(self, queries, prompt, prompt_pad_mask=None):
        h = nn.Dense(2048, name="prompt_fc1")(prompt)
        h = nn.relu(h)
        h = nn.Dense(prompt.shape[-1], name="prompt_fc2")(h)
        prompt = nn.LayerNorm(epsilon=1e-5, name="prompt_norm")(prompt + h)
        pooled = pool_prompt(prompt, prompt_pad_mask)
        pq = nn.Dense(self.d_proj, name="proj_q")(queries)
        pp = nn.Dense(self.d_proj, name="proj_p")(pooled)
        scores = jnp.einsum("bqc,bc->bq", pq, pp) / np.sqrt(self.d_proj)
        return jnp.clip(scores, -self.clamp_max_val, self.clamp_max_val)


class PixelDecoder(nn.Module):
    """Top-down FPN fusion: coarsest level upsampled + added into finer
    levels, conv + GroupNorm + ReLU per stage
    (maskformer_segmentation.py:172)."""

    hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        """``feats``: list fine→coarse of (B, h, w, d). Returns (B, H, W, d)
        at the finest level's resolution."""
        prev = feats[-1].astype(self.dtype)
        for li, f in enumerate(feats[:-1][::-1]):
            prev = jax.image.resize(prev, f.shape, "nearest") \
                + f.astype(self.dtype)
            prev = nn.Conv(self.hidden_dim, (3, 3), padding="SAME",
                           dtype=self.dtype, name=f"conv_{li}")(prev)
            prev = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                                name=f"norm_{li}")(prev)
            prev = nn.relu(prev)
        return prev.astype(jnp.float32)


class MaskPredictor(nn.Module):
    """Per-query masks: 3-layer MLP mask embedding × pixel embedding
    (maskformer_segmentation.py:23)."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, queries, pixel_embed):
        h = queries
        for i in range(2):
            h = nn.Dense(self.hidden_dim, name=f"fc{i}")(h)
            h = nn.relu(h)
        h = nn.Dense(pixel_embed.shape[-1], name="fc2")(h)
        return jnp.einsum("bqc,bhwc->bqhw", h, pixel_embed)


# --------------------------------------------------------------------------
# the full detector
# --------------------------------------------------------------------------
class Sam3Detections(NamedTuple):
    boxes_cxcywh: jnp.ndarray   # (B, Q, 4) normalized
    scores: jnp.ndarray         # (B, Q) prompt-alignment logits
    mask_logits: jnp.ndarray    # (B, Q, H4, W4) stride-4-ish masks
    embeddings: jnp.ndarray     # (B, Q, C) decoder features
    presence: jnp.ndarray       # (B,) presence logit
    aux_boxes: tuple            # per-layer boxes (training)
    # DAC one-to-many auxiliary outputs (training only, sam3_image.py:368:
    # pred_{logits,boxes}_o2m; o2m_mask_predict=True in the builder)
    o2m_boxes: jnp.ndarray = None       # (B, Q, 4)
    o2m_scores: jnp.ndarray = None      # (B, Q)
    o2m_mask_logits: jnp.ndarray = None  # (B, Q, H4, W4)
    o2m_aux_boxes: tuple = ()           # per-layer o2m boxes
    # per-layer logits for aux supervision (with_aux_scores=True: each
    # decoder layer's queries scored by the SAME scoring head — the
    # reference's return_intermediate aux outputs)
    aux_scores: tuple = ()              # per-layer (B, Q)
    o2m_aux_scores: tuple = ()          # per-layer (B, Q)


class Sam3Detector(nn.Module):
    """Image + (text tokens | geometry prompts) → promptable detections.

    ``full_size()`` is the reference configuration (1008 px backbone,
    1024×32 ViT-Det, d_model 256, 200 queries, 6+6 layers)."""

    img_size: int = 1008
    patch_size: int = 14
    backbone_dim: int = 1024
    backbone_depth: int = 32
    backbone_heads: int = 16
    mlp_ratio: float = 4.625
    window_size: int = 24
    global_att_blocks: Sequence[int] = (7, 15, 23, 31)
    d_model: int = 256
    num_queries: int = 200
    encoder_layers: int = 6
    decoder_layers: int = 6
    max_points: int = 8
    max_boxes: int = 4
    box_rpb: str = "log"  # reference builder config (decoder.py boxRPB)
    # single-tile Pallas flash for the trunk's window blocks (vitdet.py
    # window_flash; False = pre-round-3 XLA fallback, for A/B benches)
    window_flash: bool = True
    # Pallas flash for the fusion encoder's image self-attention (the
    # S=5184 f32 score tensor is ~860 MB of HBM traffic per layer);
    # False = unfused XLA, for A/B benches
    tail_flash: bool = True
    # trunk rope convention: "skix" (2D rope, global coords) or "sam3"
    # (the reference's interleaved axial rope — REQUIRED when running
    # weights through convert_vitdet_state_dict) + the matching
    # pretrain pos-embed grid (vitdet pretrain 336 → 24)
    rope_style: str = "skix"
    pretrain_img_size: Optional[int] = None
    remat: bool = False
    dtype: jnp.dtype = jnp.float32       # trunk compute dtype
    # compute dtype of the neck/encoder/decoder/pixel-decoder tail —
    # measured on v5e: bf16 here LOSES (~17 ms of relayouts at small
    # spatial sizes), so it defaults to f32 independent of the trunk
    head_dtype: jnp.dtype = jnp.float32

    @classmethod
    def full_size(cls, **kw):
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(img_size=112, patch_size=14, backbone_dim=64,
                        backbone_depth=2, backbone_heads=2, mlp_ratio=4.0,
                        window_size=4, global_att_blocks=(1,), d_model=64,
                        num_queries=12, encoder_layers=2, decoder_layers=2)
        defaults.update(kw)
        return cls(**defaults)

    @nn.compact
    def __call__(self, images, text_memory=None, text_pad_mask=None,
                 points=None, point_labels=None, point_valid=None,
                 boxes=None, box_labels=None, box_valid=None,
                 apply_dac: bool = False, with_aux_scores: bool = False):
        """``images (B, H, W, 3)`` in [0,1]; ``text_memory (B, L, d_model)``
        from the CLIP tower's resizer; geometry prompts optional
        fixed-capacity slots. ``apply_dac=True`` (training only) adds the
        DAC one-to-many query duplicates to the outputs — the o2o outputs
        are invariant to the flag (reference sam3_image.py:268).
        ``with_aux_scores=True`` (training) scores every decoder layer's
        queries through the shared scoring head so each aux layer is
        supervised with its OWN logits (reference return_intermediate)."""
        B = images.shape[0]
        x = (images - 0.5) / 0.5
        trunk = ViTDetBackbone(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.backbone_dim, depth=self.backbone_depth,
            num_heads=self.backbone_heads, mlp_ratio=self.mlp_ratio,
            window_size=self.window_size,
            global_att_blocks=self.global_att_blocks, remat=self.remat,
            window_flash=self.window_flash, rope_style=self.rope_style,
            pretrain_img_size=self.pretrain_img_size, dtype=self.dtype,
            name="backbone")(x)
        feats, poss = SimpleFPNNeck(self.d_model, dtype=self.head_dtype,
                                    name="neck")(trunk)
        # encoder memory: the 1.0-scale level (stride = patch size)
        lvl = 2
        f = feats[lvl]
        h, w = f.shape[1], f.shape[2]
        src = f.reshape(B, h * w, self.d_model)
        pos = poss[lvl].reshape(1, h * w, self.d_model)

        # prompt sequence: text ‖ geometry
        prompt_parts = []
        pad_parts = []
        if text_memory is not None:
            prompt_parts.append(text_memory)
            pad_parts.append(jnp.zeros(text_memory.shape[:2], bool)
                             if text_pad_mask is None else text_pad_mask)
        if points is not None or boxes is not None:
            Np = self.max_points
            Nb = self.max_boxes
            pts = points if points is not None else jnp.zeros((B, Np, 2))
            plab = (point_labels if point_labels is not None
                    else jnp.zeros((B, Np), jnp.int32))
            pval = (point_valid if point_valid is not None
                    else jnp.zeros((B, Np), bool))
            bxs = boxes if boxes is not None else jnp.zeros((B, Nb, 4))
            blab = (box_labels if box_labels is not None
                    else jnp.zeros((B, Nb), jnp.int32))
            bval = (box_valid if box_valid is not None
                    else jnp.zeros((B, Nb), bool))
            g_tok, g_pad = GeometryPromptEncoder(
                self.d_model, Np, Nb, name="geometry_encoder")(
                f, pts, plab, pval, bxs, blab, bval)
            prompt_parts.append(g_tok)
            pad_parts.append(g_pad)
        if not prompt_parts:  # unconditioned: a learned "detect anything"
            tok = self.param("null_prompt", nn.initializers.normal(0.02),
                             (1, 1, self.d_model))
            prompt_parts.append(jnp.broadcast_to(tok, (B, 1, self.d_model)))
            pad_parts.append(jnp.zeros((B, 1), bool))
        prompt = jnp.concatenate(prompt_parts, axis=1)
        prompt_pad = jnp.concatenate(pad_parts, axis=1)

        memory = FusionEncoder(self.encoder_layers, dtype=self.head_dtype,
                               self_flash_min_seq=(2048 if self.tail_flash
                                                   else 1 << 30),
                               name="encoder")(
            src, pos, prompt, prompt_pad)

        dec = QueryDecoder(
            self.num_queries, self.decoder_layers, box_rpb=self.box_rpb,
            dtype=self.head_dtype, name="decoder")(
            memory, pos, prompt, prompt_pad, feat_hw=(h, w),
            apply_dac=apply_dac)
        queries, out_boxes, all_boxes, presence = (
            dec.queries, dec.boxes, dec.all_boxes, dec.presence)

        # score/mask the o2o and (when DAC) o2m halves through the SAME
        # heads in one pass — one matmul, shared parameters. Aux layers'
        # queries ride the same call when requested (training).
        parts = [queries]
        if apply_dac:
            parts.append(dec.o2m_queries)
        n_aux = 0
        if with_aux_scores:
            aux_parts = list(dec.all_queries[:-1])
            if apply_dac:
                aux_parts += list(dec.o2m_all_queries[:-1])
            n_aux = len(dec.all_queries) - 1
            parts += aux_parts
        head_q = (parts[0] if len(parts) == 1
                  else jnp.concatenate(parts, axis=1))
        scores_all = DotProductScoring(self.d_model, name="scoring")(
            head_q, prompt, prompt_pad)
        if presence is not None:
            pres_logit = nn.Dense(1, name="presence_head")(presence)[..., 0]
        else:
            pres_logit = jnp.zeros((B,))

        # segmentation: replace the encoder level with fused memory, then
        # top-down pixel decoding over the finer levels
        fused = memory.reshape(B, h, w, self.d_model)
        pyramid = [feats[0], feats[1], fused]  # fine → coarse
        pixel_embed = PixelDecoder(self.d_model, dtype=self.head_dtype,
                                   name="pixel_decoder")(pyramid)
        Q = self.num_queries
        n_main = Q * (2 if apply_dac else 1)
        masks_all = MaskPredictor(self.d_model, name="mask_predictor")(
            head_q[:, :n_main], pixel_embed)

        extra = {}
        if apply_dac:
            extra.update(o2m_boxes=dec.o2m_boxes,
                         o2m_scores=scores_all[:, Q:2 * Q],
                         o2m_mask_logits=masks_all[:, Q:],
                         o2m_aux_boxes=dec.o2m_all_boxes)
        if with_aux_scores and n_aux:
            aux_flat = scores_all[:, n_main:]
            per = [aux_flat[:, i * Q:(i + 1) * Q]
                   for i in range(aux_flat.shape[1] // Q)]
            extra["aux_scores"] = tuple(per[:n_aux])
            if apply_dac:
                extra["o2m_aux_scores"] = tuple(per[n_aux:])
        return Sam3Detections(boxes_cxcywh=out_boxes,
                              scores=scores_all[:, :Q],
                              mask_logits=masks_all[:, :Q],
                              embeddings=queries,
                              presence=pres_logit,
                              aux_boxes=tuple(all_boxes), **extra)


# --------------------------------------------------------------------------
# weight converters (reference torch state dicts → flax params)
# --------------------------------------------------------------------------
def _t(x):
    import numpy as np_

    return jnp.asarray(np_.asarray(x.detach().cpu().numpy()
                                   if hasattr(x, "detach") else x))


def _convert_torch_mha(sd, prefix):
    """torch nn.MultiheadAttention (packed in_proj) → _MHA params."""
    w = _t(sd[f"{prefix}.in_proj_weight"])
    b = _t(sd[f"{prefix}.in_proj_bias"])
    C = w.shape[1]
    wq, wk, wv = w[:C], w[C:2 * C], w[2 * C:]
    bq, bk, bv = b[:C], b[C:2 * C], b[2 * C:]
    return {
        "q": {"kernel": wq.T, "bias": bq},
        "k": {"kernel": wk.T, "bias": bk},
        "v": {"kernel": wv.T, "bias": bv},
        "out": {"kernel": _t(sd[f"{prefix}.out_proj.weight"]).T,
                "bias": _t(sd[f"{prefix}.out_proj.bias"])},
    }


def convert_fusion_encoder_layer(sd, prefix="") -> dict:
    """Reference TransformerEncoderLayer (encoder.py:13, pre-norm,
    pos_enc_at_attn) state dict → FusionEncoderLayer params."""
    def ln(name):
        return {"scale": _t(sd[f"{prefix}{name}.weight"]),
                "bias": _t(sd[f"{prefix}{name}.bias"])}

    return {
        "norm1": ln("norm1"),
        "norm2": ln("norm2"),
        "norm3": ln("norm3"),
        "self_attn": _convert_torch_mha(sd, f"{prefix}self_attn"),
        "cross_attn_image": _convert_torch_mha(sd,
                                               f"{prefix}cross_attn_image"),
        "ffn": {
            "linear1": {"kernel": _t(sd[f"{prefix}linear1.weight"]).T,
                        "bias": _t(sd[f"{prefix}linear1.bias"])},
            "linear2": {"kernel": _t(sd[f"{prefix}linear2.weight"]).T,
                        "bias": _t(sd[f"{prefix}linear2.bias"])},
        },
    }


def convert_fusion_encoder(sd, num_layers: int = 6) -> dict:
    """Full TransformerEncoderFusion stack (layers.{i}.*)."""
    return {"params": {
        f"layer_{i}": convert_fusion_encoder_layer(sd, f"layers.{i}.")
        for i in range(num_layers)}}
