"""SAM-2-style promptable mask decoder (Flax).

Capability parity with the reference's SAM decoder used inside the
tracker (sam3/sam/mask_decoder.py:12 + the two-way transformer): output
tokens = [object-score, IoU, 1 single-mask + 3 multimask tokens] ‖ prompt
tokens, a two-way transformer (token self-attn → token→image cross-attn
→ MLP → image→token cross-attn), 4× learned upscaling of image features,
per-mask hypernetwork MLPs producing mask logits via inner product, an
IoU-prediction MLP, an object-score head, and SAM-2's dynamic
single-vs-multimask selection by stability score
(mask_decoder.py:244-261).

TPU-first: fixed token counts, no data-dependent shapes; the dynamic
multimask fallback is a ``jnp.where`` select, so the whole decode jits.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from skix.models.layers import Mlp


class _Attn(nn.Module):
    num_heads: int = 8
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        C = q.shape[-1]
        ci = C // self.downsample_rate
        hd = ci // self.num_heads
        B, Lq = q.shape[:2]
        qh = nn.Dense(ci, name="q")(q).reshape(B, Lq, self.num_heads, hd)
        kh = nn.Dense(ci, name="k")(k).reshape(B, -1, self.num_heads, hd)
        vh = nn.Dense(ci, name="v")(v).reshape(B, -1, self.num_heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        p = nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, Lq, ci)
        return nn.Dense(C, name="out")(out)


class TwoWayBlock(nn.Module):
    """Token self-attn → token→image cross → MLP → image→token cross
    (reference sam/transformer.py TwoWayAttentionBlock)."""

    num_heads: int = 8
    mlp_ratio: int = 8
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, tokens, token_pe, img, img_pe):
        q = tokens if self.skip_first_pe else tokens + token_pe
        tokens = nn.LayerNorm(name="norm1")(
            tokens + _Attn(self.num_heads, name="self_attn")(q, q, tokens))
        q = tokens + token_pe
        k = img + img_pe
        tokens = nn.LayerNorm(name="norm2")(
            tokens + _Attn(self.num_heads, downsample_rate=2,
                           name="cross_t2i")(q, k, img))
        tokens = nn.LayerNorm(name="norm3")(
            tokens + Mlp(self.mlp_ratio * tokens.shape[-1],
                         name="mlp")(tokens))
        q = tokens + token_pe
        img = nn.LayerNorm(name="norm4")(
            img + _Attn(self.num_heads, downsample_rate=2,
                        name="cross_i2t")(k, q, tokens))
        return tokens, img


class SamDecoderOutputs(NamedTuple):
    mask_logits: jnp.ndarray      # (B, H*4, W*4) the selected mask
    all_mask_logits: jnp.ndarray  # (B, 4, H*4, W*4) single + 3 multimask
    iou_pred: jnp.ndarray         # (B, 4)
    obj_score: jnp.ndarray        # (B,) objectness logit
    mask_token: jnp.ndarray       # (B, C) single-mask token (obj pointer)


class SamMaskDecoder(nn.Module):
    """Image embeddings + prompt tokens → multimask logits at 4× feature
    resolution, IoU predictions, object score."""

    transformer_dim: int = 64
    num_heads: int = 8
    depth: int = 2
    num_multimask: int = 3
    stability_delta: float = 0.05
    stability_thresh: float = 0.98
    dynamic_multimask: bool = True

    @nn.compact
    def __call__(self, image_embed, image_pe=None, prompt_tokens=None,
                 multimask_output: bool = False) -> SamDecoderOutputs:
        """``image_embed (B, h, w, C)``; ``prompt_tokens (B, P, C)``
        optional sparse prompts (already embedded)."""
        B, h, w, C = image_embed.shape
        n_mask = 1 + self.num_multimask
        obj_tok = self.param("obj_score_token",
                             nn.initializers.normal(0.02), (1, 1, C))
        iou_tok = self.param("iou_token", nn.initializers.normal(0.02),
                             (1, 1, C))
        mask_toks = self.param("mask_tokens", nn.initializers.normal(0.02),
                               (1, n_mask, C))
        parts = [jnp.broadcast_to(obj_tok, (B, 1, C)),
                 jnp.broadcast_to(iou_tok, (B, 1, C)),
                 jnp.broadcast_to(mask_toks, (B, n_mask, C))]
        if prompt_tokens is not None:
            parts.append(prompt_tokens)
        tokens = jnp.concatenate(parts, axis=1)
        # SAM re-injects the ORIGINAL token embeddings as positional
        # encoding at every two-way block (reference sam/transformer.py:
        # queries + point_embedding each layer; the first block's
        # self-attention skips the addition since queries == PE there)
        token_pe = tokens

        if image_pe is None:
            from skix.tracking.vitdet import sincos_position_map

            image_pe = jnp.asarray(sincos_position_map(h, w, C))[None]
        img = image_embed.reshape(B, h * w, C)
        pe = jnp.broadcast_to(image_pe.reshape(1, h * w, C), (B, h * w, C))

        for i in range(self.depth):
            tokens, img = TwoWayBlock(self.num_heads, skip_first_pe=(i == 0),
                                      name=f"block_{i}")(tokens, token_pe,
                                                         img, pe)
        # final token→image attention + norm (reference transformer tail)
        q = tokens + token_pe
        tokens = nn.LayerNorm(name="norm_final")(
            tokens + _Attn(self.num_heads, downsample_rate=2,
                           name="final_t2i")(q, img + pe, img))

        obj_score = Mlp(C, out_features=1,
                        name="obj_score_head")(tokens[:, 0])[..., 0]
        iou_pred = Mlp(C, out_features=n_mask,
                       name="iou_head")(tokens[:, 1])
        mask_tokens_out = tokens[:, 2:2 + n_mask]

        # 4× learned upscaling (deconv ×2, LN, GELU — mask_decoder.py:63)
        feat = img.reshape(B, h, w, C)
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2),
                              name="upscale1")(feat)
        up = nn.LayerNorm(name="upscale_norm")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2),
                              name="upscale2")(up)
        up = nn.gelu(up, approximate=False)  # (B, 4h, 4w, C/8)

        hyper = [Mlp(C, out_features=C // 8, name=f"hyper_{i}")(
            mask_tokens_out[:, i]) for i in range(n_mask)]
        hyper = jnp.stack(hyper, axis=1)  # (B, n_mask, C/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)

        # selection: multimask → best-IoU of tokens 1..3; single → token 0
        # with SAM-2's stability fallback (mask_decoder.py:256)
        flat = masks.reshape(B, n_mask, -1)
        area_i = jnp.sum(flat > self.stability_delta, axis=-1).astype(
            jnp.float32)
        area_u = jnp.sum(flat > -self.stability_delta, axis=-1).astype(
            jnp.float32)
        stability = jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1),
                              1.0)
        best_multi = jnp.argmax(iou_pred[:, 1:], axis=-1) + 1
        if multimask_output:
            sel = best_multi
        elif self.dynamic_multimask:
            stable = stability[:, 0] >= self.stability_thresh
            sel = jnp.where(stable, 0, best_multi)
        else:
            sel = jnp.zeros((B,), jnp.int32)
        selected = jnp.take_along_axis(
            masks, sel[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
        return SamDecoderOutputs(mask_logits=selected, all_mask_logits=masks,
                                 iou_pred=iou_pred, obj_score=obj_score,
                                 mask_token=mask_tokens_out[:, 0])
