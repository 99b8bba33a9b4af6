"""SAM-2-style promptable mask decoder (Flax) — reference-exact structure.

Capability parity with the reference's SAM decoder used inside the
tracker (sam3/sam/mask_decoder.py:12 + sam/transformer.py TwoWayTransformer,
constructed at sam3_tracker_base.py:193: depth 2, mlp_dim 2048, heads 8,
iou head hidden 256 / depth 3 / sigmoid, 3-layer obj-score MLP,
high-res skip features): output tokens = [object-score, IoU, 1 single-mask
+ 3 multimask tokens] ‖ prompt tokens, a two-way transformer (token
self-attn → token→image cross-attn → MLP → image→token cross-attn), 4×
learned upscaling of image features (optionally fused with high-res
backbone skips via conv_s0/conv_s1 — mask_decoder.py:218-224), per-mask
3-layer hypernetwork MLPs producing mask logits via inner product, and
SAM-2's dynamic single-vs-multimask selection by stability score
(mask_decoder.py:256). ``convert_sam_mask_decoder`` loads the reference
torch state dict with numerical parity.

TPU-first: fixed token counts, no data-dependent shapes; the dynamic
multimask fallback is a ``jnp.where`` select, so the whole decode jits.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


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


class _SamMlp(nn.Module):
    """Reference MLP (mask_decoder.py:297): Linear stack with ReLU between
    layers, optional sigmoid output."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = (self.output_dim if i == self.num_layers - 1
                   else self.hidden_dim)
            x = nn.Dense(out, name=f"fc{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class TwoWayBlock(nn.Module):
    """Token self-attn → token→image cross → MLP → image→token cross
    (reference sam/transformer.py:109 TwoWayAttentionBlock; post-norm,
    torch LayerNorm eps 1e-5, ReLU MLP of width ``mlp_dim``)."""

    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, tokens, token_pe, img, img_pe):
        if self.skip_first_pe:
            # reference :155-156 — the first layer's self-attention output
            # REPLACES the queries (no residual)
            tokens = _Attn(self.num_heads, name="self_attn")(
                tokens, tokens, tokens)
        else:
            q = tokens + token_pe
            tokens = tokens + _Attn(self.num_heads, name="self_attn")(
                q, q, tokens)
        tokens = nn.LayerNorm(epsilon=1e-5, name="norm1")(tokens)
        q = tokens + token_pe
        k = img + img_pe
        tokens = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            tokens + _Attn(self.num_heads, downsample_rate=2,
                           name="cross_t2i")(q, k, img))
        h = nn.Dense(self.mlp_dim, name="mlp_fc1")(tokens)
        h = nn.relu(h)
        h = nn.Dense(tokens.shape[-1], name="mlp_fc2")(h)
        tokens = nn.LayerNorm(epsilon=1e-5, name="norm3")(tokens + h)
        q = tokens + token_pe
        img = nn.LayerNorm(epsilon=1e-5, name="norm4")(
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
    mlp_dim: int = 2048
    num_multimask: int = 3
    iou_hidden_dim: int = 256
    iou_sigmoid: bool = True      # reference builder: sigmoid IoU head
    stability_delta: float = 0.05
    stability_thresh: float = 0.98
    dynamic_multimask: bool = True

    @nn.compact
    def __call__(self, image_embed, image_pe=None, prompt_tokens=None,
                 multimask_output: bool = False,
                 high_res_feats=None) -> SamDecoderOutputs:
        """``image_embed (B, h, w, C)``; ``prompt_tokens (B, P, C)``
        optional sparse prompts (already embedded); ``high_res_feats``
        optional (feat_4x (B, 4h, 4w, C), feat_2x (B, 2h, 2w, C)) raw
        backbone skips — projected by conv_s0/conv_s1 and fused into the
        upscaling (mask_decoder.py:218-224)."""
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
            tokens, img = TwoWayBlock(self.num_heads, self.mlp_dim,
                                      skip_first_pe=(i == 0),
                                      name=f"block_{i}")(tokens, token_pe,
                                                         img, pe)
        # final token→image attention + norm (reference transformer tail)
        q = tokens + token_pe
        tokens = nn.LayerNorm(epsilon=1e-5, name="norm_final")(
            tokens + _Attn(self.num_heads, downsample_rate=2,
                           name="final_t2i")(q, img + pe, img))

        obj_score = _SamMlp(C, 1, 3, name="obj_score_head")(
            tokens[:, 0])[..., 0]
        iou_pred = _SamMlp(self.iou_hidden_dim, n_mask, 3,
                           sigmoid_output=self.iou_sigmoid,
                           name="iou_head")(tokens[:, 1])
        mask_tokens_out = tokens[:, 2:2 + n_mask]

        # 4× learned upscaling (deconv ×2, LN, GELU — mask_decoder.py:63);
        # with high-res skips: act(ln(dc1(src) + conv_s1(f2x))) then
        # act(dc2(·) + conv_s0(f4x)) (mask_decoder.py:218-224)
        feat = img.reshape(B, h, w, C)
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2),
                              name="upscale1")(feat)
        if high_res_feats is not None:
            f4x, f2x = high_res_feats
            up = up + nn.Conv(C // 4, (1, 1), name="conv_s1")(f2x)
        up = nn.LayerNorm(epsilon=1e-6, name="upscale_norm")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2),
                              name="upscale2")(up)
        if high_res_feats is not None:
            up = up + nn.Conv(C // 8, (1, 1), name="conv_s0")(f4x)
        up = nn.gelu(up, approximate=False)  # (B, 4h, 4w, C/8)

        hyper = [_SamMlp(C, C // 8, 3, name=f"hyper_{i}")(
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


# --------------------------------------------------------------------------
# weight converter (reference torch state dict → flax params)
# --------------------------------------------------------------------------
def convert_sam_mask_decoder(sd, depth: int = 2) -> dict:
    """Reference ``sam3/sam/mask_decoder.py`` MaskDecoder state dict →
    ``SamMaskDecoder`` flax params (random-weight parity-tested)."""
    def t(x):
        return jnp.asarray(np.asarray(x.detach().cpu()))

    def lin(prefix):
        return {"kernel": t(sd[f"{prefix}.weight"]).T,
                "bias": t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": t(sd[f"{prefix}.weight"]),
                "bias": t(sd[f"{prefix}.bias"])}

    def attn(prefix):
        return {"q": lin(f"{prefix}.q_proj"), "k": lin(f"{prefix}.k_proj"),
                "v": lin(f"{prefix}.v_proj"),
                "out": lin(f"{prefix}.out_proj")}

    def mlp3(prefix):
        return {f"fc{i}": lin(f"{prefix}.layers.{i}") for i in range(3)}

    def deconv(prefix):
        # torch ConvTranspose2d weight (in, out, kh, kw) → flax
        # ConvTranspose kernel (kh, kw, in, out), SPATIALLY FLIPPED
        # (lax.conv_transpose does not mirror the kernel; torch does)
        w = jnp.transpose(t(sd[f"{prefix}.weight"]), (2, 3, 0, 1))
        return {"kernel": w[::-1, ::-1],
                "bias": t(sd[f"{prefix}.bias"])}

    params = {
        "obj_score_token": t(sd["obj_score_token.weight"])[None],
        "iou_token": t(sd["iou_token.weight"])[None],
        "mask_tokens": t(sd["mask_tokens.weight"])[None],
        "norm_final": ln("transformer.norm_final_attn"),
        "final_t2i": attn("transformer.final_attn_token_to_image"),
        "obj_score_head": mlp3("pred_obj_score_head"),
        "iou_head": mlp3("iou_prediction_head"),
        "upscale1": deconv("output_upscaling.0"),
        "upscale_norm": ln("output_upscaling.1"),
        "upscale2": deconv("output_upscaling.3"),
    }
    for i in range(depth):
        p = f"transformer.layers.{i}"
        params[f"block_{i}"] = {
            "self_attn": attn(f"{p}.self_attn"),
            "cross_t2i": attn(f"{p}.cross_attn_token_to_image"),
            "cross_i2t": attn(f"{p}.cross_attn_image_to_token"),
            "mlp_fc1": lin(f"{p}.mlp.lin1"),
            "mlp_fc2": lin(f"{p}.mlp.lin2"),
            "norm1": ln(f"{p}.norm1"), "norm2": ln(f"{p}.norm2"),
            "norm3": ln(f"{p}.norm3"), "norm4": ln(f"{p}.norm4"),
        }
    n_mask = t(sd["mask_tokens.weight"]).shape[0]
    for i in range(n_mask):
        params[f"hyper_{i}"] = mlp3(f"output_hypernetworks_mlps.{i}")
    if "conv_s0.weight" in sd:
        for name in ("conv_s0", "conv_s1"):
            w = t(sd[f"{name}.weight"])  # (out, in, 1, 1)
            params[name] = {"kernel": jnp.transpose(w, (2, 3, 1, 0)),
                            "bias": t(sd[f"{name}.bias"])}
    return {"params": params}
