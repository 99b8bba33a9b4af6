"""Monocular depth estimation (DPT-family), Flax.

Capability parity with the reference's depth stage
(prepare_dataset/model/depth_estimation.py:83 — HuggingFace ``Intel/dpt-large``
batched inference, fp16 autocast, bicubic resize back to the input size).

TPU-first: ViT-L/16 backbone (skix.models.layers) with 4 intermediate taps →
DPT reassemble/fusion (skix.models.vggt.DPTHead machinery, S=1) → relu
inverse-depth head; bf16 compute; whole batch under one jit; resize-back is
part of the jitted graph (``jax.image.resize`` bicubic).

``convert_hf_dpt_checkpoint`` maps the HuggingFace ``DPTForDepthEstimation``
state dict onto this module for numerical parity when weights are present
(no network access in CI — the converter is exercised against randomly
initialized HF modules when ``transformers`` is importable).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.layers import Block, PatchEmbed

_IMAGENET_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
_IMAGENET_STD = np.array([0.5, 0.5, 0.5], np.float32)


class DPTBackbone(nn.Module):
    """ViT with cls token + learned pos embed, returning tapped layers."""

    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    taps: Sequence[int] = (5, 11, 17, 23)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        B, H, W, _ = images.shape
        x = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                       name="patch_embed")(images.astype(self.dtype))
        P = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, P + 1, self.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(self.dtype),
             x], axis=1) + pos.astype(self.dtype)
        taps = []
        want = set(self.taps)
        for i in range(self.depth):
            x = Block(self.num_heads, 4.0, qk_norm=False, init_values=None,
                      dtype=self.dtype, name=f"block_{i}")(x)
            if i in want:
                taps.append(x.astype(jnp.float32))
        return taps


class MonocularDepth(nn.Module):
    """DPT monocular depth: image (B, H, W, 3) in [0,1] → (B, H, W) depth."""

    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    taps: Sequence[int] = (5, 11, 17, 23)
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        B, H, W, _ = images.shape
        x = (images - _IMAGENET_MEAN) / _IMAGENET_STD
        taps = DPTBackbone(self.patch_size, self.embed_dim, self.depth,
                           self.num_heads, self.taps, self.dtype,
                           name="backbone")(x)
        gh, gw = H // self.patch_size, W // self.patch_size

        feats = []
        scale_ops = ["up4", "up2", "id", "down2"]
        for i, t in enumerate(taps):
            h = t[:, 1:, :]  # drop cls (DPT 'ignore' readout)
            h = h.reshape(B, gh, gw, self.embed_dim)
            h = nn.Conv(self.out_channels[i], (1, 1), name=f"project_{i}")(h)
            op = scale_ops[i]
            if op == "up4":
                h = nn.ConvTranspose(self.out_channels[i], (4, 4),
                                     strides=(4, 4), name=f"resize_{i}")(h)
            elif op == "up2":
                h = nn.ConvTranspose(self.out_channels[i], (2, 2),
                                     strides=(2, 2), name=f"resize_{i}")(h)
            elif op == "down2":
                h = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding="SAME", name=f"resize_{i}")(h)
            h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        name=f"scratch_{i}")(h)
            feats.append(h)

        from skix.models.vggt import _FusionBlock

        f4 = _FusionBlock(self.features, has_residual=False,
                          name="refine4")(feats[3])
        f3 = _FusionBlock(self.features, name="refine3")(f4, feats[2])
        f2 = _FusionBlock(self.features, name="refine2")(f3, feats[1])
        f1 = _FusionBlock(self.features, name="refine1")(f2, feats[0])

        h = nn.Conv(self.features // 2, (3, 3), padding="SAME",
                    name="head_conv1")(f1)
        Bh, hh, ww, _ = h.shape
        h = jax.image.resize(h, (Bh, hh * 2, ww * 2, h.shape[-1]), "bilinear")
        h = nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3")(h)
        h = nn.relu(h)[..., 0]
        # resize back to the input resolution (reference bicubic resize,
        # depth_estimation.py:117)
        return jax.image.resize(h, (B, H, W), "bicubic")


def estimate_depth_batched(model: MonocularDepth, variables, frames_u8,
                           batch_size: int = 8):
    """Chunked whole-clip depth: ``frames (T, H, W, 3) uint8`` →
    ``(T, 1, H, W) float32`` (pt_info contract layout)."""
    T = frames_u8.shape[0]
    from skix.utils.jitapply import apply_model
    fwd = lambda v, x: apply_model(model, None, v, x)  # noqa: E731
    outs = []
    for s in range(0, T, batch_size):
        chunk = jnp.asarray(frames_u8[s:s + batch_size], jnp.float32) / 255.0
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = jnp.pad(chunk, ((0, pad), (0, 0), (0, 0), (0, 0)))
        d = fwd(variables, chunk)
        outs.append(np.asarray(d[: batch_size - pad if pad else batch_size]))
    depth = np.concatenate(outs, axis=0)[:T]
    return depth[:, None, :, :]


def convert_hf_dpt_checkpoint(state_dict, cfg: MonocularDepth | None = None):
    """Map a HuggingFace ``DPTForDepthEstimation`` (Intel/dpt-large) torch
    state dict → Flax variables for :class:`MonocularDepth`.

    Key correspondences (HF naming):
    - ``dpt.embeddings.{cls_token,position_embeddings,patch_embeddings...}``
    - ``dpt.encoder.layer.{i}.{attention,intermediate,output,layernorm_*}``
    - ``neck.reassemble_stage.layers.{i}.projection/resize``
    - ``neck.convs.{i}`` (scratch 3×3), ``neck.fusion_stage.layers.{i}``
    - ``head.head.{0,2,4}``.
    """

    def np_of(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def lin(prefix):
        return {"kernel": np_of(state_dict[f"{prefix}.weight"]).T,
                "bias": np_of(state_dict[f"{prefix}.bias"])}

    def conv(prefix, transpose=False):
        w = np_of(state_dict[f"{prefix}.weight"])
        # torch conv: (out, in, kh, kw) → flax: (kh, kw, in, out);
        # torch convT: (in, out, kh, kw) → flax ConvTranspose: (kh, kw, in, out)
        w = w.transpose(2, 3, 1, 0) if not transpose else w.transpose(2, 3, 0, 1)
        out = {"kernel": w}
        if f"{prefix}.bias" in state_dict:
            out["bias"] = np_of(state_dict[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": np_of(state_dict[f"{prefix}.weight"]),
                "bias": np_of(state_dict[f"{prefix}.bias"])}

    cfg = cfg or MonocularDepth()
    p: dict = {"backbone": {}}
    bb = p["backbone"]
    bb["cls_token"] = np_of(state_dict["dpt.embeddings.cls_token"])
    bb["pos_embed"] = np_of(state_dict["dpt.embeddings.position_embeddings"])
    bb["patch_embed"] = {"proj": conv(
        "dpt.embeddings.patch_embeddings.projection")}
    for i in range(cfg.depth):
        pref = f"dpt.encoder.layer.{i}"
        q = lin(f"{pref}.attention.attention.query")
        k = lin(f"{pref}.attention.attention.key")
        v = lin(f"{pref}.attention.attention.value")
        qkv = {"kernel": np.concatenate([q["kernel"], k["kernel"],
                                         v["kernel"]], axis=1),
               "bias": np.concatenate([q["bias"], k["bias"], v["bias"]])}
        bb[f"block_{i}"] = {
            "norm1": ln(f"{pref}.layernorm_before"),
            "attn": {"qkv": qkv,
                     "proj": lin(f"{pref}.attention.output.dense")},
            "norm2": ln(f"{pref}.layernorm_after"),
            "mlp": {"fc1": lin(f"{pref}.intermediate.dense"),
                    "fc2": lin(f"{pref}.output.dense")},
        }
    # neck: reassemble projections + resizes
    for i in range(4):
        p[f"project_{i}"] = conv(
            f"neck.reassemble_stage.layers.{i}.projection")
        if i != 2:  # layer 2 is identity
            p[f"resize_{i}"] = conv(
                f"neck.reassemble_stage.layers.{i}.resize", transpose=(i < 2))
        p[f"scratch_{i}"] = conv(f"neck.convs.{i}")
    # fusion blocks: HF fusion layer 0 fuses the deepest tap (refine4)
    fuse_names = ["refine4", "refine3", "refine2", "refine1"]
    for i, name in enumerate(fuse_names):
        pref = f"neck.fusion_stage.layers.{i}"
        blk = {"out_conv": conv(f"{pref}.projection")}
        units = [("res_unit1", "residual_layer1"), ("res_unit2", "residual_layer2")]
        for ours, theirs in units:
            key1 = f"{pref}.{theirs}.convolution1"
            if f"{key1}.weight" in state_dict:
                blk[f"{ours}_conv1"] = conv(key1)
                blk[f"{ours}_conv2"] = conv(f"{pref}.{theirs}.convolution2")
        p[name] = blk
    p["head_conv1"] = conv("head.head.0")
    p["head_conv2"] = conv("head.head.2")
    p["head_conv3"] = conv("head.head.4")
    return {"params": jax.tree.map(jnp.asarray, p)}
