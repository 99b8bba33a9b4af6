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
        outs = {}
        want = set(self.taps)
        for i in range(self.depth):
            x = Block(self.num_heads, 4.0, qk_norm=False, init_values=None,
                      dtype=self.dtype, name=f"block_{i}")(x)
            if i in want:
                outs[i] = x.astype(jnp.float32)
        # honor REPEATED tap indices (tiny configs pad the 4-tap list
        # with the last layer — prepare_dataset.py depth_layers<4)
        return [outs[t] for t in self.taps]


class MonocularDepth(nn.Module):
    """DPT monocular depth: image (B, H, W, 3) in [0,1] → (B, H, W) depth."""

    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    taps: Sequence[int] = (5, 11, 17, 23)
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    # HF DPTReassembleStage readout: Intel/dpt-large (the reference's
    # checkpoint, depth_estimation.py:99) uses "project" — the cls token
    # concatenates onto every patch token and projects back through a
    # Linear+GELU (modeling_dpt.py readout_projects). "ignore" drops cls.
    readout: str = "project"
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
            h = t[:, 1:, :]
            if self.readout == "project":
                cls_tok = jnp.broadcast_to(t[:, :1, :], h.shape)
                h = nn.Dense(self.embed_dim, name=f"readout_{i}")(
                    jnp.concatenate([h, cls_tok], axis=-1))
                h = nn.gelu(h, approximate=False)
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
                # torch Conv2d(k=3, s=2, p=1): SYMMETRIC padding — flax
                # "SAME" pads (0, 1) on even inputs at stride 2 and the
                # windows shift one pixel (caught by the round-5 parity
                # rebuild at meaningful signal scale)
                h = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name=f"resize_{i}")(h)
            h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        name=f"scratch_{i}")(h)
            feats.append(h)

        from skix.models.vggt import _FusionBlock

        # HF DPT dialect: PRE-activation residual skips
        # (DPTPreActResidualLayer) and mismatched residuals resized to
        # the hidden state's size with align_corners=False — this model
        # converts from HF checkpoints, NOT from VGGT's vendored DPT,
        # whose inplace-ReLU skip the _FusionBlock default replicates.
        hf = dict(preact_residual=True, align_residual=True)
        f4 = _FusionBlock(self.features, has_residual=False,
                          name="refine4", **hf)(feats[3])
        f3 = _FusionBlock(self.features, name="refine3", **hf)(f4, feats[2])
        f2 = _FusionBlock(self.features, name="refine2", **hf)(f3, feats[1])
        f1 = _FusionBlock(self.features, name="refine1", **hf)(f2, feats[0])

        h = nn.Conv(self.features // 2, (3, 3), padding="SAME",
                    name="head_conv1")(f1)
        hh, ww = h.shape[1], h.shape[2]
        # HF head upsample is Upsample(scale=2, bilinear, ALIGN_CORNERS=TRUE)
        from skix.models.vggt import _resize_align_corners
        h = _resize_align_corners(h, (hh * 2, ww * 2))
        h = nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3")(h)
        h = nn.relu(h)[..., 0]
        # resize back to the input resolution (reference bicubic resize,
        # depth_estimation.py:117) — torch-exact kernel (Keys a=-0.75;
        # jax.image.resize "bicubic" uses a=-0.5 and deviates ~2%)
        return _resize_bicubic_torch(h, (H, W))


def _resize_bicubic_torch(x, out_hw):
    """Separable bicubic resize with torch ``interpolate(mode="bicubic",
    align_corners=False)`` semantics: half-pixel source mapping, Keys
    cubic-convolution kernel with a = −0.75, border-clamped taps.
    ``x (..., H, W)``; static tap indices/weights (numpy at trace time)."""
    H, W = x.shape[-2], x.shape[-1]
    h2, w2 = out_hw

    def taps(n1, n2):
        src = (np.arange(n2) + 0.5) * (n1 / n2) - 0.5
        t0 = np.floor(src).astype(np.int64)
        frac = (src - t0).astype(np.float64)
        a = -0.75
        offs = np.array([-1, 0, 1, 2])
        xs = np.abs(frac[:, None] - offs[None, :])        # (n2, 4)
        w = np.where(
            xs <= 1.0, (a + 2) * xs ** 3 - (a + 3) * xs ** 2 + 1.0,
            np.where(xs < 2.0,
                     a * xs ** 3 - 5 * a * xs ** 2 + 8 * a * xs - 4 * a,
                     0.0))
        idx = np.clip(t0[:, None] + offs[None, :], 0, n1 - 1)
        return idx, jnp.asarray(w.astype(np.float32))

    iy, wy = taps(H, h2)
    ix, wx = taps(W, w2)
    a = jnp.einsum("...hkw,hk->...hw", x[..., iy, :], wy)   # rows
    return jnp.einsum("...hwk,wk->...hw", a[..., ix], wx)   # cols


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
        # torch convT: (in, out, kh, kw) → flax ConvTranspose (kh, kw, in,
        # out) + SPATIAL FLIP — lax.conv_transpose does not mirror the
        # kernel (same fix as sam_decoder.py:258 / vggt_convert)
        w = (w.transpose(2, 3, 1, 0) if not transpose
             else w.transpose(2, 3, 0, 1)[::-1, ::-1])
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
    # neck: readout projects + reassemble projections + resizes
    for i in range(4):
        ro = f"neck.reassemble_stage.readout_projects.{i}.0"
        if f"{ro}.weight" in state_dict:
            p[f"readout_{i}"] = lin(ro)
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
