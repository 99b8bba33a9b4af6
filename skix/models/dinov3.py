"""DINOv3-shaped ViT trunk (axial RoPE, storage tokens) + hub converter.

Reference capability: the SAM-3D-Body backbone factory enumerates six
``dinov3_*`` variants (prepare_side_results/sam_3d_body/models/backbones/
__init__.py:22-29) wrapped by ``Dinov3Backbone`` (backbones/dinov3.py:7),
which ``torch.hub.load``s facebookresearch/dinov3 with ``pretrained=False``
and returns the final layer's NORMALIZED patch tokens
(``get_intermediate_layers(n=1, reshape=True, norm=True)``, dinov3.py:35).
The reference vendors no DINOv3 source — only the hub param names are
visible in its own code (``cls_token``, ``storage_tokens``, ``pos_embed``,
``patch_embed``, ``blocks.N`` — dinov3.py:61-66).

This module implements the published DINOv3 architecture (ViT trunk where
learned positions are replaced by axial 2D RoPE on the PATCH tokens only;
a cls token plus ``n_storage_tokens`` register-style tokens prepend the
sequence and skip RoPE; pre-LN blocks with LayerScale; Mlp or gated-SiLU
FFN for the larger variants) and a converter targeting the hub state-dict
layout. Like the ALIKED converter (skix/perception/aliked.py), numeric
parity against real weights is UNVERIFIABLE in this zero-egress
environment — the reference itself runs the trunk with random weights
(``pretrained=False``) — so the tests pin the converter to a synthesized
state-dict spec (zero param-tree mismatches) and the RoPE math to its
invariants (norm preservation, prefix-token passthrough, relative-phase
structure).

RoPE (DINOv3 RopePositionEmbedding): patch-center coordinates normalized
to [-1, 1] per axis ("separate" mode; "min"/"max" divide both axes by the
shorter/longer side), D_head/4 periods per axis — geometric in ``base``
(default 100) or log-spaced in [min_period, max_period] — and angles
``2π·coord/period`` for (h, w) concatenated then duplicated so the
rotate-half convention applies. The train-time shift/jitter/rescale
coordinate augmentations are inference-irrelevant and omitted.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.layers import LayerScale


def dinov3_rope_periods(head_dim: int, base: Optional[float] = 100.0,
                        min_period: Optional[float] = None,
                        max_period: Optional[float] = None) -> np.ndarray:
    """(head_dim/4,) rotation periods — geometric in ``base`` or
    log-spaced between ``min_period`` and ``max_period``."""
    if head_dim % 4:
        raise ValueError("head_dim must be a multiple of 4 for 2D RoPE")
    n = head_dim // 4
    if min_period is not None and max_period is not None:
        exponents = np.linspace(0.0, 1.0, n)
        return (min_period
                * (max_period / min_period) ** exponents).astype(np.float32)
    if base is None:
        raise ValueError("need base or (min_period, max_period)")
    return (base ** (2.0 * np.arange(n) / (2 * n))).astype(np.float32)


def dinov3_rope_coords(gh: int, gw: int,
                       normalize_coords: str = "separate"
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Flattened patch-center coordinates in [-1, 1]: ``(hh, ww)`` each
    (gh·gw,). ``(i + 0.5) / size`` per axis ("separate"; "min"/"max"
    divide both axes by the shorter/longer side), then ``2c − 1``."""
    if normalize_coords == "separate":
        ch = (np.arange(gh) + 0.5) / gh
        cw = (np.arange(gw) + 0.5) / gw
    elif normalize_coords == "max":
        s = max(gh, gw)
        ch = (np.arange(gh) + 0.5) / s
        cw = (np.arange(gw) + 0.5) / s
    elif normalize_coords == "min":
        s = min(gh, gw)
        ch = (np.arange(gh) + 0.5) / s
        cw = (np.arange(gw) + 0.5) / s
    else:
        raise ValueError(f"unknown normalize_coords {normalize_coords!r}")
    ch = 2.0 * ch - 1.0
    cw = 2.0 * cw - 1.0
    return (np.repeat(ch, gw).astype(np.float32),
            np.tile(cw, gh).astype(np.float32))


def dinov3_rope_tables(gh: int, gw: int, periods: np.ndarray,
                       normalize_coords: str = "separate"
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Static-grid (gh·gw, head_dim) cos/sin tables (numpy oracle; the
    module computes the same from its ``rope_periods`` param). Angles
    ``2π·coord/period`` per axis, h/w concatenated then tiled twice
    (rotate-half layout)."""
    hh, ww = dinov3_rope_coords(gh, gw, normalize_coords)
    angles = np.concatenate([
        2.0 * math.pi * hh[:, None] / periods[None, :],
        2.0 * math.pi * ww[:, None] / periods[None, :]], -1)  # (N, hd/2)
    angles = np.concatenate([angles, angles], -1)             # (N, hd)
    return (np.cos(angles).astype(np.float32),
            np.sin(angles).astype(np.float32))


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class Dinov3Attention(nn.Module):
    """Self-attention with RoPE on the patch tokens only (the
    ``n_prefix`` cls/storage tokens pass through unrotated)."""

    num_heads: int
    n_prefix: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd).transpose(
            2, 0, 3, 1, 4)                                # (3, B, H, N, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]

        def rope(t):
            pre, pat = t[:, :, :self.n_prefix], t[:, :, self.n_prefix:]
            pat32 = pat.astype(jnp.float32)
            pat = (pat32 * cos[None, None]
                   + _rotate_half(pat32) * sin[None, None]).astype(t.dtype)
            return jnp.concatenate([pre, pat], axis=2)

        q, k = rope(q), rope(k)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        attn = nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class GatedFFN(nn.Module):
    """DINOv3's gated-SiLU FFN for the larger variants
    (``hidden = silu(w1·x) * (w2·x); out = w3·hidden``)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = nn.Dense(self.hidden, dtype=self.dtype, name="w1")(x)
        u = nn.Dense(self.hidden, dtype=self.dtype, name="w2")(x)
        return nn.Dense(x.shape[-1], dtype=self.dtype,
                        name="w3")(nn.silu(g) * u)


class Dinov3Block(nn.Module):
    num_heads: int
    n_prefix: int
    mlp_ratio: float = 4.0
    ffn: str = "mlp"            # "mlp" | "swiglu"
    ffn_hidden: Optional[int] = None  # explicit width (hub swiglu variants
                                      # round to alignment multiples)
    ln_eps: float = 1e-6        # DINO-family LayerNorm eps
    init_values: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin):
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="norm1")(x)
        h = Dinov3Attention(self.num_heads, self.n_prefix, self.dtype,
                            name="attn")(h, cos, sin)
        x = x + LayerScale(self.init_values, name="ls1")(h)
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="norm2")(x)
        hidden = (self.ffn_hidden if self.ffn_hidden is not None
                  else int(C * self.mlp_ratio))
        if self.ffn == "swiglu":
            h = GatedFFN(hidden, self.dtype, name="mlp")(h)
        else:
            h = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(h)
            h = nn.Dense(C, dtype=self.dtype,
                         name="mlp_fc2")(nn.gelu(h, approximate=False))
        return x + LayerScale(self.init_values, name="ls2")(h)


class Dinov3Trunk(nn.Module):
    """DINOv3-shaped encoder → final-layer NORMALIZED patch tokens
    (B, gh·gw, C) — exactly the slice ``Dinov3Backbone.forward`` consumes
    (get_intermediate_layers(n=1, norm=True); the caller reshapes)."""

    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    n_storage_tokens: int = 4
    mlp_ratio: float = 4.0
    ffn: str = "mlp"
    ffn_hidden: Optional[int] = None
    rope_base: Optional[float] = 100.0
    rope_min_period: Optional[float] = None
    rope_max_period: Optional[float] = None
    rope_normalize: str = "separate"
    ln_eps: float = 1e-6        # DINO-family LayerNorm eps
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        B, H, W, _ = images.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        x = nn.Conv(self.embed_dim,
                    (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(images)
        x = x.reshape(B, gh * gw, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        sto = self.param("storage_tokens", nn.initializers.zeros,
                         (1, self.n_storage_tokens, self.embed_dim))
        n_prefix = 1 + self.n_storage_tokens
        x = jnp.concatenate([
            jnp.broadcast_to(cls.astype(self.dtype),
                             (B, 1, self.embed_dim)),
            jnp.broadcast_to(sto.astype(self.dtype),
                             (B, self.n_storage_tokens, self.embed_dim)),
            x], axis=1)
        # RoPE periods live as a converted "parameter" so hub checkpoints
        # (which serialize the `periods` buffer) restore bit-exact; init
        # reproduces the base/min/max formula.
        hd = self.embed_dim // self.num_heads
        periods = self.param(
            "rope_periods",
            lambda rng: jnp.asarray(dinov3_rope_periods(
                hd, self.rope_base, self.rope_min_period,
                self.rope_max_period)),)
        hh, ww = dinov3_rope_coords(gh, gw, self.rope_normalize)
        # upstream holds periods as a NON-LEARNED buffer: stop gradients
        # so fine-tuning with a plain optimizer cannot drift the
        # rotation periods (the param still restores bit-exact)
        periods = jax.lax.stop_gradient(periods)
        ang = jnp.concatenate([
            2.0 * math.pi * jnp.asarray(hh)[:, None] / periods[None, :],
            2.0 * math.pi * jnp.asarray(ww)[:, None] / periods[None, :]],
            -1)
        ang = jnp.concatenate([ang, ang], -1)               # (N, hd)
        cos = jnp.cos(ang)
        sin = jnp.sin(ang)
        for i in range(self.depth):
            x = Dinov3Block(self.num_heads, n_prefix, self.mlp_ratio,
                            self.ffn, self.ffn_hidden, self.ln_eps,
                            dtype=self.dtype,
                            name=f"block_{i}")(x, cos, sin)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="norm")(x)
        return x[:, n_prefix:]


# ---------------------------------------------------------------------------
# hub converter
# ---------------------------------------------------------------------------

def _np_of(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


# Reference factory names (sam-3d-body backbones/__init__.py create_backbone
# `dinov3_*`) → published architecture hyperparameters. `ffn_hidden` is set
# where the hub variant rounds the SwiGLU width to an alignment multiple.
DINOV3_VARIANTS = {
    "dinov3_vits16": dict(embed_dim=384, depth=12, num_heads=6,
                          ffn="mlp", n_storage_tokens=4),
    "dinov3_vits16plus": dict(embed_dim=384, depth=12, num_heads=6,
                              ffn="swiglu", n_storage_tokens=4),
    "dinov3_vitb16": dict(embed_dim=768, depth=12, num_heads=12,
                          ffn="mlp", n_storage_tokens=4),
    "dinov3_vitl16": dict(embed_dim=1024, depth=24, num_heads=16,
                          ffn="mlp", n_storage_tokens=4),
    "dinov3_vith16plus": dict(embed_dim=1280, depth=32, num_heads=20,
                              ffn="swiglu", n_storage_tokens=4),
    "dinov3_vit7b16": dict(embed_dim=4096, depth=40, num_heads=32,
                           ffn="swiglu", ffn_hidden=8192,
                           n_storage_tokens=4,
                           rope_base=None, rope_min_period=0.5,
                           rope_max_period=90.0),
}


def infer_dinov3_config(state_dict) -> dict:
    """Infer Dinov3Trunk construction kwargs from a hub state dict's
    shapes (embed_dim/depth/ffn/ffn_hidden/n_storage_tokens, and
    num_heads via the serialized rope periods: head_dim = 4·len(periods))."""
    sd = {(k[len("encoder."):] if k.startswith("encoder.") else k): v
          for k, v in state_dict.items()}
    embed_dim = int(_np_of(sd["cls_token"]).shape[-1])
    cfg = {
        "embed_dim": embed_dim,
        "n_storage_tokens": int(_np_of(sd["storage_tokens"]).shape[1]),
        "patch_size": int(_np_of(sd["patch_embed.proj.weight"]).shape[-1]),
        "depth": 1 + max(int(k.split(".")[1]) for k in sd
                         if k.startswith("blocks.")),
    }
    if "blocks.0.mlp.w1.weight" in sd:
        cfg["ffn"] = "swiglu"
        cfg["ffn_hidden"] = int(_np_of(sd["blocks.0.mlp.w1.weight"]).shape[0])
    else:
        cfg["ffn"] = "mlp"
        cfg["ffn_hidden"] = int(_np_of(sd["blocks.0.mlp.fc1.weight"]).shape[0])
    if "rope_embed.periods" in sd:
        head_dim = 4 * int(_np_of(sd["rope_embed.periods"]).shape[0])
        cfg["num_heads"] = embed_dim // head_dim
    return cfg


def convert_dinov3_trunk(state_dict, ffn: str = "mlp",
                         head_dim: Optional[int] = None) -> dict:
    """facebookresearch/dinov3 hub ``state_dict()`` → flax variables for
    :class:`Dinov3Trunk`. Accepts an optional ``encoder.`` prefix (the
    reference wraps the hub model as ``self.encoder``, dinov3.py:16)."""
    sd = {(k[len("encoder."):] if k.startswith("encoder.") else k): v
          for k, v in state_dict.items()}

    def dense(pre):
        return {"kernel": jnp.asarray(_np_of(sd[f"{pre}.weight"]).T),
                "bias": jnp.asarray(_np_of(sd[f"{pre}.bias"]))}

    def ln(pre):
        return {"scale": jnp.asarray(_np_of(sd[f"{pre}.weight"])),
                "bias": jnp.asarray(_np_of(sd[f"{pre}.bias"]))}

    p: dict = {
        "patch_embed": {
            "kernel": jnp.asarray(_np_of(
                sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(_np_of(sd["patch_embed.proj.bias"]))},
        "cls_token": jnp.asarray(_np_of(sd["cls_token"])),
        "storage_tokens": jnp.asarray(_np_of(sd["storage_tokens"])),
        "norm": ln("norm"),
    }
    if "rope_embed.periods" in sd:
        p["rope_periods"] = jnp.asarray(_np_of(sd["rope_embed.periods"]))
    else:  # buffer serialized non-persistently → recompute from base
        if head_dim is None:
            raise ValueError("state dict has no rope_embed.periods — "
                             "pass head_dim to recompute the default "
                             "base-100 periods")
        p["rope_periods"] = jnp.asarray(dinov3_rope_periods(head_dim))
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        pre = f"blocks.{i}"
        blk = {
            "norm1": ln(f"{pre}.norm1"),
            "norm2": ln(f"{pre}.norm2"),
            "attn": {"qkv": dense(f"{pre}.attn.qkv"),
                     "proj": dense(f"{pre}.attn.proj")},
            "ls1": {"gamma": jnp.asarray(_np_of(sd[f"{pre}.ls1.gamma"]))},
            "ls2": {"gamma": jnp.asarray(_np_of(sd[f"{pre}.ls2.gamma"]))},
        }
        if ffn == "swiglu":
            blk["mlp"] = {"w1": dense(f"{pre}.mlp.w1"),
                          "w2": dense(f"{pre}.mlp.w2"),
                          "w3": dense(f"{pre}.mlp.w3")}
        else:
            blk["mlp_fc1"] = dense(f"{pre}.mlp.fc1")
            blk["mlp_fc2"] = dense(f"{pre}.mlp.fc2")
        p[f"block_{i}"] = blk
        i += 1
    return {"params": p}


def dinov3_reference_state_dict_spec(embed_dim: int = 384, depth: int = 12,
                                     num_heads: int = 6,
                                     n_storage_tokens: int = 4,
                                     patch_size: int = 16,
                                     mlp_ratio: float = 4.0,
                                     ffn: str = "mlp") -> dict:
    """Hub-layout state-dict entries → torch shapes (converter-test
    oracle; the source is hub-only and unreachable offline — the names
    the reference's own wrapper enumerates, dinov3.py:61-66, anchor the
    layout)."""
    spec = {
        "cls_token": (1, 1, embed_dim),
        "storage_tokens": (1, n_storage_tokens, embed_dim),
        "patch_embed.proj.weight": (embed_dim, 3, patch_size, patch_size),
        "patch_embed.proj.bias": (embed_dim,),
        "rope_embed.periods": (embed_dim // num_heads // 4,),
        "norm.weight": (embed_dim,),
        "norm.bias": (embed_dim,),
    }
    hidden = int(embed_dim * mlp_ratio)
    for i in range(depth):
        pre = f"blocks.{i}"
        spec[f"{pre}.norm1.weight"] = (embed_dim,)
        spec[f"{pre}.norm1.bias"] = (embed_dim,)
        spec[f"{pre}.norm2.weight"] = (embed_dim,)
        spec[f"{pre}.norm2.bias"] = (embed_dim,)
        spec[f"{pre}.attn.qkv.weight"] = (3 * embed_dim, embed_dim)
        spec[f"{pre}.attn.qkv.bias"] = (3 * embed_dim,)
        spec[f"{pre}.attn.proj.weight"] = (embed_dim, embed_dim)
        spec[f"{pre}.attn.proj.bias"] = (embed_dim,)
        spec[f"{pre}.ls1.gamma"] = (embed_dim,)
        spec[f"{pre}.ls2.gamma"] = (embed_dim,)
        if ffn == "swiglu":
            for w in ("w1", "w2"):
                spec[f"{pre}.mlp.{w}.weight"] = (hidden, embed_dim)
                spec[f"{pre}.mlp.{w}.bias"] = (hidden,)
            spec[f"{pre}.mlp.w3.weight"] = (embed_dim, hidden)
            spec[f"{pre}.mlp.w3.bias"] = (embed_dim,)
        else:
            spec[f"{pre}.mlp.fc1.weight"] = (hidden, embed_dim)
            spec[f"{pre}.mlp.fc1.bias"] = (hidden,)
            spec[f"{pre}.mlp.fc2.weight"] = (embed_dim, hidden)
            spec[f"{pre}.mlp.fc2.bias"] = (embed_dim,)
    return spec
