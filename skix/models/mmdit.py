"""Double-stream MMDiT for image editing + flow-matching sampler (Flax).

Capability parity with the reference's vendored Qwen-Image-Edit stack
(SURVEY.md §2.14): double-stream transformer with joint text+image
attention (image_edit/qwenimage/transformer_qwenimage.py:357
``QwenImageTransformerBlock``), 3D RoPE over (frame, y, x) positions
(:158 ``QwenEmbedRope``), timestep-modulated AdaLN streams, and the
4-step flow-matching inference loop (qwen_image_edit.py:145
``infer_camera_edit``, num_inference_steps=4). The FA3 attention processor
(qwen_fa3_processor.py) maps to skix.ops.attention.

This is the architecture + sampler at framework fidelity; production
checkpoints (20B-class) convert onto the same module tree when available.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.layers import Mlp, _rope_1d
from skix.ops.attention import flash_attention


def rope_3d(x, pos, base_freq: float = 10000.0, axes_dim=(8, 28, 28)):
    """3D RoPE over (t, y, x): split head-dim per axis (reference
    QwenEmbedRope:158 semantics). ``x (B, H, N, D)``, ``pos (B, N, 3)``."""
    parts = []
    start = 0
    for ax, d in enumerate(axes_dim):
        seg = x[..., start:start + d]
        parts.append(_rope_1d(seg, pos[..., ax][:, None, :], base_freq))
        start += d
    if start < x.shape[-1]:
        parts.append(x[..., start:])
    return jnp.concatenate(parts, axis=-1)


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class AdaLNModulation(nn.Module):
    dim: int
    n_params: int = 6

    @nn.compact
    def __call__(self, cond):
        h = nn.Dense(self.n_params * self.dim, name="mod")(nn.silu(cond))
        return jnp.split(h[:, None, :], self.n_params, axis=-1)


class JointBlock(nn.Module):
    """One double-stream block: separate AdaLN/MLP per stream, one joint
    attention over the concatenated [text, image] token set."""

    num_heads: int
    axes_dim: Sequence[int] = (8, 28, 28)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, txt, cond, img_pos, txt_pos):
        C = img.shape[-1]
        hd = C // self.num_heads

        i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = AdaLNModulation(
            C, name="img_mod")(cond)
        t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = AdaLNModulation(
            C, name="txt_mod")(cond)

        def qkv(stream, name):
            h = nn.DenseGeneral((3, self.num_heads, hd), axis=-1,
                                dtype=self.dtype, name=name)(stream)
            q, k, v = h[..., 0, :, :], h[..., 1, :, :], h[..., 2, :, :]
            # (B, N, H, hd) → (B, H, N, hd); RMS-ish qk norm
            q = nn.LayerNorm(use_bias=False, name=f"{name}_qn")(q)
            k = nn.LayerNorm(use_bias=False, name=f"{name}_kn")(k)
            return (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3))

        img_n = nn.LayerNorm(use_bias=False, use_scale=False,
                             name="img_norm1")(img) * (1 + i_sc1) + i_sh1
        txt_n = nn.LayerNorm(use_bias=False, use_scale=False,
                             name="txt_norm1")(txt) * (1 + t_sc1) + t_sh1
        qi, ki, vi = qkv(img_n, "img_qkv")
        qt, kt, vt = qkv(txt_n, "txt_qkv")

        Lt = txt.shape[1]
        q = jnp.concatenate([qt, qi], axis=2)
        k = jnp.concatenate([kt, ki], axis=2)
        v = jnp.concatenate([vt, vi], axis=2)
        # rope via fused cos/sin tables over the concatenated [txt, img]
        # sequence (positions are identical across the batch): the
        # rotate-half runs as a signed-permutation MXU matmul in the
        # kernel/XLA instead of per-stream relayout copies
        from skix.ops.attention import rope_3d_tables

        full_pos = jnp.concatenate([txt_pos[0], img_pos[0]], axis=0)
        cos, sin = rope_3d_tables(full_pos, hd, self.axes_dim)
        out = flash_attention(q, k, v, rope_cos=cos, rope_sin=sin,
                              rope_rotate=("segments",
                                           tuple(self.axes_dim)))
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[2], C)
        txt_att, img_att = out[:, :Lt], out[:, Lt:]

        img = img + i_g1 * nn.Dense(C, name="img_proj")(img_att)
        txt = txt + t_g1 * nn.Dense(C, name="txt_proj")(txt_att)

        img_n2 = nn.LayerNorm(use_bias=False, use_scale=False,
                              name="img_norm2")(img) * (1 + i_sc2) + i_sh2
        txt_n2 = nn.LayerNorm(use_bias=False, use_scale=False,
                              name="txt_norm2")(txt) * (1 + t_sc2) + t_sh2
        img = img + i_g2 * Mlp(4 * C, dtype=self.dtype, name="img_mlp")(img_n2)
        txt = txt + t_g2 * Mlp(4 * C, dtype=self.dtype, name="txt_mlp")(txt_n2)
        return img, txt


class MMDiT(nn.Module):
    """Velocity-prediction transformer over patchified image latents with
    text conditioning tokens."""

    patch_size: int = 2
    in_channels: int = 4
    dim: int = 256
    depth: int = 4
    num_heads: int = 4
    text_dim: int = 64
    axes_dim: Sequence[int] = (8, 28, 28)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, text_emb, timesteps):
        """``latents (B, H, W, Cin)``; ``text_emb (B, L, text_dim)``;
        ``timesteps (B,)`` in [0, 1] → predicted velocity, same shape as
        latents."""
        B, H, W, Cin = latents.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        x = latents.reshape(B, gh, p, gw, p, Cin).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, p * p * Cin)
        img = nn.Dense(self.dim, name="img_in")(x)
        txt = nn.Dense(self.dim, name="txt_in")(text_emb)
        cond = Mlp(self.dim, out_features=self.dim, name="time_embed")(
            timestep_embedding(timesteps, 256))

        ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        img_pos = jnp.asarray(np.stack(
            [np.zeros(gh * gw), ys.ravel(), xs.ravel()], -1), jnp.float32)
        img_pos = jnp.broadcast_to(img_pos[None], (B, gh * gw, 3))
        L = text_emb.shape[1]
        txt_pos = jnp.zeros((B, L, 3), jnp.float32).at[..., 0].set(
            jnp.arange(L, dtype=jnp.float32)[None] + 1.0)

        for i in range(self.depth):
            img, txt = JointBlock(self.num_heads, self.axes_dim, self.dtype,
                                  name=f"joint_{i}")(img, txt, cond,
                                                     img_pos, txt_pos)
        sh, sc = AdaLNModulation(self.dim, n_params=2, name="final_mod")(cond)
        img = nn.LayerNorm(use_bias=False, use_scale=False,
                           name="final_norm")(img) * (1 + sc) + sh
        out = nn.Dense(p * p * Cin, name="img_out")(img)
        out = out.reshape(B, gh, gw, p, p, Cin).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(B, H, W, Cin)


def flow_matching_edit(model: MMDiT, variables, latents, text_emb,
                       num_steps: int = 4, key=None, strength: float = 1.0):
    """Rectified-flow editing: start from a noised version of the source
    latents and integrate the learned velocity back with ``num_steps``
    Euler steps (the reference's 4-step schedule). jit-able."""
    if key is None:
        key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, latents.shape, latents.dtype)
    t0 = strength
    x = (1.0 - t0) * latents + t0 * noise
    ts = jnp.linspace(t0, 0.0, num_steps + 1)

    def body(i, x):
        t_cur = ts[i]
        t_next = ts[i + 1]
        B = x.shape[0]
        v = model.apply(variables, x, text_emb,
                        jnp.full((B,), t_cur, jnp.float32))
        return x + (t_next - t_cur) * v

    return jax.lax.fori_loop(0, num_steps, body, x)


# --------------------------------------------------------------------------
# Camera-motion prompt builder (reference qwen_image_edit.py:95-141)
# --------------------------------------------------------------------------
def build_camera_prompt(rotate_deg: float = 0.0, move_forward: float = 0.0,
                        vertical_tilt: float = 0.0,
                        wideangle: bool = False) -> str:
    """Map camera-motion controls to a bilingual edit prompt."""
    parts = []
    if abs(rotate_deg) > 0:
        side = "left" if rotate_deg > 0 else "right"
        side_zh = "左" if rotate_deg > 0 else "右"
        parts.append(f"Rotate the camera {abs(rotate_deg):.0f} degrees to "
                     f"the {side} 将镜头向{side_zh}旋转{abs(rotate_deg):.0f}度")
    if abs(move_forward) > 0:
        if move_forward > 0:
            parts.append("Move the camera forward 镜头前移")
        else:
            parts.append("Move the camera backward 镜头后移")
    if abs(vertical_tilt) > 0:
        if vertical_tilt > 0:
            parts.append("Tilt the camera upward 镜头上仰")
        else:
            parts.append("Tilt the camera downward 镜头下俯")
    if wideangle:
        parts.append("Switch to a wide-angle lens 切换到广角镜头")
    if not parts:
        parts.append("Keep the camera unchanged 保持镜头不变")
    return "; ".join(parts)


def embed_prompt_tokens(text: str, length: int = 16, dim: int = 64):
    """Deterministic per-token embedding (hash-seeded) — the slot a real
    text encoder drops into."""
    import hashlib

    toks = (text.lower().split() + ["<pad>"] * length)[:length]
    rows = []
    for tok in toks:
        h = hashlib.sha256(tok.encode()).digest()
        r = np.random.default_rng(int.from_bytes(h[:8], "little"))
        rows.append(r.normal(size=(dim,)).astype(np.float32))
    emb = np.stack(rows)
    return jnp.asarray(emb / (np.linalg.norm(emb, axis=-1, keepdims=True)
                              + 1e-9))
