"""Qwen-Image double-stream DiT (reference structure) + edit samplers.

Reference-structure-exact rebuild of the vendored Qwen-Image-Edit
denoiser (image_edit/qwenimage/transformer_qwenimage.py:472
``QwenImageTransformer2DModel``):

- double-stream blocks (:357 ``QwenImageTransformerBlock``): per-stream
  AdaLN modulation (one SiLU→Linear producing shift/scale/gate for BOTH
  norm1 and norm2), joint attention over the concatenated [text, image]
  token set with per-stream QKV projections and per-head RMS qk-norm
  (:256 ``QwenDoubleStreamAttnProcessor2_0``), gelu-tanh FeedForwards;
- 3D rope with the ``scale_rope`` centered height/width positions and
  text positions offset past the largest image extent (:158
  ``QwenEmbedRope``), applied in the INTERLEAVED complex-pair convention
  (:94 ``apply_rotary_emb_qwen`` with ``use_real=False``) — fused into
  the flash kernel via cos/sin tables + the interleaved signed
  permutation (skix.ops.attention);
- timestep conditioning ``Timesteps(256, flip_sin_to_cos, shift=0,
  scale=1000)`` → two-layer SiLU MLP (:142), RMSNorm + projection on the
  text stream, AdaLayerNormContinuous head (:540 ``norm_out``) and the
  patch²·out_channels ``proj_out``.

``convert_qwen_image_transformer`` maps a torch state dict of the
vendored module 1:1 onto this tree (parity-tested against the imported
reference module in tests/test_mmdit.py). ``edit_plus_sample``
implements the reference Edit-Plus inference semantics
(pipeline_qwenimage_edit_plus.py:804-823): VAE-encoded source-image
latents concatenated along the image-token sequence axis each step,
velocity sliced back to the noise tokens, true-CFG over negative prompt
embeds with the cond-norm rescale (:836-840), and the dynamically
shifted flow-match sigma schedule (:744-759). ``flow_matching_edit``
keeps the SDEdit strength-noising alternative.

The quirk that ``encoder_hidden_states_mask`` is accepted but not
applied inside attention is faithful to the reference processor
(transformer_qwenimage.py:275,328-336: only ``attention_mask`` — which
the pipeline never supplies — reaches the attention op).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models.layers import _rope_1d
from skix.ops.attention import flash_attention, interleaved_rope_tables


# --------------------------------------------------------------------------
# latent packing (pipeline_qwenimage_edit_plus.py:386 _pack_latents /
# :395 _unpack_latents, NHWC here)
# --------------------------------------------------------------------------
def pack_latents(x):
    """``(B, h, w, C)`` NHWC latents → ``(B, h/2·w/2, C·4)`` tokens with
    the reference's (channel, py, px) feature ordering."""
    B, h, w, C = x.shape
    x = x.reshape(B, h // 2, 2, w // 2, 2, C).transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, (h // 2) * (w // 2), C * 4)


def unpack_latents(x, h: int, w: int):
    """Inverse of :func:`pack_latents` → ``(B, h, w, C)``."""
    B, S, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, h // 2, w // 2, C, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, h, w, C)


# --------------------------------------------------------------------------
# rope (QwenEmbedRope:158 semantics, scale_rope=True)
# --------------------------------------------------------------------------
def qwen_rope_angles(video_fhw, txt_len: int, axes_dim=(16, 56, 56),
                     theta: float = 10000.0, scale_rope: bool = True):
    """Per-pair rotation angles for the joint sequence.

    ``video_fhw``: static tuple of ``(frames, height, width)`` token
    grids — target first, then each source image (the pipeline's
    ``img_shapes``, pipeline_qwenimage_edit_plus.py:733). Image ``idx``
    uses frame positions ``idx..idx+f-1`` (QwenEmbedRope:242), height /
    width use the centered ``[-(ceil/2), floor/2)`` positions when
    ``scale_rope`` (:244-247), and text positions start past the largest
    half-extent (:225-231). Returns numpy ``(S_img, D/2)``, ``(L, D/2)``
    angle arrays for :func:`interleaved_rope_tables`.
    """
    inv = [1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
           for d in axes_dim]
    img_parts = []
    max_vid = 0
    for idx, (f, h, w) in enumerate(video_fhw):
        pf = np.arange(idx, idx + f, dtype=np.float64)
        if scale_rope:
            ph = np.arange(-(h - h // 2), h // 2, dtype=np.float64)
            pw = np.arange(-(w - w // 2), w // 2, dtype=np.float64)
            max_vid = max(max_vid, h // 2, w // 2)
        else:
            ph = np.arange(h, dtype=np.float64)
            pw = np.arange(w, dtype=np.float64)
            max_vid = max(max_vid, h, w)
        af = np.broadcast_to((pf[:, None] * inv[0])[:, None, None, :],
                             (f, h, w, len(inv[0])))
        ah = np.broadcast_to((ph[:, None] * inv[1])[None, :, None, :],
                             (f, h, w, len(inv[1])))
        aw = np.broadcast_to((pw[:, None] * inv[2])[None, None, :, :],
                             (f, h, w, len(inv[2])))
        img_parts.append(
            np.concatenate([af, ah, aw], axis=-1).reshape(f * h * w, -1))
    img_angles = np.concatenate(img_parts, axis=0)
    pt = np.arange(max_vid, max_vid + txt_len, dtype=np.float64)
    txt_angles = np.concatenate([pt[:, None] * iv for iv in inv], axis=-1)
    return img_angles.astype(np.float32), txt_angles.astype(np.float32)


# --------------------------------------------------------------------------
# modules
# --------------------------------------------------------------------------
class QwenTimestepEmbed(nn.Module):
    """``Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0,
    scale=1000)`` → ``TimestepEmbedding`` (transformer_qwenimage.py:142).
    Input ``t`` is the pipeline's ``timestep/1000`` (= sigma)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        half = 128
        freqs = jnp.asarray(
            np.exp(-np.log(10000.0) * np.arange(half) / half), jnp.float32)
        args = t.astype(jnp.float32)[:, None] * freqs[None] * 1000.0
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(
            emb.astype(self.dtype))
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(
            nn.silu(h))


class QwenImageBlock(nn.Module):
    """One double-stream block (transformer_qwenimage.py:357)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, txt, temb, rope_cos, rope_sin):
        C = self.num_heads * self.head_dim
        B, L = txt.shape[0], txt.shape[1]
        S = img.shape[1]

        # one modulation per stream: (shift, scale, gate) × (norm1, norm2)
        mod_i = nn.Dense(6 * C, dtype=self.dtype, name="img_mod")(
            nn.silu(temb))[:, None, :]
        mod_t = nn.Dense(6 * C, dtype=self.dtype, name="txt_mod")(
            nn.silu(temb))[:, None, :]
        i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = jnp.split(mod_i, 6, axis=-1)
        t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = jnp.split(mod_t, 6, axis=-1)

        def ln(name):
            return nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                use_scale=False, name=name)

        def heads(x):
            return x.reshape(B, x.shape[1], self.num_heads, self.head_dim)

        img_n = ln("img_norm1")(img) * (1 + i_sc1) + i_sh1
        txt_n = ln("txt_norm1")(txt) * (1 + t_sc1) + t_sh1

        qi = nn.RMSNorm(epsilon=1e-6, name="norm_q")(
            heads(nn.Dense(C, dtype=self.dtype, name="to_q")(img_n)))
        ki = nn.RMSNorm(epsilon=1e-6, name="norm_k")(
            heads(nn.Dense(C, dtype=self.dtype, name="to_k")(img_n)))
        vi = heads(nn.Dense(C, dtype=self.dtype, name="to_v")(img_n))
        qt = nn.RMSNorm(epsilon=1e-6, name="norm_added_q")(
            heads(nn.Dense(C, dtype=self.dtype, name="add_q_proj")(txt_n)))
        kt = nn.RMSNorm(epsilon=1e-6, name="norm_added_k")(
            heads(nn.Dense(C, dtype=self.dtype, name="add_k_proj")(txt_n)))
        vt = heads(nn.Dense(C, dtype=self.dtype, name="add_v_proj")(txt_n))

        # joint attention, [text, image] order; rope rides the kernel's
        # cos/sin tables in the interleaved complex-pair convention
        q = jnp.concatenate([qt, qi], axis=1).transpose(0, 2, 1, 3)
        k = jnp.concatenate([kt, ki], axis=1).transpose(0, 2, 1, 3)
        v = jnp.concatenate([vt, vi], axis=1).transpose(0, 2, 1, 3)
        out = flash_attention(q, k, v, rope_cos=rope_cos, rope_sin=rope_sin,
                              rope_rotate="interleaved")
        out = out.transpose(0, 2, 1, 3).reshape(B, L + S, C)
        txt_att, img_att = out[:, :L], out[:, L:]

        img = img + i_g1 * nn.Dense(C, dtype=self.dtype,
                                    name="to_out")(img_att)
        txt = txt + t_g1 * nn.Dense(C, dtype=self.dtype,
                                    name="to_add_out")(txt_att)

        img_n2 = ln("img_norm2")(img) * (1 + i_sc2) + i_sh2
        h = nn.gelu(nn.Dense(4 * C, dtype=self.dtype,
                             name="img_mlp_in")(img_n2), approximate=True)
        img = img + i_g2 * nn.Dense(C, dtype=self.dtype,
                                    name="img_mlp_out")(h)
        txt_n2 = ln("txt_norm2")(txt) * (1 + t_sc2) + t_sh2
        h = nn.gelu(nn.Dense(4 * C, dtype=self.dtype,
                             name="txt_mlp_in")(txt_n2), approximate=True)
        txt = txt + t_g2 * nn.Dense(C, dtype=self.dtype,
                                    name="txt_mlp_out")(h)
        return img, txt


class QwenImageDiT(nn.Module):
    """The reference denoiser (transformer_qwenimage.py:472) in Flax.

    Operates on PACKED latent tokens ``(B, S, in_channels)`` (the
    pipeline packs 2×2 latent patches before the transformer); returns
    per-token ``patch_size²·out_channels`` — the caller slices the first
    ``S_target`` tokens and unpacks.
    """

    patch_size: int = 2
    in_channels: int = 64
    out_channels: int = 16
    num_layers: int = 4
    attention_head_dim: int = 32
    num_attention_heads: int = 4
    joint_attention_dim: int = 64
    axes_dims_rope: Sequence[int] = (16, 8, 8)
    theta: float = 10000.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states, timestep,
                 video_fhw: Tuple[Tuple[int, int, int], ...],
                 encoder_hidden_states_mask=None):
        """``hidden_states (B, S, Cin)`` packed latents (target tokens
        first, then source-image tokens); ``encoder_hidden_states
        (B, L, joint_dim)``; ``timestep (B,)`` = sigma (the pipeline's
        ``t/1000``); ``video_fhw`` STATIC token-grid shapes, target
        first. The mask argument is accepted for signature parity but —
        like the reference — does not reach the attention op."""
        del encoder_hidden_states_mask
        B, S, _ = hidden_states.shape
        L = encoder_hidden_states.shape[1]
        D = self.attention_head_dim
        assert sum(self.axes_dims_rope) == D, \
            f"axes_dims_rope {self.axes_dims_rope} must sum to {D}"
        assert S == sum(f * h * w for f, h, w in video_fhw), \
            f"token count {S} != video_fhw {video_fhw}"
        inner = self.num_attention_heads * D

        img = nn.Dense(inner, dtype=self.dtype, name="img_in")(hidden_states)
        txt = nn.RMSNorm(epsilon=1e-6, name="txt_norm")(encoder_hidden_states)
        txt = nn.Dense(inner, dtype=self.dtype, name="txt_in")(txt)
        temb = QwenTimestepEmbed(inner, dtype=self.dtype,
                                 name="time_text_embed")(timestep)

        img_ang, txt_ang = qwen_rope_angles(
            tuple(tuple(s) for s in video_fhw), L,
            tuple(self.axes_dims_rope), self.theta)
        ang = jnp.concatenate(
            [jnp.asarray(txt_ang), jnp.asarray(img_ang)], axis=0)
        cos, sin = interleaved_rope_tables(ang)

        for i in range(self.num_layers):
            img, txt = QwenImageBlock(self.num_attention_heads, D,
                                      self.dtype,
                                      name=f"blocks_{i}")(img, txt, temb,
                                                          cos, sin)

        # AdaLayerNormContinuous (norm_out): scale FIRST, then shift
        e = nn.Dense(2 * inner, dtype=self.dtype,
                     name="norm_out_linear")(nn.silu(temb))
        scale, shift = jnp.split(e, 2, axis=-1)
        img = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                           name="norm_out")(img)
        img = img * (1 + scale[:, None]) + shift[:, None]
        return nn.Dense(self.patch_size ** 2 * self.out_channels,
                        dtype=self.dtype, name="proj_out")(img)


# --------------------------------------------------------------------------
# converter (vendored torch module → this tree; zero unmatched keys)
# --------------------------------------------------------------------------
def convert_qwen_image_transformer(state_dict):
    """Map a ``QwenImageTransformer2DModel`` torch state dict onto
    :class:`QwenImageDiT` variables. Raises on any unconsumed key so a
    real checkpoint either converts fully or fails loudly."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}
    used = set()

    def lin(key):
        used.add(f"{key}.weight")
        used.add(f"{key}.bias")
        return {"kernel": sd[f"{key}.weight"].T.copy(),
                "bias": sd[f"{key}.bias"].copy()}

    def rms(key):
        used.add(f"{key}.weight")
        return {"scale": sd[f"{key}.weight"].copy()}

    params = {
        "img_in": lin("img_in"),
        "txt_in": lin("txt_in"),
        "txt_norm": rms("txt_norm"),
        "time_text_embed": {
            "linear_1": lin("time_text_embed.timestep_embedder.linear_1"),
            "linear_2": lin("time_text_embed.timestep_embedder.linear_2"),
        },
        "norm_out_linear": lin("norm_out.linear"),
        "proj_out": lin("proj_out"),
    }
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("transformer_blocks."))
    for i in range(n_layers):
        p = f"transformer_blocks.{i}"
        params[f"blocks_{i}"] = {
            "img_mod": lin(f"{p}.img_mod.1"),
            "txt_mod": lin(f"{p}.txt_mod.1"),
            "to_q": lin(f"{p}.attn.to_q"),
            "to_k": lin(f"{p}.attn.to_k"),
            "to_v": lin(f"{p}.attn.to_v"),
            "add_q_proj": lin(f"{p}.attn.add_q_proj"),
            "add_k_proj": lin(f"{p}.attn.add_k_proj"),
            "add_v_proj": lin(f"{p}.attn.add_v_proj"),
            "norm_q": rms(f"{p}.attn.norm_q"),
            "norm_k": rms(f"{p}.attn.norm_k"),
            "norm_added_q": rms(f"{p}.attn.norm_added_q"),
            "norm_added_k": rms(f"{p}.attn.norm_added_k"),
            "to_out": lin(f"{p}.attn.to_out.0"),
            "to_add_out": lin(f"{p}.attn.to_add_out"),
            "img_mlp_in": lin(f"{p}.img_mlp.net.0.proj"),
            "img_mlp_out": lin(f"{p}.img_mlp.net.2"),
            "txt_mlp_in": lin(f"{p}.txt_mlp.net.0.proj"),
            "txt_mlp_out": lin(f"{p}.txt_mlp.net.2"),
        }
    unmatched = sorted(set(sd) - used)
    if unmatched:
        raise ValueError(f"unconverted reference keys: {unmatched[:8]}"
                         f"{'...' if len(unmatched) > 8 else ''}")
    return {"params": params}


# --------------------------------------------------------------------------
# samplers
# --------------------------------------------------------------------------
def flow_match_sigmas(num_steps: int, image_seq_len: int,
                      base_image_seq_len: int = 256,
                      max_image_seq_len: int = 4096,
                      base_shift: float = 0.5, max_shift: float = 1.15):
    """Dynamically shifted flow-match schedule: ``linspace(1, 1/N)``
    sigmas through the exponential time shift at
    ``mu = calculate_shift(seq_len)`` with a terminal 0
    (pipeline_qwenimage_edit_plus.py:744-759 +
    FlowMatchEulerDiscreteScheduler dynamic shifting)."""
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
    m = (max_shift - base_shift) / (max_image_seq_len - base_image_seq_len)
    mu = image_seq_len * m + base_shift - m * base_image_seq_len
    shifted = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))
    return np.append(shifted, 0.0).astype(np.float32)


def edit_plus_sample(model: QwenImageDiT, variables, latents, image_latents,
                     prompt_emb, video_fhw, *, negative_prompt_emb=None,
                     true_cfg_scale: float = 4.0, num_steps: int = 4,
                     sigmas=None):
    """Reference Edit-Plus denoising loop
    (pipeline_qwenimage_edit_plus.py:795-844): ``latents (B, S_tgt, C)``
    start as pure noise; each step the source-image tokens
    ``image_latents (B, S_src, C)`` are concatenated along the sequence
    axis, the velocity is sliced back to the noise tokens, true-CFG
    combines positive/negative predictions with the cond-norm rescale,
    and an Euler step advances the shifted sigma schedule. jit-able
    (``video_fhw`` static)."""
    S_tgt = latents.shape[1]
    if sigmas is None:
        sigmas = flow_match_sigmas(num_steps, S_tgt)
    sig = jnp.asarray(sigmas, jnp.float32)
    do_cfg = negative_prompt_emb is not None and true_cfg_scale > 1.0

    def velocity(x_in, emb, t):
        return model.apply(variables, x_in, emb, t, video_fhw)[:, :S_tgt]

    def body(i, x):
        x_in = x if image_latents is None else \
            jnp.concatenate([x, image_latents], axis=1)
        t = jnp.full((x.shape[0],), sig[i], x.dtype)
        v = velocity(x_in, prompt_emb, t)
        if do_cfg:
            v_neg = velocity(x_in, negative_prompt_emb, t)
            comb = v_neg + true_cfg_scale * (v - v_neg)
            cond_norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
            comb_norm = jnp.linalg.norm(comb, axis=-1, keepdims=True)
            v = comb * (cond_norm / comb_norm)
        return x + (sig[i + 1] - sig[i]) * v

    return jax.lax.fori_loop(0, len(sigmas) - 1, body, latents)


def flow_matching_edit(model: QwenImageDiT, variables, latents, prompt_emb,
                       video_fhw, num_steps: int = 4, key=None,
                       strength: float = 1.0):
    """SDEdit-style alternative (kept as an option): noise the PACKED
    source tokens to ``t0 = strength`` and integrate the velocity back
    with Euler steps — the conditioning mechanism the repo shipped before
    Edit-Plus; a converted reference checkpoint should prefer
    :func:`edit_plus_sample`."""
    if key is None:
        key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, latents.shape, latents.dtype)
    t0 = strength
    x = (1.0 - t0) * latents + t0 * noise
    ts = jnp.linspace(t0, 0.0, num_steps + 1)

    def body(i, x):
        t_cur, t_next = ts[i], ts[i + 1]
        v = model.apply(variables, x, prompt_emb,
                        jnp.full((x.shape[0],), t_cur, jnp.float32),
                        video_fhw)
        return x + (t_next - t_cur) * v

    return jax.lax.fori_loop(0, num_steps, body, x)


# --------------------------------------------------------------------------
# legacy helpers (other modules' tests exercise these conventions)
# --------------------------------------------------------------------------
def rope_3d(x, pos, base_freq: float = 10000.0, axes_dim=(8, 28, 28)):
    """3D rope in the per-axis rotate-half-segment convention
    (``x (B, H, N, D)``, ``pos (B, N, 3)``) — kept for the segmented
    kernel-table parity tests (tests/test_ops.py)."""
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
    """Generic sinusoidal embedding (cos|sin) used by training utilities."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


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
    """Deterministic per-token embedding (hash-seeded) — the smoke-only
    stand-in behind ``smoke_text: true``."""
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
