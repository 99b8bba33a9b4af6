"""VGGT-family multi-view transformer (Flax, Pallas attention).

Capability parity with the reference's vendored Meta VGGT-1B
(SURVEY.md §2.6):
- Aggregator with **alternating attention**: frame blocks attend within a
  frame ``(B·S, P, C)``, global blocks across all frames ``(B, S·P, C)``,
  ``aa_order=["frame", "global"]`` (reference
  vggt/vggt/models/aggregator.py:25,260,284);
- camera + register tokens with first-frame/rest split
  (aggregator.py:127-133, slice_expand_and_flatten :308);
- 2D RoPE (freq 100), QK-norm, LayerScale 0.01 (aggregator.py:60-70);
- CameraHead: adaLN-modulated trunk with iterative 9-D pose-encoding
  refinement [t(3), quat(4), fov(2)] (heads/camera_head.py:19,95);
- DPTHead: 4 intermediate taps → per-tap projection + resize → fusion
  refinement → dense depth / point map with confidence
  (heads/dpt_head.py:21);
- pose-encoding ↔ extrinsic/intrinsic conversions (utils/pose_enc.py:11).

TPU-first: images feature-last (B, S, H, W, 3); frame↔global reshapes are
free layout changes under XLA; all attention via the Pallas flash kernel;
bf16 compute with f32 LayerNorm/head outputs; `jax.checkpoint` on blocks
for training.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.geometry.rotations import matrix_to_quat, quat_to_matrix
from skix.models.layers import (Block, Mlp, PatchEmbed, VisionTransformer,
                                make_grid_positions)

_RESNET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_RESNET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# --------------------------------------------------------------------------
# pose encoding (reference utils/pose_enc.py)
# --------------------------------------------------------------------------
def extri_intri_to_pose_encoding(extrinsics, intrinsics, image_size_hw):
    """``extrinsics (..., 3, 4)``, ``intrinsics (..., 3, 3)`` → ``(..., 9)``
    [T(3), quat(4), fov_h, fov_w]."""
    R = extrinsics[..., :3, :3]
    T = extrinsics[..., :3, 3]
    quat = matrix_to_quat(R)
    H, W = image_size_hw
    fov_h = 2.0 * jnp.arctan((H / 2.0) / intrinsics[..., 1, 1])
    fov_w = 2.0 * jnp.arctan((W / 2.0) / intrinsics[..., 0, 0])
    return jnp.concatenate([T, quat, fov_h[..., None], fov_w[..., None]],
                           axis=-1)


def pose_encoding_to_extri_intri(pose_enc, image_size_hw):
    """Inverse of :func:`extri_intri_to_pose_encoding`."""
    T = pose_enc[..., :3]
    quat = pose_enc[..., 3:7]
    quat = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True) + 1e-9)
    R = quat_to_matrix(quat)
    extrinsics = jnp.concatenate([R, T[..., None]], axis=-1)
    H, W = image_size_hw
    fy = (H / 2.0) / jnp.tan(jnp.clip(pose_enc[..., 7] / 2.0, 1e-4))
    fx = (W / 2.0) / jnp.tan(jnp.clip(pose_enc[..., 8] / 2.0, 1e-4))
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    K = jnp.stack([
        jnp.stack([fx, zeros, jnp.full_like(fx, W / 2.0)], -1),
        jnp.stack([zeros, fy, jnp.full_like(fy, H / 2.0)], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], axis=-2)
    return extrinsics, K


def activate_head_output(x, activation: str):
    """Dense-head value activations (reference heads/head_act.py)."""
    if activation == "linear":
        return x
    if activation == "relu":
        return nn.relu(x)
    if activation == "exp":
        return jnp.exp(x)
    if activation == "inv_log":  # sign-preserving expm1 of |x|
        return jnp.sign(x) * (jnp.expm1(jnp.abs(x)))
    if activation == "expp1":
        return jnp.exp(x) + 1.0
    if activation == "expp0":
        return jnp.exp(x)
    raise ValueError(activation)


def activate_pose(pose_enc, trans_act="linear", quat_act="linear",
                  fl_act="relu"):
    t = activate_head_output(pose_enc[..., :3], trans_act)
    q = activate_head_output(pose_enc[..., 3:7], quat_act)
    f = activate_head_output(pose_enc[..., 7:], fl_act)
    return jnp.concatenate([t, q, f], axis=-1)


# --------------------------------------------------------------------------
# Aggregator
# --------------------------------------------------------------------------
class Aggregator(nn.Module):
    """Alternating frame/global attention over multi-view token sets.

    Input ``images (B, S, H, W, 3)`` in [0, 1] → list of per-layer token
    tensors ``(B, S, P', 2C)`` (frame‖global concat, reference
    aggregator.py:250-255) and ``patch_start_idx``.
    """

    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qk_norm: bool = True
    rope_freq: float = 100.0
    init_values: float = 0.01
    patch_embed_kind: str = "conv"  # "conv" | "vit"
    output_layers: Optional[Sequence[int]] = None  # None → all layers
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    # optional attention-core override for the GLOBAL blocks — the sequence-
    # parallel cut point (SURVEY §5.7, reference aggregator.py:284): e.g.
    # ``partial(ring_attention, mesh=mesh, axis="sp")`` shards the S·P token
    # axis over the mesh while frame blocks stay embarrassingly parallel.
    global_attn_fn: Optional[Callable] = None
    # qk_norm bounds the attention logits, so the Pallas kernel can skip
    # online-max bookkeeping (measured +8% fwd on v5e); None disables.
    attn_fixed_max: Optional[float] = 12.0

    @property
    def patch_start_idx(self) -> int:
        return 1 + self.num_register_tokens

    @nn.compact
    def __call__(self, images) -> Tuple[List[jnp.ndarray], int]:
        B, S, H, W, _ = images.shape
        x = (images - _RESNET_MEAN) / _RESNET_STD
        x = x.reshape(B * S, H, W, 3).astype(self.dtype)

        if self.patch_embed_kind == "conv":
            patch_tokens = PatchEmbed(self.patch_size, self.embed_dim,
                                      self.dtype, name="patch_embed")(x)
        else:
            patch_tokens = VisionTransformer(
                patch_size=self.patch_size, embed_dim=self.embed_dim,
                depth=self.depth, num_heads=self.num_heads,
                num_register_tokens=self.num_register_tokens,
                dtype=self.dtype, name="patch_embed")(x)
        P_patch = patch_tokens.shape[1]

        # first-frame vs rest token split (slice_expand_and_flatten :308)
        camera_token = self.param("camera_token",
                                  nn.initializers.normal(1e-6),
                                  (1, 2, 1, self.embed_dim))
        register_token = self.param("register_token",
                                    nn.initializers.normal(1e-6),
                                    (1, 2, self.num_register_tokens,
                                     self.embed_dim))

        def expand_special(tok):
            X = tok.shape[2]
            first = jnp.broadcast_to(tok[:, 0:1], (B, 1, X, self.embed_dim))
            rest = jnp.broadcast_to(tok[:, 1:2], (B, S - 1, X, self.embed_dim))
            return jnp.concatenate([first, rest], axis=1).reshape(
                B * S, X, self.embed_dim)

        tokens = jnp.concatenate(
            [expand_special(camera_token).astype(self.dtype),
             expand_special(register_token).astype(self.dtype),
             patch_tokens], axis=1)
        P = tokens.shape[1]

        # RoPE positions: special tokens at (0,0); patches at grid+1
        gh, gw = H // self.patch_size, W // self.patch_size
        grid = jnp.asarray(make_grid_positions(gh, gw)) + 1
        pos_frame = jnp.concatenate(
            [jnp.zeros((self.patch_start_idx, 2), jnp.int32), grid], axis=0)
        pos_bs = jnp.broadcast_to(pos_frame[None], (B * S, P, 2))
        pos_global = pos_bs.reshape(B, S * P, 2)

        block_kwargs = dict(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qk_norm=self.qk_norm, init_values=self.init_values,
            rope_freq=self.rope_freq, dtype=self.dtype,
            attn_fixed_max=self.attn_fixed_max if self.qk_norm else None,
            # every batch row shares the same position grid in both the
            # frame and global layouts → rope can fuse into the kernel
            rope_tables=True)

        # NOTE: at 518 px the frame layout (P=1374) and global layout
        # (S·P=2748 for stereo pairs) both hit flash_attention's S-fitted
        # two-even-tiles rule — aggregator fwd 65→55 ms/pair measured
        # (scripts/bench_vggt_blocks.py); no per-block overrides needed.
        outputs = []
        want = set(self.output_layers) if self.output_layers is not None else None
        BlockCls = nn.remat(Block) if self.remat else Block
        for i in range(self.depth):
            frame_blk = BlockCls(**block_kwargs, name=f"frame_block_{i}")
            global_blk = BlockCls(**block_kwargs,
                                  attn_fn=self.global_attn_fn,
                                  name=f"global_block_{i}")
            # frame attention: (B*S, P, C)
            tokens = frame_blk(tokens, pos_bs)
            frame_inter = tokens.reshape(B, S, P, self.embed_dim)
            # global attention: (B, S*P, C)
            tokens_g = tokens.reshape(B, S * P, self.embed_dim)
            tokens_g = global_blk(tokens_g, pos_global)
            tokens = tokens_g.reshape(B * S, P, self.embed_dim)
            global_inter = tokens.reshape(B, S, P, self.embed_dim)
            if want is None or i in want:
                outputs.append(jnp.concatenate(
                    [frame_inter, global_inter], axis=-1).astype(jnp.float32))
        return outputs, self.patch_start_idx


# --------------------------------------------------------------------------
# Camera head (iterative refinement)
# --------------------------------------------------------------------------
class CameraHead(nn.Module):
    """adaLN-modulated trunk, iterative delta refinement of the 9-D pose
    encoding (reference heads/camera_head.py:19-141)."""

    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 0.01
    num_iterations: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, camera_tokens):
        """``camera_tokens (B, S, C_in)`` → list of ``(B, S, 9)`` predictions
        (one per refinement iteration; last is final)."""
        B, S, C = camera_tokens.shape
        x = nn.LayerNorm(epsilon=1e-5, name="token_norm")(camera_tokens)

        empty_pose = self.param("empty_pose_tokens", nn.initializers.zeros,
                                (1, 1, 9))
        embed_pose = nn.Dense(self.dim_in, name="embed_pose")
        mod = nn.Dense(3 * self.dim_in, name="poseLN_modulation")
        trunk = [Block(self.num_heads, self.mlp_ratio,
                       init_values=self.init_values, dtype=self.dtype,
                       name=f"trunk_{i}") for i in range(self.trunk_depth)]
        trunk_norm = nn.LayerNorm(epsilon=1e-5, name="trunk_norm")
        adaln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             name="adaln_norm")
        pose_branch = Mlp(self.dim_in // 2, out_features=9,
                          name="pose_branch")

        pred = None
        preds = []
        for _ in range(self.num_iterations):
            if pred is None:
                inp = embed_pose(jnp.broadcast_to(empty_pose, (B, S, 9)))
            else:
                inp = embed_pose(jax.lax.stop_gradient(pred))
            shift, scale, gate = jnp.split(mod(nn.silu(inp)), 3, axis=-1)
            h = gate * (adaln(x) * (1 + scale) + shift) + x
            for blk in trunk:
                h = blk(h)
            delta = pose_branch(trunk_norm(h))
            pred = delta if pred is None else pred + delta
            preds.append(activate_pose(pred))
        return preds


# --------------------------------------------------------------------------
# DPT head (dense prediction)
# --------------------------------------------------------------------------
class _FusionBlock(nn.Module):
    """Reference FeatureFusionBlock (dpt_head.py:399): residual add →
    resConfUnit2 → align-corners-True resize to the NEXT level's size
    (``out_size``; scale 2 when None) → out_conv.

    Two DPT dialects share this block and differ in the residual skip:

    - VGGT's vendored DPT (default): ``ResidualConvUnit`` uses
      ``ReLU(inplace=True)`` (dpt_head.py:301,376) — ``out =
      activation(x)`` MUTATES x, so the skip at :386 adds ``relu(h)``.
    - HF transformers DPT (``preact_residual=True``, used by
      skix/models/dpt.py): ``DPTPreActResidualLayer`` returns
      ``conv_stack + hidden_state`` — the skip is the PRE-activation h,
      and ``DPTFeatureFusionLayer`` resizes a mismatched residual to the
      hidden state's size with align_corners=False
      (``align_residual=True``) before adding.
    """

    features: int
    has_residual: bool = True
    preact_residual: bool = False   # HF DPTPreActResidualLayer skip
    align_residual: bool = False    # HF mismatched-residual resize

    @nn.compact
    def __call__(self, x, res=None, out_size=None):
        def res_unit(h, name):
            a = nn.relu(h)
            out = nn.Conv(self.features, (3, 3), padding="SAME",
                          name=f"{name}_conv1")(a)
            out = nn.relu(out)
            out = nn.Conv(self.features, (3, 3), padding="SAME",
                          name=f"{name}_conv2")(out)
            return (h if self.preact_residual else a) + out

        if self.has_residual and res is not None:
            if self.align_residual and res.shape[1:3] != x.shape[1:3]:
                # HF: interpolate(residual, size=hidden, align_corners=False)
                # = jax.image.resize half-pixel bilinear
                res = jax.image.resize(
                    res, (*res.shape[:1], *x.shape[1:3], res.shape[-1]),
                    "bilinear")
            x = x + res_unit(res, "res_unit1")
        x = res_unit(x, "res_unit2")
        H, W = x.shape[1], x.shape[2]
        x = _resize_align_corners(
            x, out_size if out_size is not None else (H * 2, W * 2))
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


def _resize_align_corners(x, out_hw):
    """Separable bilinear resize with torch ``align_corners=True``
    semantics (reference dpt_head.py custom_interpolate): output index
    ``i`` samples source ``i·(n1−1)/(n2−1)``. ``x (..., H, W, C)``."""
    H, W = x.shape[-3], x.shape[-2]
    h2, w2 = out_hw

    def taps(n1, n2):
        src = (np.zeros(1) if n2 == 1
               else np.arange(n2) * (n1 - 1) / (n2 - 1))
        i0 = np.clip(np.floor(src).astype(np.int64), 0, n1 - 1)
        i1 = np.minimum(i0 + 1, n1 - 1)
        return i0, i1, jnp.asarray((src - i0).astype(np.float32))

    y0, y1, wy = taps(H, h2)
    x0, x1, wx = taps(W, w2)
    a = (x[..., y0, :, :] * (1 - wy)[:, None, None]
         + x[..., y1, :, :] * wy[:, None, None])
    return (a[..., x0, :] * (1 - wx)[:, None]
            + a[..., x1, :] * wx[:, None])


class DPTHead(nn.Module):
    """Dense prediction head over 4 aggregator taps
    (reference heads/dpt_head.py:21-140). ``feature_only`` +
    ``down_ratio`` give the track-head feature-extractor variant
    (track_head.py:50: output_conv1 keeps ``features`` channels and the
    fused map is align-corners-interpolated to ``H/down_ratio`` with no
    output head)."""

    dim_in: int = 2048
    patch_size: int = 14
    output_dim: int = 4          # e.g. 3 (depth xyz / points) + 1 conf
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    activation: str = "inv_log"
    conf_activation: str = "expp1"
    feature_only: bool = False
    down_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, taps, images_hw, patch_start_idx: int):
        """``taps``: list of 4 token tensors ``(B, S, P, dim_in)``;
        returns ``(pred (B, S, H, W, output_dim−1), conf (B, S, H, W))``
        — or ``(B, S, H/down_ratio, W/down_ratio, features)`` feature
        maps when ``feature_only``."""
        H, W = images_hw
        gh, gw = H // self.patch_size, W // self.patch_size
        feats = []
        scale_ops = ["up4", "up2", "id", "down2"]
        for i, t in enumerate(taps):
            B, S, P, C = t.shape
            x = t[:, :, patch_start_idx:, :]
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm_{i}")(x)
            x = x.reshape(B * S, gh, gw, C)
            x = nn.Conv(self.out_channels[i], (1, 1),
                        name=f"project_{i}")(x)
            op = scale_ops[i]
            if op == "up4":
                x = nn.ConvTranspose(self.out_channels[i], (4, 4),
                                     strides=(4, 4), name=f"resize_{i}")(x)
            elif op == "up2":
                x = nn.ConvTranspose(self.out_channels[i], (2, 2),
                                     strides=(2, 2), name=f"resize_{i}")(x)
            elif op == "down2":
                x = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding="SAME", name=f"resize_{i}")(x)
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        name=f"scratch_{i}")(x)
            feats.append(x)

        f4 = _FusionBlock(self.features, has_residual=False,
                          name="refine4")(feats[3],
                                          out_size=feats[2].shape[1:3])
        f3 = _FusionBlock(self.features, name="refine3")(
            f4, feats[2], out_size=feats[1].shape[1:3])
        f2 = _FusionBlock(self.features, name="refine2")(
            f3, feats[1], out_size=feats[0].shape[1:3])
        f1 = _FusionBlock(self.features, name="refine1")(f2, feats[0])

        if self.feature_only:
            B = taps[0].shape[0]
            S = taps[0].shape[1]
            h = nn.Conv(self.features, (3, 3), padding="SAME",
                        name="out_conv1")(f1)
            h = _resize_align_corners(
                h, (H // self.down_ratio, W // self.down_ratio))
            return h.reshape(B, S, *h.shape[1:])

        h = nn.Conv(self.features // 2, (3, 3), padding="SAME",
                    name="out_conv1")(f1)
        h = _resize_align_corners(h, (H, W))
        h = nn.Conv(32, (3, 3), padding="SAME", name="out_conv2a")(h)
        h = nn.relu(h)
        h = nn.Conv(self.output_dim, (1, 1), name="out_conv2b")(h)

        B = taps[0].shape[0]
        S = taps[0].shape[1]
        h = h.reshape(B, S, H, W, self.output_dim)
        pred = activate_head_output(h[..., :-1], self.activation)
        conf = activate_head_output(h[..., -1], self.conf_activation)
        return pred, conf


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------
class VGGT(nn.Module):
    """Aggregator + camera / depth / point heads (reference
    vggt/vggt/models/vggt.py:17; the CoTracker-style track head lives in
    ``skix/models/track_head.py`` and consumes the aggregator tokens this
    module exposes via ``return_tokens``)."""

    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    enable_depth: bool = True
    enable_point: bool = True
    intermediate_layer_idx: Sequence[int] = (4, 11, 17, 23)
    patch_embed_kind: str = "conv"
    remat: bool = False  # rematerialize aggregator blocks (training)
    return_tokens: bool = False  # expose (B,S,gh,gw,2E) patch tokens
    return_taps: bool = False    # expose the 4 intermediate tap tensors
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """``images (B, S, H, W, 3)`` in [0,1] → dict of predictions."""
        B, S, H, W, _ = images.shape
        needed = set(self.intermediate_layer_idx) | {self.depth - 1}
        agg = Aggregator(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads,
            patch_embed_kind=self.patch_embed_kind,
            output_layers=sorted(needed), remat=self.remat,
            dtype=self.dtype, name="aggregator")
        outputs, patch_start = agg(images)
        layer_of = {L: i for i, L in enumerate(sorted(needed))}
        last = outputs[layer_of[self.depth - 1]]

        result = {}
        cam_preds = CameraHead(dim_in=2 * self.embed_dim,
                               dtype=self.dtype, name="camera_head")(
            last[:, :, 0, :])
        result["pose_enc"] = cam_preds[-1]
        result["pose_enc_list"] = cam_preds

        taps = [outputs[layer_of[L]] for L in self.intermediate_layer_idx]
        if self.enable_depth:
            depth, depth_conf = DPTHead(
                dim_in=2 * self.embed_dim, patch_size=self.patch_size,
                output_dim=2, activation="exp", conf_activation="expp1",
                dtype=self.dtype, name="depth_head")(taps, (H, W), patch_start)
            result["depth"] = depth
            result["depth_conf"] = depth_conf
        if self.enable_point:
            pts, pt_conf = DPTHead(
                dim_in=2 * self.embed_dim, patch_size=self.patch_size,
                output_dim=4, activation="inv_log", conf_activation="expp1",
                dtype=self.dtype, name="point_head")(taps, (H, W), patch_start)
            result["world_points"] = pts
            result["world_points_conf"] = pt_conf
        if self.return_tokens:
            gh = H // self.patch_size
            gw = W // self.patch_size
            result["tokens"] = last[:, :, patch_start:, :].reshape(
                B, S, gh, gw, last.shape[-1])
        if self.return_taps:
            # full tap tensors (incl. special tokens) for the track head
            result["taps"] = tuple(taps)
            result["patch_start_idx"] = patch_start
        return result


def unproject_depth_to_points(depth, extrinsics, intrinsics):
    """Depth map ``(..., H, W)`` + cameras → world points ``(..., H, W, 3)``
    (reference utils/geometry.py unproject_depth_map_to_point_map)."""
    depth = jnp.asarray(depth)
    H, W = depth.shape[-2:]
    # integer pixel coordinates, matching the reference convention
    # (utils/geometry.py:107 np.meshgrid(np.arange(W), np.arange(H))) so
    # converted-checkpoint outputs stay numerically comparable.
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    x_cam = (grid_x - cx) / fx * depth
    y_cam = (grid_y - cy) / fy * depth
    cam_pts = jnp.stack([x_cam, y_cam, depth], axis=-1)
    R = extrinsics[..., :3, :3]
    t = extrinsics[..., :3, 3]
    # world = Rᵀ (cam − t)
    return jnp.einsum("...ji,...hwj->...hwi", R, cam_pts - t[..., None, None, :])
