"""SAM-3D-Body-family single-image 3D human estimator (Flax).

Capability parity with the reference's vendored Meta sam-3d-body
(SURVEY.md §2.7): top-down crop pipeline → ViT backbone → promptable
cross-attention decoder with learnable init tokens + keypoint prompts →
**MHR parametric body head** (the real Momentum-Human-Rig
parameterization: 6 global rot6d + 260 continuous body pose + 45 shape +
28 scale PCA + 2×54 hand PCA + 72 face, reference
models/heads/mhr_head.py:36-369) + perspective camera head, plus the
**hand decoder branch with wrist-angle refinement** (reference
sam3d_body.py:1203-1360, sam_3d_body_estimator.py:36). Output schema
matches the per-frame ``.npz`` consumed downstream
(prepare_side_results/save.py:108: ``pred_keypoints_2d (70,2)``,
``pred_keypoints_3d (70,3)``, ``pred_cam_t``, ``focal_length``,
``pred_vertices``).

TPU-first redesign:
- the bbox-center-scale affine crop (reference GetBBoxCenterScale +
  TopdownAffine) is a jitted ``scale_and_translate`` — the whole clip's
  crops batch on device;
- the decoder is a fixed stack of cross-attention blocks over a static
  token set (no dynamic prompt counts: prompts are masked slots);
- the MHR rig is an explicit parameter-transform + XYZ-euler FK + LBS
  program under jit (skix.models.mhr) — autodiff-safe for refinement;
- hand refinement is batched over the clip and gated by the reference's
  wrist-angle criterion (threshold 1.4 rad) and box-size criterion.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skix.models import mhr
from skix.models.layers import Block, Mlp, PatchEmbed

MHR70_PARENTS = mhr.MHR70_PARENTS  # real MHR-70 hierarchy (metadata names)

# MHR-70 keypoint ids (reference metadata/mhr70.py): wrists and hand chains
RIGHT_WRIST, LEFT_WRIST = 41, 62
RIGHT_HAND_KPTS = np.arange(21, 41)
LEFT_HAND_KPTS = np.arange(42, 62)


# --------------------------------------------------------------------------
# Crop pipeline (TopdownAffine parity, on-device)
# --------------------------------------------------------------------------
def bbox_center_scale(bbox_xyxy, padding: float = 1.25):
    """bbox → (center (2,), scale (2,)) with padding (reference
    GetBBoxCenterScale semantics)."""
    bbox = jnp.asarray(bbox_xyxy)
    c = jnp.stack([(bbox[..., 0] + bbox[..., 2]) * 0.5,
                   (bbox[..., 1] + bbox[..., 3]) * 0.5], axis=-1)
    s = jnp.stack([bbox[..., 2] - bbox[..., 0],
                   bbox[..., 3] - bbox[..., 1]], axis=-1) * padding
    # square crop with aspect kept (max side)
    side = jnp.max(s, axis=-1, keepdims=True)
    return c, jnp.broadcast_to(side, s.shape)


def crop_resize(frame, center, scale, out_size: int):
    """Affine crop via scale_and_translate: frame (H, W, 3) f32 →
    (out, out, 3). Differentiable, jit/vmap-friendly."""
    sx = out_size / scale[0]
    sy = out_size / scale[1]
    tx = out_size / 2.0 - center[0] * sx
    ty = out_size / 2.0 - center[1] * sy
    return jax.image.scale_and_translate(
        frame, (out_size, out_size, 3), (0, 1),
        jnp.stack([sy, sx]), jnp.stack([ty, tx]), method="linear")


def crop_to_image_coords(pts_crop, center, scale, out_size: int):
    """Inverse of the crop mapping for 2D points ``(..., 2)``."""
    return (pts_crop - out_size / 2.0) * (scale / out_size) + center


# --------------------------------------------------------------------------
# MHR head (reference heads/mhr_head.py:36 forward semantics)
# --------------------------------------------------------------------------
class MHRHeadOutputs(NamedTuple):
    keypoints_3d: jnp.ndarray    # (B, 70, 3) meters, root-relative, y/z flip
    vertices: jnp.ndarray        # (B, V, 3)
    joint_rots: jnp.ndarray      # (B, J, 3, 3) world joint rotations
    global_rot: jnp.ndarray      # (B, 3) euler xyz
    body_pose: jnp.ndarray       # (B, 133) model params (hands/jaw zeroed)
    shape: jnp.ndarray           # (B, 45)
    scale: jnp.ndarray           # (B, 28)
    hand: jnp.ndarray            # (B, 108) PCA params (left ‖ right)
    pred_pose_raw: jnp.ndarray   # (B, 6 + 260) rot6d + cont pose


class MHRHead(nn.Module):
    """Pose token → npose prediction → MHR FK (reference mhr_head.py:271).

    ``rig_name``/``buffers_name`` reference registered assets
    (skix.models.mhr registries) so the module stays hashable."""

    input_dim: int = 256
    rig_name: str = "default"
    buffers_name: str = "default"
    num_shape: int = 45
    num_scale: int = 28
    num_hand: int = 54
    num_face: int = 72
    body_cont: int = 260
    mlp_div: int = 8
    use_hands: bool = True

    @property
    def npose(self) -> int:
        return (6 + self.body_cont + self.num_shape + self.num_scale
                + 2 * self.num_hand + self.num_face)

    @nn.compact
    def __call__(self, x, init_estimate=None,
                 hand_override=None) -> MHRHeadOutputs:
        B = x.shape[0]
        rig = mhr.get_rig(self.rig_name)
        bufs = mhr.get_buffers(self.buffers_name)

        h = nn.Dense(self.input_dim // self.mlp_div, name="proj_fc1")(x)
        h = nn.gelu(h, approximate=False)
        pred = nn.Dense(self.npose, name="proj_fc2",
                        bias_init=nn.initializers.zeros)(h)
        # zero-pose init: identity global rot6d + zero-pose body cont
        # (reference get_zero_pose_init:122)
        zero_cont = mhr.model_params_to_cont_body(jnp.zeros(133))
        zero_init = jnp.concatenate([
            jnp.asarray([1.0, 0, 0, 0, 1, 0]), zero_cont,
            jnp.zeros(self.npose - 6 - self.body_cont)])
        pred = pred + zero_init
        if init_estimate is not None:
            pred = pred + init_estimate

        c = 6
        grot6 = pred[:, :c]
        grot_mat = mhr.rot6d_to_matrix_cols(grot6)
        # reference-convention output (mhr_head.py:295 rotmat_to_euler
        # 'ZYX'); the rig is fed whichever order IT declares
        global_rot = mhr.matrix_to_euler_zyx(grot_mat)
        rig_rot = (global_rot if rig.root_euler_order == "zyx"
                   else mhr.matrix_to_euler_xyz(grot_mat))
        body_cont = pred[:, c:c + self.body_cont]
        c += self.body_cont
        body_pose = mhr.cont_to_model_params_body(body_cont)
        # zero hands + jaw (mhr_head.py:305-307)
        body_pose = body_pose * (1.0 - jnp.asarray(
            mhr.MHR_PARAM_HAND_MASK, body_pose.dtype))
        body_pose = body_pose.at[:, -3:].set(0.0)
        shape = pred[:, c:c + self.num_shape]
        c += self.num_shape
        scale = pred[:, c:c + self.num_scale]
        c += self.num_scale
        hand = pred[:, c:c + 2 * self.num_hand]
        c += 2 * self.num_hand
        if hand_override is not None:
            hand = hand_override

        model_params = mhr.assemble_model_params(
            jnp.zeros((B, 3)), rig_rot, body_pose,
            hand if self.use_hands else None, scale,
            jnp.asarray(bufs.scale_mean), jnp.asarray(bufs.scale_comps),
            hand_pose_mean=jnp.asarray(bufs.hand_pose_mean),
            hand_pose_comps=jnp.asarray(bufs.hand_pose_comps),
            hand_joint_idxs_left=jnp.asarray(bufs.hand_joint_idxs_left),
            hand_joint_idxs_right=jnp.asarray(bufs.hand_joint_idxs_right))

        out = mhr.rig_forward(rig, model_params)
        kpts = mhr.mhr_output_transform(out["keypoints"][..., :70, :])
        verts = mhr.mhr_output_transform(out["verts"])
        return MHRHeadOutputs(
            keypoints_3d=kpts, vertices=verts, joint_rots=out["joint_rots"],
            global_rot=global_rot, body_pose=body_pose, shape=shape,
            scale=scale, hand=hand,
            pred_pose_raw=jnp.concatenate([grot6, body_cont], axis=-1))


# --------------------------------------------------------------------------
# Decoder machinery
# --------------------------------------------------------------------------
class PromptEncoder(nn.Module):
    """Keypoint-prompt tokens: (x, y, label) → embed; invalid slots masked
    (reference prompt_encoder + keypoint_prompt_sampler capability)."""

    embed_dim: int = 256
    max_prompts: int = 8

    @nn.compact
    def __call__(self, prompts, prompt_valid):
        # prompts (B, P, 3): normalized x, y in [0,1], label in {0,1}
        h = nn.Dense(self.embed_dim, name="point_proj")(prompts)
        label_emb = self.param("label_embed", nn.initializers.normal(0.02),
                               (2, self.embed_dim))
        lab = label_emb[jnp.clip(prompts[..., 2].astype(jnp.int32), 0, 1)]
        h = h + lab
        return jnp.where(prompt_valid[..., None], h, 0.0), prompt_valid


class MaskDownscaler(nn.Module):
    """SAM-style mask downscaling stack (reference
    decoders/prompt_encoder.py:50-58 ``mask_downscaling``, the SAM2
    ``mask_embed_type='v1'`` layout): Conv(1→4, k4 s4) → LayerNorm(C) →
    GELU → Conv(4→16, k4 s4) → LayerNorm(C) → GELU → Conv(16→embed, k1).
    16× total downsample — a ``crop_size`` mask lands exactly on the
    patch grid. NHWC; LayerNorm over channels = the reference's
    LayerNorm2d (eps 1e-6)."""

    embed_dim: int = 384
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mask):
        h = mask.astype(self.dtype)
        h = nn.Conv(self.mask_in_chans // 4, (4, 4), strides=(4, 4),
                    padding="VALID", name="conv0")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="ln0")(h.astype(jnp.float32))
        # exact (erf) GELU — torch nn.GELU default, needed for converter
        # parity (flax's default is the tanh approximation)
        h = nn.gelu(h, approximate=False).astype(self.dtype)
        h = nn.Conv(self.mask_in_chans, (4, 4), strides=(4, 4),
                    padding="VALID", name="conv1")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="ln1")(h.astype(jnp.float32))
        h = nn.gelu(h, approximate=False).astype(self.dtype)
        return nn.Conv(self.embed_dim, (1, 1), name="conv2")(h)


def convert_mask_downscaling(sd, prefix: str = "mask_downscaling."):
    """Torch ``mask_downscaling`` Sequential state dict → flax params for
    :class:`MaskDownscaler` (Conv2d OIHW → HWIO; LayerNorm2d scale/bias
    1:1). ``sd``: numpy-valued dict (``{k: v.numpy()}`` a torch state
    dict)."""
    def conv(i):
        w = np.asarray(sd[f"{prefix}{i}.weight"])
        return {"kernel": np.transpose(w, (2, 3, 1, 0)),
                "bias": np.asarray(sd[f"{prefix}{i}.bias"])}

    def ln(i):
        return {"scale": np.asarray(sd[f"{prefix}{i}.weight"]),
                "bias": np.asarray(sd[f"{prefix}{i}.bias"])}

    return {"conv0": conv(0), "ln0": ln(1), "conv1": conv(3),
            "ln1": ln(4), "conv2": conv(6)}


class CrossAttnBlock(nn.Module):
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, kv_tokens):
        C = q_tokens.shape[-1]
        h = nn.LayerNorm(name="norm_q")(q_tokens)
        kv = nn.LayerNorm(name="norm_kv")(kv_tokens)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="cross_attn")
        q_tokens = q_tokens + attn(h, kv)
        h = nn.LayerNorm(name="norm_mlp")(q_tokens)
        return q_tokens + Mlp(4 * C, dtype=self.dtype, name="mlp")(h)


class SAM3DBodyOutputs(NamedTuple):
    mhr: MHRHeadOutputs
    cam_t: jnp.ndarray           # (B, 3) perspective translation
    joints_3d: jnp.ndarray       # (B, 70, 3) camera-frame (root at cam_t)
    joints_2d_crop: jnp.ndarray  # (B, 70, 2) in crop pixels
    vertices_3d: jnp.ndarray     # (B, V, 3) camera-frame mesh


class SAM3DBody(nn.Module):
    """Backbone → promptable decoder → MHR head + camera head, with a
    hand-decoder branch (reference models/meta_arch/sam3d_body.py:45,289,
    1057,1203)."""

    crop_size: int = 256
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 8
    num_heads: int = 6
    decoder_depth: int = 4
    decoder_dim: int = 256
    num_joints: int = 70
    max_prompts: int = 8
    focal_length: float = 5000.0  # crop-relative default focal
    rig_name: str = "default"
    # backbone family (reference backbones/__init__.py create_backbone:
    # 'vit_hmr' ViT variants vs 'dinov3_*' Dinov3Backbone wrappers).
    # 'dinov3' = the DINOv3-exact RoPE trunk (skix.models.dinov3:
    # axial-RoPE patch tokens, cls + storage tokens, hub-layout
    # converter; numeric parity unverifiable offline — the reference
    # itself hub-loads it pretrained=False, dinov3.py:16).
    # 'dino' = the shared DINOv2-shaped
    # skix.models.layers.VisionTransformer (register tokens + LayerScale,
    # converter-tested seam: skix.models.vggt_convert.
    # convert_dinov2_backbone), the nearest vendored-family stand-in.
    backbone: str = "vit_hmr"
    backbone_registers: int = 4
    # dinov3-trunk plumbing (larger hub variants need swiglu widths and
    # log-spaced rope periods; see skix.models.dinov3.DINOV3_VARIANTS)
    backbone_ffn: str = "mlp"
    backbone_mlp_ratio: float = 4.0
    backbone_ffn_hidden: Optional[int] = None
    backbone_rope_min: Optional[float] = None
    backbone_rope_max: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, crops, prompts=None, prompt_valid=None,
                 decoder_type: str = "body", hand_override=None,
                 mask=None, mask_score=None):
        """``crops (B, S, S, 3)`` in [0,1] → SAM3DBodyOutputs.

        ``decoder_type='hand'`` runs the hand-decoder queries — same
        backbone, separate init tokens — whose MHR forward is used only
        for its hand PCA params + wrist rotations (reference
        forward_step(decoder_type=...) :1189).

        ``mask (B, S, S, 1)``: crop-aligned person mask,
        ``mask_score (B,)``: its confidence. Reference mask-prompt
        conditioning (sam3d_body.py:766 ``_get_mask_prompt`` + :1107
        'v1: non-iterative'): the downscaled mask embedding — gated
        ``where(score > 0, score·emb, no_mask_embed)`` — is ADDED to the
        image embeddings before the decoder. ``mask=None`` behaves like
        the reference's default batch (zero mask, score 0 →
        ``no_mask_embed``); the encoder params always exist so
        checkpoints are stable across both call styles."""
        B = crops.shape[0]
        x = (crops - 0.5) / 0.5
        if self.backbone.startswith("dinov3"):
            # DINOv3-exact trunk (axial RoPE, storage tokens) — the hub
            # architecture Dinov3Backbone loads (dinov3.py:16); converter
            # seam: skix.models.dinov3.convert_dinov3_trunk. Reference
            # factory names (dinov3_vits16, ...) select the published
            # variant hyperparameters; bare "dinov3" uses this module's
            # own embed_dim/depth/num_heads plus the backbone_* fields.
            from skix.models.dinov3 import DINOV3_VARIANTS, Dinov3Trunk

            kw = dict(patch_size=self.patch_size, embed_dim=self.embed_dim,
                      depth=self.depth, num_heads=self.num_heads,
                      n_storage_tokens=self.backbone_registers,
                      ffn=self.backbone_ffn,
                      ffn_hidden=self.backbone_ffn_hidden,
                      mlp_ratio=self.backbone_mlp_ratio)
            if self.backbone_rope_min is not None:
                kw.update(rope_base=None,
                          rope_min_period=self.backbone_rope_min,
                          rope_max_period=self.backbone_rope_max)
            if self.backbone in DINOV3_VARIANTS:
                var = dict(DINOV3_VARIANTS[self.backbone])
                if var["embed_dim"] != self.embed_dim:
                    raise ValueError(
                        f"{self.backbone} is a {var['embed_dim']}-dim "
                        f"trunk; set SAM3DBody embed_dim to match "
                        f"(got {self.embed_dim})")
                kw.update(var)
            elif self.backbone != "dinov3":
                raise ValueError(
                    f"unknown dinov3 variant {self.backbone!r}; known: "
                    f"{sorted(DINOV3_VARIANTS)} or bare 'dinov3'")
            tokens = Dinov3Trunk(
                dtype=self.dtype, name="dino_backbone",
                **kw)(x.astype(self.dtype))
        elif self.backbone.startswith("dino"):
            # Dinov3Backbone.forward (dinov3.py:25-37): normalized
            # last-layer patch tokens (get_intermediate_layers n=1,
            # norm=True) — VisionTransformer returns exactly
            # x_norm_patchtokens (cls/register stripped)
            from skix.models.layers import VisionTransformer

            tokens = VisionTransformer(
                patch_size=self.patch_size, embed_dim=self.embed_dim,
                depth=self.depth, num_heads=self.num_heads,
                num_register_tokens=self.backbone_registers,
                dtype=self.dtype, name="dino_backbone")(x.astype(self.dtype))
        else:
            tokens = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                                name="patch_embed")(x.astype(self.dtype))
            P = tokens.shape[1]
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, P, self.embed_dim))
            tokens = tokens + pos.astype(self.dtype)
            for i in range(self.depth):
                tokens = Block(self.num_heads, 4.0, dtype=self.dtype,
                               name=f"block_{i}")(tokens)
            tokens = nn.LayerNorm(dtype=self.dtype,
                                  name="backbone_norm")(tokens)

        # mask-prompt conditioning (reference _get_mask_prompt :766-789 +
        # image_embeddings += mask_embeddings :1109). Params are created
        # unconditionally; a None mask takes the no_mask_embed path.
        if mask_score is None:
            # reference semantics: an externally PROVIDED mask carries
            # score 1 (sam_3d_body_estimator.py:137-150); only the
            # no-mask path defaults to 0 (→ no_mask_embed). Defaulting
            # provided masks to 0 would silently ignore them.
            mask_score = (jnp.zeros((B,), jnp.float32) if mask is None
                          else jnp.ones((B,), jnp.float32))
        if mask is None:
            mask = jnp.zeros((B, self.crop_size, self.crop_size, 1),
                             jnp.float32)
        memb = MaskDownscaler(self.embed_dim, dtype=self.dtype,
                              name="mask_prompt")(mask)
        memb = memb.reshape(B, -1, self.embed_dim)           # (B, P, E)
        no_mask = self.param("no_mask_embed",
                             nn.initializers.normal(0.02),
                             (self.embed_dim,))
        score = mask_score.astype(jnp.float32)[:, None, None]
        gated = jnp.where(score > 0, score * memb.astype(jnp.float32),
                          no_mask[None, None, :])
        tokens = tokens + gated.astype(tokens.dtype)

        kv = nn.Dense(self.decoder_dim, name="kv_proj")(
            tokens.astype(jnp.float32))

        # learnable init tokens: [pose, cam] queries per decoder branch
        n_q = 2
        name = ("init_tokens" if decoder_type == "body"
                else "hand_init_tokens")
        init_tokens = self.param(name, nn.initializers.normal(0.02),
                                 (1, n_q, self.decoder_dim))
        q = jnp.broadcast_to(init_tokens, (B, n_q, self.decoder_dim))
        if prompts is not None:
            pe, pv = PromptEncoder(self.decoder_dim, self.max_prompts,
                                   name="prompt_encoder")(prompts,
                                                          prompt_valid)
            kv = jnp.concatenate([kv, pe], axis=1)
        for i in range(self.decoder_depth):
            q = CrossAttnBlock(8, name=f"decoder_{i}")(q, kv)
        q = nn.LayerNorm(name="decoder_norm")(q)
        pose_tok, cam_tok = q[:, 0], q[:, 1]

        head_name = "head_pose" if decoder_type == "body" else "head_hand"
        mhr_out = MHRHead(self.decoder_dim, rig_name=self.rig_name,
                          name=head_name)(pose_tok,
                                          hand_override=hand_override)

        cam = Mlp(self.decoder_dim, out_features=3,
                  name="camera_head")(cam_tok)
        # perspective translation: (tx, ty, inverse-depth-ish tz activation)
        cam_t = jnp.stack([cam[..., 0], cam[..., 1],
                           2.0 * jnp.exp(cam[..., 2] * 0.5) + 0.5], axis=-1)

        joints_cam = mhr_out.keypoints_3d + cam_t[:, None, :]
        verts_cam = mhr_out.vertices + cam_t[:, None, :]
        z = jnp.clip(joints_cam[..., 2:3], 1e-3)
        f = self.focal_length
        c = self.crop_size / 2.0
        joints_2d = joints_cam[..., :2] / z * f + c
        return SAM3DBodyOutputs(mhr=mhr_out, cam_t=cam_t,
                                joints_3d=joints_cam,
                                joints_2d_crop=joints_2d,
                                vertices_3d=verts_cam)


# --------------------------------------------------------------------------
# Hand refinement (reference run_inference steps 1-3, sam3d_body.py:1226)
# --------------------------------------------------------------------------
def hand_boxes_from_keypoints(joints_2d, pad: float = 1.6,
                              min_side: float = 24.0):
    """Square hand boxes around the predicted hand keypoints
    (reference _get_hand_box capability). ``joints_2d (B, 70, 2)`` →
    (left_xyxy (B, 4), right_xyxy (B, 4))."""

    def box(kpts, wrist):
        pts = jnp.concatenate([kpts, wrist[:, None]], axis=1)
        lo = jnp.min(pts, axis=1)
        hi = jnp.max(pts, axis=1)
        cen = 0.5 * (lo + hi)
        side = jnp.maximum(jnp.max(hi - lo, axis=-1), min_side) * pad
        return jnp.concatenate([cen - side[:, None] / 2,
                                cen + side[:, None] / 2], axis=-1)

    left = box(joints_2d[:, LEFT_HAND_KPTS], joints_2d[:, LEFT_WRIST])
    right = box(joints_2d[:, RIGHT_HAND_KPTS], joints_2d[:, RIGHT_WRIST])
    return left, right


def wrist_angle_gate(body_rots, hand_rots, wrist_joints=(62, 41),
                     thresh: float = 1.4):
    """Accept the hand-branch pose only when its global wrist rotation is
    within ``thresh`` rad of the body branch's (reference criterion 1,
    sam3d_body.py:1286-1315, thresh_wrist_angle=1.4). Returns (B, 2) bool
    for (left, right)."""
    idx = jnp.asarray(wrist_joints)
    diff = mhr.rotation_angle_difference(body_rots[:, idx],
                                         hand_rots[:, idx])
    return diff < thresh


def refine_hands_params(body_hand, hand_branch_hand, accept_left,
                        accept_right):
    """Blend hand PCA params: take the hand branch's where accepted
    (reference step 3 'replace hand pose estimation')."""
    nh = mhr.NUM_HAND_CONT
    left = jnp.where(accept_left[:, None], hand_branch_hand[:, :nh],
                     body_hand[:, :nh])
    right = jnp.where(accept_right[:, None], hand_branch_hand[:, nh:],
                      body_hand[:, nh:])
    return jnp.concatenate([left, right], axis=-1)


# --------------------------------------------------------------------------
# Estimator facade (top-down crop pipeline, batched)
# --------------------------------------------------------------------------
class SAM3DBodyEstimator:
    """Frames + per-frame bboxes → per-frame MHR-70 outputs
    (reference sam_3d_body_estimator.py:22 ``process_one_image`` semantics,
    batched over the clip). ``inference_type='full'`` adds the hand branch
    with wrist-angle gating; ``'body'`` is body-only."""

    thresh_wrist_angle = 1.4  # reference sam_3d_body_estimator.py:36
    hand_box_min_px = 64.0    # reference criterion 2 (sam3d_body.py:1317)

    def __init__(self, model: Optional[SAM3DBody] = None, variables=None,
                 rng_seed: int = 0):
        self.model = model or SAM3DBody()
        if variables is None:
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, self.model.crop_size, self.model.crop_size,
                           3)))
        # graft missing branches (hand decoder, mask-prompt encoder) —
        # checkpoint-loaded variables from an older/body-only run must
        # still support inference_type='full' and mask conditioning
        if any(key not in variables.get("params", {})
               for key in ("hand_init_tokens", "mask_prompt")):
            hand_vars = jax.jit(
                lambda k: self.model.init(k, jnp.zeros(
                    (1, self.model.crop_size, self.model.crop_size, 3)),
                    decoder_type="hand"))(jax.random.PRNGKey(rng_seed + 1))
            merged = dict(variables["params"])
            for key, val in hand_vars["params"].items():
                merged.setdefault(key, val)
            variables = {**variables, "params": merged}
        self.variables = variables
        self._fwd = jax.jit(self._forward_batch, static_argnums=(4,))

    def _forward_batch(self, variables, frames, centers, scales,
                       full: bool, masks=None, mask_scores=None):
        size = self.model.crop_size
        crops = jax.vmap(crop_resize, in_axes=(0, 0, 0, None))(
            frames, centers, scales, size)
        mask_crops = None
        if masks is not None:
            # crop the person mask with the SAME affine as the image
            # (reference: the transform pipeline warps data_info["mask"]
            # alongside img); conditioning applies to the body pass —
            # the hand branch crops run unconditioned
            mask_crops = jax.vmap(crop_resize, in_axes=(0, 0, 0, None))(
                masks, centers, scales, size)
        out = self.model.apply(variables, crops, mask=mask_crops,
                               mask_score=mask_scores)
        if full:
            # hand branch on wrist-centered crops (left/right), cut from
            # the ORIGINAL frames at native resolution; the box-size gate
            # measures original-image pixels (reference criterion 2,
            # sam3d_body.py:1317 — hand_box_size_thresh is in image px)
            lbox, rbox = hand_boxes_from_keypoints(out.joints_2d_crop)

            def run_hand(box_crop):
                tl = jax.vmap(crop_to_image_coords,
                              in_axes=(0, 0, 0, None))(
                    box_crop[:, :2], centers, scales, size)
                br = jax.vmap(crop_to_image_coords,
                              in_axes=(0, 0, 0, None))(
                    box_crop[:, 2:], centers, scales, size)
                box_img = jnp.concatenate([tl, br], axis=-1)
                c, s = bbox_center_scale(box_img, padding=0.9)
                hc = jax.vmap(crop_resize, in_axes=(0, 0, 0, None))(
                    frames, c, s, size)
                return self.model.apply(variables, hc,
                                        decoder_type="hand"), s[:, 0]

            lout, lside = run_hand(lbox)
            rout, rside = run_hand(rbox)
            gate = wrist_angle_gate(out.mhr.joint_rots, lout.mhr.joint_rots,
                                    thresh=self.thresh_wrist_angle)
            gate_r = wrist_angle_gate(out.mhr.joint_rots,
                                      rout.mhr.joint_rots,
                                      thresh=self.thresh_wrist_angle)
            ok_l = gate[:, 0] & (lside > self.hand_box_min_px)
            ok_r = gate_r[:, 1] & (rside > self.hand_box_min_px)
            nh = mhr.NUM_HAND_CONT
            branch_hand = jnp.concatenate(
                [lout.mhr.hand[:, :nh], rout.mhr.hand[:, nh:]], axis=-1)
            hand = refine_hands_params(out.mhr.hand, branch_hand, ok_l,
                                       ok_r)
            out = self.model.apply(variables, crops, hand_override=hand,
                                   mask=mask_crops,
                                   mask_score=mask_scores)
        # crop 2D → original-image pixels
        k2 = jax.vmap(crop_to_image_coords, in_axes=(0, 0, 0, None))(
            out.joints_2d_crop, centers, scales, size)
        return out, k2

    def process_clip(self, frames_u8: np.ndarray, bboxes_xyxy: np.ndarray,
                     batch_size: int = 8,
                     image_focal=None,
                     inference_type: str = "body",
                     masks=None, mask_scores=None):
        """``frames (T, H, W, 3) uint8``, ``bboxes (T, 4)`` → list of per-
        frame output dicts (npz schema parity incl. mesh vertices).

        ``image_focal``: None (crop-focal × scale fallback), a scalar, or a
        per-frame ``(T,)`` array — the reference runs its MoGe FOV estimator
        per image and overrides ``batch["cam_int"]``
        (sam_3d_body_estimator.py:169-175); the per-frame form mirrors that.

        ``masks``: optional per-frame person masks ``(T, H, W)`` /
        ``(T, 1, H, W)`` / ``(T, H, W, 1)`` (bool/uint8/float) —
        mask-conditioned inference (reference
        sam_3d_body_estimator.py:137-150: externally provided masks get
        ``mask_score=1``; the pt contract's YOLO-seg mask is the natural
        source). ``mask_scores (T,)`` overrides the per-frame confidence.
        """
        T = frames_u8.shape[0]
        masks_f = None
        scores_f = None
        if masks is not None:
            m = np.asarray(masks)
            if m.ndim == 4 and m.shape[1] == 1:      # (T,1,H,W) contract
                m = m[:, 0]
            if m.ndim == 4:                           # (T,H,W,1)
                m = m[..., 0]
            masks_f = (m > 0).astype(np.float32)[..., None]  # (T,H,W,1)
            scores_f = (np.ones((T,), np.float32) if mask_scores is None
                        else np.broadcast_to(
                            np.asarray(mask_scores, np.float32).reshape(-1),
                            (T,)).astype(np.float32))
        focal_arr = None
        if image_focal is not None:
            focal_arr = np.broadcast_to(
                np.asarray(image_focal, np.float32).reshape(-1), (T,))
        centers, scales = bbox_center_scale(jnp.asarray(bboxes_xyxy,
                                                        jnp.float32))
        full = inference_type == "full"
        results = []
        for s in range(0, T, batch_size):
            e = min(s + batch_size, T)
            fr = jnp.asarray(frames_u8[s:e], jnp.float32) / 255.0
            pad = batch_size - (e - s)
            c = centers[s:e]
            sc = scales[s:e]
            mk = sf = None
            if masks_f is not None:
                mk = jnp.asarray(masks_f[s:e])
                sf = jnp.asarray(scores_f[s:e])
            if pad:
                fr = jnp.pad(fr, ((0, pad), (0, 0), (0, 0), (0, 0)))
                c = jnp.pad(c, ((0, pad), (0, 0)))
                sc = jnp.pad(sc, ((0, pad), (0, 0)), constant_values=1.0)
                if mk is not None:
                    mk = jnp.pad(mk, ((0, pad), (0, 0), (0, 0), (0, 0)))
                    sf = jnp.pad(sf, ((0, pad),))
            out, k2 = self._fwd(self.variables, fr, c, sc, full, mk, sf)
            n = e - s
            # ONE batched device→host pull per batch: per-field
            # np.asarray inside the frame loop issued ~11 small relay
            # transfers per FRAME (CLAUDE.md: tunnel bandwidth varies
            # 0.4-26 MB/s — transfer count dominates)
            out, k2, sc_h = jax.device_get((out, k2, sc))
            # focal in original-image pixels (crop focal × scale ratio)
            f_img = (sc_h[:n, 0] / self.model.crop_size
                     * self.model.focal_length)
            for i in range(n):
                cam_t = np.asarray(out.cam_t[i])
                j3 = np.asarray(out.joints_3d[i])
                v3 = np.asarray(out.vertices_3d[i])
                if focal_arr is not None:
                    # The camera head's translation is consistent with the
                    # crop focal mapped to image pixels (f_img). The
                    # reference overrides cam_int BEFORE estimation
                    # (sam_3d_body_estimator.py:169-175), which in the
                    # weak→full perspective conversion scales tz ∝ f.
                    # Re-express the estimate under the overridden focal so
                    # the saved (focal_length, pred_cam_t) pair reprojects
                    # to the same 2D instead of pairing a MoGe focal with a
                    # crop-focal translation.
                    ratio = (float(focal_arr[s + i])
                             / max(float(f_img[i]), 1e-6))
                    delta = np.array([0.0, 0.0, cam_t[2] * (ratio - 1.0)],
                                     np.float32)
                    cam_t = cam_t + delta
                    j3 = j3 + delta
                    v3 = v3 + delta
                results.append({
                    "pred_keypoints_2d": np.asarray(k2[i]),
                    "pred_keypoints_3d": j3,
                    "pred_vertices": v3,
                    "pred_cam_t": cam_t,
                    "focal_length": np.asarray(
                        focal_arr[s + i] if focal_arr is not None
                        else f_img[i]),
                    "bbox": np.asarray(bboxes_xyxy[s + i]),
                    "pred_global_rots": np.asarray(out.mhr.joint_rots[i]),
                    "body_pose_params": np.asarray(out.mhr.body_pose[i]),
                    "hand_pose_params": np.asarray(out.mhr.hand[i]),
                    "scale_params": np.asarray(out.mhr.scale[i]),
                    "shape_params": np.asarray(out.mhr.shape[i]),
                })
        return results


def select_closest_person(outputs: Sequence[dict],
                          previous_person: Optional[dict] = None,
                          continuity_weight: float = 0.5) -> Optional[dict]:
    """Athlete pick among candidates: nearest camera depth, biased toward
    temporal continuity with the previous frame (reference
    prepare_side_results/infer.py:49)."""
    if not outputs:
        return None
    scores = []
    for out in outputs:
        cam_t = np.asarray(out.get("pred_cam_t", [np.inf] * 3)).reshape(-1)
        depth = float(cam_t[2]) if cam_t.size >= 3 and np.isfinite(cam_t[2]) \
            else np.inf
        cont = 0.0
        if previous_person is not None:
            prev_t = np.asarray(previous_person.get("pred_cam_t",
                                                    cam_t)).reshape(-1)
            cont = float(np.linalg.norm(cam_t[:3] - prev_t[:3]))
        scores.append(depth + continuity_weight * cont)
    return outputs[int(np.argmin(scores))]
