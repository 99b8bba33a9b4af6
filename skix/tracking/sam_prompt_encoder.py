"""SAM prompt encoder + SAM-1-style interactive image predictor.

Capability parity with the reference's interactive segmentation path:

- ``SamPromptEncoder`` ≙ ``sam3/sam/prompt_encoder.py:12`` (PromptEncoder):
  random-Fourier positional encoding (PositionEmbeddingRandom:201), four
  point-type embeddings (neg / pos / box-corner-1 / box-corner-2), a
  not-a-point embedding selected where ``label == -1``, mask downscaling
  convs for dense prompts, and a learned no-mask embedding broadcast over
  the feature grid.
- ``SamImagePredictor`` ≙ ``sam3/model/sam1_task_predictor.py:22``
  (SAM3InteractiveImagePredictor): ``set_image`` encodes the frame once;
  ``predict(point_coords, point_labels, box, multimask_output)`` decodes
  masks + IoU predictions from the cached embedding, rescaling prompt
  pixels to model space and mask logits back to the original size.

TPU-first: fixed prompt capacity with ``-1``-label padding (the
reference's own padding convention, prompt_encoder.py:83-99) so every
prompt combination hits one compiled program; the host facade caches the
jitted encode/decode pair.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class RandomPositionEmbedding(nn.Module):
    """Random spatial-frequency positional encoding
    (prompt_encoder.py:201 PositionEmbeddingRandom). The Gaussian matrix
    is a parameter (converter target for the reference buffer)."""

    num_pos_feats: int = 64  # output dim = 2 × num_pos_feats
    scale: float = 1.0

    def _matrix(self):
        return self.param(
            "gaussian_matrix",
            lambda k, s: self.scale * jax.random.normal(k, s),
            (2, self.num_pos_feats))

    @nn.compact
    def __call__(self, coords01):
        """``coords01 (..., 2)`` in [0, 1] → (..., 2·num_pos_feats)."""
        c = (2.0 * coords01 - 1.0) @ self._matrix()
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid(self, h: int, w: int):
        """Dense PE for an (h, w) feature grid → (h, w, C)
        (prompt_encoder.py get_dense_pe / forward)."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        return self(coords)


class SamPromptEncoder(nn.Module):
    """Point / box / mask prompts → (sparse tokens, dense embedding,
    dense positional encoding)."""

    embed_dim: int = 64
    mask_in_chans: int = 16
    input_image_size: int = 512    # padded model input (pixel coords)

    @nn.compact
    def __call__(self, feat_hw: tuple[int, int],
                 points: Optional[jnp.ndarray] = None,   # (B, P, 2) pixels
                 labels: Optional[jnp.ndarray] = None,   # (B, P) −1 pad
                 boxes: Optional[jnp.ndarray] = None,    # (B, 4) xyxy px
                 masks: Optional[jnp.ndarray] = None):   # (B, 4h, 4w, 1)
        h, w = feat_hw
        pe = RandomPositionEmbedding(self.embed_dim // 2, name="pe")
        # 4 point types + not-a-point (prompt_encoder.py:41-46)
        type_embed = self.param("point_embeddings",
                                nn.initializers.normal(1.0),
                                (4, self.embed_dim))
        not_a_point = self.param("not_a_point_embed",
                                 nn.initializers.normal(1.0),
                                 (self.embed_dim,))
        no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0),
                             (self.embed_dim,))

        sparse_parts = []
        size = float(self.input_image_size)
        if points is not None:
            assert labels is not None
            c01 = (points + 0.5) / size     # pixel-center shift
            emb = pe(c01)
            emb = jnp.where((labels == -1)[..., None],
                            not_a_point[None, None], emb)
            for t in range(4):
                emb = jnp.where((labels == t)[..., None],
                                emb + type_embed[t][None, None], emb)
            sparse_parts.append(emb)
        if boxes is not None:
            corners = (boxes.reshape(-1, 2, 2) + 0.5) / size
            emb = pe(corners)
            emb = emb + type_embed[2:4][None]
            sparse_parts.append(emb)
        if sparse_parts:
            sparse = jnp.concatenate(sparse_parts, axis=1)
        else:
            B = masks.shape[0] if masks is not None else 1
            sparse = jnp.zeros((B, 0, self.embed_dim))

        if masks is not None:
            m = masks
            for i, ch in enumerate([self.mask_in_chans // 4,
                                    self.mask_in_chans]):
                m = nn.Conv(ch, (2, 2), strides=(2, 2),
                            name=f"mask_down_{i}")(m)
                m = nn.LayerNorm(epsilon=1e-6, name=f"mask_norm_{i}")(m)
                m = nn.gelu(m, approximate=False)  # torch nn.GELU (erf)
            dense = nn.Conv(self.embed_dim, (1, 1), name="mask_proj")(m)
        else:
            B = sparse.shape[0]
            dense = jnp.broadcast_to(no_mask[None, None, None],
                                     (B, h, w, self.embed_dim))

        return sparse, dense, pe.grid(h, w)


def convert_sam_prompt_encoder(sd) -> dict:
    """Reference ``sam3/sam/prompt_encoder.py`` torch state dict →
    ``SamPromptEncoder`` flax params (parity-tested vs the imported
    reference module on random weights)."""
    def t(x):
        return jnp.asarray(np.asarray(x.detach().cpu()))

    def conv(prefix):
        w = t(sd[f"{prefix}.weight"])  # (out, in, kh, kw)
        return {"kernel": jnp.transpose(w, (2, 3, 1, 0)),
                "bias": t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": t(sd[f"{prefix}.weight"]),
                "bias": t(sd[f"{prefix}.bias"])}

    params = {
        "pe": {"gaussian_matrix":
               t(sd["pe_layer.positional_encoding_gaussian_matrix"])},
        "point_embeddings": jnp.concatenate(
            [t(sd[f"point_embeddings.{i}.weight"]) for i in range(4)],
            axis=0),
        "not_a_point_embed": t(sd["not_a_point_embed.weight"])[0],
        "no_mask_embed": t(sd["no_mask_embed.weight"])[0],
        "mask_down_0": conv("mask_downscaling.0"),
        "mask_norm_0": ln("mask_downscaling.1"),
        "mask_down_1": conv("mask_downscaling.3"),
        "mask_norm_1": ln("mask_downscaling.4"),
        "mask_proj": conv("mask_downscaling.6"),
    }
    return {"params": params}


class InteractiveSegmenter(nn.Module):
    """Jit-friendly core: trunk encode + prompt encode + SAM decode
    (the model stack behind SAM3InteractiveImagePredictor)."""

    features: int = 64
    trunk: str = "conv"
    img_size: int = 512
    num_heads: int = 8

    def setup(self):
        from skix.tracking.memory_tracker import ImageEncoder
        from skix.tracking.sam_decoder import SamMaskDecoder

        self.encoder = ImageEncoder(self.features, trunk=self.trunk,
                                    name="encoder")
        self.prompts = SamPromptEncoder(self.features,
                                        input_image_size=self.img_size,
                                        name="prompt_encoder")
        self.decoder = SamMaskDecoder(transformer_dim=self.features,
                                      num_heads=self.num_heads,
                                      name="decoder")

    def encode_image(self, image):
        """``image (B, H, W, 3)`` → (B, h, w, C)."""
        return self.encoder(image)

    def predict_from_embedding(self, feats, points, labels,
                               boxes=None, mask_in=None,
                               multimask_output: bool = True):
        h, w = feats.shape[1], feats.shape[2]
        sparse, dense, img_pe = self.prompts((h, w), points, labels,
                                             boxes, mask_in)
        return self.decoder(feats + dense,
                            image_pe=img_pe[None],
                            prompt_tokens=sparse,
                            multimask_output=multimask_output)

    def __call__(self, image, points, labels):  # init path
        feats = self.encode_image(image)
        return self.predict_from_embedding(feats, points, labels)


class SamImagePredictor:
    """Host facade with the reference's interactive API
    (sam1_task_predictor.py:22): ``set_image`` → repeated ``predict``
    calls against the cached embedding → ``reset_predictor``."""

    def __init__(self, model: InteractiveSegmenter, variables,
                 max_points: int = 8):
        self.model = model
        self.variables = variables
        self.max_points = int(max_points)
        self._feats = None
        self._orig_hw = None
        self._encode = jax.jit(
            lambda v, img: model.apply(v, img,
                                       method=model.encode_image))
        self._decode = jax.jit(
            lambda v, f, p, l, mm: model.apply(
                v, f, p, l, multimask_output=mm,
                method=model.predict_from_embedding),
            static_argnums=(4,))
        self._decode_box = jax.jit(
            lambda v, f, p, l, b, mm: model.apply(
                v, f, p, l, boxes=b, multimask_output=mm,
                method=model.predict_from_embedding),
            static_argnums=(5,))

    def set_image(self, image: np.ndarray) -> None:
        """``image (H, W, 3)`` uint8/float; resized to the model square."""
        img = np.asarray(image)
        self._orig_hw = img.shape[:2]
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        s = self.model.img_size
        x = jax.image.resize(jnp.asarray(img), (s, s, 3), "bilinear")
        self._feats = self._encode(self.variables, x[None])

    def get_image_embedding(self):
        if self._feats is None:
            raise RuntimeError("call set_image first")
        return self._feats

    def predict(self, point_coords, point_labels, box=None,
                multimask_output: bool = True):
        """``point_coords (P, 2)`` in ORIGINAL-image pixels, ``point_labels
        (P,)`` 1=fg / 0=bg; ``box`` optional (4,) xyxy in original pixels
        (the reference predict signature, sam1_task_predictor.py:230).
        Returns (masks (M, H, W) bool at the original size, iou_pred (M,),
        lowres_logits)."""
        if self._feats is None:
            raise RuntimeError("call set_image first")
        H, W = self._orig_hw
        s = self.model.img_size
        if point_coords is None:  # box-only prompting (reference allows it)
            point_coords = np.zeros((0, 2), np.float32)
            point_labels = np.zeros((0,), np.int32)
        pts = np.asarray(point_coords, np.float32).reshape(-1, 2).copy()
        if len(pts):
            pts[:, 0] *= s / W
            pts[:, 1] *= s / H
        lab = np.asarray(point_labels, np.int32).reshape(-1)
        P = self.max_points
        pad = P - len(lab)
        if pad < 0:
            raise ValueError(f"at most {P} points")
        pts = np.pad(pts, ((0, pad), (0, 0)))
        lab = np.pad(lab, (0, pad), constant_values=-1)
        if box is not None:
            bx = np.asarray(box, np.float32).reshape(4).copy()
            bx[0::2] *= s / W
            bx[1::2] *= s / H
            out = self._decode_box(self.variables, self._feats,
                                   jnp.asarray(pts)[None],
                                   jnp.asarray(lab)[None],
                                   jnp.asarray(bx)[None],
                                   bool(multimask_output))
        else:
            out = self._decode(self.variables, self._feats,
                               jnp.asarray(pts)[None],
                               jnp.asarray(lab)[None],
                               bool(multimask_output))
        logits = out.all_mask_logits if multimask_output \
            else out.mask_logits[:, None]
        up = jax.image.resize(logits, (*logits.shape[:2], H, W), "bilinear")
        masks = np.asarray(up[0] > 0.0)
        iou = np.asarray(out.iou_pred[0])
        return masks, iou, np.asarray(logits[0])

    def reset_predictor(self) -> None:
        self._feats = None
        self._orig_hw = None
