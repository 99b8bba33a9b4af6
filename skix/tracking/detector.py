"""Compact DETR-family promptable detector (Flax).

Capability-parity skeleton of the reference's SAM3 image detector
(sam3/model/sam3_image.py:36: ViT-Det backbone + text encoder + vision-
language fusion + transformer decoder + dot-product scoring head; SURVEY.md
§2.8): here a ViT backbone, a prompt-conditioning token (text/geometry
embedding slot — a full CLIP-BPE encoder is deferred to a later round),
learnable object queries, cross-attention decoder, and box/score heads.
Boxes are predicted as normalized cxcywh and scored against the prompt
embedding by dot product (the reference's scoring-head shape).

All shapes static; the per-frame detector output feeds
skix.tracking.lifecycle directly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from skix.models.layers import Block, Mlp, PatchEmbed
from skix.tracking.lifecycle import TrackerConfig  # noqa: F401 (re-export)


class Detections(NamedTuple):
    boxes_xyxy: jnp.ndarray   # (B, Q, 4) in pixels of the input image
    scores: jnp.ndarray       # (B, Q)
    embeddings: jnp.ndarray   # (B, Q, C) query features (for association)
    mask_logits: jnp.ndarray  # (B, Q, gh, gw) per-query segmentation logits


class DetrDetector(nn.Module):
    img_size: int = 256
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 6
    num_heads: int = 6
    num_queries: int = 16
    decoder_depth: int = 2
    prompt_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, prompt_embedding=None) -> Detections:
        """``images (B, H, W, 3)`` in [0,1]; ``prompt_embedding (B, D)``
        optional concept vector (e.g. encoded "person" / "snow")."""
        B, H, W, _ = images.shape
        x = (images - 0.5) / 0.5
        tokens = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                            name="patch_embed")(x.astype(self.dtype))
        P = tokens.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, P, self.embed_dim))
        tokens = tokens + pos.astype(self.dtype)

        # vision–prompt fusion: add the projected prompt to every token
        if prompt_embedding is not None:
            pe = nn.Dense(self.embed_dim, name="prompt_proj")(
                prompt_embedding)
            tokens = tokens + pe[:, None, :].astype(self.dtype)

        for i in range(self.depth):
            tokens = Block(self.num_heads, 4.0, dtype=self.dtype,
                           name=f"block_{i}")(tokens)
        memory = nn.LayerNorm(dtype=self.dtype, name="enc_norm")(
            tokens).astype(jnp.float32)

        queries = self.param("query_embed", nn.initializers.normal(0.02),
                             (1, self.num_queries, self.embed_dim))
        q = jnp.broadcast_to(queries, (B, self.num_queries, self.embed_dim))
        from skix.models.sam3d_body import CrossAttnBlock

        for i in range(self.decoder_depth):
            q = CrossAttnBlock(self.num_heads, name=f"decoder_{i}")(q, memory)
        q = nn.LayerNorm(name="dec_norm")(q)

        # box head: normalized cxcywh via sigmoid
        box = nn.sigmoid(Mlp(self.embed_dim, out_features=4,
                             name="box_head")(q))
        cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
        boxes = jnp.stack([(cx - w / 2) * W, (cy - h / 2) * H,
                           (cx + w / 2) * W, (cy + h / 2) * H], axis=-1)

        # dot-product scoring against the prompt (objectness fallback)
        obj = Mlp(self.embed_dim, out_features=1, name="objectness")(q)[..., 0]
        if prompt_embedding is not None:
            pq = nn.Dense(self.embed_dim, name="score_proj")(prompt_embedding)
            sim = jnp.einsum("bqc,bc->bq", q, pq) / jnp.sqrt(
                jnp.asarray(self.embed_dim, jnp.float32))
            scores = nn.sigmoid(obj + sim)
        else:
            scores = nn.sigmoid(obj)

        # maskformer-style segmentation: per-query mask = dot product of a
        # query mask-embedding with per-pixel embeddings (reference
        # sam3/model/maskformer_segmentation.py capability)
        gh, gw = H // self.patch_size, W // self.patch_size
        pixel_emb = nn.Dense(self.embed_dim, name="pixel_embed")(memory)
        mask_q = Mlp(self.embed_dim, out_features=self.embed_dim,
                     name="mask_embed")(q)
        mask_logits = jnp.einsum("bqc,bpc->bqp", mask_q, pixel_emb)
        mask_logits = mask_logits.reshape(B, self.num_queries, gh, gw)
        return Detections(boxes_xyxy=boxes, scores=scores, embeddings=q,
                          mask_logits=mask_logits)


def embed_text_prompt(text: str, dim: int = 64) -> jnp.ndarray:
    """Deterministic hash-based concept embedding — the plumbing slot a
    CLIP-BPE text encoder (reference text_encoder_ve.py) drops into in a
    later round. Distinct strings get near-orthogonal vectors."""
    import hashlib

    import numpy as np

    h = hashlib.sha256(text.lower().strip().encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    v = rng.normal(size=(dim,)).astype(np.float32)
    return jnp.asarray(v / (np.linalg.norm(v) + 1e-9))
