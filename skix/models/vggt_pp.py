"""VGGT aggregator under pipeline parallelism.

Runs the Aggregator's depth-D alternating frame/global block stack
through :func:`skix.parallel.pipeline.pipeline_apply`: consecutive
block PAIRS group into S = pipe-axis-size stages, each stage's weights
resident on exactly ONE chip, token activations hopping the ICI ring on
a GPipe schedule. This is the memory-scaling mode the reference cannot
express (its VGGT runs fully replicated per GPU — SURVEY §2.16 "PP:
not needed"); here VGGT-1B's 24 × 2 blocks (~0.8 GB bf16 of trunk
weights + AdamW state ×3) can spread over a pod slice while TP/SP stay
available inside each stage.

Works on the UNCHANGED ``Aggregator`` parameter tree (no module
refactor, converters/checkpoints untouched): the pre-block token
assembly (patchify, camera/register token expansion, rope positions —
aggregator.py semantics, transcribed from
:meth:`skix.models.vggt.Aggregator.__call__`) runs replicated; per-depth
block params are sliced out of the tree by name and stage-stacked; the
intermediate-layer outputs the VGGT heads consume ride a fixed
``(n_out, …)`` buffer through the pipeline so ``output_layers``
semantics survive (each stage writes its owned layers' frame‖global
concat into its slot).

Parity: tests/test_vggt_pp.py asserts the pipelined forward equals
``agg.apply`` to 1e-4 for every output layer, at one and two block
pairs per stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from skix.models.layers import Block, PatchEmbed, make_grid_positions
from skix.models.vggt import _RESNET_MEAN, _RESNET_STD, Aggregator
from skix.parallel.pipeline import pipeline_apply


def aggregator_stage_params(variables, depth: int, n_stages: int):
    """Slice ``frame_block_i``/``global_block_i`` params out of an
    Aggregator tree and stack them stage-major: leaves
    ``(n_stages, blocks_per_stage, …)``. Also returns the per-stage
    ``out_slot`` table mapping each local block to its slot in the
    output buffer (−1 = layer not requested)."""
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    bps = depth // n_stages
    params = variables["params"]

    def stack(prefix):
        per_stage = []
        for s in range(n_stages):
            blocks = [params[f"{prefix}_{s * bps + j}"] for j in range(bps)]
            per_stage.append(jax.tree.map(lambda *xs: jnp.stack(xs),
                                          *blocks))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage)

    return {"frame": stack("frame_block"), "global": stack("global_block")}


def aggregator_pipeline_forward(agg: Aggregator, variables, images,
                                mesh: Mesh, axis: str = "pipe",
                                n_micro: int | None = None):
    """``agg.apply(variables, images)`` with the block stack pipelined
    over ``mesh[axis]``. ``images (B, S, H, W, 3)``; B must be divisible
    by ``n_micro`` (default: min(B, 2·pipe)). Returns
    ``(outputs list, patch_start_idx)`` exactly like the module.

    Constraints: ``patch_embed_kind='conv'`` and no ``global_attn_fn``
    override (SP inside a PP stage would nest shard_maps — compose PP
    with TP/DP instead)."""
    if agg.patch_embed_kind != "conv":
        raise NotImplementedError("PP forward supports the conv patchify")
    if agg.global_attn_fn is not None:
        raise NotImplementedError("PP does not compose with the SP "
                                  "attention override in one call")
    n_stages = mesh.shape[axis]
    bps = agg.depth // n_stages
    B, S, H, W, _ = images.shape
    M = n_micro or min(B, 2 * n_stages)
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    b = B // M

    # ---- pre-block token assembly (replicated; Aggregator.__call__
    # transcription on the SAME param tree) ----
    params = variables["params"]
    x = (images - _RESNET_MEAN) / _RESNET_STD
    x = x.reshape(B * S, H, W, 3).astype(agg.dtype)
    patch_tokens = PatchEmbed(agg.patch_size, agg.embed_dim, agg.dtype) \
        .apply({"params": params["patch_embed"]}, x)

    def expand_special(tok):
        X = tok.shape[2]
        first = jnp.broadcast_to(tok[:, 0:1], (B, 1, X, agg.embed_dim))
        rest = jnp.broadcast_to(tok[:, 1:2],
                                (B, S - 1, X, agg.embed_dim))
        return jnp.concatenate([first, rest], axis=1).reshape(
            B * S, X, agg.embed_dim)

    tokens = jnp.concatenate(
        [expand_special(params["camera_token"]).astype(agg.dtype),
         expand_special(params["register_token"]).astype(agg.dtype),
         patch_tokens], axis=1)
    P_tok = tokens.shape[1]

    gh, gw = H // agg.patch_size, W // agg.patch_size
    grid = jnp.asarray(make_grid_positions(gh, gw)) + 1
    pos_frame = jnp.concatenate(
        [jnp.zeros((agg.patch_start_idx, 2), jnp.int32), grid], axis=0)
    pos_bs = jnp.broadcast_to(pos_frame[None], (b * S, P_tok, 2))
    pos_global = pos_bs.reshape(b, S * P_tok, 2)

    want = (list(range(agg.depth)) if agg.output_layers is None
            else list(agg.output_layers))
    n_out = len(want)
    slot_of = {layer: i for i, layer in enumerate(want)}
    out_slot = np.full((n_stages, bps), -1, np.int32)
    for s in range(n_stages):
        for j in range(bps):
            layer = s * bps + j
            if layer in slot_of:
                out_slot[s, j] = slot_of[layer]

    stage_params = aggregator_stage_params(variables, agg.depth, n_stages)
    stage_params["out_slot"] = jnp.asarray(out_slot)

    block_kwargs = dict(
        num_heads=agg.num_heads, mlp_ratio=agg.mlp_ratio,
        qk_norm=agg.qk_norm, init_values=agg.init_values,
        rope_freq=agg.rope_freq, dtype=agg.dtype,
        attn_fixed_max=agg.attn_fixed_max if agg.qk_norm else None,
        rope_tables=True)
    blk = Block(**block_kwargs)

    def stage_fn(p, act):
        tok, outs = act["tokens"], act["outs"]
        for j in range(bps):
            fp = jax.tree.map(lambda a, j=j: a[j], p["frame"])
            gp = jax.tree.map(lambda a, j=j: a[j], p["global"])
            tok = blk.apply({"params": fp}, tok, pos_bs)
            frame_inter = tok.reshape(b, S, P_tok, agg.embed_dim)
            tok_g = blk.apply({"params": gp},
                              tok.reshape(b, S * P_tok, agg.embed_dim),
                              pos_global)
            tok = tok_g.reshape(b * S, P_tok, agg.embed_dim)
            global_inter = tok.reshape(b, S, P_tok, agg.embed_dim)
            conc = jnp.concatenate([frame_inter, global_inter],
                                   axis=-1).astype(jnp.float32)
            slot = p["out_slot"][j]
            cur = jax.lax.dynamic_index_in_dim(
                outs, jnp.clip(slot, 0, n_out - 1), keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(slot >= 0, conc, cur),
                jnp.clip(slot, 0, n_out - 1), 0)
        return {"tokens": tok, "outs": outs}

    act0 = {
        "tokens": tokens.reshape(M, b * S, P_tok, agg.embed_dim),
        "outs": jnp.zeros((M, n_out, b, S, P_tok, 2 * agg.embed_dim),
                          jnp.float32),
    }
    result = pipeline_apply(stage_fn, stage_params, act0, mesh, axis)
    # (M, n_out, b, S, …) → n_out × (B, S, …)
    outs = jnp.moveaxis(result["outs"], 1, 0).reshape(
        n_out, B, S, P_tok, 2 * agg.embed_dim)
    return [outs[i] for i in range(n_out)], agg.patch_start_idx
