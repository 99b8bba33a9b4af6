"""Stage CLI: novel-camera-angle frame synthesis (image editing).

Reference entry: image_edit/main.py:62 with driver run.py:37 —
``CameraEditor`` loads the Qwen-Image-Edit pipeline (bf16, FA3, fused
multiple-angles LoRA), builds bilingual camera-motion prompts from
(rotate_deg, move_forward, vertical_tilt, wideangle) and runs 4-step
flow-matching inference per sampled frame (qwen_image_edit.py:40-160).

Here: skix.models.mmdit ``QwenImageDiT`` — the reference-structure
denoiser (converter-parity-tested vs the imported vendored
transformer_qwenimage) — with the reference EDIT-PLUS inference
semantics by default (pipeline_qwenimage_edit_plus.py:804-823): target
latents start as pure noise, the VAE-encoded source-image tokens are
concatenated along the sequence axis every step, the velocity is sliced
back, and ``true_cfg_scale > 1`` runs true-CFG over negative prompt
embeds with the cond-norm rescale (:836-840; the reference CameraEditor
runs the distilled 4-step LoRA at true_cfg_scale=1.0,
qwen_image_edit.py:153). ``sampler: sdedit`` keeps the strength-noising
alternative. Latents come from a real KL-VAE (skix.models.vae, 8×
compression; ``use_vae: false`` falls back to a pixel-space downsample
for smoke runs), and LoRA adapters fuse into the transformer weights at
load time (skix.models.lora, reference qwen_image_edit.py:79-87
``fuse_lora(lora_scale=1.25)``).

Text conditioning is REAL by default and Qwen-shaped: prompts flow
tokenizer → a :class:`skix.models.qwen_text.QwenTextEncoder` (the
decoder-only RMSNorm/SwiGLU/GQA architecture of the reference's
Qwen2.5-VL prompt tower, pipeline_qwenimage_edit_plus.py:194,287) →
MMDiT text stream. The converter seam for real weights is
``skix.models.qwen_text.convert_hf_qwen2`` via
``text_encoder_checkpoint`` (a torch ``.pt/.pth`` Qwen2 state dict
converts directly); the matching byte-level BPE tokenizer loads public
``vocab.json``/``merges.txt`` assets via ``qwen_vocab``/``qwen_merges``
(zero-egress: without them the in-repo CLIP BPE stands in, ids only).
``text_tower: clip`` keeps the round-3 CLIP/VE option
(``convert_ve_text_encoder`` seam); the hash embedding survives only
behind an explicit ``smoke_text: true``.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from skix.config import cli_main, iter_person_dirs

log = logging.getLogger(__name__)


class CameraEditor:
    def __init__(self, cfg):
        import jax
        import jax.numpy as jnp

        from skix.models.mmdit import QwenImageDiT

        self.cfg = cfg
        self.latent_down = int(cfg.get("latent_downsample", 8))
        self.use_vae = bool(cfg.get("use_vae", False))
        self.latent_channels = (int(cfg.get("latent_channels", 16))
                                if self.use_vae else 3)
        dim = int(cfg.get("dim", 256))
        heads = int(cfg.get("num_heads", 4))
        head_dim = dim // heads
        self.model = QwenImageDiT(
            patch_size=2,
            in_channels=4 * self.latent_channels,
            out_channels=self.latent_channels,
            num_layers=int(cfg.get("depth", 4)),
            attention_head_dim=head_dim,
            num_attention_heads=heads,
            joint_attention_dim=int(cfg.get("text_dim", 64)),
            axes_dims_rope=tuple(cfg.get("axes_dim", (16, 24, 24))),
        )
        size = int(cfg.get("image_size", 512))
        self.size = size
        lat = size // self.latent_down
        if lat % 2:
            raise ValueError(f"latent grid {lat} must be even for 2×2 "
                             "token packing")
        # token grids (target, source) — the pipeline's img_shapes
        self._fhw = ((1, lat // 2, lat // 2), (1, lat // 2, lat // 2))
        n_tok = (lat // 2) ** 2
        self.true_cfg = float(cfg.get("true_cfg_scale", 1.0))
        self.negative_prompt = str(cfg.get("negative_prompt", " "))
        self.sampler = str(cfg.get("sampler", "edit_plus"))
        ckpt = cfg.get("checkpoint")
        if ckpt and Path(ckpt).exists():
            if str(ckpt).endswith((".pt", ".pth")):
                import torch

                from skix.models.mmdit import convert_qwen_image_transformer

                sd = torch.load(ckpt, map_location="cpu", weights_only=True)
                self.variables = convert_qwen_image_transformer(sd)
                log.info("converted reference QwenImage transformer from "
                         "%s", ckpt)
            else:
                from skix.pipelines.videopose3d import load_checkpoint

                self.variables = load_checkpoint(ckpt)
        else:
            log.warning("no image-edit checkpoint configured — random init "
                        "(smoke mode)")
            self.variables = jax.jit(
                self.model.init,
                static_argnums=(4,))(
                jax.random.PRNGKey(0),
                jnp.zeros((1, n_tok, 4 * self.latent_channels)),
                jnp.zeros((1, 16, int(cfg.get("text_dim", 64)))),
                jnp.zeros((1,)), self._fhw[:1])

        # text conditioning: tokenizer → text tower → MMDiT (the hash
        # embedding is smoke-only and must be asked for explicitly)
        self.text_len = int(cfg.get("text_len", 16))
        self.text_encoder = None
        self.text_tower = str(cfg.get("text_tower", "qwen"))
        self._prompt_cache: dict = {}
        if bool(cfg.get("smoke_text", False)):
            log.warning("smoke_text=true: prompts use the deterministic "
                        "HASH embedding, not a text encoder — edits are "
                        "not semantically conditioned")
        elif self.text_tower == "qwen_vl":
            self._build_qwen_vl_tower(cfg, jax, jnp)
        elif self.text_tower == "qwen":
            self._build_qwen_tower(cfg, jax, jnp)
        else:
            from skix.tracking.clip_text import VETextEncoder
            from skix.tracking.clip_tokenizer import ClipTokenizer

            te_kw = dict(cfg.get("text_encoder", {}) or {})
            te_kw.setdefault("width", 256)
            te_kw.setdefault("heads", 4)
            te_kw.setdefault("layers", 4)
            enc = VETextEncoder(d_model=int(cfg.get("text_dim", 64)),
                                context_length=self.text_len, **te_kw)
            self.tokenizer = ClipTokenizer(context_length=self.text_len)
            te_ckpt = cfg.get("text_encoder_checkpoint")
            if te_ckpt and Path(te_ckpt).exists():
                from skix.pipelines.videopose3d import load_checkpoint

                te_vars = load_checkpoint(te_ckpt)
            else:
                log.warning("no text-encoder checkpoint — random-init "
                            "tower (real tokenization/attention, untrained "
                            "weights); convert one via "
                            "convert_ve_text_encoder")
                te_vars = jax.jit(enc.init)(
                    jax.random.PRNGKey(2),
                    jnp.zeros((1, self.text_len), jnp.int32))
            self.text_encoder = (enc, te_vars)

        # fuse LoRA adapters (reference: multiple-angles LoRA, scale 1.25)
        lora_path = cfg.get("lora_path")
        if lora_path and Path(lora_path).exists():
            from skix.models.lora import apply_lora, convert_safetensors_lora

            raw = dict(np.load(lora_path, allow_pickle=False))
            lora = convert_safetensors_lora(raw)
            self.variables, n = apply_lora(
                self.variables, lora,
                scale=float(cfg.get("lora_scale", 1.25)))
            log.info("fused %d LoRA deltas from %s", n, lora_path)

        # VAE: real latent space (encode → sample → decode)
        self.vae = None
        if self.use_vae:
            from skix.models.vae import KLVAE

            self.vae = KLVAE(ch=int(cfg.get("vae_ch", 32)),
                             latent_channels=self.latent_channels)
            vae_ckpt = cfg.get("vae_checkpoint")
            if vae_ckpt and Path(vae_ckpt).exists():
                from skix.pipelines.videopose3d import load_checkpoint

                self.vae_variables = load_checkpoint(vae_ckpt)
            else:
                log.warning("no VAE checkpoint — random init (smoke mode)")
                self.vae_variables = jax.jit(self.vae.init)(
                    jax.random.PRNGKey(1),
                    jnp.zeros((1, size, size, 3)))
            self._encode = jax.jit(
                lambda v, x: self.vae.apply(v, x, method=self.vae.encode))
            self._decode = jax.jit(
                lambda v, z: self.vae.apply(v, z, method=self.vae.decode))
        self._sample = jax.jit(self._sample_impl, static_argnums=(4, 5, 6))

    def _sample_impl(self, source_tokens, pos_emb, neg_emb, key, strength,
                     num_steps, cond_on_source):
        """One edit: Edit-Plus by default (noise target tokens, source
        tokens concatenated per step, optional true-CFG); ``sampler:
        sdedit`` noises the source tokens to ``strength`` instead."""
        import jax

        from skix.models.mmdit import edit_plus_sample, flow_matching_edit

        if self.sampler == "sdedit":
            return flow_matching_edit(
                self.model, self.variables, source_tokens, pos_emb,
                self._fhw[:1], num_steps=num_steps, key=key,
                strength=strength)
        noise = jax.random.normal(key, source_tokens.shape,
                                  source_tokens.dtype)
        return edit_plus_sample(
            self.model, self.variables, noise,
            source_tokens if cond_on_source else None, pos_emb,
            self._fhw if cond_on_source else self._fhw[:1],
            negative_prompt_emb=neg_emb if self.true_cfg > 1.0 else None,
            true_cfg_scale=self.true_cfg, num_steps=num_steps)

    def _resolve_qwen_tokenizer(self, cfg, vl: bool):
        """Shared tokenizer-asset resolution for the qwen/qwen_vl paths:
        the real byte-level BPE when ``qwen_vocab``/``qwen_merges``
        assets are configured; the in-repo CLIP BPE stands in otherwise
        (ids only — the tower architecture is unchanged). Returns
        (vocab_size, (vision_start, vision_end, image_pad) ids)."""
        vocab = cfg.get("qwen_vocab")
        merges = cfg.get("qwen_merges")
        if vocab and merges and Path(vocab).exists() \
                and Path(merges).exists():
            from skix.models.qwen_text import QwenBpeTokenizer

            self.tokenizer = QwenBpeTokenizer(
                vocab, merges, context_length=self.text_len)
            vocab_size = max(self.tokenizer.encoder.values()) + 1
            if vl:
                # real Qwen vision special ids live above the BPE table
                vocab_size = max(vocab_size, 151656)
            return vocab_size, (151652, 151653, 151655)
        from skix.tracking.clip_tokenizer import ClipTokenizer

        log.warning("no qwen_vocab/qwen_merges assets — tokenizing "
                    "with the in-repo CLIP BPE (the tower stays "
                    "Qwen-shaped; drop in the public vocab.json/"
                    "merges.txt to match reference ids)")
        self.tokenizer = ClipTokenizer(context_length=self.text_len)
        return (49408 + 3 if vl else 49408), (49408, 49409, 49410)

    def _qwen_text_kwargs(self, cfg, vocab_size):
        """Shared QwenTextEncoder kwarg fill for the qwen/qwen_vl paths."""
        te_kw = dict(cfg.get("text_encoder", {}) or {})
        te_kw.setdefault("layers", 2)
        te_kw.setdefault("heads", 4)
        te_kw.setdefault("kv_heads", 2)
        te_kw.setdefault("intermediate", 4 * int(cfg.get("text_dim", 64)))
        te_kw.setdefault("vocab_size", vocab_size)
        te_kw["vocab_size"] = int(te_kw["vocab_size"])
        te_kw["hidden"] = int(cfg.get("text_dim", 64))
        return te_kw

    def _build_qwen_tower(self, cfg, jax, jnp):
        """Qwen2-shaped prompt tower (the reference family)."""
        from skix.models.qwen_text import QwenTextEncoder, convert_hf_qwen2

        vocab_size, _ = self._resolve_qwen_tokenizer(cfg, vl=False)
        enc = QwenTextEncoder(**self._qwen_text_kwargs(cfg, vocab_size))
        te_ckpt = cfg.get("text_encoder_checkpoint")
        if te_ckpt and Path(te_ckpt).exists():
            if str(te_ckpt).endswith((".pt", ".pth")):
                import torch

                sd = torch.load(te_ckpt, map_location="cpu",
                                weights_only=True)
                te_vars = convert_hf_qwen2(sd)
                log.info("converted HF Qwen2 tower from %s", te_ckpt)
            else:
                from skix.pipelines.videopose3d import load_checkpoint

                te_vars = load_checkpoint(te_ckpt)
        else:
            log.warning("no text-encoder checkpoint — random-init "
                        "Qwen-shaped tower (real tokenization/attention, "
                        "untrained weights); convert one via "
                        "convert_hf_qwen2")
            te_vars = jax.jit(enc.init)(
                jax.random.PRNGKey(2),
                jnp.zeros((1, self.text_len), jnp.int32))
        self.text_encoder = (enc, te_vars)

    def _build_qwen_vl_tower(self, cfg, jax, jnp):
        """Qwen2.5-VL-shaped MULTIMODAL prompt tower — the reference's
        actual conditioning (pipeline_qwenimage_edit_plus.py:230
        ``_get_qwen_prompt_embeds``: the input image's vision tokens are
        spliced into the prompt and the LM runs with 3D rope). Converter
        seam: ``convert_hf_qwen2_5_vl`` via ``text_encoder_checkpoint``.
        Tokenizer as in the qwen path; the three vision special ids are
        the real Qwen ids when the real vocab is loaded, else the top of
        the stand-in vocab."""
        from skix.models.qwen_text import QwenTextEncoder
        from skix.models.qwen_vl import (QwenVisionTower, QwenVLEncoder,
                                         convert_hf_qwen2_5_vl)

        vocab_size, (vs_id, ve_id, pad_id) = \
            self._resolve_qwen_tokenizer(cfg, vl=True)
        dim = int(cfg.get("text_dim", 64))
        text = QwenTextEncoder(**self._qwen_text_kwargs(cfg, vocab_size))
        vi_kw = dict(cfg.get("vision_encoder", {}) or {})
        vi_kw.setdefault("depth", 2)
        vi_kw.setdefault("hidden", 32)
        vi_kw.setdefault("heads", 2)
        vi_kw.setdefault("intermediate", 64)
        vi_kw.setdefault("fullatt_block_indexes",
                         (int(vi_kw["depth"]) - 1,))
        vision = QwenVisionTower(out_hidden=dim, **vi_kw)
        hd = dim // text.heads
        half = hd // 2
        sec = cfg.get("mrope_section")
        if sec is None:
            # HF 7B ratio [16, 24, 24] of half=64 → (1/4, 3/8, 3/8)
            t = half // 4
            h = (half - t) // 2
            sec = (t, h, half - t - h)
        self._vl_image_tokens = int(cfg.get("image_tokens", 16))
        self._vl_patch = int(vi_kw.get("patch_size", 14))

        te_ckpt = cfg.get("text_encoder_checkpoint")
        if te_ckpt and Path(te_ckpt).exists():
            if str(te_ckpt).endswith((".pt", ".pth")):
                import torch

                sd = torch.load(te_ckpt, map_location="cpu",
                                weights_only=True)
                variables = convert_hf_qwen2_5_vl(sd)
                log.info("converted HF Qwen2.5-VL tower from %s", te_ckpt)
            else:
                from skix.pipelines.videopose3d import load_checkpoint

                variables = load_checkpoint(te_ckpt)
                if not {"vision", "text"} <= set(variables):
                    raise ValueError(
                        f"VL checkpoint {te_ckpt} must hold a "
                        "{'vision': ..., 'text': ...} pytree")
                log.info("loaded Qwen2.5-VL tower from %s", te_ckpt)
        else:
            log.warning("no VL checkpoint — random-init Qwen2.5-VL-"
                        "shaped tower (real tokenization/attention/"
                        "vision splice, untrained weights); convert one "
                        "via convert_hf_qwen2_5_vl")
            from skix.models.qwen_vl import preprocess_image_qwen

            patches, grid = preprocess_image_qwen(
                np.zeros((self._vl_patch * 2 * 4,) * 2 + (3,),
                         np.float32),
                patch_size=self._vl_patch,
                target_tokens=self._vl_image_tokens)
            variables = {
                "vision": jax.jit(
                    lambda r: vision.init(r, jnp.asarray(patches),
                                          (grid,)))(
                    jax.random.PRNGKey(3)),
                "text": jax.jit(text.init)(
                    jax.random.PRNGKey(2),
                    jnp.zeros((1, self.text_len), jnp.int32)),
            }
        self.text_encoder = QwenVLEncoder(
            vision, text, variables, mrope_section=sec,
            image_token_id=pad_id, vision_start_token_id=vs_id)
        self._vl_vision_end = ve_id

    def _embed_prompt_vl(self, prompt: str, image=None):
        """Multimodal encode: ``[vision_start, pad×N, vision_end] +
        text_ids`` with the image's vision tokens spliced at the pads;
        conditioning = the hidden states at the TEXT positions (the
        reference drops the template prefix the same way,
        :287 ``split_hidden_states = [e[drop_idx:] ...]``)."""
        from skix.models.qwen_vl import preprocess_image_qwen

        enc = self.text_encoder
        toks = self.tokenizer([prompt])
        if isinstance(toks, tuple):            # QwenBpeTokenizer
            ids, tmask = (np.asarray(t) for t in toks)
            tmask = tmask[0][:self.text_len]
        else:                                  # CLIP stand-in ids
            ids, tmask = np.asarray(toks), None
        text_ids = ids[0][:self.text_len]
        if image is not None:
            n = self._vl_image_tokens
            patches, grid = preprocess_image_qwen(
                image, patch_size=self._vl_patch, target_tokens=n)
            n_real = (grid[1] // 2) * (grid[2] // 2)
            full = np.concatenate([
                [enc.vision_start_token_id],
                np.full(n_real, enc.image_token_id, np.int64),
                [self._vl_vision_end], text_ids]).astype(np.int64)
            mask = None
            if tmask is not None:              # vision block is all real
                mask = np.concatenate(
                    [np.ones(n_real + 2, tmask.dtype), tmask])[None]
            hidden = enc.encode(full[None], patches, (grid,),
                                attention_mask=mask)
        else:
            hidden = enc.encode(
                text_ids[None].astype(np.int64),
                attention_mask=None if tmask is None else tmask[None])
        return np.asarray(hidden[0, -self.text_len:])

    def embed_prompt(self, prompt: str):
        """Prompt string → (text_len, text_dim) conditioning memory
        (reference encode_prompt: tokenizer → text tower → projection)."""
        import jax.numpy as jnp

        cached = self._prompt_cache.get(prompt)
        if cached is not None:
            return cached
        if self.text_encoder is None:   # explicit smoke_text=true
            from skix.models.mmdit import embed_prompt_tokens

            emb = embed_prompt_tokens(prompt, length=self.text_len,
                                      dim=int(self.cfg.get("text_dim", 64)))
        elif self.text_tower == "qwen_vl":
            emb = self._embed_prompt_vl(prompt)
        elif self.text_tower == "qwen":
            from skix.utils.jitapply import apply_model

            enc, te_vars = self.text_encoder
            toks = self.tokenizer([prompt])
            if isinstance(toks, tuple):          # QwenBpeTokenizer
                ids, mask = toks
                hidden = apply_model(enc, None, te_vars,
                                     jnp.asarray(ids), jnp.asarray(mask))
            else:                                # CLIP stand-in ids
                hidden = apply_model(enc, None, te_vars,
                                     jnp.asarray(np.asarray(toks)))
            emb = hidden[0]
        else:
            from skix.utils.jitapply import apply_model

            enc, te_vars = self.text_encoder
            tokens = jnp.asarray(self.tokenizer([prompt]))
            _, resized, _ = apply_model(enc, None, te_vars, tokens)
            emb = resized[0]
        emb = np.asarray(emb)
        self._prompt_cache[prompt] = emb
        return emb

    def infer_camera_edit(self, frame_u8: np.ndarray, rotate_deg=0.0,
                          move_forward=0.0, vertical_tilt=0.0,
                          wideangle=False, seed: int = 0):
        import jax
        import jax.numpy as jnp

        from skix.models.mmdit import build_camera_prompt

        from skix.models.mmdit import pack_latents, unpack_latents

        prompt = build_camera_prompt(rotate_deg, move_forward, vertical_tilt,
                                     wideangle)
        vl_on_image = (self.text_tower == "qwen_vl"
                       and self.text_encoder is not None
                       and bool(self.cfg.get("condition_on_image", True)))
        if vl_on_image:
            # the reference conditions the PROMPT TOWER on the input image
            # too (encode_prompt(prompt, image) — vision tokens spliced
            # into the prompt); per-frame, so no prompt cache
            text = jnp.asarray(self._embed_prompt_vl(prompt, frame_u8))
        else:
            text = jnp.asarray(self.embed_prompt(prompt))
        neg = None
        if self.true_cfg > 1.0 and self.sampler != "sdedit":
            # true-CFG needs negative embeds (reference encode_prompt on
            # the negative prompt WITH the same image context, :709-718)
            neg = jnp.asarray(
                self._embed_prompt_vl(self.negative_prompt, frame_u8)
                if vl_on_image else self.embed_prompt(self.negative_prompt)
            )[None]
        img = jnp.asarray(frame_u8, jnp.float32) / 127.5 - 1.0
        if img.shape[:2] != (self.size, self.size):
            img = jax.image.resize(img, (self.size, self.size, 3),
                                   "bilinear")
        if self.vae is not None:
            mean, _ = self._encode(self.vae_variables, img[None])
            lat = mean * self.vae.scaling_factor
        else:
            lat_size = self.size // self.latent_down
            lat = jax.image.resize(img, (lat_size, lat_size, 3),
                                   "bilinear")[None]
        lat_h, lat_w = lat.shape[1], lat.shape[2]
        tokens = pack_latents(lat)
        out_tok = self._sample(
            tokens, text[None], neg, jax.random.PRNGKey(seed),
            float(self.cfg.get("strength", 0.6)),
            int(self.cfg.get("num_inference_steps", 4)),
            bool(self.cfg.get("condition_on_latents", True)))
        out_lat = unpack_latents(out_tok, lat_h, lat_w)
        if self.vae is not None:
            out = self._decode(self.vae_variables,
                               out_lat / self.vae.scaling_factor)[0]
        else:
            out = jax.image.resize(out_lat[0], (self.size, self.size, 3),
                                   "bilinear")
        out = np.asarray(jnp.clip((out + 1.0) * 127.5, 0, 255)).astype(np.uint8)
        return out, prompt


@cli_main("image_edit")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    from skix.io.video import read_video

    editor = CameraEditor(cfg)
    root = Path(cfg.paths.video_root)
    out_root = Path(cfg.paths.out_root)
    edits = cfg.get("edits", [{"rotate_deg": 30.0}, {"rotate_deg": -30.0}])
    stride = int(cfg.get("frame_stride", 30))
    report = {}
    for person_dir in iter_person_dirs(root, cfg):
        for video in sorted(person_dir.glob("*.mp4")):
            # per-video isolation like every other stage: one corrupt
            # video (or a bad edits key) must not abort the batch and
            # lose the summary
            try:
                frames = read_video(video, max_frames=cfg.get("max_frames"))
                out_dir = out_root / person_dir.name / video.stem
                out_dir.mkdir(parents=True, exist_ok=True)
                n = 0
                import cv2

                for t in range(0, len(frames), stride):
                    for e_i, edit in enumerate(edits):
                        ed = (dict(edit) if not hasattr(edit, "to_dict")
                              else edit.to_dict())
                        out, prompt = editor.infer_camera_edit(frames[t],
                                                               **ed)
                        cv2.imwrite(
                            str(out_dir / f"frame_{t:06d}_edit{e_i}.png"),
                            cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
                        n += 1
                report[f"{person_dir.name}/{video.stem}"] = n
                log.info("%s/%s: %d edited frames", person_dir.name,
                         video.stem, n)
            except Exception:  # noqa: BLE001 — per-video isolation
                log.exception("%s failed", video)
                report[f"{person_dir.name}/{video.stem}"] = -1
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "image_edit_summary.json").write_text(
        json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
