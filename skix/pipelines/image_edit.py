"""Stage CLI: novel-camera-angle frame synthesis (image editing).

Reference entry: image_edit/main.py:62 with driver run.py:37 —
``CameraEditor`` loads the Qwen-Image-Edit pipeline (bf16, FA3, fused
multiple-angles LoRA), builds bilingual camera-motion prompts from
(rotate_deg, move_forward, vertical_tilt, wideangle) and runs 4-step
flow-matching inference per sampled frame (qwen_image_edit.py:40-160).

Here: skix.models.mmdit double-stream transformer + rectified-flow
sampler; latents come from a real KL-VAE (skix.models.vae, 8×
compression; ``use_vae: false`` falls back to a pixel-space downsample
for smoke runs), and LoRA adapters fuse into the transformer weights at
load time (skix.models.lora, reference qwen_image_edit.py:79-87
``fuse_lora(lora_scale=1.25)``). Structure, prompts, step count and
outputs mirror the reference.

Text conditioning is REAL by default: prompts flow tokenizer → text
transformer → MMDiT text stream, mirroring the reference's
``encode_prompt`` (pipeline_qwenimage_edit_plus.py: the Qwen2.5-VL text
tower embeds the camera-motion prompt; here the in-repo CLIP BPE
tokenizer + ``VETextEncoder`` tower, whose resizer projects token memory
to ``text_dim``). The converter seam for pretrained towers is
``skix.tracking.clip_text.convert_ve_text_encoder`` via
``text_encoder_checkpoint``; scale knobs via ``text_encoder:`` kwargs
(reference CLIP scale = width 1024 / heads 16 / layers 24, see
configs/image_edit.yaml). The round-2 hash embedding survives only
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

        from skix.models.mmdit import MMDiT

        self.cfg = cfg
        self.latent_down = int(cfg.get("latent_downsample", 8))
        self.use_vae = bool(cfg.get("use_vae", False))
        self.latent_channels = (int(cfg.get("latent_channels", 16))
                                if self.use_vae else 3)
        self.model = MMDiT(
            patch_size=int(cfg.get("patch_size", 2)),
            in_channels=self.latent_channels,
            dim=int(cfg.get("dim", 256)),
            depth=int(cfg.get("depth", 4)),
            num_heads=int(cfg.get("num_heads", 4)),
            text_dim=int(cfg.get("text_dim", 64)),
            axes_dim=tuple(cfg.get("axes_dim", (8, 28, 28))),
        )
        size = int(cfg.get("image_size", 512))
        self.size = size
        lat = size // self.latent_down
        ckpt = cfg.get("checkpoint")
        if ckpt and Path(ckpt).exists():
            from skix.pipelines.videopose3d import load_checkpoint

            self.variables = load_checkpoint(ckpt)
        else:
            log.warning("no image-edit checkpoint configured — random init "
                        "(smoke mode)")
            self.variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, lat, lat, self.latent_channels)),
                jnp.zeros((1, 16, int(cfg.get("text_dim", 64)))),
                jnp.zeros((1,)))

        # text conditioning: tokenizer → text tower → MMDiT (the hash
        # embedding is smoke-only and must be asked for explicitly)
        self.text_len = int(cfg.get("text_len", 16))
        self.text_encoder = None
        self._prompt_cache: dict = {}
        if bool(cfg.get("smoke_text", False)):
            log.warning("smoke_text=true: prompts use the deterministic "
                        "HASH embedding, not a text encoder — edits are "
                        "not semantically conditioned")
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
        self._sample = jax.jit(self._sample_impl, static_argnums=(4,))

    def _sample_impl(self, latents, text_emb, key, strength, num_steps):
        from skix.models.mmdit import flow_matching_edit

        return flow_matching_edit(self.model, self.variables, latents,
                                  text_emb, num_steps=num_steps, key=key,
                                  strength=strength)

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

        prompt = build_camera_prompt(rotate_deg, move_forward, vertical_tilt,
                                     wideangle)
        text = jnp.asarray(self.embed_prompt(prompt))
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
        out_lat = self._sample(lat, text[None], jax.random.PRNGKey(seed),
                               float(self.cfg.get("strength", 0.6)),
                               int(self.cfg.get("num_inference_steps", 4)))
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
            frames = read_video(video, max_frames=cfg.get("max_frames"))
            out_dir = out_root / person_dir.name / video.stem
            out_dir.mkdir(parents=True, exist_ok=True)
            n = 0
            import cv2

            for t in range(0, len(frames), stride):
                for e_i, edit in enumerate(edits):
                    ed = dict(edit) if not hasattr(edit, "to_dict") else edit.to_dict()
                    out, prompt = editor.infer_camera_edit(frames[t], **ed)
                    cv2.imwrite(str(out_dir / f"frame_{t:06d}_edit{e_i}.png"),
                                cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
                    n += 1
            report[f"{person_dir.name}/{video.stem}"] = n
            log.info("%s/%s: %d edited frames", person_dir.name, video.stem, n)
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "image_edit_summary.json").write_text(
        json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
