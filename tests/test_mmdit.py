"""Qwen-Image DiT / image-edit tests.

Parity oracle: the IMPORTED vendored reference transformer
(image_edit/qwenimage/transformer_qwenimage.py) with randomly
initialized weights converted through ``convert_qwen_image_transformer``
(see tests/_qwen_oracle.py for the diffusers-surface stub).
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.mmdit import (
    QwenImageDiT,
    build_camera_prompt,
    convert_qwen_image_transformer,
    edit_plus_sample,
    embed_prompt_tokens,
    flow_match_sigmas,
    flow_matching_edit,
    pack_latents,
    qwen_rope_angles,
    rope_3d,
    timestep_embedding,
    unpack_latents,
)

rng = np.random.default_rng(83)

TINY = dict(patch_size=2, in_channels=16, out_channels=4, num_layers=2,
            attention_head_dim=16, num_attention_heads=2,
            joint_attention_dim=24, axes_dims_rope=(4, 6, 6))


def _tiny_pair(seed=0):
    """(reference torch model, skix model, converted variables)."""
    import torch

    from _qwen_oracle import load_reference_transformer

    ref_mod = load_reference_transformer()
    torch.manual_seed(seed)
    ref = ref_mod.QwenImageTransformer2DModel(
        patch_size=2, in_channels=16, out_channels=4, num_layers=2,
        attention_head_dim=16, num_attention_heads=2,
        joint_attention_dim=24, guidance_embeds=False,
        axes_dims_rope=(4, 6, 6)).eval()
    model = QwenImageDiT(**TINY)
    variables = convert_qwen_image_transformer(ref.state_dict())
    return ref, model, variables


class TestComponents:
    def test_timestep_embedding(self):
        e = timestep_embedding(jnp.asarray([0.0, 0.5]), 32)
        assert e.shape == (2, 32)
        assert not np.allclose(np.asarray(e[0]), np.asarray(e[1]))

    def test_rope3d_preserves_norm(self):
        x = jnp.asarray(rng.normal(size=(1, 2, 5, 64)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, 10, (1, 5, 3)), jnp.float32)
        y = rope_3d(x, pos)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                                   np.linalg.norm(np.asarray(x), axis=-1),
                                   rtol=1e-5)

    def test_prompt_builder(self):
        p = build_camera_prompt(rotate_deg=45)
        assert "45" in p and "left" in p and "左" in p
        p2 = build_camera_prompt(move_forward=-1, vertical_tilt=1,
                                 wideangle=True)
        assert "backward" in p2 and "upward" in p2 and "wide-angle" in p2
        assert "unchanged" in build_camera_prompt()

    def test_prompt_tokens_deterministic(self):
        a = embed_prompt_tokens("rotate left", 8, 32)
        b = embed_prompt_tokens("rotate left", 8, 32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_pack_unpack_roundtrip(self):
        x = jnp.asarray(rng.normal(size=(2, 8, 6, 5)), jnp.float32)
        packed = pack_latents(x)
        assert packed.shape == (2, 4 * 3, 20)
        np.testing.assert_allclose(np.asarray(unpack_latents(packed, 8, 6)),
                                   np.asarray(x))

    def test_pack_matches_reference_nchw_semantics(self):
        """_pack_latents (pipeline_qwenimage_edit_plus.py:386) packs NCHW
        via view(B,C,h/2,2,w/2,2).permute(0,2,4,1,3,5); our NHWC pack must
        produce the identical token features."""
        B, C, h, w = 2, 3, 4, 6
        x = rng.normal(size=(B, C, h, w)).astype(np.float32)
        ref = x.reshape(B, C, h // 2, 2, w // 2, 2) \
               .transpose(0, 2, 4, 1, 3, 5) \
               .reshape(B, (h // 2) * (w // 2), C * 4)
        ours = pack_latents(jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-7)

    def test_flow_match_sigmas(self):
        sig = flow_match_sigmas(4, 1024)
        assert sig.shape == (5,)
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig) < 0)
        assert sig[0] <= 1.0
        # mu = 0 → shift is the identity on every sigma
        m = (1.15 - 0.5) / (4096 - 256)
        seq_at_mu0 = -(0.5 - m * 256) / m
        base = np.linspace(1.0, 1.0 / 4, 4)
        ident = flow_match_sigmas(4, seq_at_mu0)
        np.testing.assert_allclose(ident[:-1], base, rtol=1e-5)

    def test_rope_angles_shapes_and_text_offset(self):
        img, txt = qwen_rope_angles(((1, 4, 6), (1, 4, 6)), 5,
                                    axes_dim=(4, 6, 6))
        assert img.shape == (48, 8) and txt.shape == (5, 8)
        # text positions start at max(h//2, w//2) = 3 (scale_rope)
        assert txt[0, 0] == pytest.approx(3.0)


class TestModel:
    def test_output_shape_and_finite(self):
        model = QwenImageDiT(**TINY)
        fhw = ((1, 4, 4), (1, 4, 4))
        x = jnp.asarray(rng.normal(size=(1, 32, 16)), jnp.float32)
        txt = jnp.asarray(rng.normal(size=(1, 6, 24)), jnp.float32)
        t = jnp.asarray([0.5])
        v = model.init(jax.random.PRNGKey(0), x, txt, t, fhw)
        out = model.apply(v, x, txt, t, fhw)
        assert out.shape == (1, 32, 16)  # p²·out_channels = 16
        assert np.all(np.isfinite(np.asarray(out)))

    def test_text_conditioning_matters(self):
        model = QwenImageDiT(**TINY)
        fhw = ((1, 4, 4),)
        x = jnp.asarray(rng.normal(size=(1, 16, 16)), jnp.float32)
        t1 = jnp.asarray(rng.normal(size=(1, 6, 24)), jnp.float32)
        t2 = jnp.asarray(rng.normal(size=(1, 6, 24)), jnp.float32)
        ts = jnp.asarray([0.3])
        v = model.init(jax.random.PRNGKey(0), x, t1, ts, fhw)
        o1 = model.apply(v, x, t1, ts, fhw)
        o2 = model.apply(v, x, t2, ts, fhw)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_sdedit_steps(self):
        model = QwenImageDiT(**TINY)
        fhw = ((1, 4, 4),)
        lat = jnp.asarray(rng.normal(size=(1, 16, 16)), jnp.float32)
        txt = jnp.asarray(rng.normal(size=(1, 6, 24)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), lat, txt, jnp.asarray([0.5]),
                       fhw)
        out = flow_matching_edit(model, v, lat, txt, fhw, num_steps=4,
                                 key=jax.random.PRNGKey(1), strength=0.5)
        assert out.shape == lat.shape
        assert np.all(np.isfinite(np.asarray(out)))
        out0 = flow_matching_edit(model, v, lat, txt, fhw, num_steps=0,
                                  key=jax.random.PRNGKey(1), strength=0.0)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(lat),
                                   atol=1e-6)


class TestReferenceParity:
    """Forward + sampler parity vs the imported vendored transformer."""

    def test_forward_parity(self):
        import torch

        ref, model, variables = _tiny_pair()
        video_fhw = [(1, 4, 6), (1, 4, 6)]   # target + one source image
        B, S, L = 2, 48, 7
        x = torch.randn(B, S, 16)
        txt = torch.randn(B, L, 24)
        t = torch.tensor([0.7, 0.3])
        rope = ref.pos_embed([video_fhw] * B, [L] * B, device=x.device)
        with torch.no_grad():
            out_t = ref(hidden_states=x, encoder_hidden_states=txt,
                        encoder_hidden_states_mask=torch.ones(B, L),
                        timestep=t, image_rotary_emb=rope,
                        return_dict=False)[0]
        out_j = model.apply(variables, jnp.asarray(x.numpy()),
                            jnp.asarray(txt.numpy()),
                            jnp.asarray(t.numpy()),
                            tuple(video_fhw))
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                                   atol=2e-4, rtol=2e-4)

    def test_forward_parity_single_image_no_source(self):
        import torch

        ref, model, variables = _tiny_pair(seed=3)
        video_fhw = [(1, 6, 4)]
        B, S, L = 1, 24, 5
        x = torch.randn(B, S, 16)
        txt = torch.randn(B, L, 24)
        t = torch.tensor([0.11])
        rope = ref.pos_embed([video_fhw], [L], device=x.device)
        with torch.no_grad():
            out_t = ref(hidden_states=x, encoder_hidden_states=txt,
                        encoder_hidden_states_mask=torch.ones(B, L),
                        timestep=t, image_rotary_emb=rope,
                        return_dict=False)[0]
        out_j = model.apply(variables, jnp.asarray(x.numpy()),
                            jnp.asarray(txt.numpy()), jnp.asarray(t.numpy()),
                            tuple(video_fhw))
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                                   atol=2e-4, rtol=2e-4)

    def test_converter_rejects_unknown_keys(self):
        import torch

        ref, _, _ = _tiny_pair()
        sd = dict(ref.state_dict())
        sd["transformer_blocks.0.attn.extra.weight"] = torch.zeros(3)
        with pytest.raises(ValueError, match="unconverted"):
            convert_qwen_image_transformer(sd)

    def test_edit_plus_sampling_parity(self):
        """Two full denoise steps of the Edit-Plus loop
        (pipeline_qwenimage_edit_plus.py:795-844): latent concat along
        the sequence axis, velocity slice-back, true-CFG with the
        cond-norm rescale, Euler over the shifted sigmas — torch
        transcription with the ORACLE transformer vs edit_plus_sample."""
        import torch

        ref, model, variables = _tiny_pair(seed=1)
        video_fhw = [(1, 4, 4), (1, 4, 4)]
        B, S_t, S_s, L = 1, 16, 16, 6
        cfg_scale = 2.5
        lat0 = rng.normal(size=(B, S_t, 16)).astype(np.float32)
        img_lat = rng.normal(size=(B, S_s, 16)).astype(np.float32)
        emb_pos = rng.normal(size=(B, L, 24)).astype(np.float32)
        emb_neg = rng.normal(size=(B, L, 24)).astype(np.float32)
        sigmas = flow_match_sigmas(2, S_t)

        lat_t = torch.from_numpy(lat0.copy())
        img_lat_t = torch.from_numpy(img_lat)
        pos_t, neg_t = torch.from_numpy(emb_pos), torch.from_numpy(emb_neg)
        rope = ref.pos_embed([video_fhw] * B, [L] * B, device=lat_t.device)
        with torch.no_grad():
            for i in range(2):
                x_in = torch.cat([lat_t, img_lat_t], dim=1)
                t = torch.full((B,), float(sigmas[i]))
                pos = ref(hidden_states=x_in, encoder_hidden_states=pos_t,
                          encoder_hidden_states_mask=torch.ones(B, L),
                          timestep=t, image_rotary_emb=rope,
                          return_dict=False)[0][:, :S_t]
                neg = ref(hidden_states=x_in, encoder_hidden_states=neg_t,
                          encoder_hidden_states_mask=torch.ones(B, L),
                          timestep=t, image_rotary_emb=rope,
                          return_dict=False)[0][:, :S_t]
                comb = neg + cfg_scale * (pos - neg)
                cond_norm = torch.norm(pos, dim=-1, keepdim=True)
                noise_norm = torch.norm(comb, dim=-1, keepdim=True)
                v = comb * (cond_norm / noise_norm)
                lat_t = lat_t + (float(sigmas[i + 1]) - float(sigmas[i])) * v

        out_j = edit_plus_sample(
            model, variables, jnp.asarray(lat0), jnp.asarray(img_lat),
            jnp.asarray(emb_pos), tuple(video_fhw),
            negative_prompt_emb=jnp.asarray(emb_neg),
            true_cfg_scale=cfg_scale, sigmas=sigmas)
        np.testing.assert_allclose(np.asarray(out_j), lat_t.numpy(),
                                   atol=5e-4, rtol=5e-4)

    def test_edit_plus_no_source_no_cfg(self):
        """Degenerate path: no source latents, no negative embeds → plain
        flow-match euler from noise."""
        _, model, variables = _tiny_pair(seed=2)
        lat0 = jnp.asarray(rng.normal(size=(1, 16, 16)), jnp.float32)
        emb = jnp.asarray(rng.normal(size=(1, 5, 24)), jnp.float32)
        out = edit_plus_sample(model, variables, lat0, None, emb,
                               ((1, 4, 4),), num_steps=2)
        assert out.shape == lat0.shape
        assert np.all(np.isfinite(np.asarray(out)))


class TestCLI:
    def test_end_to_end(self, tmp_path):
        from skix.io.video import write_video
        from skix.pipelines.image_edit import main

        root = tmp_path / "videos" / "p01"
        root.mkdir(parents=True)
        write_video(root / "osmo_1.mp4",
                    rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8),
                    fps=4)
        out_root = tmp_path / "out"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "image_edit.yaml").write_text(f"""
paths:
  video_root: {tmp_path / 'videos'}
  out_root: {out_root}
checkpoint: null
image_size: 64
latent_downsample: 8
dim: 32
depth: 1
num_heads: 2
text_dim: 32
axes_dim: [4, 6, 6]
num_inference_steps: 2
true_cfg_scale: 2.0
frame_stride: 2
edits:
  - {{rotate_deg: 30.0}}
""")
        main([f"--config-dir={cdir}"])
        pngs = sorted((out_root / "p01" / "osmo_1").glob("*.png"))
        assert len(pngs) == 2  # frames 0, 2
        rep = json.loads((out_root / "image_edit_summary.json").read_text())
        assert rep["p01/osmo_1"] == 2
