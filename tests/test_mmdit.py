"""MMDiT / image-edit tests."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.mmdit import (
    MMDiT,
    build_camera_prompt,
    embed_prompt_tokens,
    flow_matching_edit,
    rope_3d,
    timestep_embedding,
)

rng = np.random.default_rng(83)


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


class TestModel:
    def _tiny(self):
        return MMDiT(patch_size=2, in_channels=3, dim=64, depth=2,
                     num_heads=2, text_dim=32, axes_dim=(8, 12, 12))

    def test_velocity_shape(self):
        model = self._tiny()
        lat = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
        txt = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
        t = jnp.asarray([0.5])
        v = model.init(jax.random.PRNGKey(0), lat, txt, t)
        out = model.apply(v, lat, txt, t)
        assert out.shape == lat.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_text_conditioning_matters(self):
        model = self._tiny()
        lat = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
        t1 = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
        t2 = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
        ts = jnp.asarray([0.3])
        v = model.init(jax.random.PRNGKey(0), lat, t1, ts)
        o1 = model.apply(v, lat, t1, ts)
        o2 = model.apply(v, lat, t2, ts)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_flow_matching_steps(self):
        model = self._tiny()
        lat = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
        txt = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), lat, txt, jnp.asarray([0.5]))
        out = flow_matching_edit(model, v, lat, txt, num_steps=4,
                                 key=jax.random.PRNGKey(1), strength=0.5)
        assert out.shape == lat.shape
        assert np.all(np.isfinite(np.asarray(out)))
        # strength 0 with 0 noise → output = input exactly (no integration)
        out0 = flow_matching_edit(model, v, lat, txt, num_steps=0,
                                  key=jax.random.PRNGKey(1), strength=0.0)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(lat),
                                   atol=1e-6)


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
patch_size: 2
dim: 32
depth: 1
num_heads: 2
text_dim: 32
axes_dim: [4, 6, 6]
num_inference_steps: 2
strength: 0.5
frame_stride: 2
edits:
  - {{rotate_deg: 30.0}}
""")
        main([f"--config-dir={cdir}"])
        pngs = sorted((out_root / "p01" / "osmo_1").glob("*.png"))
        assert len(pngs) == 2  # frames 0, 2
        rep = json.loads((out_root / "image_edit_summary.json").read_text())
        assert rep["p01/osmo_1"] == 2
