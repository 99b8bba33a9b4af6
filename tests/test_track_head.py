"""Track-head tests: bilinear sampling + correlation-guided refinement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.track_head import TrackHead, bilinear_sample

rng = np.random.default_rng(163)


class TestBilinear:
    def test_exact_at_integer_coords(self):
        fmap = jnp.asarray(rng.random((6, 7, 3)), jnp.float32)
        xy = jnp.asarray([[2.0, 3.0], [0.0, 0.0]])
        out = np.asarray(bilinear_sample(fmap, xy))
        np.testing.assert_allclose(out[0], np.asarray(fmap[3, 2]), atol=1e-6)
        np.testing.assert_allclose(out[1], np.asarray(fmap[0, 0]), atol=1e-6)

    def test_interpolates_midpoint(self):
        fmap = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0).at[0, 1, 0].set(3.0)
        out = float(bilinear_sample(fmap, jnp.asarray([0.5, 0.0]))[0])
        assert abs(out - 2.0) < 1e-6

    def test_zero_outside(self):
        fmap = jnp.ones((4, 4, 1))
        out = float(bilinear_sample(fmap, jnp.asarray([-5.0, 2.0]))[0])
        assert out == 0.0


class TestTrackHead:
    def test_shapes(self):
        model = TrackHead(dim=32, iters=2, corr_radius=2, patch_size=8)
        feats = jnp.asarray(rng.normal(size=(1, 4, 6, 6, 16)), jnp.float32)
        queries = jnp.asarray([[[16.0, 24.0], [8.0, 8.0], [40.0, 40.0]]])
        v = model.init(jax.random.PRNGKey(0), feats, queries)
        out = model.apply(v, feats, queries)
        assert out.tracks.shape == (1, 4, 3, 2)
        assert out.visibility.shape == (1, 4, 3)
        assert np.all(np.isfinite(np.asarray(out.tracks)))
        assert 0.0 <= float(jnp.min(out.visibility)) \
            and float(jnp.max(out.visibility)) <= 1.0

    def test_static_scene_stays_near_query(self):
        """With identical features every frame, refined tracks should stay
        in the neighborhood of the query (correlation peak at the start)."""
        model = TrackHead(dim=32, iters=3, corr_radius=2, patch_size=8)
        one = rng.normal(size=(1, 1, 8, 8, 16)).astype(np.float32)
        feats = jnp.asarray(np.tile(one, (1, 5, 1, 1, 1)))
        queries = jnp.asarray([[[32.0, 32.0]]])
        v = model.init(jax.random.PRNGKey(0), feats, queries)
        out = model.apply(v, feats, queries)
        # untrained net: positions remain finite and bounded near the frame
        t = np.asarray(out.tracks)
        assert np.all(np.abs(t - 32.0) < 64.0)
        # per-frame positions identical across frames (same features+state)
        np.testing.assert_allclose(t[0, 0], t[0, -1], atol=1e-4)
