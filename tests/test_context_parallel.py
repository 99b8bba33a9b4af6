"""Sequence-parallel attention tests on the 8-device virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.ops.attention import _attention_reference
from skix.parallel import make_mesh
from skix.parallel.context_parallel import allgather_kv_attention, ring_attention

rng = np.random.default_rng(191)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"sp": 8})


def _qkv(S=64, D=16, B=1, H=2):
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    return q, k, v


class TestAllGatherKV:
    def test_matches_single_device(self, mesh):
        q, k, v = _qkv()
        want = np.asarray(_attention_reference(q, k, v, 0.25))
        got = np.asarray(allgather_kv_attention(q, k, v, mesh, "sp",
                                                sm_scale=0.25))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_jit(self, mesh):
        q, k, v = _qkv()
        fn = jax.jit(lambda a, b, c: allgather_kv_attention(a, b, c, mesh))
        out = fn(q, k, v)
        assert out.shape == q.shape


class TestRing:
    def test_matches_single_device(self, mesh):
        q, k, v = _qkv(S=80)
        want = np.asarray(_attention_reference(q, k, v, 0.25))
        got = np.asarray(ring_attention(q, k, v, mesh, "sp", sm_scale=0.25))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_default_scale(self, mesh):
        q, k, v = _qkv(S=64, D=16)
        want = np.asarray(_attention_reference(q, k, v, 1 / 4.0))
        got = np.asarray(ring_attention(q, k, v, mesh, "sp"))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_extreme_logits_stable(self, mesh):
        # large-magnitude scores exercise the online-softmax merge
        q, k, v = _qkv(S=64, D=16)
        got = np.asarray(ring_attention(50.0 * q, 50.0 * k, v, mesh, "sp"))
        want = np.asarray(_attention_reference(50.0 * q, 50.0 * k, v, 0.25))
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, want, atol=1e-4)
