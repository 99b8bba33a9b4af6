"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.parallel import (batch_sharding, make_mesh, replicate,
                           shard_params_fsdp, shard_params_tp)
from skix.parallel.collectives import (all_gather, all_reduce_mean,
                                       all_reduce_sum, data_parallel_map,
                                       psum_scalar)

rng = np.random.default_rng(23)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh({"data": 4, "model": 2})


class TestMesh:
    def test_axes(self, mesh8):
        assert mesh8.shape == {"data": 4, "model": 2}

    def test_minus_one_axis(self):
        m = make_mesh({"data": -1, "model": 2})
        assert m.shape["data"] == 4

    def test_bad_sizes_raise(self):
        with pytest.raises(ValueError):
            make_mesh({"data": 3, "model": 2})

    def test_batch_sharding_placement(self, mesh8):
        x = jnp.arange(16.0).reshape(8, 2)
        xs = jax.device_put(x, batch_sharding(mesh8))
        assert xs.sharding.spec[0] == "data"  # leading dim sharded
        np.testing.assert_allclose(np.asarray(xs), np.asarray(x))

    def test_tp_param_sharding(self, mesh8):
        params = {"dense": {"kernel": jnp.zeros((16, 64)),
                            "bias": jnp.zeros((3,))}}
        sharded = shard_params_tp(params, mesh8)
        k = sharded["dense"]["kernel"]
        assert k.sharding.spec[-1] == "model"  # output features sharded
        b = sharded["dense"]["bias"]
        # 3 not divisible by 2 → replicated
        spec = b.sharding.spec
        assert all(s is None for s in spec)


class TestFSDP:
    def test_params_actually_sharded(self):
        mesh = make_mesh({"data": 8})
        params = {"big": jnp.ones((64, 1024)), "tiny": jnp.ones(3),
                  "odd": jnp.ones((7, 3001))}
        sh = shard_params_fsdp(params, mesh, min_size=1024)
        # big shards its largest divisible axis over all 8 devices
        shard = sh["big"].addressable_shards[0].data
        assert shard.size == sh["big"].size // 8
        # tiny (below min_size) and odd (no divisible axis) replicate
        assert sh["tiny"].addressable_shards[0].data.size == 3
        assert sh["odd"].addressable_shards[0].data.size == 7 * 3001

    def test_fsdp_train_step_parity_vs_replicated(self):
        """ZeRO-sharded params + optimizer state give the SAME loss and
        the same updated params as the replicated DP step — XLA inserts
        the all-gathers/reduce-scatters, the math is unchanged."""
        from skix.models.train import init_state, make_optimizer, train_step
        from skix.models.videopose3d import TemporalLifter

        mesh = make_mesh({"data": 8})
        model = TemporalLifter(filter_widths=(3, 3), channels=128,
                               dropout=0.0)
        optimizer = make_optimizer()
        state = init_state(model, jax.random.PRNGKey(0), optimizer)

        B = 8
        lrng = np.random.default_rng(5)
        x = jnp.asarray(lrng.normal(size=(B, model.rf, 17, 2)) * 0.1,
                        jnp.float32)
        y = jnp.asarray(lrng.normal(size=(B, 1, 17, 3)) * 0.1,
                        jnp.float32)
        step = jax.jit(train_step, static_argnums=(0, 1))

        ref_state, ref_loss = step(model, optimizer, state, x, y,
                                   jax.random.PRNGKey(1))

        fs = state._replace(
            params=shard_params_fsdp(state.params, mesh, min_size=1024),
            opt_state=shard_params_fsdp(state.opt_state, mesh,
                                        min_size=1024))
        xb = jax.device_put(x, batch_sharding(mesh))
        yb = jax.device_put(y, batch_sharding(mesh))
        with mesh:
            fs_state, fs_loss = step(model, optimizer, fs, xb, yb,
                                     jax.random.PRNGKey(1))
        assert float(fs_loss) == pytest.approx(float(ref_loss), rel=1e-5)
        ref_leaf = jax.tree.leaves(ref_state.params)[0]
        fs_leaf = jax.tree.leaves(fs_state.params)[0]
        np.testing.assert_allclose(np.asarray(fs_leaf),
                                   np.asarray(ref_leaf), atol=1e-5)
        # sharding persisted through the update (memory win is real)
        big = max(jax.tree.leaves(fs_state.params), key=lambda a: a.size)
        assert big.addressable_shards[0].data.size < big.size


class TestCollectives:
    def test_all_reduce_mean(self):
        mesh = make_mesh({"data": 8})
        x = jnp.arange(8.0)
        out = np.asarray(all_reduce_mean(x, mesh))
        np.testing.assert_allclose(out, np.full(8, 3.5))

    def test_all_reduce_sum(self):
        mesh = make_mesh({"data": 8})
        x = jnp.ones(8)
        np.testing.assert_allclose(np.asarray(all_reduce_sum(x, mesh)), 8.0)

    def test_all_gather_identity(self):
        mesh = make_mesh({"data": 8})
        x = jnp.arange(16.0).reshape(8, 2)
        out = np.asarray(all_gather(x, mesh))
        np.testing.assert_allclose(out, np.asarray(x))

    def test_all_gather_differentiable(self):
        mesh = make_mesh({"data": 8})
        x = jnp.arange(8.0)
        g = jax.grad(lambda v: jnp.sum(all_gather(v, mesh) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), 2 * np.arange(8.0))

    def test_psum_scalar(self):
        mesh = make_mesh({"data": 8})
        x = jnp.arange(8.0)
        assert float(psum_scalar(x, mesh)) == 28.0

    def test_data_parallel_map(self):
        mesh = make_mesh({"data": 8})
        fn = data_parallel_map(lambda v: v * 2 + 1, mesh)
        x = jnp.arange(8.0)[:, None]
        np.testing.assert_allclose(np.asarray(fn(x)),
                                   np.asarray(x) * 2 + 1)


class TestFrameShardedDetection:
    def test_detector_frames_axis_parity(self):
        """Frame-sharded open-vocabulary detection: the TPU-native analog
        of the reference's Sam3ImageOnVideoMultiGPU (sam3_image.py:687,
        SURVEY §2.16 — detection sharded over frames across GPUs). A
        batch of frames shards over a 'frames' mesh axis; outputs must
        match the unsharded forward."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from skix.tracking.sam3_detector import Sam3Detector

        rng_l = np.random.default_rng(101)
        det = Sam3Detector.tiny(num_queries=4)
        F = 8  # one frame per device
        imgs = jnp.asarray(rng_l.uniform(0, 1, (F, 112, 112, 3)),
                           jnp.float32)
        text = jnp.asarray(
            np.tile(rng_l.normal(0, 0.1, (1, 3, 64)), (F, 1, 1)),
            jnp.float32)
        v = det.init(jax.random.PRNGKey(0), imgs[:1], text[:1])

        fwd = jax.jit(lambda p, i, t: det.apply(p, i, t))
        ref = fwd(v, imgs, text)

        mesh = make_mesh({"frames": 8})
        sh = NamedSharding(mesh, P("frames"))
        imgs_s = jax.device_put(imgs, sh)
        text_s = jax.device_put(text, sh)
        v_rep = jax.device_put(v, NamedSharding(mesh, P()))
        with mesh:
            out = fwd(v_rep, imgs_s, text_s)
            jax.block_until_ready(out.scores)
        np.testing.assert_allclose(np.asarray(out.scores),
                                   np.asarray(ref.scores), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.boxes_cxcywh),
                                   np.asarray(ref.boxes_cxcywh), atol=1e-4)


class TestEDT:
    def test_zero_inside(self):
        from skix.ops.edt import edt

        m = np.zeros((8, 8), bool)
        m[3:5, 3:5] = True
        d = np.asarray(edt(jnp.asarray(m)))
        np.testing.assert_allclose(d[3, 3], 0.0)
        np.testing.assert_allclose(d[3, 2], 1.0)
        np.testing.assert_allclose(d[0, 0], np.sqrt(9 + 9))

    def test_matches_scipy(self):
        ndi = pytest.importorskip("scipy.ndimage")
        from skix.ops.edt import edt

        m = rng.random((24, 24)) > 0.8
        if not m.any():
            m[5, 5] = True
        want = ndi.distance_transform_edt(~m)
        got = np.asarray(edt(jnp.asarray(m)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_signed(self):
        from skix.ops.edt import signed_edt

        m = np.zeros((10, 10), bool)
        m[2:8, 2:8] = True
        s = np.asarray(signed_edt(jnp.asarray(m)))
        assert s[5, 5] < 0 and s[0, 0] > 0


class TestAliasPackage:
    def test_import_alias(self):
        import skiing_analysis_pytorch_tpu as alias

        assert alias.__version__
        from skiing_analysis_pytorch_tpu.geometry import umeyama  # noqa
        assert alias.geometry.umeyama is umeyama
