"""Generator + training-loop + checkpoint/resume tests."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.generators import ChunkedGenerator, UnchunkedGenerator
from skix.models.train import init_state, make_optimizer, train_step
from skix.models.videopose3d import TemporalLifter

rng = np.random.default_rng(99)


def _clips(n=3, T=60):
    p2 = [rng.normal(size=(T, 17, 2)).astype(np.float32) for _ in range(n)]
    p3 = [rng.normal(size=(T, 17, 3)).astype(np.float32) for _ in range(n)]
    return p2, p3


class TestChunkedGenerator:
    def test_shapes(self):
        p2, p3 = _clips()
        g = ChunkedGenerator(p2, p3, receptive_field=27, batch_size=16,
                             chunk_length=1, augment=False)
        x, y = next(g.epoch())
        assert x.shape == (16, 27, 17, 2)
        assert y.shape == (16, 1, 17, 3)

    def test_covers_all_frames(self):
        p2, p3 = _clips(n=1, T=50)
        g = ChunkedGenerator(p2, p3, receptive_field=9, batch_size=8,
                             chunk_length=1, augment=False)
        starts = sorted(s for _, s in g.pairs)
        assert starts == list(range(50))

    def test_window_alignment(self):
        """Center frame of each 2D window must equal the 2D frame at the
        3D target index."""
        p2, p3 = _clips(n=1, T=30)
        g = ChunkedGenerator(p2, p3, receptive_field=9, batch_size=4,
                             chunk_length=1, augment=False, seed=3)
        x, y = next(g.epoch())
        # recover which targets these are by matching y against p3
        for bi in range(4):
            t = np.where(np.all(np.isclose(p3[0][:, None][:, 0], y[bi, 0]),
                                axis=(1, 2)))[0][0]
            np.testing.assert_allclose(x[bi, 4], p2[0][t])

    def test_flip_augmentation_consistent(self):
        from skix.geometry.skeletons import H36M_LEFT, H36M_RIGHT

        p2, p3 = _clips(n=1, T=40)
        g = ChunkedGenerator(p2, p3, receptive_field=9, batch_size=40,
                             chunk_length=1, augment=True, seed=1)
        x, y = next(g.epoch())

        def unflip(a):  # a: (J, 3)
            b = a.copy()
            b[:, 0] *= -1
            b[list(H36M_LEFT) + list(H36M_RIGHT)] = \
                b[list(H36M_RIGHT) + list(H36M_LEFT)]
            return b

        # every sample is either an original target frame or an exact flip
        n_flipped = n_orig = 0
        for bi in range(x.shape[0]):
            yb = y[bi, 0]
            orig = np.any(np.all(np.isclose(p3[0], yb[None]), axis=(1, 2)))
            flip = np.any(np.all(np.isclose(p3[0], unflip(yb)[None]),
                                 axis=(1, 2)))
            assert orig or flip, f"sample {bi} matches neither orientation"
            n_flipped += int(flip and not orig)
            n_orig += int(orig)
        assert n_flipped > 5 and n_orig > 5  # ≈50/50 of 40

    def test_rng_state_roundtrip(self):
        p2, p3 = _clips()
        g1 = ChunkedGenerator(p2, p3, 27, batch_size=8, seed=5)
        state = g1.rng_state
        a1, _ = next(g1.epoch())
        g2 = ChunkedGenerator(p2, p3, 27, batch_size=8, seed=999)
        g2.rng_state = state
        a2, _ = next(g2.epoch())
        np.testing.assert_array_equal(a1, a2)


class TestUnchunked:
    def test_padding(self):
        p2, p3 = _clips(n=1, T=20)
        g = UnchunkedGenerator(p2, p3, receptive_field=27)
        x, y = next(iter(g))
        assert x.shape == (1, 20 + 26, 17, 2)
        assert y.shape == (20, 17, 3)


class TestTrainStep:
    def test_loss_decreases_overfit(self):
        model = TemporalLifter(filter_widths=(3, 3), channels=32,
                               strided=True)
        opt = make_optimizer(lr=1e-2, steps_per_epoch=100)
        state = init_state(model, jax.random.PRNGKey(0), opt)
        x = jnp.asarray(rng.normal(size=(8, model.rf, 17, 2)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(8, 1, 17, 3)) * 0.1, jnp.float32)
        step = jax.jit(train_step, static_argnums=(0, 1))
        losses = []
        for i in range(40):
            state, loss = step(model, opt, state, x, y,
                               jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < 0.5 * losses[0]
        assert int(state.step) == 40

    def test_batch_stats_update(self):
        model = TemporalLifter(filter_widths=(3, 3), channels=16)
        opt = make_optimizer()
        state = init_state(model, jax.random.PRNGKey(0), opt)
        before = np.asarray(state.batch_stats["expand_bn"]["mean"]).copy()
        x = jnp.asarray(rng.normal(size=(4, 9, 17, 2)) + 3.0, jnp.float32)
        y = jnp.zeros((4, 1, 17, 3))
        state, _ = train_step(model, opt, state, x, y, jax.random.PRNGKey(0))
        after = np.asarray(state.batch_stats["expand_bn"]["mean"])
        assert not np.allclose(before, after)


class TestCheckpointResume:
    def test_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from skix.pipelines.train_lifter import (latest_checkpoint,
                                                 restore_checkpoint,
                                                 save_checkpoint, _decode_rng)

        model = TemporalLifter(filter_widths=(3, 3), channels=16)
        opt = make_optimizer()
        state = init_state(model, jax.random.PRNGKey(0), opt)
        x = jnp.asarray(rng.normal(size=(2, 9, 17, 2)), jnp.float32)
        y = jnp.zeros((2, 1, 17, 3))
        state, _ = train_step(model, opt, state, x, y, jax.random.PRNGKey(0))

        gen_state = np.random.default_rng(3).bit_generator.state
        save_checkpoint(tmp_path, 0, state, gen_state)
        found = latest_checkpoint(tmp_path)
        assert found is not None
        path, meta = found
        assert meta["epoch"] == 0

        fresh = init_state(model, jax.random.PRNGKey(42), opt)
        restored = restore_checkpoint(path, fresh)
        np.testing.assert_allclose(
            np.asarray(restored.params["shrink"]["bias"]),
            np.asarray(state.params["shrink"]["bias"]))
        assert int(restored.step) == 1
        dec = _decode_rng(meta["gen_rng_state"])
        r = np.random.default_rng(0)
        r.bit_generator.state = dec
        r2 = np.random.default_rng(3)
        assert r.random() == r2.random()


class TestTrainCLI:
    def test_smoke_two_epochs_and_resume(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from skix.pipelines.train_lifter import main

        data = tmp_path / "data"
        data.mkdir()
        for i in range(2):
            np.savez(data / f"clip{i}.npz",
                     pose_2d=rng.normal(size=(30, 17, 2)).astype(np.float32),
                     pose_3d=rng.normal(size=(30, 17, 3)).astype(np.float32))
        ckpt = tmp_path / "ckpt"
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "train_lifter.yaml").write_text(f"""
paths:
  data_root: {data}
  checkpoint_dir: {ckpt}
filter_widths: [3, 3]
channels: 16
strided: true
batch_size: 16
epochs: 2
lr: 0.001
resume: false
""")
        main([f"--config-dir={cdir}"])
        assert (ckpt / "epoch_0001_meta.json").exists()
        # resume continues to epoch 3
        (cdir / "train_lifter.yaml").write_text(
            (cdir / "train_lifter.yaml").read_text().replace(
                "epochs: 2", "epochs: 3").replace("resume: false",
                                                  "resume: true"))
        main([f"--config-dir={cdir}"])
        assert (ckpt / "epoch_0002_meta.json").exists()
