"""Generic Trainer tests: convergence, grad accumulation, resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.trainer import Trainer, TrainerConfig

rng = np.random.default_rng(223)


def _linreg_setup():
    W_true = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    X = jnp.asarray(rng.normal(size=(256, 4)), jnp.float32)
    Y = X @ W_true

    def loss_fn(params, batch, rng_key):
        xb, yb = batch
        return jnp.mean((xb @ params["W"] - yb) ** 2)

    params = {"W": jnp.zeros((4, 3))}

    def batches(n):
        for i in range(n):
            s = (i * 32) % 224
            yield (X[s:s + 32], Y[s:s + 32])

    return loss_fn, params, batches, W_true


class TestTrainer:
    def test_converges(self):
        loss_fn, params, batches, W_true = _linreg_setup()
        tr = Trainer(loss_fn, params,
                     TrainerConfig(lr=5e-2, max_steps=300, log_every=100,
                                   checkpoint_every=0))
        hist = tr.fit(batches(300))
        assert hist["loss"][-1][1] < 1e-3
        np.testing.assert_allclose(np.asarray(tr.state.params["W"]),
                                   np.asarray(W_true), atol=0.05)

    def test_grad_accum_steps_counted(self):
        loss_fn, params, batches, _ = _linreg_setup()
        tr = Trainer(loss_fn, params,
                     TrainerConfig(lr=5e-2, max_steps=40, grad_accum_steps=4,
                                   checkpoint_every=0, log_every=40))
        tr.fit(batches(40))
        assert int(tr.state.step) == 40  # micro-steps counted

    def test_clipping_applied(self):
        # exploding-gradient loss must not produce NaN with clipping
        def loss_fn(params, batch, rng_key):
            return 1e8 * jnp.sum(params["w"] ** 2)

        tr = Trainer(loss_fn, {"w": jnp.ones(3)},
                     TrainerConfig(lr=1e-2, grad_clip_norm=1.0, max_steps=10,
                                   checkpoint_every=0, log_every=10))
        tr.fit(range(10))
        assert np.all(np.isfinite(np.asarray(tr.state.params["w"])))

    def test_checkpoint_resume(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        loss_fn, params, batches, _ = _linreg_setup()
        cfg = TrainerConfig(lr=5e-2, max_steps=50, checkpoint_every=25,
                            log_every=50)
        tr1 = Trainer(loss_fn, params, cfg, ckpt_dir=tmp_path)
        tr1.fit(batches(50))
        w_end = np.asarray(tr1.state.params["W"]).copy()

        tr2 = Trainer(loss_fn, params, cfg, ckpt_dir=tmp_path)
        resumed = tr2.try_resume()
        assert resumed == 50
        np.testing.assert_allclose(np.asarray(tr2.state.params["W"]), w_end)

    def test_validation_hook(self):
        loss_fn, params, batches, W_true = _linreg_setup()
        vals = []

        def val_fn(p):
            v = float(jnp.mean((p["W"] - W_true) ** 2))
            vals.append(v)
            return v

        tr = Trainer(loss_fn, params,
                     TrainerConfig(lr=5e-2, max_steps=100, val_every=50,
                                   checkpoint_every=0, log_every=100))
        hist = tr.fit(batches(100), val_fn=val_fn)
        assert len(hist["val"]) == 2
        assert vals[-1] < vals[0]
