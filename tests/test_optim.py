"""Optimizer factory + scheduler tests (reference sam3/train/optim)."""

import importlib.util

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from skix.models.optim import (
    LayerDecay,
    OptionRule,
    add_scheduled_decay,
    as_schedule,
    constant_schedule,
    construct_optimizer,
    infer_num_layers,
    inverse_sqrt_schedule,
    vit_layer_id,
    warmup_cosine_schedule,
)

REF_SCHED = "/root/reference/prepare_front_results/sam3/train/optim/schedulers.py"


def _load_reference_scheduler():
    spec = importlib.util.spec_from_file_location("ref_schedulers", REF_SCHED)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.InverseSquareRootParamScheduler


class TestSchedulers:
    def test_inverse_sqrt_parity_vs_reference(self):
        """Value parity with the imported reference scheduler at every
        step of a training run (schedulers.py:20-41)."""
        Ref = _load_reference_scheduler()
        total = 200
        for base, warm, cool, ts in [(1e-3, 20, 30, 50), (5e-4, 0, 0, 100),
                                     (2e-3, 10, 0, 10), (1e-4, 0, 40, 25)]:
            ref = Ref(base_lr=base, warmup_steps=warm, cooldown_steps=cool,
                      timescale=ts)
            ours = inverse_sqrt_schedule(base, warm, cool, ts,
                                         total_steps=total)
            for step in range(0, total + 1, 7):
                want = ref(step=step, where=step / total)
                got = float(ours(step))
                assert got == pytest.approx(want, rel=1e-6, abs=1e-12), (
                    step, base, warm, cool, ts)

    def test_warmup_cosine_shape(self):
        s = warmup_cosine_schedule(1e-3, 10, 100)
        vals = [float(s(t)) for t in range(101)]
        assert vals[0] == pytest.approx(0.0, abs=1e-9)
        assert max(vals) == pytest.approx(1e-3, rel=1e-3)
        assert vals[-1] < vals[50]

    def test_constant(self):
        assert float(constant_schedule(0.5)(123)) == 0.5
        assert float(as_schedule(0.25)(9)) == 0.25


def _tiny_params():
    return {
        "patch_embed": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
        "block_0": {"attn": {"kernel": jnp.ones((2, 2)),
                             "bias": jnp.ones(2)},
                    "norm1": {"scale": jnp.ones(2), "bias": jnp.ones(2)}},
        "block_1": {"attn": {"kernel": jnp.ones((2, 2)),
                             "bias": jnp.ones(2)}},
        "head": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
    }


def _grads_like(params):
    return jax.tree_util.tree_map(jnp.ones_like, params)


class TestConstructOptimizer:
    def test_groups_cover_and_zero_wd_on_norms(self):
        params = _tiny_params()
        tx, groups = construct_optimizer(
            params,
            {"lr": [OptionRule(1e-3)],
             "weight_decay": [OptionRule(0.1),
                              OptionRule(0.0, ["*/bias", "*norm*/scale"])]},
        )
        all_paths = sorted(p for g in groups for p in g["paths"])
        assert len(all_paths) == len(set(all_paths)) == 10
        nodecay = next(g for g in groups if g["weight_decay"] == 0.0)
        assert "block_0/norm1/scale" in nodecay["paths"]
        assert all(p.endswith("bias") or "norm" in p
                   for p in nodecay["paths"])
        # weight decay actually differs between the groups after a step
        state = tx.init(params)
        upd, _ = tx.update(_grads_like(params), state, params)
        import flax.traverse_util as tu
        flat = tu.flatten_dict(upd)
        decayed = flat[("block_0", "attn", "kernel")]
        plain = flat[("block_0", "attn", "bias")]
        assert not np.allclose(np.asarray(decayed), np.asarray(plain))

    def test_backbone_lr_scope(self):
        params = _tiny_params()
        tx, groups = construct_optimizer(
            params,
            {"lr": [OptionRule(1e-3),
                    OptionRule(1e-5, ["block_*", "patch_embed/*"])]},
        )
        slow = next(g for g in groups if g["lr"] == 1e-5)
        assert "head/kernel" not in slow["paths"]
        state = tx.init(params)
        upd, _ = tx.update(_grads_like(params), state, params)
        import flax.traverse_util as tu
        flat = tu.flatten_dict(upd)
        fast = abs(float(flat[("head", "kernel")][0, 0]))
        slow_u = abs(float(flat[("block_0", "attn", "kernel")][0, 0]))
        assert fast / slow_u == pytest.approx(100.0, rel=1e-3)

    def test_validation_errors(self):
        params = _tiny_params()
        with pytest.raises(ValueError, match="matches no params"):
            construct_optimizer(params, {"lr": [OptionRule(1.0, ["zzz*"]),
                                                OptionRule(1.0)]})
        with pytest.raises(ValueError, match="overlap"):
            construct_optimizer(params, {"lr": [OptionRule(1.0, ["block_*"]),
                                                OptionRule(2.0, ["block_0/*"]),
                                                OptionRule(3.0)]})
        with pytest.raises(ValueError, match="one default"):
            construct_optimizer(params, {"lr": [OptionRule(1.0),
                                                OptionRule(2.0)]})
        with pytest.raises(ValueError, match="unsupported"):
            construct_optimizer(params, {"momentum": [OptionRule(0.9)]})

    def test_scheduled_lr_and_wd_step(self):
        params = _tiny_params()
        sched = inverse_sqrt_schedule(1e-3, 5, 0, 10, total_steps=100)
        tx, _ = construct_optimizer(
            params,
            {"lr": [OptionRule(sched)],
             "weight_decay": [OptionRule(constant_schedule(0.1))]},
            grad_clip_norm=1.0)
        state = tx.init(params)
        g = _grads_like(params)
        # two steps run and stay finite; warmup means step0 lr < later lr
        upd0, state = tx.update(g, state, params)
        p1 = optax.apply_updates(params, upd0)
        upd1, state = tx.update(g, state, p1)
        leaves = jax.tree_util.tree_leaves(upd1)
        assert all(bool(jnp.isfinite(x).all()) for x in leaves)

    def test_scheduled_decay_transform(self):
        wd = add_scheduled_decay(lambda s: 0.1 * (s + 1))
        params = {"w": jnp.full(3, 2.0)}
        state = wd.init(params)
        u0, state = wd.update({"w": jnp.zeros(3)}, state, params)
        u1, state = wd.update({"w": jnp.zeros(3)}, state, params)
        np.testing.assert_allclose(np.asarray(u0["w"]), 0.2, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(u1["w"]), 0.4, rtol=1e-6)


class TestLayerDecay:
    def test_vit_layer_id_reference_map(self):
        """Mapping parity with reference vitdet.py:861-876."""
        n = 4
        assert vit_layer_id("patch_embed/kernel", n) == 0
        assert vit_layer_id("pos_embed", n) == 0
        assert vit_layer_id("ln_pre/scale", n) == 0
        assert vit_layer_id("block_0/attn/kernel", n) == 1
        assert vit_layer_id("block_3/mlp/fc1/kernel", n) == 4
        assert vit_layer_id("block_2/attn/rel_pos_h", n) == n + 1
        assert vit_layer_id("neck/kernel", n) == n + 1

    def test_layer_scales_monotonic_and_overrides(self):
        params = {
            "trunk": _tiny_params(),
            "decoder": {"kernel": jnp.ones((2, 2))},
        }
        ld = LayerDecay(value=0.5, apply_to="trunk",
                        overrides={"*pos_embed*": 1.0})
        tx, groups = construct_optimizer(
            params, {"lr": [OptionRule(1e-2)]}, layer_decay=ld)
        state = tx.init(params)
        upd, _ = tx.update(_grads_like(params), state, params)
        import flax.traverse_util as tu
        flat = tu.flatten_dict(upd)
        u_pe = abs(float(flat[("trunk", "patch_embed", "kernel")][0, 0]))
        u_b0 = abs(float(flat[("trunk", "block_0", "attn", "kernel")][0, 0]))
        u_b1 = abs(float(flat[("trunk", "block_1", "attn", "kernel")][0, 0]))
        u_dec = abs(float(flat[("decoder", "kernel")][0, 0]))
        # num_layers inferred = 2; scales: layer0 0.5^3, block0 0.5^2,
        # block1 0.5^1, outside apply_to 0.5^0 = 1
        assert u_pe < u_b0 < u_b1 < u_dec
        assert u_b1 / u_b0 == pytest.approx(2.0, rel=1e-3)
        assert u_dec / u_b1 == pytest.approx(2.0, rel=1e-3)

    def test_min_clamp_and_infer(self):
        paths = ["t/block_0/k", "t/block_7/k", "o/k"]
        assert infer_num_layers(paths, "t") == 8
        ld = LayerDecay(value=0.5, apply_to="t", minimum=0.3, num_layers=8)
        assert ld.scale_for("t/block_0/k", 8) == 0.3  # 0.5^8 clamped
        assert ld.scale_for("t/block_7/k", 8) == 0.5
        assert ld.scale_for("o/k", 8) == 1.0


class TestDetectorOptimScheme:
    def test_sam3_scheme_builds_reference_recipe(self):
        """train_detector optim.scheme=sam3 wires the reference full-ft
        recipe (roboflow_v100_full_ft_100_images.yaml:339-396): slower
        layer-decayed backbone LR, zero wd on bias/scale."""
        from skix.pipelines.train_detector import build_optimizer

        params = {
            "backbone": {
                "patch_embed": {"kernel": jnp.ones((2, 2))},
                "pos_embed": jnp.ones((1, 2)),
                "block_0": {"kernel": jnp.ones((2, 2)),
                            "bias": jnp.ones(2)},
                "block_1": {"kernel": jnp.ones((2, 2)),
                            "bias": jnp.ones(2)},
            },
            "decoder": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2),
                        "norm": {"scale": jnp.ones(2)}},
        }
        cfg = {"lr": 1e-3, "weight_decay": 0.1, "grad_clip": 1.0,
               "optim": {"scheme": "sam3", "lr_backbone": 1e-4,
                         "warmup_steps": 2, "timescale": 2,
                         "layer_decay": 0.5}, "steps": 100}
        tx = build_optimizer(cfg, params, 100)
        state = tx.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        # run past warmup so LRs are at full scale
        p = params
        for _ in range(4):
            upd, state = tx.update(g, state, p)
            p = optax.apply_updates(p, upd)
        import flax.traverse_util as tu
        flat = tu.flatten_dict(upd)
        u_dec = abs(float(flat[("decoder", "kernel")][0, 0]))
        u_b1 = abs(float(flat[("backbone", "block_1", "kernel")][0, 0]))
        u_b0 = abs(float(flat[("backbone", "block_0", "kernel")][0, 0]))
        u_pe = abs(float(flat[("backbone", "pos_embed")][0, 0]))
        # backbone 10x slower than decoder, then layer-decayed 0.5/level
        assert u_dec > u_b1 > u_b0
        assert u_b1 / u_b0 == pytest.approx(2.0, rel=0.2)
        # pos_embed pinned at scale 1.0 (override) -> fastest backbone lr
        assert u_pe > u_b1

    def test_simple_scheme_unchanged(self):
        from skix.pipelines.train_detector import build_optimizer

        params = {"w": jnp.ones((2, 2))}
        tx = build_optimizer({"lr": 1e-3}, params, 10)
        state = tx.init(params)
        upd, _ = tx.update({"w": jnp.ones((2, 2))}, state, params)
        assert bool(jnp.isfinite(upd["w"]).all())


class TestTrainerIntegration:
    def test_trainer_accepts_custom_tx(self):
        from skix.models.trainer import Trainer, TrainerConfig
        params = _tiny_params()
        tx, _ = construct_optimizer(
            params, {"lr": [OptionRule(1e-2)],
                     "weight_decay": [OptionRule(0.0, ["*/bias"]),
                                      OptionRule(0.01)]},
            grad_clip_norm=1.0)

        def loss_fn(p, batch, rng):
            return sum(jnp.sum(x ** 2)
                       for x in jax.tree_util.tree_leaves(p))

        tr = Trainer(loss_fn, params, TrainerConfig(max_steps=3), tx=tx)
        s0 = float(tr.state.params["head"]["kernel"][0, 0])
        tr.fit([{"x": 0}] * 3)
        s1 = float(tr.state.params["head"]["kernel"][0, 0])
        assert s1 < s0
