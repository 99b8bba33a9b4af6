"""Pipeline parallelism (skix/parallel/pipeline.py): GPipe schedule over
a pipe mesh axis must be numerically IDENTICAL to folding the stages
sequentially on one device — forward and gradients — and must keep each
stage's weights resident on exactly one chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skix.parallel import make_mesh
from skix.parallel.pipeline import (pipeline_apply, sequential_apply,
                                    shard_params_pipeline,
                                    stack_stage_params)


def _mlp_stage(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _make_params(rng, S, D):
    return {"w": jnp.asarray(rng.normal(size=(S, D, D)) * 0.3),
            "b": jnp.asarray(rng.normal(size=(S, D)) * 0.1)}


class TestPipelineForward:
    def test_matches_sequential(self):
        rng = np.random.default_rng(0)
        S, M, B, D = 4, 8, 3, 16
        mesh = make_mesh({"pipe": S}, devices=jax.devices()[:S])
        params = _make_params(rng, S, D)
        x = jnp.asarray(rng.normal(size=(M, B, D)))
        ref = sequential_apply(_mlp_stage, params, x)
        out = pipeline_apply(_mlp_stage, params, x, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_eight_stages_single_microbatch(self):
        # Degenerate M=1 (pure fill/drain, no steady state).
        rng = np.random.default_rng(1)
        S, D = 8, 8
        mesh = make_mesh({"pipe": S}, devices=jax.devices()[:S])
        params = _make_params(rng, S, D)
        x = jnp.asarray(rng.normal(size=(1, 2, D)))
        ref = sequential_apply(_mlp_stage, params, x)
        out = pipeline_apply(_mlp_stage, params, x, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_combined_data_pipe_mesh(self):
        # The pipe axis composes with other mesh axes (input replicated
        # over data here; DP rides the microbatch contents).
        rng = np.random.default_rng(2)
        S, M, D = 4, 6, 8
        mesh = make_mesh({"data": 2, "pipe": S})
        params = _make_params(rng, S, D)
        x = jnp.asarray(rng.normal(size=(M, 2, D)))
        ref = sequential_apply(_mlp_stage, params, x)
        out = pipeline_apply(_mlp_stage, params, x, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_jit_wrapped(self):
        rng = np.random.default_rng(3)
        S, M, D = 4, 4, 8
        mesh = make_mesh({"pipe": S}, devices=jax.devices()[:S])
        params = _make_params(rng, S, D)
        x = jnp.asarray(rng.normal(size=(M, 2, D)))

        @jax.jit
        def run(p, xs):
            return pipeline_apply(_mlp_stage, p, xs, mesh)

        np.testing.assert_allclose(
            np.asarray(run(params, x)),
            np.asarray(sequential_apply(_mlp_stage, params, x)),
            atol=1e-6)


class TestPipelineBackward:
    def test_grad_parity_params_and_input(self):
        rng = np.random.default_rng(4)
        S, M, B, D = 4, 8, 2, 12
        mesh = make_mesh({"pipe": S}, devices=jax.devices()[:S])
        params = _make_params(rng, S, D)
        x = jnp.asarray(rng.normal(size=(M, B, D)))
        tgt = jnp.asarray(rng.normal(size=(M, B, D)))

        def loss_pipe(p, xs):
            return jnp.mean(
                (pipeline_apply(_mlp_stage, p, xs, mesh) - tgt) ** 2)

        def loss_seq(p, xs):
            return jnp.mean(
                (sequential_apply(_mlp_stage, p, xs) - tgt) ** 2)

        gp = jax.grad(loss_pipe, argnums=(0, 1))(params, x)
        gs = jax.grad(loss_seq, argnums=(0, 1))(params, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6), gp, gs)

    def test_remat_grad_parity(self):
        # jax.checkpoint around the stage must not change gradients.
        rng = np.random.default_rng(9)
        S, M, D = 4, 4, 8
        mesh = make_mesh({"pipe": S}, devices=jax.devices()[:S])
        params = _make_params(rng, S, D)
        x = jnp.asarray(rng.normal(size=(M, 2, D)))

        def loss(p, rm):
            return jnp.mean(pipeline_apply(_mlp_stage, p, x, mesh,
                                           remat=rm) ** 2)

        g0 = jax.grad(lambda p: loss(p, False))(params)
        g1 = jax.grad(lambda p: loss(p, True))(params)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6), g0, g1)

    def test_dp_pp_composition(self):
        # data axis shards the within-microbatch batch; pipe axis the
        # stages — parity with the sequential single-device fold.
        rng = np.random.default_rng(10)
        S, M, B, D = 4, 4, 4, 8
        mesh = make_mesh({"data": 2, "pipe": S})
        params = _make_params(rng, S, D)
        x = jnp.asarray(rng.normal(size=(M, B, D)))
        ref = sequential_apply(_mlp_stage, params, x)
        out = pipeline_apply(_mlp_stage, params, x, mesh,
                             data_axis="data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)
        # and gradients through the composed mesh
        def loss_pp(p):
            return jnp.mean(pipeline_apply(_mlp_stage, p, x, mesh,
                                           data_axis="data") ** 2)

        def loss_seq(p):
            return jnp.mean(sequential_apply(_mlp_stage, p, x) ** 2)

        gp = jax.grad(loss_pp)(params)
        gs = jax.grad(loss_seq)(params)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6), gp, gs)

    def test_train_step_improves_loss(self):
        # One SGD step through the pipelined loss must reduce it.
        rng = np.random.default_rng(5)
        S, M, D = 4, 4, 8
        mesh = make_mesh({"pipe": S}, devices=jax.devices()[:S])
        params = shard_params_pipeline(_make_params(rng, S, D), mesh)
        x = jnp.asarray(rng.normal(size=(M, 2, D)))
        tgt = jnp.asarray(rng.normal(size=(M, 2, D))) * 0.5

        @jax.jit
        def step(p):
            def loss(p):
                return jnp.mean(
                    (pipeline_apply(_mlp_stage, p, x, mesh) - tgt) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            return l, jax.tree.map(lambda w, gw: w - 0.1 * gw, p, g)

        l0, params = step(params)
        for _ in range(4):
            l1, params = step(params)
        assert float(l1) < float(l0)


class TestLayout:
    def test_stack_stage_params(self):
        rng = np.random.default_rng(6)
        per_stage = [{"w": jnp.asarray(rng.normal(size=(4, 4)))}
                     for _ in range(3)]
        stacked = stack_stage_params(per_stage)
        assert stacked["w"].shape == (3, 4, 4)
        np.testing.assert_array_equal(np.asarray(stacked["w"][1]),
                                      np.asarray(per_stage[1]["w"]))

    def test_params_live_on_one_chip_each(self):
        rng = np.random.default_rng(7)
        S, D = 4, 8
        mesh = make_mesh({"pipe": S}, devices=jax.devices()[:S])
        params = shard_params_pipeline(_make_params(rng, S, D), mesh)
        shard_shapes = {s.data.shape for s in params["w"].addressable_shards}
        assert shard_shapes == {(1, D, D)}

    def test_stage_count_mismatch_is_caught(self):
        rng = np.random.default_rng(8)
        mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
        params = _make_params(rng, 3, 8)  # 3 stages on a 4-chip pipe
        x = jnp.asarray(rng.normal(size=(2, 2, 8)))
        with pytest.raises(Exception):
            jax.block_until_ready(
                pipeline_apply(_mlp_stage, params, x, mesh))
