"""VGGT aggregator pipeline parallelism (skix/models/vggt_pp.py):
the pipelined block stack must reproduce agg.apply exactly — every
requested output layer, both at one and at two block pairs per stage —
on the unchanged parameter tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skix.models.vggt import Aggregator
from skix.models.vggt_pp import (aggregator_pipeline_forward,
                                 aggregator_stage_params)
from skix.parallel import make_mesh


@pytest.fixture(scope="module")
def tiny_agg():
    agg = Aggregator(img_size=28, patch_size=14, embed_dim=64, depth=4,
                     num_heads=4, num_register_tokens=2,
                     output_layers=(0, 3))
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (4, 2, 28, 28, 3))
    variables = jax.jit(lambda k: agg.init(k, imgs))(jax.random.PRNGKey(1))
    ref_outs, ref_psi = jax.jit(
        lambda v, x: agg.apply(v, x))(variables, imgs)
    return agg, variables, imgs, ref_outs, ref_psi


class TestVggtPipeline:
    @pytest.mark.parametrize("n_stages", [4, 2])
    def test_forward_parity_all_output_layers(self, tiny_agg, n_stages):
        agg, variables, imgs, ref_outs, ref_psi = tiny_agg
        mesh = make_mesh({"pipe": n_stages},
                         devices=jax.devices()[:n_stages])
        outs, psi = aggregator_pipeline_forward(agg, variables, imgs,
                                                mesh)
        assert psi == ref_psi
        assert len(outs) == len(ref_outs)
        for got, want in zip(outs, ref_outs):
            assert got.shape == want.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-4)

    def test_single_microbatch(self, tiny_agg):
        agg, variables, imgs, ref_outs, _ = tiny_agg
        mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
        outs, _ = aggregator_pipeline_forward(agg, variables, imgs, mesh,
                                              n_micro=1)
        np.testing.assert_allclose(np.asarray(outs[-1]),
                                   np.asarray(ref_outs[-1]), atol=1e-4)

    def test_stage_params_layout(self, tiny_agg):
        agg, variables, _, _, _ = tiny_agg
        sp = aggregator_stage_params(variables, agg.depth, 2)
        leaf = jax.tree.leaves(sp["frame"])[0]
        assert leaf.shape[:2] == (2, 2)
        # stage 1 / local 0 is frame_block_2
        want = jax.tree.leaves(
            variables["params"]["frame_block_2"])[0]
        got = jax.tree.leaves(jax.tree.map(lambda a: a[1, 0],
                                           sp["frame"]))[0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_indivisible_depth_raises(self, tiny_agg):
        agg, variables, imgs, _, _ = tiny_agg
        mesh = make_mesh({"pipe": 3}, devices=jax.devices()[:3])
        with pytest.raises(ValueError):
            aggregator_pipeline_forward(agg, variables, imgs, mesh)

    def test_default_all_layers(self):
        # output_layers=None → every depth, PP buffer holds them all
        agg = Aggregator(img_size=28, patch_size=14, embed_dim=32,
                         depth=2, num_heads=2, num_register_tokens=1)
        imgs = jax.random.uniform(jax.random.PRNGKey(2), (2, 2, 28, 28, 3))
        variables = jax.jit(lambda k: agg.init(k, imgs))(
            jax.random.PRNGKey(3))
        ref_outs, _ = agg.apply(variables, imgs)
        mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
        outs, _ = aggregator_pipeline_forward(agg, variables, imgs, mesh)
        assert len(outs) == 2
        for got, want in zip(outs, ref_outs):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-4)
