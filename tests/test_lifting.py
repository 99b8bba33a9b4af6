"""Lifting-model tests: parity vs the reference PyTorch TemporalModel.

The reference net is imported from /root/reference (read-only) purely as a
numerical oracle; weights are randomly initialized there and converted with
``convert_reference_state_dict``, then outputs are compared to ≤1e-4.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.videopose3d import (
    TemporalLifter,
    convert_reference_state_dict,
    infer_sequence,
    pad_for_inference,
    receptive_field,
)

rng = np.random.default_rng(42)


def _make_reference_model(filter_widths, channels=64):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from VideoPose3D.common.model import TemporalModel
    except Exception as e:  # pragma: no cover - reference not importable
        pytest.skip(f"reference model not importable: {e}")
    model = TemporalModel(17, 2, 17, filter_widths=list(filter_widths),
                          causal=False, dropout=0.25, channels=channels)
    model.eval()
    return torch, model


class TestReceptiveField:
    def test_243(self):
        assert receptive_field((3, 3, 3, 3, 3)) == 243

    def test_27(self):
        assert receptive_field((3, 3, 3)) == 27


class TestParity:
    @pytest.mark.parametrize("filter_widths", [(3, 3), (3, 3, 3)])
    def test_matches_reference_torch(self, filter_widths):
        torch, ref = _make_reference_model(filter_widths)
        rf = receptive_field(filter_widths)
        T = rf + 10
        x = rng.normal(size=(2, T, 17, 2)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()

        model = TemporalLifter(filter_widths=filter_widths, channels=64)
        variables = convert_reference_state_dict(ref.state_dict(), filter_widths)
        got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        assert got.shape == want.shape == (2, 11, 17, 3)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_strided_variant_weight_compatible(self):
        """The strided training path must produce the same single-frame
        output as the dilated path (reference TemporalModelOptimized1f
        weight-compatibility, common/model.py:140)."""
        fw = (3, 3, 3)
        rf = receptive_field(fw)
        model_d = TemporalLifter(filter_widths=fw, channels=32)
        model_s = TemporalLifter(filter_widths=fw, channels=32, strided=True)
        variables = model_d.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, rf, 17, 2)), train=False)
        x = jnp.asarray(rng.normal(size=(4, rf, 17, 2)).astype(np.float32))
        out_d = model_d.apply(variables, x, train=False)
        out_s = model_s.apply(variables, x, train=False)
        assert out_s.shape == (4, 1, 17, 3)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                                   atol=1e-4)


class TestInference:
    def test_pad_for_inference(self):
        x = jnp.arange(5, dtype=jnp.float32)[:, None, None] * jnp.ones((5, 17, 2))
        p = pad_for_inference(x, 27)
        assert p.shape == (5 + 26, 17, 2)
        np.testing.assert_allclose(
            np.asarray(p[:13]), np.broadcast_to(np.asarray(p[0]), (13, 17, 2)))
        np.testing.assert_allclose(
            np.asarray(p[-13:]), np.broadcast_to(np.asarray(p[-1]), (13, 17, 2)))

    def test_infer_sequence_full_length(self):
        fw = (3, 3)
        model = TemporalLifter(filter_widths=fw, channels=32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 9, 17, 2)), train=False)
        x = jnp.asarray(rng.normal(size=(40, 17, 2)).astype(np.float32))
        out = infer_sequence(model, variables, x, flip_augment=True)
        assert out.shape == (40, 17, 3)

    def test_flip_augment_symmetric_input(self):
        """A laterally symmetric input should give (near-)identical output
        with and without flip augmentation."""
        from skix.geometry.skeletons import H36M_LEFT, H36M_RIGHT, flip_keypoints

        fw = (3, 3)
        model = TemporalLifter(filter_widths=fw, channels=32)
        variables = model.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, 9, 17, 2)), train=False)
        x = rng.normal(size=(20, 17, 2)).astype(np.float32)
        xs = 0.5 * (x + np.asarray(flip_keypoints(jnp.asarray(x), H36M_LEFT, H36M_RIGHT)))
        out_aug = infer_sequence(model, variables, jnp.asarray(xs), flip_augment=True)
        # flip of symmetric input == input ⇒ augmented = mean of two
        # mirror-equivalent predictions; just check finiteness + shape here
        assert out_aug.shape == (20, 17, 3)
        assert np.all(np.isfinite(np.asarray(out_aug)))


class TestLosses:
    def test_mpjpe_values(self):
        from skix.metrics import mpjpe

        pred = np.zeros((2, 5, 3))
        gt = np.ones((2, 5, 3))
        np.testing.assert_allclose(float(mpjpe(pred, gt)), np.sqrt(3.0), rtol=1e-6)

    def test_mpjpe_masked(self):
        from skix.metrics import mpjpe

        pred = np.zeros((4, 3))
        gt = np.ones((4, 3))
        gt[2] = 100.0
        valid = np.array([True, True, False, True])
        np.testing.assert_allclose(float(mpjpe(pred, gt, valid)), np.sqrt(3.0), rtol=1e-5)

    def test_p_mpjpe_invariant_to_similarity(self):
        from skix.metrics import p_mpjpe
        from skix.geometry.rotations import rotvec_to_matrix

        gt = rng.normal(size=(6, 17, 3)).astype(np.float32)
        R = np.asarray(rotvec_to_matrix(jnp.asarray([0.3, -0.2, 0.5])))
        pred = 1.8 * gt @ R.T + np.array([5.0, -2.0, 1.0], np.float32)
        assert float(p_mpjpe(jnp.asarray(pred), jnp.asarray(gt))) < 2e-4

    def test_n_mpjpe_scale_invariant(self):
        from skix.metrics import n_mpjpe

        gt = rng.normal(size=(4, 17, 3)).astype(np.float32)
        assert float(n_mpjpe(jnp.asarray(3.7 * gt), jnp.asarray(gt))) < 1e-5

    def test_velocity_error(self):
        from skix.metrics import mean_velocity_error

        gt = rng.normal(size=(10, 17, 3))
        assert float(mean_velocity_error(gt + 5.0, gt)) < 1e-6  # const offset


class TestBNFolding:
    def test_identical_outputs(self):
        from skix.models.videopose3d import fold_batchnorm

        model = TemporalLifter(filter_widths=(3, 3), channels=32)
        x = jnp.asarray(rng.normal(size=(2, 20, 17, 2)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 9, 17, 2)), train=False)
        # give BN non-trivial statistics first
        _, mut = model.apply(variables, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
        want = model.apply(variables, x, train=False)
        folded = fold_batchnorm(variables)
        got = model.apply(folded, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
