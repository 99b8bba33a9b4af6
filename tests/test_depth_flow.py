"""Monocular depth + optical flow model tests (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.dpt import MonocularDepth, estimate_depth_batched
from skix.models.raft import RAFT, compute_flow_sequence, convex_upsample

rng = np.random.default_rng(17)


class TestDepth:
    def _tiny(self):
        return MonocularDepth(patch_size=16, embed_dim=32, depth=4,
                              num_heads=2, taps=(0, 1, 2, 3),
                              features=16, out_channels=(8, 16, 24, 24))

    def test_forward_shape(self):
        model = self._tiny()
        imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), imgs)
        d = model.apply(v, imgs)
        assert d.shape == (2, 64, 64)
        assert float(jnp.min(d)) >= 0.0  # relu inverse-depth
        assert np.all(np.isfinite(np.asarray(d)))

    def test_batched_clip(self):
        model = self._tiny()
        imgs = jnp.zeros((1, 64, 64, 3))
        v = model.init(jax.random.PRNGKey(0), imgs)
        frames = rng.integers(0, 255, (5, 64, 64, 3)).astype(np.uint8)
        depth = estimate_depth_batched(model, v, frames, batch_size=2)
        assert depth.shape == (5, 1, 64, 64)

    @pytest.mark.parametrize("img", [64, 80])
    def test_hf_converter_parity(self, img):
        """Convert an HF DPT and compare forwards at MEANINGFUL signal
        scale. Round-5 hardening: the original test used HF's default
        init, whose final-ReLU output is ~1.6e-8 — 5 orders below the
        atol, so it passed through a fusion-residual semantic break
        unchanged (code-review finding). Weights are re-initialized
        xavier so |depth| ~ 0.3, a magnitude floor asserts the test can
        never go vacuous again, and img=80 exercises the odd patch grid
        (gh=5: mismatched fusion residual sizes + the output back-resize
        with torch-exact bicubic, previously a crash)."""
        transformers = pytest.importorskip("transformers")
        torch = pytest.importorskip("torch")
        from skix.models.dpt import convert_hf_dpt_checkpoint

        hf_cfg = transformers.DPTConfig(
            image_size=img, patch_size=16, num_channels=3, hidden_size=32,
            num_hidden_layers=4, num_attention_heads=2, intermediate_size=128,
            is_hybrid=False, backbone_out_indices=[0, 1, 2, 3],
            fusion_hidden_size=16, neck_hidden_sizes=[8, 16, 24, 24],
            reassemble_factors=[4, 2, 1, 0.5],
        )
        hf = transformers.DPTForDepthEstimation(hf_cfg).eval()
        g = torch.Generator().manual_seed(0)
        with torch.no_grad():
            for p in hf.parameters():
                if p.dim() >= 2:
                    torch.nn.init.xavier_uniform_(p, generator=g)
                else:
                    p.uniform_(-0.05, 0.05, generator=g)
        x = rng.random((1, img, img, 3)).astype(np.float32)
        with torch.no_grad():
            want = hf(torch.from_numpy(
                ((x - 0.5) / 0.5).transpose(0, 3, 1, 2))).predicted_depth
            # skix resizes back to input resolution (the reference
            # pipeline behavior, depth_estimation.py:117) — mirror it
            want = torch.nn.functional.interpolate(
                want[:, None], (img, img), mode="bicubic",
                align_corners=False)[:, 0]
        assert float(want.abs().max()) > 0.05, "vacuous parity signal"
        model = MonocularDepth(patch_size=16, embed_dim=32, depth=4,
                               num_heads=2, taps=(0, 1, 2, 3), features=16,
                               out_channels=(8, 16, 24, 24))
        variables = convert_hf_dpt_checkpoint(hf.state_dict(), model)
        got = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got)[0], want.numpy()[0],
                                   atol=1e-4, rtol=1e-3)


class TestRAFT:
    def _tiny(self):
        return RAFT(hidden=32, context=32, corr_levels=2, corr_radius=2,
                    iters=3)

    def test_forward_shape(self):
        model = self._tiny()
        a = jnp.asarray(rng.random((1, 32, 40, 3)), jnp.float32)
        b = jnp.asarray(rng.random((1, 32, 40, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), a, b)
        flow = model.apply(v, a, b)
        assert flow.shape == (1, 32, 40, 2)
        assert np.all(np.isfinite(np.asarray(flow)))

    def test_zero_motion_small_flow_after_training_signal(self):
        """Identical frames: flow magnitude should be bounded (untrained
        net won't give exactly 0, but must stay finite and modest)."""
        model = self._tiny()
        a = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(1), a, a)
        flow = model.apply(v, a, a)
        assert float(jnp.max(jnp.abs(flow))) < 64.0

    def test_convex_upsample_constant(self):
        flow = jnp.ones((1, 4, 4, 2)) * 2.0
        mask = jnp.zeros((1, 4, 4, 64 * 9))
        up = convex_upsample(flow, mask)
        assert up.shape == (1, 32, 32, 2)
        # interior pixels: uniform softmax over a full 3×3 neighborhood of
        # the constant coarse flow → exactly 8·flow. (Borders mix in the
        # zero padding — original RAFT unfold semantics.)
        np.testing.assert_allclose(np.asarray(up)[:, 8:24, 8:24], 16.0,
                                   atol=1e-5)

    def test_sequence_helper_pads(self):
        model = self._tiny()
        a = jnp.zeros((1, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(0), a, a)
        frames = rng.integers(0, 255, (4, 30, 34, 3)).astype(np.uint8)
        flow = compute_flow_sequence(model, v, frames)
        assert flow.shape == (3, 2, 30, 34)

    def test_translation_direction(self):
        """A trained-free sanity: correlation lookup sees the true shift —
        check that the correlation volume itself peaks at the shift."""
        from skix.models.raft import correlation_pyramid

        # local rng (shared module rng made this order-dependent) and
        # ZERO-MEAN features: with uniform [0,1) features every dot
        # product is positive and a large-norm pixel can beat the true
        # self-match — gaussian features give the self-match a ~4 sigma
        # margin regardless of seed
        lrng = np.random.default_rng(17)
        f = lrng.normal(size=(1, 8, 8, 16)).astype(np.float32)
        f2 = np.roll(f, shift=2, axis=2)  # shift right by 2
        pyr = correlation_pyramid(jnp.asarray(f), jnp.asarray(f2), 1)
        corr = np.asarray(pyr[0])[0]  # (h, w, h, w)
        # for interior pixel (4,3): best match at (4,5)
        ij = np.unravel_index(np.argmax(corr[4, 3]), corr[4, 3].shape)
        assert ij == (4, 5)
