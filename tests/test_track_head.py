"""Track-head tests: reference-structure parity + sampling oracles.

Parity oracle: the IMPORTED reference TrackHead
(vggt/vggt/heads/track_head.py + track_modules/) with random weights
converted through ``convert_track_head``.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.track_head import (
    BaseTrackerPredictor,
    TrackHead,
    bilinear_sample,
    corr_pyramid_sample,
    get_2d_embedding,
    sincos_pos_embed_2d,
    track_points,
)
from skix.models.vggt_convert import convert_track_head

rng = np.random.default_rng(163)

TINY = dict(dim_in=32, patch_size=2, features=16, iters=2, stride=2,
            corr_levels=3, corr_radius=2, hidden_size=16)


def _ref_track_head(seed=0):
    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from vggt.vggt.heads.track_head import TrackHead as RefTrackHead

    torch.manual_seed(seed)
    return RefTrackHead(**TINY).eval()


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

    def test_border_clamps(self):
        fmap = jnp.asarray(rng.random((4, 4, 1)), jnp.float32)
        out = float(bilinear_sample(fmap, jnp.asarray([-5.0, 2.0]),
                                    padding="border")[0])
        assert abs(out - float(fmap[2, 0, 0])) < 1e-6

    def test_matches_torch_grid_sample(self):
        """Both paddings vs F.grid_sample align_corners=True (the
        track_modules/utils.py:124 bilinear_sampler convention)."""
        import torch
        import torch.nn.functional as F

        fmap = rng.random((5, 6, 2)).astype(np.float32)
        xy = (rng.random((8, 2)).astype(np.float32)
              * np.array([8.0, 7.0], np.float32) - 1.0)  # some out of range
        for pad in ("zeros", "border"):
            ours = np.asarray(bilinear_sample(jnp.asarray(fmap),
                                              jnp.asarray(xy), padding=pad))
            t_in = torch.from_numpy(fmap.transpose(2, 0, 1))[None]
            grid = torch.from_numpy(xy)[None, :, None, :].clone()
            grid[..., 0] = grid[..., 0] * 2 / (6 - 1) - 1
            grid[..., 1] = grid[..., 1] * 2 / (5 - 1) - 1
            t_out = F.grid_sample(t_in, grid, align_corners=True,
                                  padding_mode=pad)
            np.testing.assert_allclose(
                ours, t_out[0, :, :, 0].T.numpy(), atol=1e-5, rtol=1e-5)


class TestComponentOracles:
    def test_get_2d_embedding_matches_reference(self):
        import torch

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from vggt.vggt.heads.track_modules.utils import (
            get_2d_embedding as ref_emb)

        xy = rng.normal(size=(2, 5, 2)).astype(np.float32) * 10
        ours = np.asarray(get_2d_embedding(jnp.asarray(xy), 8))
        theirs = ref_emb(torch.from_numpy(xy), 8, cat_coords=False).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_sincos_pos_embed_matches_reference(self):
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from vggt.vggt.heads.track_modules.utils import (
            get_2d_sincos_pos_embed)

        ours = sincos_pos_embed_2d(52, 3, 4)          # (3, 4, 52)
        theirs = get_2d_sincos_pos_embed(52, (3, 4))  # (1, 52, 3, 4)
        np.testing.assert_allclose(
            ours, theirs[0].permute(1, 2, 0).numpy(), atol=1e-5)


class TestReferenceParity:
    def _inputs(self, S=3, N=5, H=10, W=10):
        gh, gw = H // 2, W // 2
        P = 5 + gh * gw
        taps = [rng.normal(size=(1, S, P, 32)).astype(np.float32) * 0.5
                for _ in range(4)]
        queries = (rng.random((1, N, 2)).astype(np.float32)
                   * np.array([W - 1.0, H - 1.0], np.float32))
        return taps, queries

    def test_forward_parity(self):
        import torch

        ref = _ref_track_head()
        taps, queries = self._inputs()
        S, H, W = 3, 10, 10
        # reference consumes a full per-layer token list; only the DPT
        # taps (default intermediate_layer_idx 4/11/17/23) are read
        full = [torch.zeros(1)] * 24
        for li, t in zip((4, 11, 17, 23), taps):
            full[li] = torch.from_numpy(t)
        images = torch.zeros(1, S, 3, H, W)
        with torch.no_grad():
            coords_t, vis_t, conf_t = ref(full, images, 5,
                                          torch.from_numpy(queries))

        model = TrackHead(**TINY, img_hw=(H, W), patch_start_idx=5)
        variables = {"params": jax.tree.map(
            jnp.asarray, convert_track_head(ref.state_dict(), prefix=""))}
        coords_j, vis_j, conf_j = model.apply(
            variables, tuple(jnp.asarray(t) for t in taps),
            jnp.asarray(queries))

        assert len(coords_j) == len(coords_t) == 2
        for cj, ct in zip(coords_j, coords_t):
            np.testing.assert_allclose(np.asarray(cj), ct.numpy(),
                                       atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(vis_j), vis_t.numpy(),
                                   atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(conf_j), conf_t.numpy(),
                                   atol=1e-4, rtol=1e-3)

    def test_converter_round_trips_param_tree(self):
        """Converted tree exactly matches the initialized module tree
        (names and shapes) — no silently dropped parameters."""
        ref = _ref_track_head()
        taps, queries = self._inputs()
        model = TrackHead(**TINY, img_hw=(10, 10), patch_start_idx=5)
        init_vars = model.init(jax.random.PRNGKey(0),
                               tuple(jnp.asarray(t) for t in taps),
                               jnp.asarray(queries))
        conv = convert_track_head(ref.state_dict(), prefix="")

        def paths(tree, prefix=()):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out.update(paths(v, prefix + (k,)))
                else:
                    out[prefix + (k,)] = np.asarray(v).shape
            return out

        pi = paths(init_vars["params"])
        pc = paths(conv)
        assert pi == pc

    def test_track_points_wrapper(self):
        ref = _ref_track_head()
        taps, queries = self._inputs()
        model = TrackHead(**TINY, img_hw=(10, 10), patch_start_idx=5)
        variables = {"params": jax.tree.map(
            jnp.asarray, convert_track_head(ref.state_dict(), prefix=""))}
        res = track_points(model, variables,
                           tuple(jnp.asarray(t) for t in taps),
                           jnp.asarray(queries))
        assert res.tracks.shape == (1, 3, 5, 2)
        assert res.visibility.shape == (1, 3, 5)
        # frame 0 is pinned to the query points
        np.testing.assert_allclose(np.asarray(res.tracks[0, 0]), queries[0],
                                   atol=1e-4)


class TestPadMasking:
    def test_masked_pads_match_exact_size_run(self):
        """Fixed-size chunk padding must NOT perturb real tracks: a run
        with n real queries + pad slots and ``query_valid`` must equal
        the exact-size run (the reference predict_tracks_in_chunks has
        no pads; unmasked zeros leak into the virtual-track space
        attention — round-5 code-review finding)."""
        lrng = np.random.default_rng(7)
        S, H, W = 3, 10, 10
        gh, gw = H // 2, W // 2
        taps = tuple(jnp.asarray(
            lrng.normal(size=(1, S, 5 + gh * gw, 32)), jnp.float32) * 0.5
            for _ in range(4))
        n, chunk = 4, 16
        q_real = jnp.asarray(
            lrng.random((1, n, 2)) * np.array([W - 1.0, H - 1.0]),
            jnp.float32)
        model = TrackHead(**TINY, img_hw=(H, W), patch_start_idx=5)
        variables = jax.jit(lambda k: model.init(k, taps, q_real))(
            jax.random.PRNGKey(0))

        exact_coords, exact_vis, _ = model.apply(variables, taps, q_real)
        q_pad = jnp.concatenate(
            [q_real, jnp.zeros((1, chunk - n, 2))], axis=1)
        qv = jnp.asarray(np.arange(chunk) < n)[None]
        pad_coords, pad_vis, _ = model.apply(variables, taps, q_pad, qv)
        np.testing.assert_allclose(np.asarray(pad_coords[-1][:, :, :n]),
                                   np.asarray(exact_coords[-1]),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(pad_vis[:, :, :n]),
                                   np.asarray(exact_vis),
                                   atol=1e-5, rtol=1e-5)
        # and WITHOUT the mask the pads demonstrably perturb the output
        raw_coords, _, _ = model.apply(variables, taps, q_pad)
        assert np.abs(np.asarray(raw_coords[-1][:, :, :n])
                      - np.asarray(exact_coords[-1])).max() > 1e-4


class TestTrackerBehavior:
    def test_corr_sample_peak_at_matching_feature(self):
        """The correlation window peaks where the target feature lies."""
        B, S, H, W, C = 1, 1, 9, 9, 8
        fm = rng.normal(size=(B, S, H, W, C)).astype(np.float32)
        tgt = fm[:, :, 4, 6][:, :, None]               # feature at (x=6, y=4)
        coords = jnp.asarray([[[[6.0, 4.0]]]])
        out = corr_pyramid_sample(jnp.asarray(fm), jnp.asarray(tgt), coords,
                                  num_levels=1, radius=2)
        win = np.asarray(out).reshape(5, 5)
        assert np.unravel_index(win.argmax(), (5, 5)) == (2, 2)

    def test_refinement_moves_toward_shifted_content(self):
        """A tracker trained for zero iterations is identity-ish; with
        random weights the API invariants still hold: frame-0 pinned,
        outputs finite, vis in [0, 1]."""
        model = BaseTrackerPredictor(latent_dim=8, hidden_size=16,
                                     corr_levels=2, corr_radius=1,
                                     depth=1, iters=2)
        fm = jnp.asarray(rng.normal(size=(1, 3, 8, 8, 8)), jnp.float32)
        q = jnp.asarray([[[3.0, 3.0], [5.0, 2.0]]])
        v = model.init(jax.random.PRNGKey(0), q, fm)
        coords, vis, conf = model.apply(v, q, fm)
        assert np.all(np.isfinite(np.asarray(coords[-1])))
        np.testing.assert_allclose(np.asarray(coords[-1][0, 0]),
                                   np.asarray(q[0]) , atol=1e-5)
        assert np.all((np.asarray(vis) >= 0) & (np.asarray(vis) <= 1))
        assert conf is not None
