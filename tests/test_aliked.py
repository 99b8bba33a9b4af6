"""ALIKED extractor (skix/perception/aliked.py).

The deformable conv is verified against an INDEPENDENT numpy
transcription of the torchvision ``deform_conv2d`` sampling rule and
against ``lax.conv`` at zero offsets; DKD sub-pixel refinement against a
numpy soft-argmax oracle; the converter against the published state-dict
layout (structure/shape round trip — lightglue itself is unreachable in
this environment, see the module docstring's verification caveat)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skix.perception.aliked import (ALIKED, ALIKED_CFGS, SDDH,
                                    aliked_keypoints, bilinear_sample,
                                    convert_aliked, deform_conv2d,
                                    dkd_detect, reference_aliked_spec,
                                    upsample_align_corners)


def _np_bilinear(img, py, px):
    """Zero-padded bilinear: each corner contributes only if inside."""
    H, W, C = img.shape
    y0, x0 = int(np.floor(py)), int(np.floor(px))
    wy, wx = py - y0, px - x0
    acc = np.zeros(C)
    for yi, xi, w in ((y0, x0, (1 - wy) * (1 - wx)),
                      (y0, x0 + 1, (1 - wy) * wx),
                      (y0 + 1, x0, wy * (1 - wx)),
                      (y0 + 1, x0 + 1, wy * wx)):
        if 0 <= yi < H and 0 <= xi < W:
            acc += w * img[yi, xi]
    return acc


def _np_deform_conv(x, off, w):
    B, H, W, C = x.shape
    K = w.shape[0]
    pad = K // 2
    Cout = w.shape[-1]
    out = np.zeros((B, H, W, Cout))
    for b in range(B):
        for y in range(H):
            for xc in range(W):
                acc = np.zeros(Cout)
                for i in range(K):
                    for j in range(K):
                        k = i * K + j
                        py = y + i - pad + off[b, y, xc, 2 * k]
                        px = xc + j - pad + off[b, y, xc, 2 * k + 1]
                        v = _np_bilinear(x[b], py, px)
                        acc += v @ w[i, j]
                out[b, y, xc] = acc
    return out


class TestDeformConv:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 6, 6, 3)).astype(np.float32)
        off = (rng.normal(size=(2, 6, 6, 18)) * 1.5).astype(np.float32)
        w = rng.normal(size=(3, 3, 3, 4)).astype(np.float32)
        got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                       jnp.asarray(w)))
        want = _np_deform_conv(x, off, w)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_zero_offsets_equal_regular_conv(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 5)), jnp.float32)
        off = jnp.zeros((1, 8, 8, 18))
        got = deform_conv2d(x, off, w)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_mask_modulation(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 5, 5, 2)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 2, 2)), jnp.float32)
        off = jnp.zeros((1, 5, 5, 18))
        half = deform_conv2d(x, off, w,
                             mask=jnp.full((1, 5, 5, 9), 0.5))
        full = deform_conv2d(x, off, w)
        np.testing.assert_allclose(np.asarray(half), 0.5 * np.asarray(full),
                                   atol=1e-5)


class TestUpsample:
    def test_align_corners_grid(self):
        # align_corners=True maps output i → input i·(in−1)/(out−1):
        # corners map to corners exactly.
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 3, 3, 2)).astype(np.float32)
        up = np.asarray(upsample_align_corners(jnp.asarray(x), 5, 5))
        np.testing.assert_allclose(up[0, 0, 0], x[0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(up[0, 4, 4], x[0, 2, 2], atol=1e-6)
        np.testing.assert_allclose(up[0, 2, 2], x[0, 1, 1], atol=1e-6)
        # midpoint between two input pixels
        np.testing.assert_allclose(up[0, 0, 1],
                                   0.5 * (x[0, 0, 0] + x[0, 0, 1]),
                                   atol=1e-6)

    def test_bilinear_sample_outside_is_zero(self):
        img = jnp.ones((4, 4, 1))
        v = bilinear_sample(img, jnp.asarray([-1.0, 5.0]),
                            jnp.asarray([0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(v), 0.0)
        # half-in: only the inside corner pair contributes
        v = bilinear_sample(img, jnp.asarray([-0.5]), jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(v), 0.5)


class TestDKD:
    def test_subpixel_matches_numpy_softargmax(self):
        rng = np.random.default_rng(4)
        s = rng.uniform(0.0, 0.3, size=(20, 20)).astype(np.float32)
        s[9, 11] = 0.9
        s[9, 12] = 0.8  # pulls the soft-argmax right
        xy, score, valid = dkd_detect(jnp.asarray(s), max_pts=4,
                                      det_thres=0.5, radius=2)
        assert bool(valid[0]) and int(valid.sum()) == 1
        # numpy soft-argmax over the 5×5 patch at (9, 11)
        patch = s[7:12, 9:14].reshape(-1)
        p = np.exp((patch - patch.max()) / 0.1)
        p /= p.sum()
        gy, gx = np.meshgrid(np.arange(-2, 3), np.arange(-2, 3),
                             indexing="ij")
        ex = 11 + (p * gx.reshape(-1)).sum()
        ey = 9 + (p * gy.reshape(-1)).sum()
        np.testing.assert_allclose(np.asarray(xy[0]), [ex, ey], atol=1e-4)
        assert ex > 11  # refinement moved toward the secondary peak

    def test_border_suppressed_and_fixed_slots(self):
        s = np.zeros((16, 16), np.float32)
        s[0, 0] = 1.0   # border peak must not fire
        s[8, 8] = 0.9
        xy, score, valid = dkd_detect(jnp.asarray(s), max_pts=8,
                                      det_thres=0.1)
        assert xy.shape == (8, 2) and valid.shape == (8,)
        assert int(valid.sum()) == 1
        np.testing.assert_allclose(np.asarray(xy[0]), [8, 8], atol=0.5)


class TestBackbone:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = ALIKED(model_name="aliked-t16")
        img = jnp.asarray(
            np.random.default_rng(5).uniform(size=(1, 32, 32, 3)),
            jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img)
        return model, variables, img

    def test_forward_shapes_and_ranges(self, tiny):
        model, variables, img = tiny
        fmap, score = model.apply(variables, img)
        dim = ALIKED_CFGS["aliked-t16"]["dim"]
        assert fmap.shape == (1, 32, 32, dim)
        assert score.shape == (1, 32, 32)
        assert float(score.min()) >= 0 and float(score.max()) <= 1
        norms = np.linalg.norm(np.asarray(fmap), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_extractor_protocol(self, tiny):
        model, variables, _ = tiny
        rng = np.random.default_rng(6)
        img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        xy, score, valid = aliked_keypoints(model, variables, img,
                                            max_pts=64, det_thres=0.0)
        assert xy.shape == (64, 2) and valid.shape == (64,)
        got = np.asarray(xy[np.asarray(valid)])
        assert np.all(got >= 0) and np.all(got < 32)


class TestSDDH:
    def test_descriptor_shapes_normalized(self):
        rng = np.random.default_rng(7)
        cfg = ALIKED_CFGS["aliked-t16"]
        head = SDDH(dim=cfg["dim"], kernel_size=cfg["K"], n_pos=cfg["M"])
        fmap = jnp.asarray(rng.normal(size=(16, 16, cfg["dim"])),
                           jnp.float32)
        kpts = jnp.asarray([[3.2, 4.7], [0.0, 0.0], [15.0, 15.0]])
        variables = head.init(jax.random.PRNGKey(1), fmap, kpts)
        desc = head.apply(variables, fmap, kpts)
        assert desc.shape == (3, cfg["dim"])
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(desc), axis=-1), 1.0, atol=1e-5)


class TestRegistry:
    def test_union_with_aliked(self):
        """'aliked+shi_tomasi' unions both extractors' keypoints
        (vggsfm_utils.py:228 semantics) through the protocol wrapper."""
        from skix.perception.sfm_tracks import (extract_keypoints,
                                                initialize_feature_extractors)

        rng = np.random.default_rng(10)
        model = ALIKED(model_name="aliked-t16")
        img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(4),
                               jnp.asarray(img)[None])
        exts = initialize_feature_extractors(
            max_query_pts=32, det_thres=0.0,
            extractor_method="aliked+shi_tomasi",
            aliked=(model, variables))
        assert set(exts) == {"aliked", "shi_tomasi"}
        only_st = initialize_feature_extractors(
            max_query_pts=32, det_thres=0.0,
            extractor_method="shi_tomasi")
        union = extract_keypoints(img, exts)
        st = extract_keypoints(img, only_st)
        assert union.shape[1] == 2 and union.shape[0] >= st.shape[0]

    def test_aliked_without_weights_warns_and_falls_back(self):
        from skix.perception.sfm_tracks import initialize_feature_extractors

        exts = initialize_feature_extractors(extractor_method="aliked")
        assert set(exts) == {"shi_tomasi"}


class TestConverter:
    @pytest.mark.parametrize("name", ["aliked-t16", "aliked-n16",
                                      "aliked-n32"])
    def test_round_trip_structure(self, name):
        rng = np.random.default_rng(8)
        sd = {k: rng.normal(size=shp).astype(np.float32) * 0.05
              for k, shp in reference_aliked_spec(name).items()}
        for k in list(sd):
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        backbone_vars, sddh_vars = convert_aliked(sd, name)
        model = ALIKED(model_name=name)
        img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
        init = model.init(jax.random.PRNGKey(2), img)
        # identical tree structure + shapes as a fresh init
        got = jax.tree.map(lambda a: a.shape, backbone_vars)
        want = jax.tree.map(lambda a: a.shape, init)
        assert got == want
        fmap, score = model.apply(backbone_vars, img)
        assert np.all(np.isfinite(np.asarray(fmap)))
        cfg = ALIKED_CFGS[name]
        head = SDDH(dim=cfg["dim"], kernel_size=cfg["K"], n_pos=cfg["M"])
        hinit = head.init(jax.random.PRNGKey(3), fmap[0],
                          jnp.asarray([[4.0, 4.0]]))
        got = jax.tree.map(lambda a: a.shape, sddh_vars)
        want = jax.tree.map(lambda a: a.shape, hinit)
        assert got == want
        desc = head.apply(sddh_vars, fmap[0], jnp.asarray([[4.0, 4.0]]))
        assert np.all(np.isfinite(np.asarray(desc)))

    def test_named_weight_lands_in_place(self):
        rng = np.random.default_rng(9)
        sd = {k: rng.normal(size=shp).astype(np.float32) * 0.05
              for k, shp in reference_aliked_spec("aliked-t16").items()}
        for k in list(sd):
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        backbone_vars, _ = convert_aliked(sd, "aliked-t16")
        np.testing.assert_allclose(
            np.asarray(backbone_vars["params"]["block3"]["conv1"]
                       ["regular_conv"]),
            sd["block3.conv1.regular_conv.weight"].transpose(2, 3, 1, 0))
        np.testing.assert_allclose(
            np.asarray(backbone_vars["batch_stats"]["block2"]["bn1"]
                       ["mean"]),
            sd["block2.bn1.running_mean"])
