"""SuperPoint learned keypoint extractor: architecture + converter
parity vs a hand-built torch oracle (lightglue/magicleap is not
installed; the oracle transcribes superpoint.py's VGG encoder, 65-way
cell softmax + depth-to-space, simple_nms, and grid_sample descriptor
sampling with the SAME state-dict names), plus the
initialize_feature_extractors / extract_keypoints union protocol
(reference vggsfm_utils.py:189,228)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.perception.sfm_tracks import (extract_keypoints,
                                        initialize_feature_extractors)
from skix.perception.superpoint import (SuperPoint, convert_superpoint,
                                        reference_superpoint_spec,
                                        sample_descriptors, simple_nms,
                                        superpoint_keypoints)


def _torch_superpoint():
    """magicleap SuperPointNet layout (same names lightglue uses)."""
    import torch
    import torch.nn as tnn

    class SuperPointNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.relu = tnn.ReLU(inplace=True)
            self.pool = tnn.MaxPool2d(2, 2)
            c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256
            self.conv1a = tnn.Conv2d(1, c1, 3, 1, 1)
            self.conv1b = tnn.Conv2d(c1, c1, 3, 1, 1)
            self.conv2a = tnn.Conv2d(c1, c2, 3, 1, 1)
            self.conv2b = tnn.Conv2d(c2, c2, 3, 1, 1)
            self.conv3a = tnn.Conv2d(c2, c3, 3, 1, 1)
            self.conv3b = tnn.Conv2d(c3, c3, 3, 1, 1)
            self.conv4a = tnn.Conv2d(c3, c4, 3, 1, 1)
            self.conv4b = tnn.Conv2d(c4, c4, 3, 1, 1)
            self.convPa = tnn.Conv2d(c4, c5, 3, 1, 1)
            self.convPb = tnn.Conv2d(c5, 65, 1, 1, 0)
            self.convDa = tnn.Conv2d(c4, c5, 3, 1, 1)
            self.convDb = tnn.Conv2d(c5, d1, 1, 1, 0)

        def forward(self, x):
            import torch

            x = self.relu(self.conv1a(x))
            x = self.relu(self.conv1b(x))
            x = self.pool(x)
            x = self.relu(self.conv2a(x))
            x = self.relu(self.conv2b(x))
            x = self.pool(x)
            x = self.relu(self.conv3a(x))
            x = self.relu(self.conv3b(x))
            x = self.pool(x)
            x = self.relu(self.conv4a(x))
            x = self.relu(self.conv4b(x))
            # detector head (lightglue forward)
            cPa = self.relu(self.convPa(x))
            scores = self.convPb(cPa)
            scores = torch.nn.functional.softmax(scores, 1)[:, :-1]
            b, _, h, w = scores.shape
            scores = scores.permute(0, 2, 3, 1).reshape(b, h, w, 8, 8)
            scores = scores.permute(0, 1, 3, 2, 4).reshape(
                b, h * 8, w * 8)
            # descriptor head
            cDa = self.relu(self.convDa(x))
            desc = self.convDb(cDa)
            desc = torch.nn.functional.normalize(desc, p=2, dim=1)
            return scores, desc

    return SuperPointNet()


class TestSuperPointParity:
    def test_dense_outputs_match_torch_oracle(self):
        import torch

        tm = _torch_superpoint()
        g = torch.Generator().manual_seed(5)
        with torch.no_grad():
            for p in tm.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        tm.eval()

        rng = np.random.default_rng(6)
        x = rng.uniform(0, 1, (1, 1, 32, 40)).astype(np.float32)
        with torch.no_grad():
            ref_s, ref_d = tm(torch.from_numpy(x))

        variables = convert_superpoint(tm.state_dict())
        s, d = SuperPoint().apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(s), ref_s.numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(d).transpose(0, 3, 1, 2),
                                   ref_d.numpy(), atol=1e-4)

    def test_spec_matches_torch_state_dict(self):
        tm = _torch_superpoint()
        spec = reference_superpoint_spec()
        sd = {k: tuple(v.shape) for k, v in tm.state_dict().items()}
        assert sd == spec

    def test_simple_nms_matches_torch_transcription(self):
        """The iterated suppress/refill NMS (lightglue simple_nms)."""
        import torch

        def torch_simple_nms(scores, nms_radius):
            def max_pool(x):
                return torch.nn.functional.max_pool2d(
                    x, kernel_size=nms_radius * 2 + 1, stride=1,
                    padding=nms_radius)

            zeros = torch.zeros_like(scores)
            max_mask = scores == max_pool(scores)
            for _ in range(2):
                supp_mask = max_pool(max_mask.float()) > 0
                supp_scores = torch.where(supp_mask, zeros, scores)
                new_max_mask = supp_scores == max_pool(supp_scores)
                max_mask = max_mask | (new_max_mask & (~supp_mask))
            return torch.where(max_mask, scores, zeros)

        rng = np.random.default_rng(7)
        s = rng.uniform(0, 1, (1, 1, 24, 24)).astype(np.float32)
        ref = torch_simple_nms(torch.from_numpy(s), 4).numpy()[0, 0]
        out = np.asarray(simple_nms(jnp.asarray(s[0, 0]), 4))
        np.testing.assert_allclose(out, ref, atol=1e-7)

    def test_sample_descriptors_matches_grid_sample(self):
        import torch

        rng = np.random.default_rng(8)
        d = rng.normal(size=(1, 16, 4, 5)).astype(np.float32)
        kp = rng.uniform(4, 28, size=(1, 6, 2)).astype(np.float32)

        s = 8
        k = torch.from_numpy(kp) - s / 2 + 0.5
        w, h = 5, 4
        k = k / torch.tensor([w * s - s / 2 - 0.5, h * s - s / 2 - 0.5])
        k = k * 2 - 1
        ref = torch.nn.functional.grid_sample(
            torch.from_numpy(d), k.view(1, 1, -1, 2), mode="bilinear",
            align_corners=True)
        ref = torch.nn.functional.normalize(
            ref.reshape(1, 16, -1), p=2, dim=1).numpy()[0].T

        out = np.asarray(sample_descriptors(
            jnp.asarray(d[0].transpose(1, 2, 0)), jnp.asarray(kp[0]), s))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestKeypointExtraction:
    @pytest.fixture(scope="class")
    def sp(self):
        model = SuperPoint()
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
        return model, variables

    def test_fixed_shapes_and_border(self, sp):
        model, variables = sp
        rng = np.random.default_rng(9)
        img = rng.uniform(0, 1, (32, 32)).astype(np.float32)
        xy, score, valid = superpoint_keypoints(model, variables, img,
                                                max_pts=64,
                                                det_thres=0.0)
        assert xy.shape == (64, 2) and valid.shape == (64,)
        v = np.asarray(valid)
        pts = np.asarray(xy)[v]
        assert len(pts) > 0
        assert (pts >= 4).all() and (pts < 28).all()  # border removed
        sc = np.asarray(score)[v]
        assert (np.diff(sc) <= 1e-6).all()            # sorted desc

    def test_extractor_union_and_fallback(self, sp):
        rng = np.random.default_rng(10)
        img = rng.uniform(0, 1, (32, 32)).astype(np.float32)

        # sp requested without weights → warn + shi_tomasi fallback
        ext = initialize_feature_extractors(64, 0.0, "sp")
        assert list(ext) == ["shi_tomasi"]

        ext_sp = initialize_feature_extractors(64, 0.0, "sp",
                                               superpoint=sp)
        assert list(ext_sp) == ["sp"]
        both = initialize_feature_extractors(64, 0.0, "sp+shi_tomasi",
                                             superpoint=sp)
        n_sp = len(extract_keypoints(img, ext_sp))
        n_st = len(extract_keypoints(img, ext))
        n_both = len(extract_keypoints(img, both))
        assert n_both == n_sp + n_st                  # union concatenates
        # unknown methods are ignored; empty → fallback
        ext2 = initialize_feature_extractors(64, 0.0, "aliked")
        assert list(ext2) == ["shi_tomasi"]

    def test_predict_tracks_with_superpoint(self, sp):
        """End-to-end: predict_tracks runs with the learned extractor in
        the query slot (random weights — behavior, not accuracy)."""
        import flax.linen as nn

        from skix.perception.sfm_tracks import predict_tracks

        class _StubHead(nn.Module):
            """Reference-contract stub: (4-tuple of (B,S,P,C) taps,
            (B,N,2) queries) → (coords_list, vis, conf) like TrackHead."""

            @nn.compact
            def __call__(self, taps, queries, query_valid=None):
                S = taps[0].shape[1]
                tr = jnp.repeat(queries[:, None], S, axis=1)  # (B,S,N,2)
                vis = jnp.ones(tr.shape[:3])
                return [tr], vis, vis

        rng = np.random.default_rng(11)
        images = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
        feats = rng.normal(size=(4, 3, 16, 8)).astype(np.float32)
        head = _StubHead()
        hv = head.init(jax.random.PRNGKey(0),
                       tuple(jnp.zeros((1, 3, 16, 8)) for _ in range(4)),
                       jnp.zeros((1, 4, 2)))
        res = predict_tracks(head, hv, images, feats,
                             max_query_pts=32, query_frame_num=2,
                             chunk=16, complete_non_vis=False,
                             extractor_method="sp", superpoint=sp)
        assert res.tracks.shape[0] == 3
        assert res.tracks.shape[1] > 0

    def test_sift_extractor(self):
        """The reference's classical `sift` member (vggsfm_utils.py:212)
        joins the union: cv2-backed, fixed-slot protocol, responses
        sorted descending, coordinates inside the image."""
        rng = np.random.default_rng(11)
        # structured image so SIFT finds real blobs
        img = np.zeros((64, 64), np.float32)
        for (y, x) in rng.integers(8, 56, (12, 2)):
            img[y - 3:y + 3, x - 3:x + 3] = rng.uniform(0.5, 1.0)
        ext = initialize_feature_extractors(32, 0.0, "sift")
        assert list(ext) == ["sift"]
        xy, score, valid = ext["sift"](img)
        assert xy.shape == (32, 2) and valid.dtype == bool
        n = int(valid.sum())
        assert n > 0
        pts = xy[valid]
        assert (pts >= 0).all() and (pts[:, 0] < 64).all() \
            and (pts[:, 1] < 64).all()
        sc = score[valid]
        assert (np.diff(sc) <= 1e-6).all()
        # rgb input path
        xy3, _, v3 = ext["sift"](np.stack([img] * 3, -1))
        assert int(v3.sum()) == n
        # union with shi_tomasi concatenates
        both = initialize_feature_extractors(32, 0.0, "sift+shi_tomasi")
        n_union = len(extract_keypoints(img, both))
        n_st = len(extract_keypoints(
            img, initialize_feature_extractors(32, 0.0, "shi_tomasi")))
        assert n_union == n + n_st
