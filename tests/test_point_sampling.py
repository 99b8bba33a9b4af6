"""Interactive-training sampler parity vs the imported reference
sam3_tracker_utils (with a scipy EDT standing in for the Triton kernel —
both implement cv2.DIST_L2 distance-to-nearest-zero semantics)."""

import importlib
import importlib.machinery
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.tracking import point_sampling as ps

SAM3_DIR = "/root/reference/prepare_front_results/sam3"


def _stub_module(name):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod
    return mod


def _import_ref_utils():
    if "sam3.model.sam3_tracker_utils" in sys.modules:
        return sys.modules["sam3.model.sam3_tracker_utils"]
    torch = pytest.importorskip("torch")
    from scipy import ndimage

    pkg = types.ModuleType("sam3")
    spec = importlib.machinery.ModuleSpec("sam3", None, is_package=True)
    spec.submodule_search_locations = [SAM3_DIR]
    pkg.__spec__ = spec
    pkg.__path__ = [SAM3_DIR]
    sys.modules["sam3"] = pkg
    # sam3.model.edt imports triton (absent here); stub edt_triton with
    # scipy's distance transform (identical cv2.DIST_L2 semantics).
    edt_stub = _stub_module("sam3.model.edt")

    def edt_triton(masks):
        out = np.stack([
            ndimage.distance_transform_edt(m)
            for m in masks.cpu().numpy().astype(bool)
        ])
        return torch.from_numpy(out.astype(np.float32))

    edt_stub.edt_triton = edt_triton
    return importlib.import_module("sam3.model.sam3_tracker_utils")


def _random_masks(rng, B, H, W, p=0.3):
    return rng.random((B, 1, H, W)) < p


def _blob_masks(rng, B, H, W, n_blobs=2, r=5):
    out = np.zeros((B, 1, H, W), bool)
    ys, xs = np.mgrid[0:H, 0:W]
    for b in range(B):
        for _ in range(n_blobs):
            cy, cx = rng.integers(0, H), rng.integers(0, W)
            out[b, 0] |= (ys - cy) ** 2 + (xs - cx) ** 2 <= r ** 2
    return out


class TestMaskToBox:
    def test_parity(self):
        torch = pytest.importorskip("torch")
        ref = _import_ref_utils()
        rng = np.random.default_rng(0)
        masks = _random_masks(rng, 5, 13, 17, p=0.1)
        masks[3] = False  # empty-mask case
        got = np.asarray(ps.mask_to_box(masks))
        want = ref.mask_to_box(torch.from_numpy(masks)).numpy()
        np.testing.assert_array_equal(got, want)


class TestSampleBoxPoints:
    def test_parity_with_shared_noise(self):
        torch = pytest.importorskip("torch")
        ref = _import_ref_utils()
        rng = np.random.default_rng(1)
        masks = _blob_masks(rng, 4, 32, 40)
        noise = (2.0 * rng.random((4, 1, 4)) - 1.0).astype(np.float32)

        got_pts, got_lab = ps.sample_box_points(masks, box_noise=jnp.asarray(noise))

        # Reference draws torch.rand inside; replay it with the same noise
        # by patching torch.rand.
        orig_rand = torch.rand
        try:
            torch.rand = lambda *a, **k: torch.from_numpy(
                (noise + 1.0) / 2.0)
            want_pts, want_lab = ref.sample_box_points(
                torch.from_numpy(masks))
        finally:
            torch.rand = orig_rand
        np.testing.assert_allclose(np.asarray(got_pts),
                                   want_pts.numpy(), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(got_lab), want_lab.numpy())

    def test_zero_noise_is_box_corners(self):
        rng = np.random.default_rng(2)
        masks = _blob_masks(rng, 2, 24, 24)
        pts, lab = ps.sample_box_points(masks, noise=0.0)
        box = np.asarray(ps.mask_to_box(masks))[:, 0]
        np.testing.assert_allclose(np.asarray(pts).reshape(2, 4),
                                   box.astype(np.float32))
        assert np.asarray(lab).tolist() == [[2, 3], [2, 3]]


class TestRandomErrorPoints:
    def test_parity_with_shared_noise(self):
        torch = pytest.importorskip("torch")
        ref = _import_ref_utils()
        rng = np.random.default_rng(3)
        B, H, W, num_pt = 4, 16, 20, 3
        gt = _blob_masks(rng, B, H, W)
        pred = _blob_masks(rng, B, H, W)
        gt[2] = pred[2]  # the all-correct branch
        noise = rng.random((B, num_pt, H, W, 2)).astype(np.float32)

        got_pts, got_lab = ps.sample_random_points_from_errors(
            gt, pred, num_pt=num_pt, pts_noise=jnp.asarray(noise))

        orig_rand = torch.rand
        try:
            torch.rand = lambda *a, **k: torch.from_numpy(noise.copy())
            want_pts, want_lab = ref.sample_random_points_from_errors(
                torch.from_numpy(gt), torch.from_numpy(pred), num_pt=num_pt)
        finally:
            torch.rand = orig_rand
        np.testing.assert_allclose(np.asarray(got_pts), want_pts.numpy())
        np.testing.assert_array_equal(np.asarray(got_lab),
                                      want_lab.numpy())

    def test_labels_match_regions(self):
        rng = np.random.default_rng(4)
        gt = _blob_masks(rng, 3, 16, 16)
        pred = _blob_masks(rng, 3, 16, 16)
        pts, lab = ps.sample_random_points_from_errors(
            gt, pred, rng=jax.random.PRNGKey(0), num_pt=4)
        pts = np.asarray(pts).astype(int)
        lab = np.asarray(lab)
        fp = ~gt & pred
        fn = gt & ~pred
        for b in range(3):
            if not fp[b].any() and not fn[b].any():
                continue
            for k in range(4):
                x, y = pts[b, k]
                region = fn if lab[b, k] == 1 else fp
                # a positive click corrects FN, a negative corrects FP
                # (or background when the prediction is exact)
                if region[b, 0].any():
                    assert region[b, 0, y, x]


class TestErrorCenterPoint:
    @pytest.mark.parametrize("padding", [True, False])
    def test_parity(self, padding):
        torch = pytest.importorskip("torch")
        ref = _import_ref_utils()
        rng = np.random.default_rng(5)
        gt = _blob_masks(rng, 4, 24, 28)
        pred = _blob_masks(rng, 4, 24, 28)
        got_pts, got_lab = ps.sample_one_point_from_error_center(
            gt, pred, padding=padding)
        want_pts, want_lab = ref.sample_one_point_from_error_center(
            torch.from_numpy(gt), torch.from_numpy(pred), padding=padding)
        np.testing.assert_array_equal(np.asarray(got_lab),
                                      want_lab.numpy())
        np.testing.assert_allclose(np.asarray(got_pts), want_pts.numpy())

    def test_get_next_point_dispatch(self):
        rng = np.random.default_rng(6)
        gt = _blob_masks(rng, 2, 16, 16)
        pts, lab = ps.get_next_point(gt, None, "center")
        assert pts.shape == (2, 1, 2) and lab.shape == (2, 1)
        # empty prediction → every click positive (corrects FN)
        assert np.asarray(lab).min() == 1
        with pytest.raises(ValueError):
            ps.get_next_point(gt, None, "nope")


class TestSinePE:
    def test_parity(self):
        torch = pytest.importorskip("torch")
        ref = _import_ref_utils()
        pos = np.array([0, 1, 5, 100], np.float32)
        got = np.asarray(ps.get_1d_sine_pe(pos, 64))
        want = ref.get_1d_sine_pe(torch.from_numpy(pos), 64).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestBestGtMatch:
    def test_parity(self):
        torch = pytest.importorskip("torch")
        ref = _import_ref_utils()
        rng = np.random.default_rng(7)
        pred = rng.normal(0, 1, (3, 4, 16, 16)).astype(np.float32)
        gt = _blob_masks(rng, 3, 16, 16)
        scores = rng.random((3, 4)).astype(np.float32)
        got = np.asarray(ps.get_best_gt_match_from_multimasks(
            pred, gt, scores))
        want = ref.get_best_gt_match_from_multimasks(
            torch.from_numpy(pred), torch.from_numpy(gt),
            torch.from_numpy(scores)).numpy()
        np.testing.assert_allclose(got, want)

    def test_zero_iou_uses_scores(self):
        torch = pytest.importorskip("torch")
        ref = _import_ref_utils()
        pred = -np.ones((2, 3, 8, 8), np.float32)  # no positive pixels
        gt = np.zeros((2, 1, 8, 8), bool)
        scores = np.array([[0.1, 0.9, 0.2], [0.8, 0.1, 0.3]], np.float32)
        got = np.asarray(ps.get_best_gt_match_from_multimasks(
            pred, gt, scores))
        want = ref.get_best_gt_match_from_multimasks(
            torch.from_numpy(pred), torch.from_numpy(gt),
            torch.from_numpy(scores)).numpy()
        np.testing.assert_allclose(got, want)


class TestSelectCondFrames:
    def _ref_select(self, ref, frame_idx, ts, max_num, keep_first):
        cond = {int(t): f"v{t}" for t in sorted(ts)}
        sel, unsel = ref.select_closest_cond_frames(
            frame_idx, cond, max_num, keep_first_cond_frame=keep_first)
        return set(sel), set(unsel)

    @pytest.mark.parametrize("keep_first", [False, True])
    def test_parity_random_cases(self, keep_first):
        ref = _import_ref_utils()
        rng = np.random.default_rng(8)
        for case in range(30):
            n = int(rng.integers(1, 9))
            ts = rng.choice(100, size=n, replace=False).astype(np.int32)
            frame_idx = int(rng.integers(0, 100))
            max_num = int(rng.integers(2, 5))
            want_sel, want_unsel = self._ref_select(
                ref, frame_idx, ts, max_num, keep_first)

            N = 8  # fixed slots, some invalid
            t_slots = np.zeros(N, np.int32)
            valid = np.zeros(N, bool)
            t_slots[:n] = ts
            valid[:n] = True
            sel, unsel = ps.select_closest_cond_frames(
                frame_idx, t_slots, valid, max_num,
                keep_first_cond_frame=keep_first)
            got_sel = set(t_slots[np.asarray(sel)].tolist())
            got_unsel = set(t_slots[np.asarray(unsel)].tolist())
            assert got_sel == want_sel, (case, frame_idx, ts, max_num)
            assert got_unsel == want_unsel

    def test_keep_all(self):
        sel, unsel = ps.select_closest_cond_frames(
            5, np.array([1, 2, 3, 0]), np.array([True, True, False, False]),
            -1)
        assert np.asarray(sel).tolist() == [True, True, False, False]
        assert not np.asarray(unsel).any()

    def test_jit_traced_frame_idx(self):
        f = jax.jit(lambda fi, t, v: ps.select_closest_cond_frames(
            fi, t, v, 2))
        t = jnp.array([3, 9, 14, 0])
        v = jnp.array([True, True, True, False])
        sel, _ = f(10, t, v)
        assert np.asarray(sel).tolist() == [False, True, True, False]
