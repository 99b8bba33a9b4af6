"""SfM track-prediction dependency: keypoints, frame ranking (FPS parity
vs the imported reference vggsfm_utils), predict_tracks semantics, and the
COLMAP reconstruction builder (np_to_pycolmap analog)."""

import importlib.machinery
import sys
import types

import numpy as np
import pytest

import flax.linen as nn
import jax.numpy as jnp

from skix.io.colmap_export import (
    build_reconstruction,
    read_colmap_images_txt,
    reconstruction_to_arrays,
    write_reconstruction_text,
)
from skix.models.track_head import TrackHead, TrackResult
from skix.perception.sfm_tracks import (
    calculate_index_mappings,
    farthest_point_sampling,
    predict_tracks,
    rank_frames_by_similarity,
    shi_tomasi_keypoints,
)


def _stub(name, attrs=()):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for a in attrs:
        setattr(mod, a, object)
    sys.modules[name] = mod
    return mod


def _import_ref_vggsfm_utils():
    if "vggt.vggt.dependency.vggsfm_utils" in sys.modules:
        return sys.modules["vggt.vggt.dependency.vggsfm_utils"]
    pytest.importorskip("torch")
    for name, attrs in [("pycolmap", ()),
                        ("lightglue", ("ALIKED", "SIFT", "SuperPoint"))]:
        if name not in sys.modules:
            _stub(name, attrs)
    if "hydra" not in sys.modules:
        h = _stub("hydra")
        h.utils = _stub("hydra.utils", ("instantiate",))
    if "omegaconf" not in sys.modules:
        _stub("omegaconf", ("OmegaConf",))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import vggt.vggt.dependency.vggsfm_utils as u
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference vggsfm_utils not importable: {e}")
    return u


class TestShiTomasi:
    def test_finds_block_corners(self):
        img = np.zeros((64, 64), np.float32)
        img[16:40, 20:44] = 1.0  # one bright block → 4 strong corners
        xy, score, valid = shi_tomasi_keypoints(img, max_pts=16)
        xy, valid = np.asarray(xy), np.asarray(valid)
        assert xy.shape == (16, 2) and valid.shape == (16,)
        got = xy[valid]
        corners = np.array([[20, 16], [43, 16], [20, 39], [43, 39]], float)
        for c in corners:
            d = np.linalg.norm(got - c, axis=1).min()
            assert d <= 2.5, f"corner {c} missed (nearest {d:.1f} px)"

    def test_fixed_shape_and_validity(self):
        flat = np.full((32, 32), 0.5, np.float32)  # no corners at all
        xy, score, valid = shi_tomasi_keypoints(flat, max_pts=8)
        assert xy.shape == (8, 2)
        # a constant image has zero response everywhere → nothing valid
        assert not bool(np.asarray(valid).any())

    def test_rgb_input(self):
        rng = np.random.default_rng(0)
        img = rng.random((48, 48, 3)).astype(np.float32)
        xy, _, valid = shi_tomasi_keypoints(img, max_pts=32)
        assert np.asarray(valid).any()
        assert np.asarray(xy)[np.asarray(valid)].max() < 48


class TestFrameRanking:
    def test_fps_parity_vs_reference(self):
        u = _import_ref_vggsfm_utils()
        import torch

        rng = np.random.default_rng(1)
        for trial in range(5):
            n = int(rng.integers(4, 12))
            dm = rng.random((n, n)) * 10.0
            start = int(rng.integers(0, n))
            k = int(rng.integers(2, n + 1))
            ref = u.farthest_point_sampling(
                torch.from_numpy(dm.copy()), k, start)
            got = farthest_point_sampling(dm, k, start)
            assert got == list(ref), f"trial {trial}: {got} vs {list(ref)}"

    def test_rank_picks_most_connected_first(self):
        # 3 near-duplicate frames + 1 outlier: a duplicate ranks first and
        # the outlier is the first farthest sample.
        base = np.array([1.0, 0.0, 0.0, 0.0])
        feats = np.stack([base, base + 1e-3, base + 2e-3,
                          np.array([0.0, 1.0, 0.0, 0.0])])
        order = rank_frames_by_similarity(feats, 2)
        assert order[0] in (0, 1, 2)
        assert order[1] == 3

    def test_index_mapping_is_involution(self):
        order = calculate_index_mappings(3, 6)
        assert order[0] == 3 and order[3] == 0
        assert np.array_equal(order[order], np.arange(6))


class _StubHead(nn.Module):
    """Tracks stay at the query position; per-frame visibility equals the
    frame's mean feature value — lets tests drive the augmentation loop by
    constructing the feature array. Mirrors the real head's API: a tuple
    of tap tensors in, (coord_preds list, vis, conf) out."""

    @nn.compact
    def __call__(self, taps, queries, query_valid=None, iters=None):
        self.param("dummy", nn.initializers.zeros, (1,))
        t0 = taps[0]
        B, S = t0.shape[0], t0.shape[1]
        N = queries.shape[1]
        pos = jnp.broadcast_to(queries[:, None], (B, S, N, 2))
        vis = jnp.broadcast_to(
            jnp.mean(t0, axis=(2, 3))[:, :, None], (B, S, N))
        return [pos], vis, None


def _textured_clip(S=4, H=32, W=32, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((H, W)).astype(np.float32)
    return np.stack([np.roll(base, s, axis=1) for s in range(S)])


class TestPredictTracks:
    def test_stub_anchors_and_shapes(self):
        import jax

        images = _textured_clip()
        S, H, W = images.shape
        feats = np.ones((4, S, 64, 4), np.float32)
        model = _StubHead()
        variables = model.init(jax.random.PRNGKey(0),
                               tuple(jnp.zeros((1, S, 64, 4))
                                     for _ in range(4)),
                               jnp.zeros((1, 4, 2)))
        out = predict_tracks(model, variables, images, feats,
                             max_query_pts=32, query_frame_num=2,
                             chunk=16, complete_non_vis=False)
        S_, P, _ = out.tracks.shape
        assert S_ == S and P > 0
        assert out.vis_scores.shape == (S, P)
        assert out.colors.shape == (P, 3) and out.colors.dtype == np.uint8
        # the stub never moves a track: every frame holds the query points,
        # and the reorder put them back on the right frame axis
        assert np.allclose(out.tracks[0], out.tracks[-1])

    def test_conf_gating(self):
        import jax

        images = _textured_clip()
        S, H, W = images.shape
        feats = np.ones((4, S, 64, 4), np.float32)
        conf = np.zeros((S, H, W), np.float32)
        conf[:, :, : W // 2] = 2.0  # left half confident, right half not
        p3d = np.zeros((S, H, W, 3), np.float32)
        model = _StubHead()
        variables = model.init(jax.random.PRNGKey(0),
                               tuple(jnp.zeros((1, S, 64, 4))
                                     for _ in range(4)),
                               jnp.zeros((1, 4, 2)))
        out = predict_tracks(model, variables, images, feats,
                             conf=conf, points_3d=p3d,
                             max_query_pts=64, query_frame_num=1,
                             chunk=16, conf_thresh=1.2, min_conf_keep=2,
                             complete_non_vis=False)
        assert out.confs is not None and out.points_3d is not None
        assert (out.confs > 1.2).all()
        assert out.points_3d.shape == (len(out.confs), 3)

    def test_non_vis_augmentation_terminates_and_appends(self):
        import jax

        images = _textured_clip()
        S = images.shape[0]
        feats = np.ones((4, S, 64, 4), np.float32)
        feats[:, 2] = 0.0  # frame 2 permanently invisible to the stub head
        model = _StubHead()
        variables = model.init(jax.random.PRNGKey(0),
                               tuple(jnp.zeros((1, S, 64, 4))
                                     for _ in range(4)),
                               jnp.zeros((1, 4, 2)))
        base = predict_tracks(model, variables, images, feats,
                              max_query_pts=16, query_frame_num=1,
                              chunk=16, complete_non_vis=False)
        aug = predict_tracks(model, variables, images, feats,
                             max_query_pts=16, query_frame_num=1,
                             chunk=16, complete_non_vis=True,
                             min_vis=4, non_vis_thresh=0.5,
                             final_max_pts=32)
        # frame 2 can never become visible: the loop must still terminate
        # (same-frame-failed-twice → final trial → stop) and must have
        # appended extra query rounds
        assert aug.tracks.shape[1] > base.tracks.shape[1]

    def test_real_track_head_end_to_end(self):
        import jax

        images = _textured_clip(S=3, H=32, W=32)
        S = images.shape[0]
        feats = np.random.default_rng(3).random((4, S, 64, 8)).astype(
            np.float32)
        model = TrackHead(dim_in=8, patch_size=4, features=8, iters=1,
                          corr_levels=3, corr_radius=1, hidden_size=16,
                          img_hw=(32, 32), patch_start_idx=0)
        variables = model.init(jax.random.PRNGKey(0),
                               tuple(jnp.zeros((1, S, 64, 8))
                                     for _ in range(4)),
                               jnp.zeros((1, 4, 2)))
        out = predict_tracks(model, variables, images, feats,
                             max_query_pts=16, query_frame_num=2,
                             chunk=8, complete_non_vis=False)
        assert np.isfinite(out.tracks).all()
        assert ((out.vis_scores >= 0) & (out.vis_scores <= 1)).all()


def _synthetic_scene(N=3, P=12, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, 0.5, (P, 3)) + np.array([0.0, 0.0, 5.0])
    K = np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1.0]])
    extr, intr, tracks = [], [], []
    for i in range(N):
        R = np.eye(3)
        t = np.array([0.2 * i, 0.0, 0.0])
        E = np.concatenate([R, t[:, None]], axis=1)
        cam = pts @ R.T + t
        uv = (cam @ K.T)
        uv = uv[:, :2] / uv[:, 2:3]
        extr.append(E)
        intr.append(K)
        tracks.append(uv)
    return pts, np.stack(extr), np.stack(intr), np.stack(tracks)


class TestReconstruction:
    def test_exact_tracks_all_inliers(self):
        pts, extr, intr, tracks = _synthetic_scene()
        recon, valid = build_reconstruction(
            pts, extr, intr, tracks, image_size=(64, 64),
            max_reproj_error=2.0, min_inlier_per_frame=2)
        assert recon is not None and valid.all()
        assert len(recon.points3d) == len(pts)
        for pt in recon.points3d.values():
            assert len(pt.track) == 3
        img = recon.images[1]
        assert img.xys.shape == (len(pts), 2)
        # reciprocal indexing: track elements point at the right Point2D
        for pid, pt in recon.points3d.items():
            for iid, p2d_idx in pt.track:
                assert recon.images[iid].point3d_ids[p2d_idx] == pid

    def test_outlier_observation_masked(self):
        pts, extr, intr, tracks = _synthetic_scene()
        tracks = tracks.copy()
        tracks[1, 0] += 50.0  # frame 1 observation of point 0 is way off
        recon, valid = build_reconstruction(
            pts, extr, intr, tracks, image_size=(64, 64),
            max_reproj_error=2.0, min_inlier_per_frame=2)
        assert valid[0]  # still ≥2 inlier views
        pt0 = recon.points3d[1]
        assert len(pt0.track) == 2
        assert all(iid != 2 for iid, _ in pt0.track)  # frame 1 is image_id 2

    def test_behind_camera_fails_gate(self):
        pts, extr, intr, tracks = _synthetic_scene()
        pts = pts.copy()
        pts[3, 2] = -5.0  # behind every camera
        recon, valid = build_reconstruction(
            pts, extr, intr, tracks, image_size=(64, 64),
            max_reproj_error=1e9,  # only the z>0 gate can reject
            min_inlier_per_frame=2)
        assert not valid[3]

    def test_min_inlier_skip(self):
        pts, extr, intr, tracks = _synthetic_scene()
        recon, valid = build_reconstruction(
            pts, extr, intr, tracks, image_size=(64, 64),
            max_reproj_error=2.0, min_inlier_per_frame=10 ** 6)
        assert recon is None and valid is None

    def test_text_roundtrip_and_arrays(self, tmp_path):
        pts, extr, intr, tracks = _synthetic_scene()
        recon, _ = build_reconstruction(
            pts, extr, intr, tracks, image_size=(64, 64),
            max_reproj_error=2.0, min_inlier_per_frame=2,
            points_rgb=np.full((len(pts), 3), 7, np.uint8))
        out = write_reconstruction_text(recon, tmp_path / "sparse")
        quats, ts, names = read_colmap_images_txt(out / "images.txt")
        assert len(names) == 3
        np.testing.assert_allclose(ts, extr[:, :, 3], atol=1e-6)
        # points3D.txt carries TRACK entries
        lines = [ln for ln in (out / "points3D.txt").read_text().splitlines()
                 if not ln.startswith("#")]
        assert len(lines) == len(pts)
        assert len(lines[0].split()) == 8 + 2 * 3  # 3 track elements

        p3d, extr2, intr2 = reconstruction_to_arrays(recon)
        np.testing.assert_allclose(p3d, pts, atol=1e-6)
        np.testing.assert_allclose(extr2, extr, atol=1e-6)
        np.testing.assert_allclose(intr2[:, 0, 0],
                                   (intr[:, 0, 0] + intr[:, 1, 1]) / 2)

    def test_shared_camera(self):
        pts, extr, intr, tracks = _synthetic_scene()
        recon, _ = build_reconstruction(
            pts, extr, intr, tracks, image_size=(64, 64),
            max_reproj_error=2.0, shared_camera=True,
            camera_type="PINHOLE", min_inlier_per_frame=2)
        assert len(recon.cameras) == 1
        assert recon.cameras[1].params.shape == (4,)
