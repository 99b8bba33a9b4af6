"""Software 3D rasterizer vs hand-computed oracles (reference capability:
front_side/o3d_bev_video_robust.py offscreen BEV skeleton videos)."""

import numpy as np
import pytest

import jax.numpy as jnp

from skix.vis.render3d import (BevVideoRenderer, BevView, COCO_EDGES,
                               intrinsics_from_fov, look_at, make_box,
                               make_icosphere, render_frame)

H, W = 96, 128
BG = (1.0, 1.0, 1.0)


def _cam(eye=(0.0, 0.0, -5.0), target=(0.0, 0.0, 0.0), up=(0.0, -1.0, 0.0)):
    R, e = look_at(eye, target, up)
    K = intrinsics_from_fov(60.0, H, W)
    return np.asarray(R), np.asarray(e), K


def _render(tris, cols, segs=None, seg_cols=None, cam=None, **kw):
    cam = cam or _cam()
    tris = np.asarray(tris, np.float32).reshape(-1, 3, 3)
    cols = np.asarray(cols, np.float32).reshape(-1, 3)
    if segs is None:
        segs = np.zeros((1, 2, 3), np.float32)
        seg_cols = np.zeros((1, 3), np.float32)
        seg_ok = np.zeros((1,), bool)
    else:
        segs = np.asarray(segs, np.float32).reshape(-1, 2, 3)
        seg_cols = np.asarray(seg_cols, np.float32).reshape(-1, 3)
        seg_ok = np.ones((len(segs),), bool)
    color, depth = render_frame(
        jnp.asarray(tris), jnp.asarray(cols),
        jnp.ones((len(tris),), bool), jnp.asarray(segs),
        jnp.asarray(seg_cols), jnp.asarray(seg_ok),
        *(jnp.asarray(c) for c in cam), height=H, width=W, chunk=8, **kw)
    return np.asarray(color), np.asarray(depth)


class TestMeshes:
    def test_box(self):
        v, t = make_box((2.0, 3.0, 4.0), (-1.0, 0.0, 1.0))
        assert v.shape == (8, 3) and t.shape == (12, 3)
        assert v.min(0).tolist() == [-1.0, 0.0, 1.0]
        assert v.max(0).tolist() == [1.0, 3.0, 5.0]

    def test_icosphere(self):
        v, t = make_icosphere(0.5, subdiv=1)
        assert t.shape == (80, 3)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 0.5,
                                   rtol=1e-5)


class TestRasterizer:
    def test_triangle_covers_center_and_depth(self):
        # big triangle at z=0 facing a camera 5 m away → center pixel
        # colored, depth == 5
        tri = [[[-2, -2, 0], [2, -2, 0], [0, 3, 0]]]
        color, depth = _render(tri, [[0.0, 0.0, 1.0]])
        cy, cx = H // 2, W // 2
        assert depth[cy, cx] == pytest.approx(5.0, rel=1e-3)
        # blue channel dominates; shading keeps it > ambient
        assert color[cy, cx, 2] > 0.3
        assert color[cy, cx, 2] > color[cy, cx, 0]
        # background corner untouched
        np.testing.assert_allclose(color[2, 2], BG)
        assert np.isinf(depth[2, 2])

    def test_zbuffer_orders_triangles(self):
        near = [[-2, -2, -1], [2, -2, -1], [0, 3, -1]]   # z_cam = 4
        far = [[-2, -2, 1], [2, -2, 1], [0, 3, 1]]       # z_cam = 6
        color_nf, depth_nf = _render([near, far],
                                     [[1, 0, 0], [0, 1, 0]])
        color_fn, depth_fn = _render([far, near],
                                     [[0, 1, 0], [1, 0, 0]])
        cy, cx = H // 2, W // 2
        for color, depth in ((color_nf, depth_nf), (color_fn, depth_fn)):
            assert depth[cy, cx] == pytest.approx(4.0, rel=1e-3)
            assert color[cy, cx, 0] > color[cy, cx, 1]   # red (near) wins
        # order independence
        np.testing.assert_allclose(color_nf, color_fn, atol=1e-6)

    def test_behind_camera_culled(self):
        tri = [[[-2, -2, -10], [2, -2, -10], [0, 3, -10]]]  # z_cam = -5
        color, depth = _render(tri, [[1, 0, 0]])
        np.testing.assert_allclose(color, np.ones((H, W, 3)))
        assert np.isinf(depth).all()

    def test_perspective_correct_depth_on_slanted_tri(self):
        # slanted triangle: depth at center interpolates 1/z, not z
        tri = [[[-3, -3, -2], [3, -3, 2], [0, 4, 0]]]
        _, depth = _render(tri, [[1, 1, 0]])
        cy, cx = H // 2, W // 2
        # center ray passes through the plane's centroid region; depth
        # must be strictly between near and far vertex depths
        assert 3.0 < depth[cy, cx] < 7.0

    def test_line_pass_draws_and_z_tests(self):
        # horizontal green segment through the origin, in front of a
        # far blue wall
        wall = [[[-5, -5, 2], [5, -5, 2], [0, 8, 2]]]
        seg = [[[-1.0, 0, 0], [1.0, 0, 0]]]
        color, depth = _render(wall, [[0, 0, 1]], segs=seg,
                               seg_cols=[[0, 1, 0]], line_width=3.0)
        cy, cx = H // 2, W // 2
        assert color[cy, cx, 1] == pytest.approx(1.0)    # unlit line color
        assert depth[cy, cx] == pytest.approx(5.0, rel=1e-2)
        # wall behind the line hides it nowhere; line behind wall would
        wallN = [[[-5, -5, -2], [5, -5, -2], [0, 8, -2]]]
        color2, _ = _render(wallN, [[0, 0, 1]], segs=seg,
                            seg_cols=[[0, 1, 0]], line_width=3.0)
        assert color2[cy, cx, 2] > color2[cy, cx, 1]     # wall wins


class TestBevRenderer:
    def test_video_and_frame_contract(self, tmp_path):
        out = tmp_path / "bev.mp4"
        r = BevVideoRenderer(out, width=W, height=H, fps=10,
                             view=BevView(lookat=(0.0, 0.0, 10.0),
                                          eye_height=25.0),
                             sphere_subdiv=0, chunk=16)
        rng = np.random.default_rng(0)
        base = np.zeros((17, 3))
        base[:, 0] = rng.normal(0, 0.4, 17)
        base[:, 1] = rng.normal(1.2, 0.2, 17)
        base[:, 2] = rng.normal(10.0, 0.5, 17)
        frames = [r.render(base + [0.02 * i, 0, 0.08 * i]) for i in range(3)]
        r.close()
        assert all(f.shape == (H, W, 3) and f.dtype == np.uint8
                   for f in frames)
        assert out.exists() and out.stat().st_size > 0
        import cv2

        cap = cv2.VideoCapture(str(out))
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        assert n == 3

    def test_scene_content(self):
        r = BevVideoRenderer(None, width=W, height=H,
                             view=BevView(lookat=(0.0, 0.0, 10.0),
                                          eye_height=25.0),
                             sphere_subdiv=0, kp_radius=0.5, chunk=16)
        kpts = np.zeros((17, 3))
        kpts[:, 2] = 10.0
        kpts[:, 1] = 1.0
        kpts[5] = [-2.0, 1.0, 10.0]
        kpts[7] = [2.0, 1.0, 10.0]
        bgr = r.render(kpts)
        # ground: gray (equal channels, < 255) over most of the frame
        cy, cx = H // 2, W // 2
        corner = bgr[cy + 10, cx + 20].astype(int)
        assert abs(corner[0] - corner[1]) < 6 and corner[0] < 250
        # green skeleton pixels exist (edge 5-7 spans x=-2..2 at z=10)
        g = bgr[..., 1].astype(int) - bgr[..., 2].astype(int)
        assert (g > 80).sum() > 10
        # red keypoint-sphere pixels exist
        rd = bgr[..., 2].astype(int) - bgr[..., 1].astype(int)
        assert (rd > 80).sum() > 4

    def test_impostor_matches_mesh_silhouette(self):
        # impostor (default) and subdivided mesh spheres agree on where
        # red pixels land and that the ball occludes the ground
        kpts = np.zeros((17, 3))
        kpts[:, 2] = 10.0
        kpts[:, 1] = 1.0
        view = BevView(lookat=(0.0, 0.0, 10.0), eye_height=25.0)
        imgs = {}
        for mode, sub in (("impostor", 0), ("mesh", 2)):
            r = BevVideoRenderer(None, width=W, height=H, view=view,
                                 kp_mode=mode, kp_radius=0.8,
                                 sphere_subdiv=sub, chunk=16)
            imgs[mode] = r.render(kpts)
        for mode in imgs:
            rd = imgs[mode][..., 2].astype(int) - imgs[mode][..., 1]
            assert (rd > 80).sum() > 4, mode
        a = (imgs["impostor"][..., 2].astype(int)
             - imgs["impostor"][..., 1] > 80)
        b = (imgs["mesh"][..., 2].astype(int) - imgs["mesh"][..., 1] > 80)
        # silhouettes overlap on most red pixels
        inter = (a & b).sum()
        assert inter / max(a.sum(), b.sum()) > 0.6

    def test_bad_kp_mode_rejected(self):
        with pytest.raises(ValueError):
            BevVideoRenderer(None, width=W, height=H, kp_mode="wat")

    def test_nonfinite_keypoints_masked(self):
        r = BevVideoRenderer(None, width=W, height=H, sphere_subdiv=0,
                             chunk=16)
        kpts = np.full((17, 3), np.nan)
        bgr = r.render(kpts)       # must not crash; no skeleton drawn
        g = bgr[..., 1].astype(int) - bgr[..., 2].astype(int)
        assert (g > 80).sum() == 0
        rd = bgr[..., 2].astype(int) - bgr[..., 1].astype(int)
        assert (rd > 80).sum() == 0

    def test_rejects_bad_shape(self):
        r = BevVideoRenderer(None, width=W, height=H, chunk=16)
        with pytest.raises(ValueError):
            r.render(np.zeros((17, 2)))

    def test_edges_default(self):
        assert COCO_EDGES[0] == (5, 7) and len(COCO_EDGES) == 12
