"""Offscreen 3D renderer: z-buffered software rasterizer in JAX.

Capability parity with the reference's Open3D BEV video renderer
(front_side/o3d_bev_video_robust.py:86-452): headless offscreen rendering
of a lit ground plane + green skeleton line set + optional red keypoint
spheres under a bird's-eye look-at camera, streamed to an mp4. The
reference needs an OpenGL context (or Open3D's Filament offscreen
backend); this is a from-scratch TPU rasterizer instead:

- **Brute-force edge-function rasterization.** Every (triangle-chunk ×
  pixel) pair is tested; a ``lax.scan`` over fixed-size triangle chunks
  carries the (depth, color) buffers. No bounding-box culling, no
  dynamic shapes — the work is perfectly regular, XLA fuses the whole
  edge-function/barycentric/shading chain into the per-chunk reduction,
  and the scene sizes here (ground + 17 spheres ≈ a few hundred
  triangles) are bandwidth-trivial on one chip.
- **Perspective-correct depth** via screen-linear 1/z interpolation;
  flat Lambertian shading from per-face normals (sun + ambient, the
  reference sets a single sun light, o3d_bev_video_robust.py:307).
- **Thick 3D lines** (the skeleton LineSet with ``line_width``,
  reference :285-286) rasterized as screen-space distance-to-segment
  tests with depth interpolated along the segment and z-tested against
  the triangle pass.
- Both windings are treated as front-facing (Open3D renders the ground
  box from above; no backface culling).

The per-frame render is one jitted call with static shapes — frames of a
clip stream through the SAME executable (no recompile-per-call;
CLAUDE.md jit-cache rule).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# reference o3d_bev_video_robust.py:57-68 (COCO-ish skeleton edge set)
COCO_EDGES: Tuple[Tuple[int, int], ...] = (
    (5, 7), (7, 9), (6, 8), (8, 10), (5, 6), (5, 11), (6, 12),
    (11, 13), (13, 15), (12, 14), (14, 16), (11, 12),
)


# --------------------------------------------------------------------------
# host-side mesh builders (static scene assembly, numpy)
# --------------------------------------------------------------------------

def make_box(extent: Sequence[float],
             origin: Sequence[float] = (0.0, 0.0, 0.0)):
    """Axis-aligned box: min corner at ``origin``, sides ``extent`` —
    o3d ``TriangleMesh.create_box`` convention. Returns (verts (8,3),
    tris (12,3))."""
    ex, ey, ez = [float(v) for v in extent]
    ox, oy, oz = [float(v) for v in origin]
    corners = np.array([[x, y, z] for x in (0, ex) for y in (0, ey)
                        for z in (0, ez)], np.float32)
    corners += np.array([ox, oy, oz], np.float32)
    # index layout: bit2=x, bit1=y, bit0=z
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),   # x- / x+
        (0, 4, 5, 1), (2, 3, 7, 6),   # y- / y+
        (0, 2, 6, 4), (1, 5, 7, 3),   # z- / z+
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append((a, b, c))
        tris.append((a, c, d))
    return corners, np.asarray(tris, np.int32)


def make_icosphere(radius: float = 1.0, subdiv: int = 1):
    """Icosahedron subdivided ``subdiv`` times and normalized to
    ``radius`` (20·4**subdiv triangles)."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
    ], np.float32)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int32)
    verts = [tuple(x) for x in (v / np.linalg.norm(v, axis=1, keepdims=True))]
    faces = [tuple(x) for x in f]
    for _ in range(subdiv):
        cache: dict = {}
        new_faces = []

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = np.asarray(verts[i]) + np.asarray(verts[j])
                m = m / np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(tuple(m))
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc),
                          (ab, bc, ca)]
        faces = new_faces
    return (np.asarray(verts, np.float32) * float(radius),
            np.asarray(faces, np.int32))


def flatten_mesh(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """(V,3) + (N,3) indices → per-triangle vertex array (N,3,3)."""
    return np.asarray(verts, np.float32)[np.asarray(tris, np.int64)]


# --------------------------------------------------------------------------
# camera
# --------------------------------------------------------------------------

def look_at(eye, target, up):
    """World→camera look-at (OpenCV convention: x right, y down in the
    image, z forward). Returns (R (3,3), eye (3,)): X_cam = R @ (X-eye)."""
    eye = jnp.asarray(eye, jnp.float32)
    fwd = jnp.asarray(target, jnp.float32) - eye
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-9)
    up = jnp.asarray(up, jnp.float32)
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-9)
    down = jnp.cross(fwd, right)
    return jnp.stack([right, down, fwd]), eye


def intrinsics_from_fov(fov_v_deg: float, height: int, width: int):
    """Vertical-FOV pinhole K (o3d offscreen default is 60°)."""
    f = 0.5 * height / np.tan(np.radians(fov_v_deg) / 2.0)
    return np.array([[f, 0, width / 2.0], [0, f, height / 2.0],
                     [0, 0, 1]], np.float32)


# --------------------------------------------------------------------------
# rasterizer core (jit; static shapes)
# --------------------------------------------------------------------------

def _project(pts_w, R, eye, K):
    """(…,3) world → (uv (…,2), z (…,))."""
    pc = (pts_w - eye) @ R.T
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = K[0, 0] * pc[..., 0] / zs + K[0, 2]
    v = K[1, 1] * pc[..., 1] / zs + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "chunk"))
def render_frame(tri_verts, tri_colors, tri_valid, seg_verts, seg_colors,
                 seg_valid, cam_R, cam_eye, K, *, height: int, width: int,
                 chunk: int = 64, background=(1.0, 1.0, 1.0),
                 sun_dir=(0.2, -1.0, 0.2), sun_strength: float = 0.85,
                 ambient: float = 0.35, line_width: float = 3.0,
                 znear: float = 0.05, point_centers=None, point_radii=None,
                 point_colors=None, point_valid=None):
    """Rasterize triangles + thick line segments (+ optional analytic
    sphere impostors) into an (H, W, 3) f32 image in [0, 1].

    tri_verts (N,3,3) world / tri_colors (N,3) / tri_valid (N,) bool;
    seg_verts (M,2,3) / seg_colors (M,3) / seg_valid (M,) bool;
    point_centers (P,3) / point_radii (P,) / point_colors (P,3) /
    point_valid (P,) — spheres drawn as screen-space circles of radius
    ``r·f/z`` at depth ``z−r`` (exact center depth, circular silhouette
    approximation). An impostor costs one (H, W) pass per point instead
    of 20·4**subdiv triangles — the 17-keypoint BEV frame drops from
    116 ms to the triangle floor (see scripts/bench_render3d.py).
    """
    H, W = height, width
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.astype(jnp.float32) + 0.5
    py = ys.astype(jnp.float32) + 0.5

    # ---- flat shading: per-face Lambert (world-space normals) ----
    e1 = tri_verts[:, 1] - tri_verts[:, 0]
    e2 = tri_verts[:, 2] - tri_verts[:, 0]
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    sun = jnp.asarray(sun_dir, jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    lam = jnp.abs(n @ (-sun))          # double-sided, like unculled faces
    shade = jnp.clip(ambient + sun_strength * lam, 0.0, 1.0)
    lit_colors = tri_colors * shade[:, None]

    uv, z = _project(tri_verts, cam_R, cam_eye, K)     # (N,3,2), (N,3)
    ok = tri_valid & jnp.all(z > znear, axis=-1)

    Np = (-tri_verts.shape[0]) % chunk
    pad = lambda a: jnp.pad(a, [(0, Np)] + [(0, 0)] * (a.ndim - 1))
    uv_p, z_p = pad(uv), pad(z)
    col_p = pad(lit_colors)
    ok_p = jnp.pad(ok, (0, Np))

    depth0 = jnp.full((H, W), jnp.inf, jnp.float32)
    color0 = jnp.broadcast_to(
        jnp.asarray(background, jnp.float32), (H, W, 3)).astype(jnp.float32)

    def tri_chunk(buf, args):
        depth, color = buf
        cuv, cz, ccol, cok = args                      # (C,3,2) (C,3) ...
        a, b, c = cuv[:, 0], cuv[:, 1], cuv[:, 2]

        def edge(p, q):
            # E(x,y) = (q-p) × (pix-p), sign = side of edge pq
            return ((q[:, 0] - p[:, 0])[:, None, None]
                    * (py[None] - p[:, 1][:, None, None])
                    - (q[:, 1] - p[:, 1])[:, None, None]
                    * (px[None] - p[:, 0][:, None, None]))

        e0 = edge(b, c)                                # (C,H,W) vs vertex a
        e1_ = edge(c, a)
        e2_ = edge(a, b)
        area = (e0 + e1_ + e2_)
        inside = ((e0 >= 0) & (e1_ >= 0) & (e2_ >= 0)) | \
                 ((e0 <= 0) & (e1_ <= 0) & (e2_ <= 0))
        inside &= jnp.abs(area) > 1e-8
        inside &= cok[:, None, None]
        areaS = jnp.where(jnp.abs(area) < 1e-8, 1e-8, area)
        w0, w1, w2 = e0 / areaS, e1_ / areaS, e2_ / areaS
        inv_z = (w0 * (1.0 / cz[:, 0])[:, None, None]
                 + w1 * (1.0 / cz[:, 1])[:, None, None]
                 + w2 * (1.0 / cz[:, 2])[:, None, None])
        zpix = 1.0 / jnp.maximum(inv_z, 1e-9)          # (C,H,W)
        zpix = jnp.where(inside, zpix, jnp.inf)
        zmin = jnp.min(zpix, axis=0)                   # (H,W)
        win = jnp.argmin(zpix, axis=0)                 # (H,W)
        wcol = ccol[win]                               # (H,W,3)
        closer = zmin < depth
        return ((jnp.where(closer, zmin, depth),
                 jnp.where(closer[..., None], wcol, color)), None)

    nsteps = uv_p.shape[0] // chunk
    (depth, color), _ = jax.lax.scan(
        tri_chunk, (depth0, color0),
        (uv_p.reshape(nsteps, chunk, 3, 2), z_p.reshape(nsteps, chunk, 3),
         col_p.reshape(nsteps, chunk, 3), ok_p.reshape(nsteps, chunk)))

    # ---- thick line pass (screen-space distance to segment, z-tested) --
    if seg_verts.shape[0]:
        suv, sz = _project(seg_verts, cam_R, cam_eye, K)   # (M,2,2),(M,2)
        sok = seg_valid & jnp.all(sz > znear, axis=-1)
        p0, p1 = suv[:, 0], suv[:, 1]                      # (M,2)
        d = p1 - p0
        len2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-8)  # (M,)
        relx = px[None] - p0[:, 0][:, None, None]
        rely = py[None] - p0[:, 1][:, None, None]
        t = ((relx * d[:, 0][:, None, None]
              + rely * d[:, 1][:, None, None]) / len2[:, None, None])
        t = jnp.clip(t, 0.0, 1.0)
        dx = relx - t * d[:, 0][:, None, None]
        dy = rely - t * d[:, 1][:, None, None]
        dist2 = dx * dx + dy * dy                          # (M,H,W)
        on = (dist2 <= (line_width / 2.0) ** 2) & sok[:, None, None]
        inv_z = ((1.0 - t) * (1.0 / sz[:, 0])[:, None, None]
                 + t * (1.0 / sz[:, 1])[:, None, None])
        zl = 1.0 / jnp.maximum(inv_z, 1e-9)
        # small bias so coplanar lines win against their own surface
        zl = jnp.where(on, zl * (1.0 - 1e-3), jnp.inf)
        zlmin = jnp.min(zl, axis=0)
        lwin = jnp.argmin(zl, axis=0)
        lcol = seg_colors[lwin]
        closer = zlmin < depth
        depth = jnp.where(closer, zlmin, depth)
        color = jnp.where(closer[..., None], lcol, color)

    # ---- analytic sphere impostor pass -------------------------------
    if point_centers is not None and point_centers.shape[0]:
        pc = (point_centers - cam_eye) @ cam_R.T          # (P,3) camera
        zc = pc[:, 2]
        pok = point_valid & (zc > znear)
        zs = jnp.where(jnp.abs(zc) < 1e-6, 1e-6, zc)
        cu = K[0, 0] * pc[:, 0] / zs + K[0, 2]
        cv = K[1, 1] * pc[:, 1] / zs + K[1, 2]
        rpx = point_radii * K[1, 1] / zs                  # screen radius
        dx = px[None] - cu[:, None, None]
        dy = py[None] - cv[:, None, None]
        d2 = dx * dx + dy * dy                            # (P,H,W)
        on = (d2 <= (rpx ** 2)[:, None, None]) & pok[:, None, None]
        # spherical depth bulge: front surface of the ball
        bulge = jnp.sqrt(jnp.maximum(
            (point_radii ** 2)[:, None, None]
            * (1.0 - d2 / jnp.maximum((rpx ** 2)[:, None, None], 1e-9)),
            0.0))
        zp = jnp.where(on, zc[:, None, None] - bulge, jnp.inf)
        # lit like a sun-facing surface scaled by the spherical falloff
        shade_p = jnp.clip(
            ambient + sun_strength
            * jnp.sqrt(jnp.maximum(
                1.0 - d2 / jnp.maximum((rpx ** 2)[:, None, None], 1e-9),
                0.0)), 0.0, 1.0)                          # (P,H,W)
        zpmin = jnp.min(zp, axis=0)
        pwin = jnp.argmin(zp, axis=0)
        hw_idx = (pwin, ys, xs)
        pcol = point_colors[pwin] * shade_p[hw_idx][..., None]
        closer = zpmin < depth
        depth = jnp.where(closer, zpmin, depth)
        color = jnp.where(closer[..., None], pcol, color)

    return color, depth


# --------------------------------------------------------------------------
# public renderer (reference Open3DBevVideoRenderer API)
# --------------------------------------------------------------------------

class BevView:
    """BEV look (reference o3d_bev_video_robust.py:69-79)."""

    def __init__(self, lookat=(0.0, 0.0, 10.0), up=(0.0, 0.0, -1.0),
                 eye_height: float = 25.0):
        self.lookat = tuple(float(v) for v in lookat)
        self.up = tuple(float(v) for v in up)
        self.eye_height = float(eye_height)


class BevVideoRenderer:
    """Headless BEV skeleton video renderer — the offscreen backend of
    the reference's ``Open3DBevVideoRenderer`` rebuilt on the JAX
    rasterizer (no GL / no Open3D).

    API parity: ``render((J,3) world kpts) -> BGR uint8 frame`` (also
    written to the mp4), ``render_many``, ``close``, context manager.
    Non-finite keypoints are dropped from spheres and from any edge
    touching them (the reference teleports them out of view,
    o3d_bev_video_robust.py:233-236).
    """

    def __init__(self, out_path, width: int = 1280, height: int = 720,
                 fps: int = 30, edges: Sequence[Tuple[int, int]] = COCO_EDGES,
                 meters_grid: Tuple[float, float] = (20.0, 30.0),
                 grid_origin: Tuple[float, float, float] = (-10.0, -0.01, 0.0),
                 view: Optional[BevView] = None,
                 draw_keypoints: bool = True, kp_radius: float = 0.08,
                 kp_mode: str = "impostor", line_width: float = 3.0,
                 fov_v_deg: float = 60.0, sphere_subdiv: int = 1,
                 mp4_fourcc: str = "mp4v", chunk: int = 64):
        self.width, self.height, self.fps = int(width), int(height), int(fps)
        self.edges = np.asarray(list(edges), np.int32)
        self.view = view or BevView()
        self.draw_keypoints = bool(draw_keypoints)
        self.line_width = float(line_width)
        self.chunk = int(chunk)

        # static scene: lit ground slab (reference :289-294)
        gx, gz = meters_grid
        gv, gt = make_box((gx, 0.01, gz), grid_origin)
        self._ground_tris = flatten_mesh(gv, gt)                 # (12,3,3)
        self._ground_cols = np.full((gt.shape[0], 3), 0.92, np.float32)
        if kp_mode not in ("impostor", "mesh"):
            raise ValueError(f"kp_mode must be impostor|mesh, got {kp_mode}")
        self.kp_mode = kp_mode
        self.kp_radius = float(kp_radius)
        self._sphere_tris = None
        if self.draw_keypoints and kp_mode == "mesh":
            sv, st = make_icosphere(kp_radius, sphere_subdiv)
            self._sphere_tris = flatten_mesh(sv, st)             # (S,3,3)

        K = intrinsics_from_fov(fov_v_deg, self.height, self.width)
        lookat = np.asarray(self.view.lookat, np.float32)
        eye = lookat + np.array([0.0, self.view.eye_height, 0.0], np.float32)
        R, eye = look_at(eye, lookat, self.view.up)
        self._cam = (np.asarray(R, np.float32), np.asarray(eye, np.float32),
                     K)

        self.out_path = Path(out_path) if out_path is not None else None
        self._video = None
        if self.out_path is not None:
            self.out_path.parent.mkdir(parents=True, exist_ok=True)
            import cv2

            self._video = cv2.VideoWriter(
                str(self.out_path), cv2.VideoWriter_fourcc(*mp4_fourcc),
                self.fps, (self.width, self.height))

    def _assemble(self, kpts_world: np.ndarray):
        kpts = np.asarray(kpts_world, np.float32)
        if kpts.ndim != 2 or kpts.shape[1] != 3:
            raise ValueError(f"kpts_world must be (J,3), got {kpts.shape}")
        finite = np.isfinite(kpts).all(axis=1)
        kpts = np.where(finite[:, None], kpts, 0.0).astype(np.float32)

        tris: List[np.ndarray] = [self._ground_tris]
        cols: List[np.ndarray] = [self._ground_cols]
        valid: List[np.ndarray] = [np.ones(len(self._ground_tris), bool)]
        points = None
        if self._sphere_tris is not None:
            S = len(self._sphere_tris)
            inst = (self._sphere_tris[None] + kpts[:, None, None, :])
            tris.append(inst.reshape(-1, 3, 3))
            cols.append(np.tile(np.array([[1.0, 0, 0]], np.float32),
                                (len(kpts) * S, 1)))
            valid.append(np.repeat(finite, S))
        elif self.draw_keypoints:
            points = (kpts,
                      np.full((len(kpts),), self.kp_radius, np.float32),
                      np.tile(np.array([[1.0, 0, 0]], np.float32),
                              (len(kpts), 1)),
                      finite)
        segs = kpts[self.edges]                               # (M,2,3)
        seg_ok = finite[self.edges].all(axis=1)
        seg_cols = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32),
                           (len(self.edges), 1))
        return (np.concatenate(tris), np.concatenate(cols),
                np.concatenate(valid), segs, seg_cols, seg_ok, points)

    def render(self, kpts_world: np.ndarray) -> np.ndarray:
        tv, tc, tok, sv, sc, sok, pts = self._assemble(kpts_world)
        pkw = {}
        if pts is not None:
            pkw = dict(point_centers=jnp.asarray(pts[0]),
                       point_radii=jnp.asarray(pts[1]),
                       point_colors=jnp.asarray(pts[2]),
                       point_valid=jnp.asarray(pts[3]))
        color, _ = render_frame(
            jnp.asarray(tv), jnp.asarray(tc), jnp.asarray(tok),
            jnp.asarray(sv), jnp.asarray(sc), jnp.asarray(sok),
            *(jnp.asarray(c) for c in self._cam),
            height=self.height, width=self.width, chunk=self.chunk,
            line_width=self.line_width, **pkw)
        rgb = np.asarray(jnp.clip(color, 0, 1) * 255.0).astype(np.uint8)
        bgr = rgb[..., ::-1]
        if self._video is not None:
            self._video.write(np.ascontiguousarray(bgr))
        return bgr

    def render_many(self, kpts_seq: Iterable[np.ndarray]) -> None:
        for kpts in kpts_seq:
            self.render(kpts)

    def close(self) -> None:
        if self._video is not None:
            self._video.release()
        self._video = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        self.close()


# reference public name (o3d_bev_video_robust.py:341 — backend selection
# collapses: there is exactly one headless-safe backend here)
Open3DBevVideoRenderer = BevVideoRenderer
