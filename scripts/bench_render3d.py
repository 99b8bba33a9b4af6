"""Offscreen 3D renderer throughput (720p BEV scene) on one chip.

Honest timing: all T frames render inside ONE jit with a chained data
dependency (each frame's keypoints are perturbed by an epsilon of the
previous frame's pixel sum), and the wall clock closes over a host
readback of the final accumulator (CLAUDE.md honest-timing rule).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from skix.vis.render3d import (COCO_EDGES, intrinsics_from_fov, look_at,
                               make_box, make_icosphere, flatten_mesh,
                               render_frame)


def build_scene(H, W, kp_radius=0.3, subdiv=1):
    gv, gt = make_box((20.0, 0.01, 30.0), (-10.0, -0.01, 0.0))
    ground = flatten_mesh(gv, gt)
    gcol = np.full((len(ground), 3), 0.92, np.float32)
    sv, st = make_icosphere(kp_radius, subdiv)
    sphere = flatten_mesh(sv, st)
    K = intrinsics_from_fov(60.0, H, W)
    R, eye = look_at((0.0, 25.0, 10.0), (0.0, 0.0, 10.0), (0.0, 0.0, -1.0))
    return ground, gcol, sphere, np.asarray(R), np.asarray(eye), K


def bench_impostor(H, W, T=16, chunk=64):
    ground, gcol, _, R, eye, K = build_scene(H, W)
    J = 17
    rng = np.random.default_rng(0)
    kpts_all = np.zeros((T, J, 3), np.float32)
    kpts_all[..., 0] = rng.normal(0, 0.4, (T, J))
    kpts_all[..., 1] = rng.normal(1.2, 0.2, (T, J))
    kpts_all[..., 2] = rng.normal(10.0, 0.5, (T, J))
    edges = np.asarray(COCO_EDGES, np.int32)
    segc = np.tile(np.array([[0.0, 1, 0]], np.float32), (len(edges), 1))
    pcol = np.tile(np.array([[1.0, 0, 0]], np.float32), (J, 1))
    prad = np.full((J,), 0.3, np.float32)

    @jax.jit
    def run(kpts_seq):
        def step(acc, kpts):
            k = kpts + 1e-12 * acc
            color, _ = render_frame(
                jnp.asarray(ground), jnp.asarray(gcol),
                jnp.ones((len(ground),), bool), k[edges],
                jnp.asarray(segc), jnp.ones((len(edges),), bool),
                jnp.asarray(R), jnp.asarray(eye), jnp.asarray(K),
                height=H, width=W, chunk=chunk,
                point_centers=k, point_radii=jnp.asarray(prad),
                point_colors=jnp.asarray(pcol),
                point_valid=jnp.ones((J,), bool))
            return jnp.sum(color), color[0, 0]
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), kpts_seq)
        return acc

    x = jnp.asarray(kpts_all)
    float(run(x))
    t0 = time.time()
    float(run(x))
    dt = (time.time() - t0) / T
    print(f"{W}x{H} impostor ({len(ground)} tris + {J} splats): "
          f"{dt * 1000:.2f} ms/frame = {1 / dt:.1f} fps", flush=True)


def bench(H, W, T=16, chunk=64, subdiv=1):
    ground, gcol, sphere, R, eye, K = build_scene(H, W, subdiv=subdiv)
    J = 17
    rng = np.random.default_rng(0)
    kpts_all = np.zeros((T, J, 3), np.float32)
    kpts_all[..., 0] = rng.normal(0, 0.4, (T, J))
    kpts_all[..., 1] = rng.normal(1.2, 0.2, (T, J))
    kpts_all[..., 2] = rng.normal(10.0, 0.5, (T, J))
    edges = np.asarray(COCO_EDGES, np.int32)
    S = len(sphere)
    scol = np.tile(np.array([[1.0, 0, 0]], np.float32), (J * S, 1))
    segc = np.tile(np.array([[0.0, 1, 0]], np.float32), (len(edges), 1))
    n_tri = len(ground) + J * S

    @jax.jit
    def run(kpts_seq):
        def step(acc, kpts):
            k = kpts + 1e-12 * acc
            inst = (jnp.asarray(sphere)[None] + k[:, None, None, :]
                    ).reshape(-1, 3, 3)
            tv = jnp.concatenate([jnp.asarray(ground), inst])
            tc = jnp.concatenate([jnp.asarray(gcol), jnp.asarray(scol)])
            segs = k[edges]
            color, _ = render_frame(
                tv, tc, jnp.ones((len(tv),), bool), segs,
                jnp.asarray(segc), jnp.ones((len(edges),), bool),
                jnp.asarray(R), jnp.asarray(eye), jnp.asarray(K),
                height=H, width=W, chunk=chunk)
            return jnp.sum(color), color[0, 0]
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), kpts_seq)
        return acc

    x = jnp.asarray(kpts_all)
    float(run(x))                       # compile + warm up (host readback)
    t0 = time.time()
    float(run(x))
    dt = (time.time() - t0) / T
    print(f"{W}x{H} subdiv={subdiv} ({n_tri} tris, chunk {chunk}): "
          f"{dt * 1000:.2f} ms/frame = {1 / dt:.1f} fps", flush=True)


if __name__ == "__main__":
    bench_impostor(720, 1280)
    bench(720, 1280, subdiv=1)
    bench(720, 1280, subdiv=0)
    bench(360, 640, subdiv=1)
