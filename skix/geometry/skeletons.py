"""Skeleton metadata and cross-format keypoint conversion (COCO/H36M/MHR-70).

Index conventions match the reference so downstream outputs are comparable:
- COCO-17 / H36M-17 orders: reference VideoPose3D/coco_hm36.py:28-48.
- H36M bone hierarchy: reference VideoPose3D/common/custom_dataset.py:15.
- COCO bones used for bone-length losses: reference bundle_adjustment/loss.py:118.
- MHR-70: first 70 keypoints of the Momentum Human Rig
  (reference bundle_adjustment/metadata/mhr70.py).

All conversion functions are jnp and shape-polymorphic over leading axes:
``(..., J, C)`` in, ``(..., J', C)`` out — vmap/jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# COCO-17
# --------------------------------------------------------------------------
COCO_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
)
COCO = {n.upper(): i for i, n in enumerate(
    ("nose", "l_eye", "r_eye", "l_ear", "r_ear", "l_sho", "r_sho", "l_elb",
     "r_elb", "l_wri", "r_wri", "l_hip", "r_hip", "l_kne", "r_kne", "l_ank",
     "r_ank"))}

# COCO skeleton edges (drawing + bone losses; reference
# prepare_dataset/model/yolov11_pose.py:21 COCO_SKELETON).
COCO_SKELETON = (
    (0, 1), (0, 2), (1, 3), (2, 4),
    (5, 6), (5, 7), (7, 9), (6, 8), (8, 10),
    (5, 11), (6, 12), (11, 12),
    (11, 13), (13, 15), (12, 14), (14, 16),
)

# 12 bones used by the reference's bone-length loss
# (bundle_adjustment/loss.py:118 BONES): limbs + torso sides.
COCO_BONES_12 = (
    (5, 7), (7, 9), (6, 8), (8, 10),      # arms
    (11, 13), (13, 15), (12, 14), (14, 16),  # legs
    (5, 11), (6, 12), (5, 6), (11, 12),   # torso
)

# --------------------------------------------------------------------------
# H36M-17 (VideoPose3D order)
# --------------------------------------------------------------------------
H36M_NAMES = (
    "pelvis", "right_hip", "right_knee", "right_ankle",
    "left_hip", "left_knee", "left_ankle",
    "spine", "thorax", "neck_nose", "head",
    "left_shoulder", "left_elbow", "left_wrist",
    "right_shoulder", "right_elbow", "right_wrist",
)
H36M = {n.upper(): i for i, n in enumerate(
    ("pel", "r_hip", "r_kne", "r_ank", "l_hip", "l_kne", "l_ank", "spine",
     "thorax", "neck", "head", "l_sho", "l_elb", "l_wri", "r_sho", "r_elb",
     "r_wri"))}

# Parent of each H36M joint (17-joint reduced skeleton with shoulders
# re-parented to thorax, as in reference custom_dataset.py:129-136).
H36M_PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8, 14, 15)

H36M_BONES = tuple((j, p) for j, p in enumerate(H36M_PARENTS) if p >= 0)

# Left/right joint sets for flip augmentation (VideoPose3D convention).
H36M_LEFT = (4, 5, 6, 11, 12, 13)
H36M_RIGHT = (1, 2, 3, 14, 15, 16)
COCO_LEFT = (1, 3, 5, 7, 9, 11, 13, 15)
COCO_RIGHT = (2, 4, 6, 8, 10, 12, 14, 16)

# Torso joints used by the no-extrinsics Umeyama alignment
# (reference VideoPose3D/fuse/fuse.py:16 TORSO_IDX).
H36M_TORSO = (H36M["PEL"], H36M["NECK"], H36M["L_HIP"], H36M["R_HIP"],
              H36M["L_SHO"], H36M["R_SHO"])

# L/R bone pairs for symmetry metrics (fuse_eval semantics).
H36M_SYMMETRIC_BONES = (
    ((4, 5), (1, 2)),    # hip->knee
    ((5, 6), (2, 3)),    # knee->ankle
    ((11, 12), (14, 15)),  # shoulder->elbow
    ((12, 13), (15, 16)),  # elbow->wrist
)


def _mid(a, b):
    return 0.5 * (a + b)


def coco_to_h36m(x, synthesize_head: bool = True):
    """COCO-17 → H36M-17 keypoints; ``x: (..., 17, C)`` with C=2|3.

    Synthesis rules match reference VideoPose3D/coco_hm36.py:74-140:
    pelvis = mid(hips), thorax = mid(shoulders), spine = mid(pelvis, thorax),
    neck = nose, head = nose + 0.5·(nose − mid(eyes)) (or nose).
    """
    x = jnp.asarray(x)
    g = lambda i: x[..., i, :]
    pelvis = _mid(g(COCO["L_HIP"]), g(COCO["R_HIP"]))
    thorax = _mid(g(COCO["L_SHO"]), g(COCO["R_SHO"]))
    spine = _mid(pelvis, thorax)
    nose = g(COCO["NOSE"])
    if synthesize_head:
        eyes_mid = _mid(g(COCO["L_EYE"]), g(COCO["R_EYE"]))
        head = nose + 0.5 * (nose - eyes_mid)
    else:
        head = nose
    parts = [
        pelvis, g(COCO["R_HIP"]), g(COCO["R_KNE"]), g(COCO["R_ANK"]),
        g(COCO["L_HIP"]), g(COCO["L_KNE"]), g(COCO["L_ANK"]),
        spine, thorax, nose, head,
        g(COCO["L_SHO"]), g(COCO["L_ELB"]), g(COCO["L_WRI"]),
        g(COCO["R_SHO"]), g(COCO["R_ELB"]), g(COCO["R_WRI"]),
    ]
    return jnp.stack(parts, axis=-2)


def h36m_to_coco(x):
    """H36M-17 → COCO-17 (best-effort inverse; face joints approximated from
    the head/neck joints, matching reference coco_hm36.py's inverse)."""
    x = jnp.asarray(x)
    g = lambda i: x[..., i, :]
    nose = g(H36M["NECK"])  # H36M "neck/nose" carries the nose position
    head = g(H36M["HEAD"])
    eye = _mid(nose, head)
    parts = [
        nose, eye, eye, head, head,
        g(H36M["L_SHO"]), g(H36M["R_SHO"]), g(H36M["L_ELB"]), g(H36M["R_ELB"]),
        g(H36M["L_WRI"]), g(H36M["R_WRI"]), g(H36M["L_HIP"]), g(H36M["R_HIP"]),
        g(H36M["L_KNE"]), g(H36M["R_KNE"]), g(H36M["L_ANK"]), g(H36M["R_ANK"]),
    ]
    return jnp.stack(parts, axis=-2)


def coco_scores_to_h36m(s):
    """Map per-joint COCO confidences (..., 17) to H36M joints; synthesized
    joints take the min of their source joints' scores."""
    s = jnp.asarray(s)
    g = lambda i: s[..., i]
    pelvis = jnp.minimum(g(COCO["L_HIP"]), g(COCO["R_HIP"]))
    thorax = jnp.minimum(g(COCO["L_SHO"]), g(COCO["R_SHO"]))
    spine = jnp.minimum(pelvis, thorax)
    nose = g(COCO["NOSE"])
    head = jnp.minimum(nose, jnp.minimum(g(COCO["L_EYE"]), g(COCO["R_EYE"])))
    parts = [
        pelvis, g(COCO["R_HIP"]), g(COCO["R_KNE"]), g(COCO["R_ANK"]),
        g(COCO["L_HIP"]), g(COCO["L_KNE"]), g(COCO["L_ANK"]),
        spine, thorax, nose, head,
        g(COCO["L_SHO"]), g(COCO["L_ELB"]), g(COCO["L_WRI"]),
        g(COCO["R_SHO"]), g(COCO["R_ELB"]), g(COCO["R_WRI"]),
    ]
    return jnp.stack(parts, axis=-1)


# --------------------------------------------------------------------------
# MHR-70 (Momentum Human Rig, first 70 keypoints) — used by the SAM-3D-Body
# route, fusion, angle reports and 3D visualization.
# Names/edges follow the reference metadata (bundle_adjustment/metadata/
# mhr70.py, duplicated across 5 modules there; defined once here).
# --------------------------------------------------------------------------
MHR70_NUM_JOINTS = 70

# Body subset indices the biomechanics stage targets (reference
# angle/main.py:34-51 UNITY_MHR70_MAPPING — 15 joints of interest).
MHR70_BODY = {
    "PELVIS": 0,
    "L_HIP": 1, "R_HIP": 2,
    "SPINE": 3,
    "L_KNEE": 4, "R_KNEE": 5,
    "L_ANKLE": 7, "R_ANKLE": 8,
    "NECK": 12,
    "L_SHOULDER": 16, "R_SHOULDER": 17,
    "L_ELBOW": 18, "R_ELBOW": 19,
    "L_WRIST": 20, "R_WRIST": 21,
    "HEAD": 15,
}

# Principal MHR-70 body edges (torso + limbs); hand/face edges omitted from
# drawing defaults just like the reference's visualizer defaults.
MHR70_BODY_EDGES = (
    (0, 1), (0, 2), (0, 3), (3, 12), (12, 15),
    (1, 4), (4, 7), (2, 5), (5, 8),
    (12, 16), (16, 18), (18, 20),
    (12, 17), (17, 19), (19, 21),
)

MHR70_SYMMETRIC_BONES = (
    ((1, 4), (2, 5)),     # hip->knee
    ((4, 7), (5, 8)),     # knee->ankle
    ((16, 18), (17, 19)),  # shoulder->elbow
    ((18, 20), (19, 21)),  # elbow->wrist
)


def bone_lengths(x, bones):
    """Lengths of ``bones`` (tuple of (i, j)) for ``x: (..., J, 3)`` →
    ``(..., B)``."""
    x = jnp.asarray(x)
    idx = np.asarray(bones)
    return jnp.linalg.norm(x[..., idx[:, 0], :] - x[..., idx[:, 1], :], axis=-1)


def flip_keypoints(x, left, right, axis_dim: int = 0):
    """Mirror keypoints: negate ``axis_dim`` coordinate and swap L/R joints.
    ``x: (..., J, C)``. Used for train/test-time flip augmentation
    (reference VideoPose3D/run.py:979-986)."""
    x = jnp.asarray(x)
    sign = np.ones(x.shape[-1], dtype=x.dtype)
    sign[axis_dim] = -1
    x = x * jnp.asarray(sign)
    perm = np.arange(x.shape[-2])
    perm[list(left)] = right
    perm[list(right)] = left
    return x[..., perm, :]
