"""Momentum-Human-Rig (MHR) parameterization + forward-kinematics rig.

Replaces round 1's invented sin-basis rig with the real MHR parameter
model (reference sam_3d_body/models/modules/mhr_utils.py:165-392 and
heads/mhr_head.py:36-369):

- **Exact parameter layout.** Body pose: 133 "model params" = 23 3-DoF
  joints (XYZ eulers at scattered indices) + 58 1-DoF hinge angles + 6
  1-DoF translations; continuous network output: 260 = 23·6 (rot6d) +
  58·2 (sin/cos) + 6. Hands: 27 model params per hand over 16 joints with
  DoF pattern (3,1,1)×4 fingers + (2,3,1,1) thumb/wrist; continuous: 54;
  a 54-component PCA (mean + comps) spans both hands' pose space.
  The index tables below are the rig's wiring — configuration data, same
  status as the MHR-70 keypoint metadata.
- **Conversions** cont ↔ model params for body and hand exactly as the
  reference defines them (XYZ-euler ↔ 6D with the same singularity
  branch), parity-tested against the importable reference functions.
- **FK rig.** The reference's actual skeleton/skinning lives in an
  opaque ``torch.jit``/Momentum asset that ships with checkpoints, not in
  the repo. ``MHRRig`` is the TPU-native equivalent: a parameter-transform
  matrix mapping model params onto per-joint 7-DoF (tx ty tz rx ry rz
  log2-scale) local transforms, XYZ-euler FK down the tree, linear-blend
  skinning, and a keypoint regressor ``(K, V+J)`` — every array is data,
  loadable from a converted asset. ``default_rig()`` builds an
  anatomically-correct 70-joint template from the real MHR-70 hierarchy
  (bundle_adjustment/metadata/mhr70.py names) so the full pipeline runs
  and tests end-to-end without the proprietary asset.

All functions are jnp, jit/vmap-safe, differentiable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# parameter-layout tables (reference mhr_utils.py:284-286,388-391 — wiring
# data of the rig, identical by necessity)
# --------------------------------------------------------------------------
BODY_3DOF_ROT_IDXS = np.array([
    (0, 2, 4), (6, 8, 10), (12, 13, 14), (15, 16, 17), (18, 19, 20),
    (21, 22, 23), (24, 25, 26), (27, 28, 29), (34, 35, 36), (37, 38, 39),
    (44, 45, 46), (53, 54, 55), (64, 65, 66), (85, 69, 73), (86, 70, 79),
    (87, 71, 82), (88, 72, 76), (91, 92, 93), (112, 96, 100),
    (113, 97, 106), (114, 98, 109), (115, 99, 103), (130, 131, 132),
], np.int32)
BODY_1DOF_ROT_IDXS = np.array([
    1, 3, 5, 7, 9, 11, 30, 31, 32, 33, 40, 41, 42, 43, 47, 48, 49, 50, 51,
    52, 56, 57, 58, 59, 60, 61, 62, 63, 67, 68, 74, 75, 77, 78, 80, 81, 83,
    84, 89, 90, 94, 95, 101, 102, 104, 105, 107, 108, 110, 111, 116, 117,
    118, 119, 120, 121, 122, 123,
], np.int32)
BODY_1DOF_TRANS_IDXS = np.array([124, 125, 126, 127, 128, 129], np.int32)

NUM_BODY_MODEL_PARAMS = 133
NUM_BODY_CONT = (2 * BODY_3DOF_ROT_IDXS.size + 2 * BODY_1DOF_ROT_IDXS.size
                 + BODY_1DOF_TRANS_IDXS.size)  # 260

# per-hand joint DoF counts, ordered by joint (mhr_utils.py:168)
HAND_DOFS = np.array([3, 1, 1, 3, 1, 1, 3, 1, 1, 3, 1, 1, 2, 3, 1, 1],
                     np.int32)
NUM_HAND_MODEL_PARAMS = int(HAND_DOFS.sum())  # 27
NUM_HAND_CONT = 2 * NUM_HAND_MODEL_PARAMS     # 54

# hand-owned entries of the 133-dim body model params (mhr_utils.py:388)
MHR_PARAM_HAND_IDXS = np.arange(62, 116, dtype=np.int32)
MHR_PARAM_HAND_MASK = np.zeros(133, bool)
MHR_PARAM_HAND_MASK[MHR_PARAM_HAND_IDXS] = True


def _hand_masks():
    cont3 = np.concatenate([np.full(2 * k, k == 3, bool) for k in HAND_DOFS])
    cont1 = np.concatenate(
        [np.full(2 * k, k in (1, 2), bool) for k in HAND_DOFS])
    par3 = np.concatenate([np.full(k, k == 3, bool) for k in HAND_DOFS])
    par1 = np.concatenate([np.full(k, k in (1, 2), bool) for k in HAND_DOFS])
    return cont3, cont1, par3, par1


_HAND_CONT_3DOF, _HAND_CONT_1DOF, _HAND_PAR_3DOF, _HAND_PAR_1DOF = \
    _hand_masks()


# --------------------------------------------------------------------------
# rotation conversions (reference batch6DFromXYZ / batchXYZfrom6D semantics)
# --------------------------------------------------------------------------
def euler_xyz_to_matrix(r):
    """XYZ-Euler ``(..., 3)`` → rotation matrix ``R = Rz(z) Ry(y) Rx(x)``
    (extrinsic x-first; reference batch6DFromXYZ:79 layout)."""
    r = jnp.asarray(r)
    cx, cy, cz = jnp.cos(r[..., 0]), jnp.cos(r[..., 1]), jnp.cos(r[..., 2])
    sx, sy, sz = jnp.sin(r[..., 0]), jnp.sin(r[..., 1]), jnp.sin(r[..., 2])
    row0 = jnp.stack([cy * cz, -cx * sz + sx * sy * cz,
                      sx * sz + cx * sy * cz], axis=-1)
    row1 = jnp.stack([cy * sz, cx * cz + sx * sy * sz,
                      -sx * cz + cx * sy * sz], axis=-1)
    row2 = jnp.stack([-sy, sx * cy, cx * cy], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler_xyz(m):
    """Inverse of :func:`euler_xyz_to_matrix`, with the reference's gimbal
    branch (batchXYZfrom6D:133-151)."""
    m = jnp.asarray(m)
    sy = jnp.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    singular = (sy < 1e-6).astype(m.dtype)
    x = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    y = jnp.arctan2(-m[..., 2, 0], sy)
    z = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    xs = jnp.arctan2(-m[..., 1, 2], m[..., 1, 1])
    zs = jnp.zeros_like(z)
    return jnp.stack([x * (1 - singular) + xs * singular, y,
                      z * (1 - singular) + zs * singular], axis=-1)


def euler_zyx_to_matrix(r):
    """ZYX-intrinsic Euler ``(z, y, x)`` → ``Rz Ry Rx`` — the head's global
    rotation convention (mhr_head.py:295 roma.rotmat_to_euler('ZYX'))."""
    r = jnp.asarray(r)
    return euler_xyz_to_matrix(jnp.stack([r[..., 2], r[..., 1], r[..., 0]],
                                         axis=-1))


def matrix_to_euler_zyx(m):
    e = matrix_to_euler_xyz(m)
    return jnp.stack([e[..., 2], e[..., 1], e[..., 0]], axis=-1)


def rot6d_to_matrix_cols(x):
    """6D (first two matrix COLUMNS) → rotation matrix, reference
    batch9Dfrom6D convention (x = col1 normalized, z = x×y, y = z×x)."""
    x = jnp.asarray(x)
    a1, a2 = x[..., :3], x[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-9)
    b3 = jnp.cross(b1, a2)
    b3 = b3 / (jnp.linalg.norm(b3, axis=-1, keepdims=True) + 1e-9)
    b2 = jnp.cross(b3, b1)
    return jnp.stack([b1, b2, b3], axis=-1)  # columns


def matrix_to_rot6d_cols(R):
    R = jnp.asarray(R)
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def euler_xyz_to_cont6d(r):
    """XYZ-Euler → 6D continuous (reference batch6DFromXYZ:79)."""
    R = euler_xyz_to_matrix(r)
    return matrix_to_rot6d_cols(R)


def cont6d_to_euler_xyz(c):
    return matrix_to_euler_xyz(rot6d_to_matrix_cols(c))


def rotation_angle_difference(A, B):
    """Angle (rad) between rotation matrices ``(..., 3, 3)`` (reference
    mhr_utils.py:16)."""
    R = jnp.einsum("...ij,...kj->...ik", jnp.asarray(A), jnp.asarray(B))
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def fix_wrist_euler(wrist_xzy, limits_x=(-2.2, 1.0), limits_z=(-2.2, 1.5),
                    limits_y=(-1.2, 1.5)):
    """Resolve the ±π euler ambiguity toward joint limits (reference
    mhr_utils.py:38). ``wrist_xzy (..., 3)`` = (X, Z, Y) angles."""
    w = jnp.asarray(wrist_xzy)
    x, z, y = w[..., 0], w[..., 1], w[..., 2]
    x_alt = jnp.arctan2(jnp.sin(x + jnp.pi), jnp.cos(x + jnp.pi))
    z_alt = jnp.arctan2(jnp.sin(-(z + jnp.pi)), jnp.cos(-(z + jnp.pi)))
    y_alt = jnp.arctan2(jnp.sin(y + jnp.pi), jnp.cos(y + jnp.pi))

    def viol(val, lim):
        return (jnp.clip(lim[0] - val, 0) ** 2
                + jnp.clip(val - lim[1], 0) ** 2)

    v_orig = viol(x, limits_x) + viol(z, limits_z) + viol(y, limits_y)
    v_alt = viol(x_alt, limits_x) + viol(z_alt, limits_z) + viol(y_alt,
                                                                 limits_y)
    alt = jnp.stack([x_alt, z_alt, y_alt], axis=-1)
    return jnp.where((v_alt < v_orig)[..., None], alt, w)


# --------------------------------------------------------------------------
# cont ↔ model params (body / hand)
# --------------------------------------------------------------------------
def cont_to_model_params_body(cont):
    """``(..., 260)`` continuous → ``(..., 133)`` model params (reference
    compact_cont_to_model_params_body:321)."""
    cont = jnp.asarray(cont)
    n3 = BODY_3DOF_ROT_IDXS.shape[0]
    n1 = BODY_1DOF_ROT_IDXS.shape[0]
    c3 = cont[..., :6 * n3].reshape(*cont.shape[:-1], n3, 6)
    c1 = cont[..., 6 * n3:6 * n3 + 2 * n1].reshape(*cont.shape[:-1], n1, 2)
    ct = cont[..., 6 * n3 + 2 * n1:]
    e3 = cont6d_to_euler_xyz(c3)                      # (..., n3, 3)
    e1 = jnp.arctan2(c1[..., 0], c1[..., 1])          # (..., n1)
    out = jnp.zeros((*cont.shape[:-1], NUM_BODY_MODEL_PARAMS), cont.dtype)
    out = out.at[..., BODY_3DOF_ROT_IDXS.reshape(-1)].set(
        e3.reshape(*cont.shape[:-1], -1))
    out = out.at[..., BODY_1DOF_ROT_IDXS].set(e1)
    out = out.at[..., BODY_1DOF_TRANS_IDXS].set(ct)
    return out


def model_params_to_cont_body(params):
    """Inverse (reference compact_model_params_to_cont_body:356)."""
    params = jnp.asarray(params)
    e3 = params[..., BODY_3DOF_ROT_IDXS.reshape(-1)].reshape(
        *params.shape[:-1], -1, 3)
    e1 = params[..., BODY_1DOF_ROT_IDXS]
    ct = params[..., BODY_1DOF_TRANS_IDXS]
    c3 = euler_xyz_to_cont6d(e3).reshape(*params.shape[:-1], -1)
    c1 = jnp.stack([jnp.sin(e1), jnp.cos(e1)], axis=-1).reshape(
        *params.shape[:-1], -1)
    return jnp.concatenate([c3, c1, ct], axis=-1)


def cont_to_model_params_hand(cont):
    """``(..., 54)`` → ``(..., 27)`` (reference
    compact_cont_to_model_params_hand:165)."""
    cont = jnp.asarray(cont)
    c3 = cont[..., _HAND_CONT_3DOF].reshape(*cont.shape[:-1], -1, 6)
    c1 = cont[..., _HAND_CONT_1DOF].reshape(*cont.shape[:-1], -1, 2)
    e3 = cont6d_to_euler_xyz(c3).reshape(*cont.shape[:-1], -1)
    e1 = jnp.arctan2(c1[..., 0], c1[..., 1])
    out = jnp.zeros((*cont.shape[:-1], NUM_HAND_MODEL_PARAMS), cont.dtype)
    out = out.at[..., np.where(_HAND_PAR_3DOF)[0]].set(e3)
    out = out.at[..., np.where(_HAND_PAR_1DOF)[0]].set(e1)
    return out


def model_params_to_cont_hand(params):
    params = jnp.asarray(params)
    e3 = params[..., np.where(_HAND_PAR_3DOF)[0]].reshape(
        *params.shape[:-1], -1, 3)
    e1 = params[..., np.where(_HAND_PAR_1DOF)[0]]
    c3 = euler_xyz_to_cont6d(e3).reshape(*params.shape[:-1], -1)
    c1 = jnp.stack([jnp.sin(e1), jnp.cos(e1)], axis=-1).reshape(
        *params.shape[:-1], -1)
    out = jnp.zeros((*params.shape[:-1], NUM_HAND_CONT), params.dtype)
    out = out.at[..., np.where(_HAND_CONT_3DOF)[0]].set(c3)
    out = out.at[..., np.where(_HAND_CONT_1DOF)[0]].set(c1)
    return out


def blend_hand_pose(hand_params_pca, hand_pose_mean, hand_pose_comps):
    """PCA hand pose ``(..., 54)`` → model params ``(..., 27)`` via
    ``mean + params @ comps`` then cont→model (mhr_head.py:148-155)."""
    cont = hand_pose_mean + jnp.einsum("...a,ab->...b",
                                       jnp.asarray(hand_params_pca),
                                       jnp.asarray(hand_pose_comps))
    return cont_to_model_params_hand(cont)


# --------------------------------------------------------------------------
# FK rig
# --------------------------------------------------------------------------
class MHRRig(NamedTuple):
    """Momentum-style skeleton + skinning, all arrays plain data.

    ``param_transform (J·7, P)`` maps the model-parameter vector onto
    per-joint DoFs ``[tx ty tz rx ry rz s]`` (s = log2 uniform scale).
    ``offsets`` are rest local translations (rig units, cm like the
    reference: outputs are /100 into meters). ``pre_rotation (J, 3, 3)``
    composes before the parametrized XYZ-euler rotation.
    ``keypoint_mapping (K, V+J)`` regresses keypoints from
    ``[vertices; joint positions]`` (mhr_head.py:96,241-251).
    """

    parents: np.ndarray          # (J,) int, -1 for root
    offsets: np.ndarray          # (J, 3) f32
    pre_rotation: np.ndarray     # (J, 3, 3) f32
    param_transform: np.ndarray  # (J*7, P) f32
    rest_verts: np.ndarray       # (V, 3) f32
    skin_weights: np.ndarray     # (V, K_influences) f32
    skin_joints: np.ndarray      # (V, K_influences) int
    keypoint_mapping: np.ndarray  # (K, V + J) f32
    # euler-angle order the rig's GLOBAL-rotation params expect: the
    # reference head emits roma.rotmat_to_euler('ZYX', ·) for the momentum
    # asset (mhr_head.py:295); the default template wires root DoFs
    # through the same XYZ euler as every other joint
    root_euler_order: str = "xyz"

    @property
    def num_joints(self) -> int:
        return self.parents.shape[0]

    @property
    def num_params(self) -> int:
        return self.param_transform.shape[1]


def rig_forward(rig: MHRRig, model_params, shape_offsets=None,
                return_verts: bool = True):
    """FK + LBS. ``model_params (..., P)`` → dict with ``joints (..., J, 3)``
    world joint positions, ``joint_rots (..., J, 3, 3)`` world rotations,
    ``verts (..., V, 3)`` posed vertices (if ``return_verts``), and
    ``keypoints (..., K, 3)``. ``shape_offsets (..., V, 3)`` optional
    blendshape displacement of the rest vertices."""
    model_params = jnp.asarray(model_params)
    batch = model_params.shape[:-1]
    J = rig.num_joints
    dofs = jnp.einsum("...p,dp->...d", model_params,
                      jnp.asarray(rig.param_transform))
    dofs = dofs.reshape(*batch, J, 7)
    t = dofs[..., :3]
    R_local = jnp.einsum("jab,...jbc->...jac", jnp.asarray(rig.pre_rotation),
                         euler_xyz_to_matrix(dofs[..., 3:6]))
    s = 2.0 ** dofs[..., 6]

    offsets = jnp.broadcast_to(jnp.asarray(rig.offsets), (*batch, J, 3))
    parents = rig.parents

    # FK down the tree (static unrolled loop over joints in topo order;
    # world scale accumulates hierarchically like Momentum)
    order = _topo_order(parents)
    Rw = [None] * J
    tw = [None] * J
    sw = [None] * J
    for j in order:
        p = int(parents[j])
        local_t = offsets[..., j, :] + t[..., j, :]
        if p < 0:
            Rw[j] = R_local[..., j, :, :]
            tw[j] = local_t
            sw[j] = s[..., j]
        else:
            tw[j] = tw[p] + sw[p][..., None] * jnp.einsum(
                "...ab,...b->...a", Rw[p], local_t)
            Rw[j] = jnp.einsum("...ab,...bc->...ac", Rw[p],
                               R_local[..., j, :, :])
            sw[j] = sw[p] * s[..., j]
    joints = jnp.stack(tw, axis=-2)
    joint_rots = jnp.stack(Rw, axis=-3)
    joint_scales = jnp.stack(sw, axis=-1)

    out = {"joints": joints, "joint_rots": joint_rots,
           "joint_scales": joint_scales}
    if return_verts and rig.rest_verts.size:
        rest = jnp.asarray(rig.rest_verts)
        if shape_offsets is not None:
            rest = rest + shape_offsets
        else:
            rest = jnp.broadcast_to(rest, (*batch, *rest.shape[-2:]))
        sj = jnp.asarray(rig.skin_joints)
        sweights = jnp.asarray(rig.skin_weights)
        rest_joint_pos = _rest_joint_positions(rig)
        # per-influence transform of the rest vertex
        vj = rest[..., :, None, :] - rest_joint_pos[sj]  # (..., V, K, 3)
        Rj = joint_rots[..., sj, :, :]                   # (..., V, K, 3, 3)
        tj = joints[..., sj, :]
        scj = joint_scales[..., sj]
        posed = jnp.einsum("...vkab,...vkb->...vka", Rj,
                           vj * scj[..., None]) + tj
        out["verts"] = jnp.sum(posed * sweights[..., None], axis=-2)
    if rig.keypoint_mapping.size:
        km = jnp.asarray(rig.keypoint_mapping)
        if "verts" in out:
            vj_cat = jnp.concatenate([out["verts"], joints], axis=-2)
        else:  # joints-only regression (vert columns dropped)
            km = km[:, -J:]
            vj_cat = joints
        out["keypoints"] = jnp.einsum("kn,...nd->...kd", km, vj_cat)
    return out


def _topo_order(parents: np.ndarray):
    depth = np.zeros(len(parents), np.int32)
    for j in range(len(parents)):
        d, a = 0, j
        while parents[a] >= 0:
            a = int(parents[a])
            d += 1
        depth[j] = d
    return list(np.argsort(depth, kind="stable"))


def _rest_joint_positions(rig: MHRRig) -> jnp.ndarray:
    """Rest-pose world joint positions (zero params)."""
    pos = np.zeros((rig.num_joints, 3), np.float32)
    R = np.zeros((rig.num_joints, 3, 3), np.float32)
    for j in _topo_order(rig.parents):
        p = int(rig.parents[j])
        if p < 0:
            pos[j] = rig.offsets[j]
            R[j] = rig.pre_rotation[j]
        else:
            pos[j] = pos[p] + R[p] @ rig.offsets[j]
            R[j] = R[p] @ rig.pre_rotation[j]
    return jnp.asarray(pos)


# --------------------------------------------------------------------------
# default 70-joint template (real MHR-70 hierarchy; synthetic numerics)
# --------------------------------------------------------------------------
# anatomical parent of each MHR-70 keypoint, by the reference's names
# (bundle_adjustment/metadata/mhr70.py): torso root = pelvis-midpoint
# proxy at left/right-hip parent "neck"-rooted chains etc. Root: 69 (neck)
# is NOT the root — we root at a virtual pelvis = joint 9/10 parent; to
# keep exactly 70 joints, left-hip(9) is the root and right-hip hangs off
# it, matching how the reference's UNITY mapping treats the hip line.
MHR70_PARENTS = np.array([
    69,  # 0 nose <- neck
    0, 0, 1, 2,          # eyes <- nose, ears <- eyes
    69, 69,              # 5 l-shoulder, 6 r-shoulder <- neck
    5, 6,                # elbows <- shoulders
    -1, 9,               # 9 l-hip (root), 10 r-hip
    9, 10,               # knees <- hips
    11, 12,              # ankles <- knees
    13, 13, 13,          # l big toe, small toe, heel <- l-ankle
    14, 14, 14,          # r foot <- r-ankle
    # right hand (21-40): tips <- first <- second <- third <- wrist(41)
    22, 23, 24, 41,      # thumb: tip<-first<-second<-third<-wrist
    26, 27, 28, 41,      # index
    30, 31, 32, 41,      # middle
    34, 35, 36, 41,      # ring
    38, 39, 40, 41,      # pinky
    8,                   # 41 right wrist <- right elbow
    # left hand (42-61), wrist = 62
    43, 44, 45, 62,
    47, 48, 49, 62,
    51, 52, 53, 62,
    55, 56, 57, 62,
    59, 60, 61, 62,
    7,                   # 62 left wrist <- left elbow
    7, 8,                # olecranons <- elbows
    7, 8,                # cubital fossae <- elbows
    5, 6,                # acromions <- shoulders
    9,                   # 69 neck <- root (spine chain collapsed)
], np.int32)

_T = 0.03  # finger segment length (m-scale template; rig units = cm)


def _default_offsets() -> np.ndarray:
    o = np.zeros((70, 3), np.float32)
    o[9] = (0, 0, 0)                    # root (left hip)
    o[10] = (0.18, 0, 0)                # right hip
    o[69] = (0.09, 0.52, 0)             # neck (from root, centered up)
    o[0] = (0, 0.10, 0.08)              # nose
    o[1], o[2] = (-0.03, 0.03, -0.02), (0.03, 0.03, -0.02)
    o[3], o[4] = (-0.05, 0.0, -0.05), (0.05, 0.0, -0.05)
    o[5], o[6] = (-0.18, -0.02, 0), (0.18, -0.02, 0)
    o[7], o[8] = (-0.28, 0, 0), (0.28, 0, 0)      # elbows
    o[62], o[41] = (-0.26, 0, 0), (0.26, 0, 0)    # wrists
    o[11], o[12] = (0, -0.44, 0), (0, -0.44, 0)   # knees
    o[13], o[14] = (0, -0.43, 0), (0, -0.43, 0)   # ankles
    o[15], o[16], o[17] = (-0.02, -0.06, 0.14), (-0.06, -0.06, 0.11), \
        (0, -0.07, -0.04)
    o[18], o[19], o[20] = (0.02, -0.06, 0.14), (0.06, -0.06, 0.11), \
        (0, -0.07, -0.04)
    # finger chains: third<-wrist, second<-third, first<-second, tip<-first
    for wrist, base, sgn in ((41, 21, 1), (62, 42, -1)):
        for f in range(5):
            third = base + 4 * f + 3
            lateral = (f - 2) * 0.018
            o[third] = (sgn * 0.08, -0.01, lateral)
            o[third - 1] = (sgn * _T, 0, 0)
            o[third - 2] = (sgn * _T * 0.8, 0, 0)
            o[third - 3] = (sgn * _T * 0.6, 0, 0)
    o[63], o[64] = (-0.03, 0, -0.03), (0.03, 0, -0.03)  # olecranon
    o[65], o[66] = (-0.02, 0, 0.03), (0.02, 0, 0.03)    # cubital fossa
    o[67], o[68] = (-0.04, 0.03, 0), (0.04, 0.03, 0)    # acromion
    return o * 100.0  # rig units are cm (reference divides by 100)


# body model-param index → (template joint, dof) wiring for the default
# template: the 23 3-DoF slots drive the major joints, 1-DoF slots drive
# finger hinges (z-axis), translations drive the root.
_3DOF_JOINTS = [9, 10, 69, 0, 5, 6, 7, 8, 11, 12, 13, 14, 62, 41, 22, 26,
                30, 34, 43, 47, 51, 55, 69]
_1DOF_JOINTS = [21, 23, 24, 25, 27, 28, 29, 31, 32, 33, 35, 36, 37, 39, 40,
                38, 42, 44, 45, 46, 48, 49, 50, 52, 53, 54, 56, 57, 58, 60,
                61, 59, 15, 16, 17, 18, 19, 20, 1, 2, 3, 4, 63, 64, 65, 66,
                67, 68, 23, 24, 27, 31, 35, 39, 44, 48, 52, 56]


def default_rig(num_verts: int = 64) -> MHRRig:
    """70-joint rig over the real MHR-70 hierarchy with a documented
    synthetic parameter wiring and a small synthetic skinned mesh — the
    stand-in until a converted Momentum asset provides the real arrays.

    Model-parameter vector: ``[tx ty tz (root trans, ×10 m), gx gy gz
    (global rot euler), body 130]`` + ``scales 68`` = 204, matching the
    reference's assembly (mhr_head.py:213-221).
    """
    J = 70
    P = 136 + 68
    parents = MHR70_PARENTS
    offsets = _default_offsets()
    pre_rot = np.tile(np.eye(3, dtype=np.float32), (J, 1, 1))

    pt = np.zeros((J * 7, P), np.float32)
    root = 9
    # global translation: params 0..2 (×10 — stored in decimeters·10=m)
    for d in range(3):
        pt[root * 7 + d, d] = 10.0  # → cm: 0.1 m per unit × 100 cm/m / 10
    # global rotation: params 3..5 onto root euler
    for d in range(3):
        pt[root * 7 + 3 + d, 3 + d] = 1.0
    # body params live at 6..135 (130 of the 133; reference truncates :130)
    base = 6
    for slot, joint in enumerate(_3DOF_JOINTS):
        for axis, pidx in enumerate(BODY_3DOF_ROT_IDXS[slot]):
            if pidx < 130 and joint != root:
                pt[joint * 7 + 3 + axis, base + pidx] = 1.0
    for slot, joint in enumerate(_1DOF_JOINTS):
        pidx = BODY_1DOF_ROT_IDXS[slot]
        if pidx < 130:
            pt[joint * 7 + 5, base + pidx] += 1.0  # z-hinge
    for d, pidx in enumerate(BODY_1DOF_TRANS_IDXS[:3]):
        if pidx < 130:
            pt[69 * 7 + d, base + pidx] = 1.0  # neck translations
    # scales: first entry = global log2 scale on root; per-limb scales
    # spread over major joints
    scale_joints = [9, 10, 11, 12, 13, 14, 5, 6, 41, 62, 7, 8, 69, 0]
    for i in range(68):
        j = scale_joints[i % len(scale_joints)]
        pt[j * 7 + 6, 136 + i] = 1.0 / (1 + i // len(scale_joints))

    # synthetic mesh: ring of vertices around each of a few body joints
    rng = np.random.default_rng(0)
    anchor_joints = np.array([9, 10, 69, 5, 6, 7, 8, 11, 12, 13, 14, 0],
                             np.int32)
    rest_j = np.zeros((J, 3), np.float32)
    Rw = np.zeros((J, 3, 3), np.float32)
    for j in _topo_order(parents):
        p = int(parents[j])
        if p < 0:
            rest_j[j] = offsets[j]
            Rw[j] = pre_rot[j]
        else:
            rest_j[j] = rest_j[p] + Rw[p] @ offsets[j]
            Rw[j] = Rw[p] @ pre_rot[j]
    vidx = np.arange(num_verts)
    anchors = anchor_joints[vidx % len(anchor_joints)]
    rest_verts = rest_j[anchors] + rng.normal(0, 4.0,
                                              (num_verts, 3)).astype(
        np.float32)
    skin_joints = np.stack([anchors, parents[anchors].clip(0)], axis=-1)
    skin_weights = np.tile(np.array([[0.8, 0.2]], np.float32),
                           (num_verts, 1))

    # keypoints = joints themselves (identity over the joint block)
    km = np.zeros((70, num_verts + J), np.float32)
    km[np.arange(70), num_verts + np.arange(70)] = 1.0

    return MHRRig(parents=parents, offsets=offsets, pre_rotation=pre_rot,
                  param_transform=pt, rest_verts=rest_verts,
                  skin_weights=skin_weights, skin_joints=skin_joints,
                  keypoint_mapping=km)


# --------------------------------------------------------------------------
# full parameter assembly (mhr_head.py:163-269 semantics)
# --------------------------------------------------------------------------
def assemble_model_params(global_trans, global_rot_euler, body_pose_params,
                          hand_pose_params, scale_params, scale_mean,
                          scale_comps, hand_pose_mean=None,
                          hand_pose_comps=None, hand_joint_idxs_left=None,
                          hand_joint_idxs_right=None):
    """[trans·10, global rot, body(130)] ‖ scales — with optional PCA hand
    drop-in (mhr_head.py:206-221)."""
    body = jnp.asarray(body_pose_params)[..., :130]
    full = jnp.concatenate([jnp.asarray(global_trans) * 10.0,
                            jnp.asarray(global_rot_euler), body], axis=-1)
    if hand_pose_params is not None:
        nh = NUM_HAND_CONT
        left = blend_hand_pose(hand_pose_params[..., :nh], hand_pose_mean,
                               hand_pose_comps)
        right = blend_hand_pose(hand_pose_params[..., nh:], hand_pose_mean,
                                hand_pose_comps)
        full = full.at[..., hand_joint_idxs_left].set(left)
        full = full.at[..., hand_joint_idxs_right].set(right)
    scales = scale_mean + jnp.einsum("...a,ab->...b",
                                     jnp.asarray(scale_params),
                                     jnp.asarray(scale_comps))
    return jnp.concatenate([full, scales], axis=-1)


def mhr_output_transform(x):
    """cm → m and the camera-system flip of y/z (mhr_head.py:233,340)."""
    x = jnp.asarray(x) / 100.0
    return x * jnp.asarray([1.0, -1.0, -1.0], x.dtype)


# --------------------------------------------------------------------------
# rig registry — Flax modules reference rigs by NAME (module attributes
# must stay hashable); converted Momentum assets register here
# --------------------------------------------------------------------------
_RIG_REGISTRY: dict = {}


def register_rig(name: str, rig: MHRRig) -> None:
    _RIG_REGISTRY[name] = rig


def get_rig(name: str = "default") -> MHRRig:
    if name not in _RIG_REGISTRY:
        if name != "default":
            raise KeyError(f"unknown rig '{name}' "
                           f"(registered: {list(_RIG_REGISTRY)})")
        _RIG_REGISTRY["default"] = default_rig()
    return _RIG_REGISTRY[name]


class MHRBuffers(NamedTuple):
    """The checkpoint-shaped PCA/metadata buffers of the reference head
    (mhr_head.py:84-105); defaults are identity stand-ins."""

    scale_mean: np.ndarray        # (68,)
    scale_comps: np.ndarray       # (28, 68)
    hand_pose_mean: np.ndarray    # (54,)
    hand_pose_comps: np.ndarray   # (54, 54)
    hand_joint_idxs_left: np.ndarray   # (27,) into the 136 full params
    hand_joint_idxs_right: np.ndarray  # (27,)

    @classmethod
    def default(cls) -> "MHRBuffers":
        return cls(
            scale_mean=np.zeros(68, np.float32),
            scale_comps=np.eye(28, 68).astype(np.float32),
            hand_pose_mean=np.zeros(54, np.float32),
            hand_pose_comps=np.eye(54, dtype=np.float32),
            # body hand params 62..115 (MHR_PARAM_HAND_IDXS) sit at +6 in
            # the [trans(3) rot(3) body(130)] full vector; left first
            hand_joint_idxs_left=np.arange(68, 95, dtype=np.int32),
            hand_joint_idxs_right=np.arange(95, 122, dtype=np.int32),
        )


_BUFFERS_REGISTRY: dict = {}


def register_buffers(name: str, bufs: MHRBuffers) -> None:
    _BUFFERS_REGISTRY[name] = bufs


def get_buffers(name: str = "default") -> MHRBuffers:
    if name not in _BUFFERS_REGISTRY:
        if name != "default":
            raise KeyError(f"unknown buffers '{name}'")
        _BUFFERS_REGISTRY["default"] = MHRBuffers.default()
    return _BUFFERS_REGISTRY[name]
