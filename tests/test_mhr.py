"""MHR parameterization parity vs the reference's importable mhr_utils
(oracle import only — sam_3d_body/models/modules/mhr_utils.py), plus FK
rig invariants."""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models import mhr



@pytest.fixture(scope="module")
def ref():
    """Import the reference mhr_utils directly (bypassing the package
    __init__, which pulls torchvision)."""
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_mhr_utils",
        "/root/reference/prepare_side_results/sam_3d_body/models/modules/"
        "mhr_utils.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_mhr_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


class TestParamConversionParity:
    def test_body_cont_to_model_params(self, ref):
        rng = np.random.default_rng(930)
        import torch

        cont = rng.normal(size=(5, 260)).astype(np.float32)
        want = ref.compact_cont_to_model_params_body(
            torch.from_numpy(cont)).numpy()
        got = np.asarray(mhr.cont_to_model_params_body(jnp.asarray(cont)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_body_model_params_to_cont(self, ref):
        rng = np.random.default_rng(931)
        import torch

        params = rng.uniform(-2, 2, size=(5, 133)).astype(np.float32)
        want = ref.compact_model_params_to_cont_body(
            torch.from_numpy(params)).numpy()
        got = np.asarray(mhr.model_params_to_cont_body(jnp.asarray(params)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_hand_cont_to_model_params(self, ref):
        rng = np.random.default_rng(932)
        import torch

        cont = rng.normal(size=(5, 54)).astype(np.float32)
        want = ref.compact_cont_to_model_params_hand(
            torch.from_numpy(cont)).numpy()
        got = np.asarray(mhr.cont_to_model_params_hand(jnp.asarray(cont)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_hand_model_params_to_cont(self, ref):
        rng = np.random.default_rng(933)
        import torch

        params = rng.uniform(-2, 2, size=(5, 27)).astype(np.float32)
        want = ref.compact_model_params_to_cont_hand(
            torch.from_numpy(params)).numpy()
        got = np.asarray(mhr.model_params_to_cont_hand(jnp.asarray(params)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_euler_6d_roundtrip_matches(self, ref):
        rng = np.random.default_rng(934)
        import torch

        r = rng.uniform(-1.4, 1.4, size=(7, 3)).astype(np.float32)
        want6 = ref.batch6DFromXYZ(torch.from_numpy(r)).numpy()
        got6 = np.asarray(mhr.euler_xyz_to_cont6d(jnp.asarray(r)))
        np.testing.assert_allclose(got6, want6, atol=1e-5)
        want_e = ref.batchXYZfrom6D(torch.from_numpy(want6)).numpy()
        got_e = np.asarray(mhr.cont6d_to_euler_xyz(jnp.asarray(got6)))
        np.testing.assert_allclose(got_e, want_e, atol=1e-5)

    def test_fix_wrist_euler(self, ref):
        rng = np.random.default_rng(935)
        import torch

        w = rng.uniform(-np.pi, np.pi, size=(6, 2, 3)).astype(np.float32)
        want = ref.fix_wrist_euler(torch.from_numpy(w)).numpy()
        got = np.asarray(mhr.fix_wrist_euler(jnp.asarray(w)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotation_angle_difference(self, ref):
        rng = np.random.default_rng(936)
        import torch

        r = rng.uniform(-1, 1, size=(6, 3)).astype(np.float32)
        A = np.asarray(mhr.euler_xyz_to_matrix(jnp.asarray(r)))
        B = np.asarray(mhr.euler_xyz_to_matrix(jnp.asarray(r[::-1].copy())))
        want = ref.rotation_angle_difference(
            torch.from_numpy(A), torch.from_numpy(B)).numpy()
        got = np.asarray(mhr.rotation_angle_difference(A, B))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_hand_mask_matches(self, ref):
        np.testing.assert_array_equal(
            mhr.MHR_PARAM_HAND_MASK, ref.mhr_param_hand_mask.numpy())


class TestRig:
    def test_hierarchy_is_a_tree(self):
        parents = mhr.MHR70_PARENTS
        assert (parents == -1).sum() == 1
        for j in range(70):  # every joint reaches the root
            a, hops = j, 0
            while parents[a] >= 0:
                a = int(parents[a])
                hops += 1
                assert hops < 70
        # reference names (oracle data): finger chains hang off wrists
        assert parents[21] == 22 and parents[24] == 41  # right thumb chain
        assert parents[42] == 43 and parents[45] == 62  # left thumb chain

    def test_zero_pose_is_rest(self):
        rig = mhr.default_rig()
        out = mhr.rig_forward(rig, jnp.zeros(rig.num_params))
        rest = np.zeros((70, 3), np.float32)
        order = mhr._topo_order(rig.parents)
        for j in order:
            p = int(rig.parents[j])
            rest[j] = rig.offsets[j] if p < 0 else rest[p] + rig.offsets[j]
        np.testing.assert_allclose(np.asarray(out["joints"]), rest,
                                   atol=1e-4)

    def test_global_rotation_rotates_everything(self):
        rig = mhr.default_rig()
        z90 = jnp.zeros(rig.num_params).at[5].set(np.pi / 2)  # global rz
        out0 = mhr.rig_forward(rig, jnp.zeros(rig.num_params),
                               return_verts=False)
        out1 = mhr.rig_forward(rig, z90, return_verts=False)
        j0 = np.asarray(out0["joints"]) - np.asarray(out0["joints"][9])
        j1 = np.asarray(out1["joints"]) - np.asarray(out1["joints"][9])
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(j1, j0 @ Rz.T, atol=1e-3)

    def test_scale_param_scales_children(self):
        rig = mhr.default_rig()
        # global log2-scale on root (scale param index 0 → 136)
        p = jnp.zeros(rig.num_params).at[136].set(1.0)  # 2×
        out0 = mhr.rig_forward(rig, jnp.zeros(rig.num_params),
                               return_verts=False)
        out1 = mhr.rig_forward(rig, p, return_verts=False)
        d0 = np.asarray(out0["joints"][69] - out0["joints"][9])
        d1 = np.asarray(out1["joints"][69] - out1["joints"][9])
        np.testing.assert_allclose(d1, 2 * d0, rtol=1e-4)

    def test_hand_pca_blend_drops_into_body(self):
        rig = mhr.default_rig()
        hand_mean = jnp.zeros(54)
        hand_comps = jnp.eye(54)
        idx_l = jnp.arange(68, 95)
        idx_r = jnp.arange(95, 122)
        full = mhr.assemble_model_params(
            jnp.zeros(3), jnp.zeros(3), jnp.zeros(133),
            jnp.ones(108) * 0.2, jnp.zeros(28), jnp.zeros(68),
            jnp.eye(28, 68), hand_pose_mean=hand_mean,
            hand_pose_comps=hand_comps, hand_joint_idxs_left=idx_l,
            hand_joint_idxs_right=idx_r)
        assert full.shape == (204,)
        assert float(jnp.abs(full[68:122]).sum()) > 0  # hands written
        out = mhr.rig_forward(rig, full, return_verts=False)
        out0 = mhr.rig_forward(rig, jnp.zeros(204), return_verts=False)
        moved = np.linalg.norm(
            np.asarray(out["joints"] - out0["joints"]), axis=-1)
        assert moved[25] > 1e-3 or moved[30] > 1e-3  # finger joints move

    def test_mesh_verts_and_keypoints(self):
        rng = np.random.default_rng(937)
        rig = mhr.default_rig()
        p = jnp.asarray(rng.normal(0, 0.1, (3, rig.num_params)), jnp.float32)
        out = mhr.rig_forward(rig, p)
        assert out["verts"].shape == (3, 64, 3)
        assert out["keypoints"].shape == (3, 70, 3)
        assert bool(jnp.all(jnp.isfinite(out["verts"])))
        # default keypoint mapping regresses the joints themselves
        np.testing.assert_allclose(np.asarray(out["keypoints"]),
                                   np.asarray(out["joints"]), atol=1e-4)

    def test_differentiable(self):
        rig = mhr.default_rig()

        def loss(p):
            return jnp.sum(mhr.rig_forward(rig, p)["keypoints"] ** 2)

        g = jax.grad(loss)(jnp.zeros(rig.num_params) + 0.01)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.linalg.norm(g)) > 0
