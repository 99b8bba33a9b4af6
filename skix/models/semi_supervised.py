"""Semi-supervised 2D→3D training: trajectory model + reprojection loss.

Capability parity with the reference's semi-supervised branch
(VideoPose3D/run.py:489-948): a second *trajectory* network (same temporal
ConvNet, one output joint = camera-space root position) paired with the
pose network; unlabeled clips are supervised by projecting the predicted
absolute 3D pose back to 2D through the H36M camera model
(common/camera.py:37) and penalizing against the input keypoints, plus a
bone-length consistency term between the labeled and unlabeled halves of
the batch; the projection/bone terms ramp in after a warmup.

Every step is one jitted program over both parameter trees.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from skix.geometry.camera import project_to_2d_h36m
from skix.geometry.skeletons import H36M_BONES
from skix.metrics.losses import mpjpe
from skix.models.videopose3d import TemporalLifter


def make_pose_and_traj_models(filter_widths=(3, 3, 3, 3, 3),
                              channels: int = 1024, strided: bool = True):
    pose = TemporalLifter(filter_widths=filter_widths, channels=channels,
                          strided=strided)
    traj = TemporalLifter(filter_widths=filter_widths, channels=channels,
                          strided=strided, num_joints_out=1)
    return pose, traj


class SemiState(NamedTuple):
    pos_params: dict
    pos_stats: dict
    traj_params: dict
    traj_stats: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def init_semi_state(pose: TemporalLifter, traj: TemporalLifter, rng,
                    optimizer) -> SemiState:
    x = jnp.zeros((1, pose.rf, pose.num_joints_in, pose.in_features))
    vp = pose.init({"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                   x, train=True)
    vt = traj.init({"params": jax.random.fold_in(rng, 2),
                    "dropout": jax.random.fold_in(rng, 3)}, x, train=True)
    params = {"pos": vp["params"], "traj": vt["params"]}
    return SemiState(pos_params=vp["params"], pos_stats=vp["batch_stats"],
                     traj_params=vt["params"], traj_stats=vt["batch_stats"],
                     opt_state=optimizer.init(params),
                     step=jnp.asarray(0))


def weighted_traj_loss(pred_traj, gt_traj):
    """Trajectory MPJPE weighted by inverse GT depth (reference run.py's
    ``w = 1/z`` weighting — distant roots matter less in pixels)."""
    w = 1.0 / jnp.clip(jnp.abs(gt_traj[..., 2:3]), 1.0)
    d = jnp.linalg.norm(pred_traj - gt_traj, axis=-1, keepdims=True)
    return jnp.mean(w * d)


def bone_length_consistency(pred_unlabeled, pred_labeled):
    """Penalize mean bone-length drift of the unlabeled half vs the labeled
    half (reference bone-length consistency term)."""
    bones = np.asarray(H36M_BONES)
    def mean_bones(x):
        return jnp.mean(jnp.linalg.norm(
            x[..., bones[:, 0], :] - x[..., bones[:, 1], :], axis=-1),
            axis=tuple(range(x.ndim - 2)))
    return jnp.mean(jnp.abs(mean_bones(pred_unlabeled)
                            - mean_bones(pred_labeled)))


def semi_supervised_step(
    pose: TemporalLifter,
    traj: TemporalLifter,
    optimizer,
    state: SemiState,
    batch_2d_lab, batch_3d_lab, traj_3d_lab,
    batch_2d_unlab, cam_params,
    dropout_rng,
    warmup: bool = False,
    w_reproj: float = 1.0,
    w_bone: float = 0.1,
):
    """One combined step.

    ``batch_2d_lab (B, rf, J, 2)`` normalized; ``batch_3d_lab (B, L, J, 3)``
    root-relative; ``traj_3d_lab (B, L, 1, 3)`` camera-space roots;
    ``batch_2d_unlab (B, rf, J, 2)``; ``cam_params (9,)`` H36M intrinsics
    (normalized coords). ``warmup`` disables the unsupervised terms.
    """

    def loss_fn(params):
        rngs = {"dropout": dropout_rng}
        pred_lab, pos_mut = pose.apply(
            {"params": params["pos"], "batch_stats": state.pos_stats},
            batch_2d_lab, train=True, rngs=rngs, mutable=["batch_stats"])
        pred_traj_lab, traj_mut = traj.apply(
            {"params": params["traj"], "batch_stats": state.traj_stats},
            batch_2d_lab, train=True, rngs=rngs, mutable=["batch_stats"])
        loss = mpjpe(pred_lab, batch_3d_lab) + weighted_traj_loss(
            pred_traj_lab, traj_3d_lab)

        if not warmup:
            pred_unlab, _ = pose.apply(
                {"params": params["pos"], "batch_stats": state.pos_stats},
                batch_2d_unlab, train=True, rngs=rngs,
                mutable=["batch_stats"])
            pred_traj_unlab, _ = traj.apply(
                {"params": params["traj"], "batch_stats": state.traj_stats},
                batch_2d_unlab, train=True, rngs=rngs,
                mutable=["batch_stats"])
            absolute = pred_unlab + pred_traj_unlab  # (B, L, J, 3)
            reproj = project_to_2d_h36m(absolute, cam_params[None])
            # compare against the center frames of the unlabeled 2D input
            L = absolute.shape[1]
            rf = pose.rf
            start = rf // 2
            target_2d = jax.lax.dynamic_slice_in_dim(
                batch_2d_unlab, start, L, axis=1)
            loss = loss + w_reproj * jnp.mean(
                jnp.linalg.norm(reproj - target_2d, axis=-1))
            loss = loss + w_bone * bone_length_consistency(pred_unlab,
                                                           pred_lab)
        return loss, (pos_mut["batch_stats"], traj_mut["batch_stats"])

    params = {"pos": state.pos_params, "traj": state.traj_params}
    (loss, (pos_stats, traj_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates, new_opt = optimizer.update(grads, state.opt_state)
    new_params = optax.apply_updates(params, updates)
    return SemiState(pos_params=new_params["pos"], pos_stats=pos_stats,
                     traj_params=new_params["traj"], traj_stats=traj_stats,
                     opt_state=new_opt, step=state.step + 1), loss
