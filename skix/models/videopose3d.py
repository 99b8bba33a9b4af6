"""2D→3D temporal-conv lifting network (VideoPose3D family), TPU-first.

Capability parity with reference VideoPose3D/common/model.py:79
(``TemporalModel``): dilated 1-D temporal ConvNet — expand conv J·2→C
channels, B residual blocks of (dilated width-w conv → BN → ReLU → dropout →
1×1 conv → BN → ReLU → dropout) with sliced residual skips, then a 1×1
"shrink" conv to J·3. Filter widths (3,3,3,3,3) ⇒ 243-frame receptive field.

TPU-first differences from the reference:
- ``lax.conv_general_dilated`` handles dilation natively, so the reference's
  separate ``TemporalModelOptimized1f`` strided-training variant
  (common/model.py:140) is unnecessary — one module serves both; a
  ``strided`` flag reproduces its stride-for-dilation trick (weight
  compatible) for single-output-frame training batches.
- feature-last ``(B, T, F)`` layout → the time axis maps onto MXU tiles;
  channels (1024) are a multiple of 128.
- optional bf16 compute with f32 params/BN statistics.

A state-dict converter ingests the reference's PyTorch checkpoints
(``pretrained_h36m_detectron_coco.bin``) for numerical parity.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def receptive_field(filter_widths: Sequence[int]) -> int:
    """Total receptive field in frames (product of filter widths)."""
    rf = 1
    for w in filter_widths:
        rf *= w
    return rf


class TemporalLifter(nn.Module):
    """Dilated temporal ConvNet lifting 2D keypoints to 3D poses.

    Input ``(B, T, J_in, C_in)`` → output ``(B, T', J_out, 3)`` where
    ``T' = T − receptive_field + 1`` (VALID padding; pad inputs by rf//2 on
    both sides for full-sequence inference, see :func:`infer_sequence`).
    """

    num_joints_in: int = 17
    in_features: int = 2
    num_joints_out: int = 17
    filter_widths: Sequence[int] = (3, 3, 3, 3, 3)
    channels: int = 1024
    dropout: float = 0.25
    causal: bool = False
    strided: bool = False  # stride instead of dilation (training variant)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T = x.shape[0], x.shape[1]
        fw = tuple(self.filter_widths)
        x = x.reshape(B, T, self.num_joints_in * self.in_features)
        x = x.astype(self.compute_dtype)

        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch momentum 0.1 ≡ flax 0.9
                epsilon=1e-5,
                dtype=self.compute_dtype,
                name=name,
            )(h)

        drop = lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)

        # expand: width-fw[0] conv (no bias; BN follows). The strided
        # training variant also strides this conv (single-output-frame
        # batches, every input frame used exactly once).
        h = nn.Conv(
            self.channels, (fw[0],),
            strides=(fw[0],) if self.strided else (1,),
            padding="VALID", use_bias=False,
            dtype=self.compute_dtype, name="expand_conv",
        )(x)
        h = drop(nn.relu(bn(h, "expand_bn")))

        next_dilation = fw[0]
        for i, w in enumerate(fw[1:]):
            pad = (w - 1) * next_dilation // 2
            if self.strided:
                # stride-for-dilation: equivalent receptive field when the
                # batch length equals the receptive field (train-time trick)
                shift = (w // 2) if self.causal else 0
                res = h[:, shift + w // 2:: w]
                conv = nn.Conv(
                    self.channels, (w,), strides=(w,), padding="VALID",
                    use_bias=False, dtype=self.compute_dtype,
                    name=f"conv_{i}_a",
                )
            else:
                shift = (w // 2) * next_dilation if self.causal else 0
                res = h[:, pad + shift: h.shape[1] - pad + shift]
                conv = nn.Conv(
                    self.channels, (w,), kernel_dilation=(next_dilation,),
                    padding="VALID", use_bias=False,
                    dtype=self.compute_dtype, name=f"conv_{i}_a",
                )
            h = drop(nn.relu(bn(conv(h), f"bn_{i}_a")))
            h = nn.Conv(
                self.channels, (1,), padding="VALID", use_bias=False,
                dtype=self.compute_dtype, name=f"conv_{i}_b",
            )(h)
            h = res + drop(nn.relu(bn(h, f"bn_{i}_b")))
            next_dilation *= w

        out = nn.Conv(
            self.num_joints_out * 3, (1,), padding="VALID", use_bias=True,
            dtype=jnp.float32, name="shrink",
        )(h.astype(jnp.float32))
        return out.reshape(B, out.shape[1], self.num_joints_out, 3)

    @property
    def rf(self) -> int:
        return receptive_field(self.filter_widths)


# --------------------------------------------------------------------------
# Reference checkpoint conversion
# --------------------------------------------------------------------------
def convert_reference_state_dict(state_dict, filter_widths=(3, 3, 3, 3, 3)):
    """Convert a VideoPose3D PyTorch ``model_pos`` state dict to Flax
    variables for :class:`TemporalLifter`.

    Layer-name correspondence (reference common/model.py:103-126):
    ``expand_conv``, ``expand_bn``, ``layers_conv.{2i,2i+1}``,
    ``layers_bn.{2i,2i+1}``, ``shrink``. Torch Conv1d kernels are
    ``(out, in, k)`` → Flax ``(k, in, out)``.
    """

    def np_of(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def conv_kernel(name):
        return np.transpose(np_of(state_dict[f"{name}.weight"]), (2, 1, 0))

    def bn_vars(name):
        return (
            {"scale": np_of(state_dict[f"{name}.weight"]),
             "bias": np_of(state_dict[f"{name}.bias"])},
            {"mean": np_of(state_dict[f"{name}.running_mean"]),
             "var": np_of(state_dict[f"{name}.running_var"])},
        )

    params: dict = {}
    batch_stats: dict = {}
    params["expand_conv"] = {"kernel": conv_kernel("expand_conv")}
    p, s = bn_vars("expand_bn")
    params["expand_bn"], batch_stats["expand_bn"] = p, s
    n_blocks = len(filter_widths) - 1
    for i in range(n_blocks):
        params[f"conv_{i}_a"] = {"kernel": conv_kernel(f"layers_conv.{2 * i}")}
        params[f"conv_{i}_b"] = {"kernel": conv_kernel(f"layers_conv.{2 * i + 1}")}
        p, s = bn_vars(f"layers_bn.{2 * i}")
        params[f"bn_{i}_a"], batch_stats[f"bn_{i}_a"] = p, s
        p, s = bn_vars(f"layers_bn.{2 * i + 1}")
        params[f"bn_{i}_b"], batch_stats[f"bn_{i}_b"] = p, s
    params["shrink"] = {
        "kernel": conv_kernel("shrink"),
        "bias": np_of(state_dict["shrink.bias"]),
    }
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, batch_stats)}


def fold_batchnorm(variables):
    """Fold BatchNorm statistics into the preceding conv kernels for
    inference: conv(x)·scale/√(var+ε) + (bias − mean·scale/√(var+ε)).

    Returns variables whose ``batch_stats`` are identity (mean 0, var 1)
    and whose BN scale/bias absorb the statistics — numerically identical
    eval-mode outputs with the normalization reduced to one fused
    multiply-add that XLA folds into the conv epilogue. The BN collection
    stays in place so the module applies unchanged.
    """
    import copy

    params = copy.deepcopy(jax.tree.map(np.asarray, variables["params"]))
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    new_stats = {}
    eps = 1e-5
    for name, st in stats.items():
        inv = 1.0 / np.sqrt(st["var"] + eps)
        p = params[name]
        p["scale"] = p["scale"] * inv
        p["bias"] = p["bias"] - st["mean"] * p["scale"]
        new_stats[name] = {"mean": np.zeros_like(st["mean"]),
                           "var": np.ones_like(st["var"]) - eps}
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, new_stats)}


# --------------------------------------------------------------------------
# Full-sequence inference (UnchunkedGenerator semantics)
# --------------------------------------------------------------------------
def pad_for_inference(kpts_2d, rf: int, causal_shift: int = 0):
    """Edge-pad a ``(T, J, 2)`` sequence by rf//2 each side (the reference's
    UnchunkedGenerator padding, VideoPose3D/common/generators.py:187)."""
    kpts_2d = jnp.asarray(kpts_2d)
    half = rf // 2
    left = jnp.repeat(kpts_2d[:1], half + causal_shift, axis=0)
    right = jnp.repeat(kpts_2d[-1:], half - causal_shift, axis=0)
    return jnp.concatenate([left, kpts_2d, right], axis=0)


def infer_sequence(
    model: TemporalLifter,
    variables,
    kpts_2d,
    flip_augment: bool = True,
    left=None,
    right=None,
):
    """Lift a full normalized-2D sequence ``(T, J, 2)`` → ``(T, J, 3)``.

    Test-time flip augmentation averages the prediction with the unflipped
    prediction of the mirrored input (reference VideoPose3D/run.py:979-986).
    jit-safe; call under ``jax.jit`` for production.
    """
    from skix.geometry.skeletons import H36M_LEFT, H36M_RIGHT, flip_keypoints

    left = H36M_LEFT if left is None else left
    right = H36M_RIGHT if right is None else right
    x = pad_for_inference(kpts_2d, model.rf)[None]  # (1, T+rf-1, J, 2)
    if flip_augment:
        xf = flip_keypoints(x, left, right)
        both = jnp.concatenate([x, xf], axis=0)
        pred = model.apply(variables, both, train=False)
        pred_n = pred[0]
        pred_f = flip_keypoints(pred[1], left, right)
        return 0.5 * (pred_n + pred_f)
    return model.apply(variables, x, train=False)[0]
