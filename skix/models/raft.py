"""RAFT-style optical flow (Flax), fixed-iteration recurrent refinement.

Capability parity with the reference's flow stage
(prepare_dataset/model/optical_flow.py:86 — torchvision ``raft_large`` on
frame pairs, pad-to-multiple-of-8, ``(T−1, 2, H, W)`` output).

Architecture (RAFT, Teed & Deng 2020; torchvision-compatible hyperparams):
feature/context encoders at 1/8 resolution, all-pairs correlation pyramid
(4 levels, lookup radius 4), ConvGRU update operator, convex-upsampling of
the 1/8-res flow. TPU-first: the update loop is a ``lax.scan`` with a
static iteration count (no per-iteration Python), correlation lookups are
bilinear gathers via ``map_coordinates``, all shapes static.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.GroupNorm(num_groups=8, dtype=self.dtype,
                                         name=name)
        h = nn.relu(norm("norm1")(nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", dtype=self.dtype, name="conv1")(x)))
        h = nn.relu(norm("norm2")(nn.Conv(
            self.features, (3, 3), padding="SAME", dtype=self.dtype,
            name="conv2")(h)))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = norm("norm3")(nn.Conv(self.features, (1, 1),
                                      strides=(self.stride, self.stride),
                                      dtype=self.dtype, name="downsample")(x))
        return nn.relu(x + h)


class BasicEncoder(nn.Module):
    """Conv encoder → 1/8 resolution features."""

    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype, name="norm1")(
            nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name="conv1")(x)))
        for i, (feat, stride) in enumerate(
                [(64, 1), (64, 1), (96, 2), (96, 1), (128, 2), (128, 1)]):
            h = ResidualBlock(feat, stride, self.dtype, name=f"res_{i}")(h)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                       name="conv_out")(h)


def correlation_pyramid(f1, f2, num_levels: int = 4):
    """All-pairs correlation: ``f1, f2 (B, h, w, C)`` → list of
    ``(B, h, w, h_l, w_l)`` volumes (avg-pooled over the *second* frame)."""
    B, h, w, C = f1.shape
    corr = jnp.einsum("bijc,bklc->bijkl", f1, f2) / jnp.sqrt(
        jnp.asarray(C, f1.dtype))
    pyramid = [corr]
    cur = corr.reshape(B * h * w, h, w, 1)
    for _ in range(num_levels - 1):
        cur = nn.avg_pool(cur, (2, 2), strides=(2, 2))
        pyramid.append(cur.reshape(B, h, w, cur.shape[1], cur.shape[2]))
    return pyramid


def lookup_correlation(pyramid, coords, radius: int = 4):
    """Sample each level in a (2r+1)² window around ``coords (B, h, w, 2)``
    (x, y at 1/8 res) → features ``(B, h, w, L·(2r+1)²)``."""
    B, h, w, _ = coords.shape
    r = radius
    dx, dy = jnp.meshgrid(jnp.arange(-r, r + 1, dtype=coords.dtype),
                          jnp.arange(-r, r + 1, dtype=coords.dtype),
                          indexing="xy")
    delta = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)  # (W2, 2)
    out = []
    for lvl, corr in enumerate(pyramid):
        scale = 0.5 ** lvl
        c = coords * scale
        # sample positions: (B, h, w, W2, 2)
        pos = c[:, :, :, None, :] + delta[None, None, None]
        vol = corr.reshape(B * h * w, corr.shape[3], corr.shape[4])
        pos_f = pos.reshape(B * h * w, -1, 2)

        def sample(v, p):
            return jax.scipy.ndimage.map_coordinates(
                v, [p[:, 1], p[:, 0]], order=1, mode="constant", cval=0.0)

        smp = jax.vmap(sample)(vol, pos_f)  # (Bhw, W2)
        out.append(smp.reshape(B, h, w, -1))
    return jnp.concatenate(out, axis=-1)


class ConvGRU(nn.Module):
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding="SAME",
                               dtype=self.dtype, name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding="SAME",
                               dtype=self.dtype, name="convr")(hx))
        q = nn.tanh(nn.Conv(self.hidden, (3, 3), padding="SAME",
                            dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class UpdateBlock(nn.Module):
    hidden: int = 128
    corr_dim: int = 4 * 81
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr_feat, flow):
        c = nn.relu(nn.Conv(192, (1, 1), dtype=self.dtype,
                            name="corr_conv1")(corr_feat))
        c = nn.relu(nn.Conv(192, (3, 3), padding="SAME", dtype=self.dtype,
                            name="corr_conv2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding="SAME", dtype=self.dtype,
                            name="flow_conv1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                            name="flow_conv2")(f))
        motion = nn.relu(nn.Conv(126, (3, 3), padding="SAME",
                                 dtype=self.dtype, name="motion_conv")(
            jnp.concatenate([c, f], axis=-1)))
        motion = jnp.concatenate([motion, flow], axis=-1)  # 128
        net = ConvGRU(self.hidden, self.dtype, name="gru")(
            net, jnp.concatenate([inp, motion], axis=-1))
        dflow = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.float32,
                        name="flow_head2")(
            nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="flow_head1")(net)))
        mask = nn.Conv(64 * 9, (1, 1), dtype=jnp.float32, name="mask_head2")(
            nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="mask_head1")(net))) * 0.25
        return net, dflow, mask


def convex_upsample(flow, mask):
    """8× convex-combination upsampling (RAFT). ``flow (B, h, w, 2)``,
    ``mask (B, h, w, 64*9)`` → ``(B, 8h, 8w, 2)``."""
    B, h, w, _ = flow.shape
    mask = mask.reshape(B, h, w, 8, 8, 9)
    mask = jax.nn.softmax(mask, axis=-1)
    # 3×3 neighborhoods of the coarse flow
    fp = jnp.pad(flow * 8.0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([fp[:, i:i + h, j:j + w] for i in range(3)
                       for j in range(3)], axis=-2)  # (B, h, w, 9, 2)
    up = jnp.einsum("bhwijk,bhwkc->bhwijc", mask, neigh)  # (B,h,w,8,8,2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * 8, w * 8, 2)


class RAFT(nn.Module):
    """Optical flow between image pairs. Images (B, H, W, 3) in [0, 1],
    H, W multiples of 8 (pad upstream as the reference does)."""

    hidden: int = 128
    context: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image1, image2):
        B, H, W, _ = image1.shape
        x1 = image1 * 2.0 - 1.0
        x2 = image2 * 2.0 - 1.0
        fmap = BasicEncoder(256, self.dtype, name="fnet")(
            jnp.concatenate([x1, x2], axis=0))
        f1, f2 = fmap[:B].astype(jnp.float32), fmap[B:].astype(jnp.float32)
        ctx = BasicEncoder(self.hidden + self.context, self.dtype,
                           name="cnet")(x1)
        net = nn.tanh(ctx[..., : self.hidden])
        inp = nn.relu(ctx[..., self.hidden:])

        pyramid = correlation_pyramid(f1, f2, self.corr_levels)
        h, w = f1.shape[1], f1.shape[2]
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (B, h, w, 2))

        update = UpdateBlock(self.hidden,
                             self.corr_levels * (2 * self.corr_radius + 1) ** 2,
                             self.dtype, name="update_block")

        # static unrolled refinement (Flax modules may not be closed over by
        # lax.scan; the iteration count is static so XLA fuses the unrolled
        # chain — same program the scan would produce)
        flow = jnp.zeros((B, h, w, 2), jnp.float32)
        mask = None
        for _ in range(self.iters):
            corr_feat = lookup_correlation(pyramid, coords0 + flow,
                                           self.corr_radius)
            net, dflow, mask = update(net, inp, corr_feat.astype(self.dtype),
                                      flow)
            flow = flow + dflow
        return convex_upsample(flow, mask)


def compute_flow_sequence(model: RAFT, variables, frames_u8,
                          chunk_size: int = 2):
    """Whole-clip flow: ``frames (T, H, W, 3) uint8`` →
    ``(T−1, 2, H, W) float32`` (pt_info layout; pads H/W to multiples of 8
    like reference optical_flow.py:54 ``_pad_to_multiple``)."""
    frames = np.asarray(frames_u8)
    T, H, W = frames.shape[:3]
    ph, pw = (-H) % 8, (-W) % 8
    from skix.utils.jitapply import apply_model
    fwd = lambda v, a, b: apply_model(model, None, v, a, b)  # noqa: E731
    outs = []
    for s in range(0, T - 1, chunk_size):
        e = min(s + chunk_size, T - 1)
        a = jnp.asarray(frames[s:e], jnp.float32) / 255.0
        b = jnp.asarray(frames[s + 1:e + 1], jnp.float32) / 255.0
        if ph or pw:
            a = jnp.pad(a, ((0, 0), (0, ph), (0, pw), (0, 0)))
            b = jnp.pad(b, ((0, 0), (0, ph), (0, pw), (0, 0)))
        flow = fwd(variables, a, b)[:, :H, :W, :]
        outs.append(np.asarray(flow).transpose(0, 3, 1, 2))
    return np.concatenate(outs, axis=0) if outs else np.zeros((0, 2, H, W),
                                                              np.float32)
