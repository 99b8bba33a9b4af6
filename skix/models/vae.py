"""Convolutional KL-VAE for the image-edit latent space (Flax).

Replaces round 1's pixel-downsample stand-in with a real autoencoder
(capability parity with the reference's diffusers VAE used by
image_edit/qwenimage/pipeline_qwenimage_edit_plus.py: encode → scaled
latents → MMDiT flow matching → decode). Architecture is the standard
KL-VAE shape: conv stem → N down stages (resnet blocks + strided conv,
GroupNorm + SiLU) → mid block → 2·C_latent moments (mean, logvar);
decoder mirrors with nearest-upsample + conv. 8× spatial compression at
the default 3 down stages.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=8, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv1")(h)
        h = nn.GroupNorm(num_groups=8, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="shortcut")(x)
        return x + h


class Encoder(nn.Module):
    ch: int = 64
    ch_mults: Sequence[int] = (1, 2, 4)
    latent_channels: int = 16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding="SAME", name="stem")(x)
        for i, m in enumerate(self.ch_mults):
            h = ResnetBlock(self.ch * m, name=f"down_{i}_block")(h)
            h = nn.Conv(self.ch * m, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"down_{i}_conv")(h)
        h = ResnetBlock(self.ch * self.ch_mults[-1], name="mid")(h)
        h = nn.GroupNorm(num_groups=8, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME",
                       name="moments")(h)


class Decoder(nn.Module):
    ch: int = 64
    ch_mults: Sequence[int] = (1, 2, 4)
    out_channels: int = 3

    @nn.compact
    def __call__(self, z):
        h = nn.Conv(self.ch * self.ch_mults[-1], (3, 3), padding="SAME",
                    name="stem")(z)
        h = ResnetBlock(self.ch * self.ch_mults[-1], name="mid")(h)
        for i, m in enumerate(reversed(self.ch_mults)):
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
            h = nn.Conv(self.ch * m, (3, 3), padding="SAME",
                        name=f"up_{i}_conv")(h)
            h = ResnetBlock(self.ch * m, name=f"up_{i}_block")(h)
        h = nn.GroupNorm(num_groups=8, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       name="out")(h)


class KLVAE(nn.Module):
    """``encode`` → (mean, logvar); ``decode`` → image. Latents scaled by
    ``scaling_factor`` for the diffusion model (diffusers convention)."""

    ch: int = 64
    ch_mults: Sequence[int] = (1, 2, 4)
    latent_channels: int = 16
    out_channels: int = 3
    scaling_factor: float = 0.5

    def setup(self):
        self.encoder = Encoder(self.ch, self.ch_mults, self.latent_channels)
        self.decoder = Decoder(self.ch, self.ch_mults, self.out_channels)

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, rng=None, sample: bool = False):
        mean, logvar = self.encode(x)
        z = mean
        if sample and rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape)
        recon = self.decode(z)
        return recon, mean, logvar

    @property
    def downsample(self) -> int:
        return 2 ** len(self.ch_mults)


def vae_loss(recon, x, mean, logvar, kl_weight: float = 1e-6):
    """Reconstruction MSE + KL to N(0, I) (standard KL-VAE objective)."""
    rec = jnp.mean((recon - x) ** 2)
    kl = 0.5 * jnp.mean(mean ** 2 + jnp.exp(logvar) - 1.0 - logvar)
    return rec + kl_weight * kl, {"rec": rec, "kl": kl}
