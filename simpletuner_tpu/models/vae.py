"""AutoencoderKL (SD/SDXL/Flux-style image VAE) in flax.linen.

TPU-native stand-in for the reference's diffusers ``AutoencoderKL`` dependency
(reference uses it for every image family; SURVEY.md §2.3 AUTOENCODER_CLASS and
the VAE cache at helpers/caching/vae.py).  Encoder/decoder with GroupNorm+SiLU
resnet blocks and a mid-attention block; channel layout is NHWC for TPU conv
efficiency.  Weight import from diffusers checkpoints maps onto these module
names (see ``simpletuner_tpu/models/vae_import.py``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    base_channels: int = 128
    channel_multipliers: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0

    @classmethod
    def sd(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def sdxl(cls) -> "VAEConfig":
        return cls(scaling_factor=0.13025)

    @classmethod
    def flux(cls) -> "VAEConfig":
        return cls(latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159)

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(base_channels=16, channel_multipliers=(1, 2), layers_per_block=1)

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.channel_multipliers) - 1)



def _groups(channels: int) -> int:
    return 32 if channels % 32 == 0 else math.gcd(channels, 32) or 1


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=_groups(x.shape[-1]), dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=_groups(self.out_channels), dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(residual)
        return h + residual


class AttnBlock(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        batch, height, width, channels = x.shape
        h = nn.GroupNorm(num_groups=_groups(x.shape[-1]), dtype=self.dtype, name="norm")(x)
        flat = h.reshape(batch, height * width, channels)
        q = nn.Dense(channels, dtype=self.dtype, name="to_q")(flat)
        k = nn.Dense(channels, dtype=self.dtype, name="to_k")(flat)
        v = nn.Dense(channels, dtype=self.dtype, name="to_v")(flat)
        scale = channels ** -0.5
        attn = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k) * scale, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(channels, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(batch, height, width, channels)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.base_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for level, mult in enumerate(cfg.channel_multipliers):
            channels = cfg.base_channels * mult
            for block in range(cfg.layers_per_block):
                h = ResnetBlock(channels, dtype=self.dtype, name=f"down_{level}_block_{block}")(h)
            if level < len(cfg.channel_multipliers) - 1:
                h = nn.Conv(
                    channels, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                    dtype=self.dtype, name=f"down_{level}_downsample",
                )(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        channels = cfg.base_channels * cfg.channel_multipliers[-1]
        h = nn.Conv(channels, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(channels, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(channels, dtype=self.dtype, name="mid_block_2")(h)
        for level, mult in enumerate(reversed(cfg.channel_multipliers)):
            channels = cfg.base_channels * mult
            for block in range(cfg.layers_per_block + 1):
                h = ResnetBlock(channels, dtype=self.dtype, name=f"up_{level}_block_{block}")(h)
            if level < len(cfg.channel_multipliers) - 1:
                batch, height, width, c = h.shape
                h = jax.image.resize(h, (batch, height * 2, width * 2, c), "nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name=f"up_{level}_upsample")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x):
        """(B, H, W, 3) in [-1,1] -> (mean, logvar) each (B, h, w, C)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng: Optional[jax.Array] = None, sample: bool = True):
        """Scaled latents ready for the diffusion model."""
        mean, logvar = self.encode_moments(x)
        if sample and rng is not None:
            std = jnp.exp(0.5 * logvar)
            latent = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        else:
            latent = mean
        return (latent - self.config.shift_factor) * self.config.scaling_factor

    def decode(self, latents):
        latents = latents / self.config.scaling_factor + self.config.shift_factor
        return self.decoder(self.post_quant_conv(latents))

    def __call__(self, x, rng: Optional[jax.Array] = None):
        latents = self.encode(x, rng)
        return self.decode(latents)
