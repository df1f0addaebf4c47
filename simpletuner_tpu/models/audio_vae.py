"""1-D waveform autoencoder for audio latents.

Reference behavior: ACE-Step's DCAE audio VAE (helpers/models/ace_step —
waveform → compressed latent sequence; SURVEY.md §2.3).  Strided Conv1D
encoder/decoder with a configurable total compression factor; NLC layout
(batch, samples, channels), bf16 compute.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class AudioVAEConfig:
    latent_channels: int = 8
    base_channels: int = 64
    strides: Tuple[int, ...] = (4, 4, 4, 8)  # 512x total compression
    in_channels: int = 2  # stereo

    @property
    def compression(self) -> int:
        out = 1
        for s in self.strides:
            out *= s
        return out

    @classmethod
    def ace(cls) -> "AudioVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "AudioVAEConfig":
        return cls(latent_channels=4, base_channels=8, strides=(4, 4), in_channels=1)


class ResBlock1D(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.silu(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Conv(self.features, (7,), padding=3, dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(h)
        h = nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.Conv(self.features, (1,), dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(h)
        if residual.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1,), dtype=self.dtype, param_dtype=self.param_dtype, name="shortcut")(residual)
        return residual + h


class AudioEncoder(nn.Module):
    config: AudioVAEConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, S, C)
        cfg = self.config
        h = nn.Conv(cfg.base_channels, (7,), padding=3, dtype=self.dtype, name="stem")(x.astype(self.dtype))
        features = cfg.base_channels
        for level, stride in enumerate(cfg.strides):
            h = ResBlock1D(features, dtype=self.dtype, name=f"down_{level}_res")(h)
            features = min(features * 2, cfg.base_channels * 16)
            h = nn.Conv(
                features, (2 * stride,), strides=(stride,), padding=stride // 2,
                dtype=self.dtype, name=f"down_{level}_pool",
            )(h)
        h = ResBlock1D(features, dtype=self.dtype, name="mid_res")(h)
        return nn.Conv(cfg.latent_channels * 2, (3,), padding=1, dtype=self.dtype, name="proj")(h)


class AudioDecoder(nn.Module):
    config: AudioVAEConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z):  # (B, S', C)
        cfg = self.config
        features = min(cfg.base_channels * 2 ** len(cfg.strides), cfg.base_channels * 16)
        h = nn.Conv(features, (3,), padding=1, dtype=self.dtype, name="stem")(z.astype(self.dtype))
        for level, stride in enumerate(reversed(cfg.strides)):
            h = ResBlock1D(features, dtype=self.dtype, name=f"up_{level}_res")(h)
            batch, length, channels = h.shape
            h = jnp.repeat(h, stride, axis=1)
            features = max(features // 2, cfg.base_channels)
            # odd kernel + symmetric padding keeps the length exactly stride×
            h = nn.Conv(features, (2 * stride + 1,), padding=stride, dtype=self.dtype, name=f"up_{level}_conv")(h)
        h = ResBlock1D(features, dtype=self.dtype, name="final_res")(h)
        return nn.Conv(cfg.in_channels, (7,), padding=3, dtype=self.dtype, name="proj")(h).astype(jnp.float32)


class AudioAutoencoderKL(nn.Module):
    config: AudioVAEConfig = AudioVAEConfig()
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.encoder = AudioEncoder(self.config, dtype=self.dtype)
        self.decoder = AudioDecoder(self.config, dtype=self.dtype)

    def encode(self, x, rng: Optional[jax.Array] = None, sample: bool = True):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if sample and rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, rng: Optional[jax.Array] = None):
        return self.decode(self.encode(x, rng))
