"""Causal 3-D video VAE (Wan/LTX-style: 4x temporal, 8x spatial compression).

Reference behavior: the video families' causal VAEs (helpers/models/wan,
hunyuanvideo_vae.py shared module — SURVEY.md §2.3) map 1+4k RGB frames to
1+k latent frames.  TPU-shape: NTHWC layout, causal temporal padding
(replicate-first-frame) so each latent frame depends only on past frames, bf16
compute / fp32 params.  Weight-compatible import for specific checkpoints lands
with the family importers; this module defines the architecture + jit surface.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VideoVAEConfig:
    latent_channels: int = 16
    base_channels: int = 96
    channel_multipliers: Tuple[int, ...] = (1, 2, 4, 4)
    temporal_downsample: Tuple[bool, ...] = (False, True, True, False)  # 4x total
    num_res_blocks: int = 2

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.channel_multipliers) - 1)

    @property
    def temporal_factor(self) -> int:
        return 2 ** sum(self.temporal_downsample)

    @classmethod
    def wan(cls) -> "VideoVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VideoVAEConfig":
        return cls(latent_channels=4, base_channels=8, channel_multipliers=(1, 2),
                   temporal_downsample=(True, True), num_res_blocks=1)


class CausalConv3D(nn.Module):
    """3-D conv with causal (replicate-front) temporal padding."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, H, W, C)
        kt, kh, kw = self.kernel
        pad_t = kt - 1
        if pad_t:
            front = jnp.repeat(x[:, :1], pad_t, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        return nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class ResBlock3D(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        groups = 8 if x.shape[-1] % 8 == 0 else 1
        h = nn.GroupNorm(groups, dtype=jnp.float32)(x.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        h = CausalConv3D(self.features, dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(h)
        groups = 8 if h.shape[-1] % 8 == 0 else 1
        h = nn.GroupNorm(groups, dtype=jnp.float32)(h.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        h = CausalConv3D(self.features, dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(h)
        if residual.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1, 1), dtype=self.dtype,
                               param_dtype=self.param_dtype, name="shortcut")(residual)
        return residual + h


class VideoEncoder(nn.Module):
    config: VideoVAEConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, H, W, 3)
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = CausalConv3D(cfg.base_channels, name="stem", **common)(x.astype(self.dtype))
        for level, mult in enumerate(cfg.channel_multipliers):
            features = cfg.base_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlock3D(features, name=f"down_{level}_res_{i}", **common)(h)
            last = level == len(cfg.channel_multipliers) - 1
            if not last:
                st = 2 if cfg.temporal_downsample[level] else 1
                h = CausalConv3D(features, strides=(st, 2, 2), name=f"down_{level}_pool", **common)(h)
            elif cfg.temporal_downsample[level]:
                h = CausalConv3D(features, strides=(2, 1, 1), name=f"down_{level}_pool", **common)(h)
        groups = 8 if h.shape[-1] % 8 == 0 else 1
        h = nn.GroupNorm(groups, dtype=jnp.float32, name="norm_out")(h.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        return CausalConv3D(cfg.latent_channels * 2, kernel=(1, 1, 1), name="proj", **common)(h)


class VideoDecoder(nn.Module):
    config: VideoVAEConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:  # (B, T', H', W', C)
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        mults = list(reversed(cfg.channel_multipliers))
        tdown = list(reversed(cfg.temporal_downsample))
        h = CausalConv3D(cfg.base_channels * mults[0], name="stem", **common)(z.astype(self.dtype))
        for level, mult in enumerate(mults):
            features = cfg.base_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlock3D(features, name=f"up_{level}_res_{i}", **common)(h)
            last = level == len(mults) - 1
            up_t = tdown[level]  # mirror of the encoder's temporal stride at this level
            up_s = not last  # mirror of the encoder's (level < last) spatial stride
            if up_t:
                h = jnp.repeat(h, 2, axis=1)[:, 1:]  # causal: drop the lead duplicate
            if up_s:
                batch, t, height, width, channels = h.shape
                h = jax.image.resize(
                    h, (batch, t, height * 2, width * 2, channels), "nearest"
                )
            if up_t or up_s:
                h = CausalConv3D(features, name=f"up_{level}_upconv", **common)(h)
        groups = 8 if h.shape[-1] % 8 == 0 else 1
        h = nn.GroupNorm(groups, dtype=jnp.float32, name="norm_out")(h.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        return CausalConv3D(3, name="proj", **common)(h).astype(jnp.float32)


class VideoAutoencoderKL(nn.Module):
    config: VideoVAEConfig = VideoVAEConfig()
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.encoder = VideoEncoder(self.config, dtype=self.dtype)
        self.decoder = VideoDecoder(self.config, dtype=self.dtype)

    def encode_moments(self, x: jax.Array) -> jax.Array:
        return self.encoder(x)

    def encode(self, x: jax.Array, rng: Optional[jax.Array] = None, sample: bool = True) -> jax.Array:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if sample and rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None) -> jax.Array:
        return self.decode(self.encode(x, rng))
