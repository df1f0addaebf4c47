"""HunyuanVideo 1.5 super-resolution latent upsamplers in flax.linen.

Reference behavior: helpers/models/hunyuanvideo/modules/upsample.py — the SR
second stage refines (optionally bilinear-resized) video latents before
decoding:

- ``SRTo720pUpsampler`` (:64-91): causal conv in → N ``SRResidualCausalBlock3D``
  (conv-silu-conv-silu-conv with skip, :49-61) → causal conv out, optional
  global residual.
- ``SRTo1080pUpsampler`` (:94-163): bilinear resize to the target spatial
  shape, conv_in PLUS channel-repeat_interleave residual (:144-146), per-level
  stacks of autoencoder ``ResnetBlock``s (RMS norm → swish → causal conv ×2,
  plain 1x1x1 shortcut; autoencoder.py:382-417), RMS norm + swish + conv out.
- Causal conv (autoencoder.py:260-289): spatial symmetric k//2, temporal
  (k-1, 0) replicate padding.
- ``RMS_norm`` (autoencoder.py:243-257): channelwise L2-normalize · sqrt(C) ·
  gamma.

Layout: flax NTHWC — torch (B, C, T, H, W) maps to (B, T, H, W, C).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SR720Config:
    in_channels: int = 32
    out_channels: int = 32
    hidden_channels: int = 64
    num_blocks: int = 6
    global_residual: bool = False

    @classmethod
    def tiny(cls) -> "SR720Config":
        return cls(in_channels=4, out_channels=4, hidden_channels=8, num_blocks=2,
                   global_residual=True)


@dataclasses.dataclass(frozen=True)
class SR1080Config:
    z_channels: int = 32
    out_channels: int = 32
    block_out_channels: Tuple[int, ...] = (128,)
    num_res_blocks: int = 2

    @classmethod
    def tiny(cls) -> "SR1080Config":
        return cls(z_channels=4, out_channels=4, block_out_channels=(8, 12), num_res_blocks=1)


def _hv_rms(x: jax.Array, gamma: jax.Array) -> jax.Array:
    """RMS_norm (autoencoder.py:243-257): L2-normalize over channels · √C · γ
    (torch F.normalize clamps the norm at eps=1e-12)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    y = x.astype(jnp.float32) / jnp.maximum(norm, 1e-12)
    return (y * np.sqrt(x.shape[-1]) * gamma).astype(x.dtype)


class HVCausalConv(nn.Module):
    """CausalConv3d (autoencoder.py:260-289): replicate-pad (k-1, 0) temporal,
    symmetric spatial."""

    features: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        pads = ((0, 0), (k - 1, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0))
        x = jnp.pad(x, pads, mode="edge")
        return nn.Conv(self.features, (k, k, k), padding="VALID", dtype=self.dtype,
                       name="conv")(x)


class SRResidualBlock(nn.Module):
    """SRResidualCausalBlock3D (upsample.py:49-61)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = HVCausalConv(self.channels, dtype=self.dtype, name="conv0")(x)
        h = HVCausalConv(self.channels, dtype=self.dtype, name="conv1")(nn.silu(h))
        h = HVCausalConv(self.channels, dtype=self.dtype, name="conv2")(nn.silu(h))
        return x + h


class HVResnetBlock(nn.Module):
    """Autoencoder ResnetBlock (autoencoder.py:382-417)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g1 = self.param("norm1_gamma", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        h = HVCausalConv(self.out_channels, dtype=self.dtype, name="conv1")(nn.silu(_hv_rms(x, g1)))
        g2 = self.param("norm2_gamma", nn.initializers.ones, (self.out_channels,), jnp.float32)
        h = HVCausalConv(self.out_channels, dtype=self.dtype, name="conv2")(nn.silu(_hv_rms(h, g2)))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class SRTo720pUpsampler(nn.Module):
    config: SR720Config = SR720Config()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C) latents
        cfg = self.config
        residual = x
        y = HVCausalConv(cfg.hidden_channels, dtype=self.dtype, name="in_conv")(x)
        for i in range(cfg.num_blocks):
            y = SRResidualBlock(cfg.hidden_channels, self.dtype, name=f"block_{i}")(y)
        y = HVCausalConv(cfg.out_channels, dtype=self.dtype, name="out_conv")(y)
        if cfg.global_residual and y.shape == residual.shape:
            y = y + residual
        return y


class SRTo1080pUpsampler(nn.Module):
    config: SR1080Config = SR1080Config()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, target_shape: Optional[Tuple[int, int]] = None):
        cfg = self.config
        if target_shape is not None and z.shape[2:4] != tuple(target_shape):
            b, t, h, w, c = z.shape
            th, tw = target_shape
            # bilinear, align_corners=False == jax.image "linear" (half-pixel)
            z = jax.image.resize(z, (b, t, th, tw, c), method="linear")
        repeats = cfg.block_out_channels[0] // cfg.z_channels
        h = HVCausalConv(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(z)
        h = h + jnp.repeat(z, repeats, axis=-1)
        for level, ch in enumerate(cfg.block_out_channels):
            for i in range(cfg.num_res_blocks + 1):
                h = HVResnetBlock(ch, self.dtype, name=f"up_{level}_block_{i}")(h)
        gamma = self.param("norm_out_gamma", nn.initializers.ones, (h.shape[-1],), jnp.float32)
        h = nn.silu(_hv_rms(h, gamma))
        return HVCausalConv(cfg.out_channels, dtype=self.dtype, name="conv_out")(h)


def _conv3d(w: dict, key: str) -> dict:
    out = {"conv": {"kernel": np.ascontiguousarray(
        np.asarray(w[f"{key}.weight"], np.float32).transpose(2, 3, 4, 1, 0))}}
    if f"{key}.bias" in w:
        out["conv"]["bias"] = np.asarray(w[f"{key}.bias"], np.float32)
    return out


def _plain_conv3d(w: dict, key: str) -> dict:
    out = {"kernel": np.ascontiguousarray(
        np.asarray(w[f"{key}.weight"], np.float32).transpose(2, 3, 4, 1, 0))}
    if f"{key}.bias" in w:
        out["bias"] = np.asarray(w[f"{key}.bias"], np.float32)
    return out


def sr720_params_from_checkpoint(w: dict, config: SR720Config) -> dict:
    params: dict = {"in_conv": _conv3d(w, "in_conv.conv"),
                    "out_conv": _conv3d(w, "out_conv.conv")}
    for i in range(config.num_blocks):
        # SRResidualCausalBlock3D.block = Sequential(conv, silu, conv, silu, conv)
        params[f"block_{i}"] = {
            "conv0": _conv3d(w, f"blocks.{i}.block.0.conv"),
            "conv1": _conv3d(w, f"blocks.{i}.block.2.conv"),
            "conv2": _conv3d(w, f"blocks.{i}.block.4.conv"),
        }
    return {"params": params}


def sr1080_params_from_checkpoint(w: dict, config: SR1080Config) -> dict:
    params: dict = {
        "conv_in": _conv3d(w, "conv_in.conv"),
        "conv_out": _conv3d(w, "conv_out.conv"),
        "norm_out_gamma": np.asarray(w["norm_out.gamma"], np.float32).reshape(-1),
    }
    for level in range(len(config.block_out_channels)):
        for i in range(config.num_res_blocks + 1):
            src = f"up.{level}.block.{i}"
            node = {
                "norm1_gamma": np.asarray(w[f"{src}.norm1.gamma"], np.float32).reshape(-1),
                "conv1": _conv3d(w, f"{src}.conv1.conv"),
                "norm2_gamma": np.asarray(w[f"{src}.norm2.gamma"], np.float32).reshape(-1),
                "conv2": _conv3d(w, f"{src}.conv2.conv"),
            }
            if f"{src}.nin_shortcut.weight" in w:
                node["nin_shortcut"] = _plain_conv3d(w, f"{src}.nin_shortcut")
            params[f"up_{level}_block_{i}"] = node
    return {"params": params}


def load_sr_upsampler(kind: str, path: str, tiny: bool = False):
    """(module, variables) for a HunyuanVideo SR stage checkpoint;
    kind ∈ {"720p", "1080p"}."""
    from ..weight_import import read_safetensors

    w = read_safetensors(path)
    if kind == "720p":
        cfg = SR720Config.tiny() if tiny else SR720Config()
        return SRTo720pUpsampler(cfg), sr720_params_from_checkpoint(w, cfg)
    if kind == "1080p":
        cfg = SR1080Config.tiny() if tiny else SR1080Config()
        return SRTo1080pUpsampler(cfg), sr1080_params_from_checkpoint(w, cfg)
    raise ValueError(f"unknown SR upsampler kind {kind!r}; expected 720p or 1080p")
