"""Tiny autoencoder (TAESD-architecture) preview decoders.

Reference: helpers/models/tae — TAE preview decoders streamed during
validation sampling (VALIDATION_PREVIEW_SPEC per family; ValidationPreviewer
at helpers/training/validation.py:1633).  Architecture mirrors
madebyollin/taesd so public checkpoints import directly: clamp-tanh bottleneck,
3 stages of 3 residual conv blocks with stride-2 (encoder) / nearest-upsample
(decoder) transitions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TAEConfig:
    latent_channels: int = 4  # taesd: 4 (sd), taesdxl: 4, taef1: 16
    base_channels: int = 64
    num_stages: int = 3  # 8x spatial

    @classmethod
    def taesd(cls) -> "TAEConfig":
        return cls()

    @classmethod
    def taef1(cls) -> "TAEConfig":
        return cls(latent_channels=16)

    @classmethod
    def tiny(cls) -> "TAEConfig":
        return cls(base_channels=8, num_stages=2)


class TAEBlock(nn.Module):
    """conv-relu ×3 with residual (taesd Block)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv_0")(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv_2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv_4")(h)
        skip = x
        if x.shape[-1] != self.channels:
            skip = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="skip")(x)
        return nn.relu(h + skip)


class TAEDecoder(nn.Module):
    config: TAEConfig = TAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latents):  # (B, h, w, C) -> (B, 8h, 8w, 3) in [0, 1]
        cfg = self.config
        c = cfg.base_channels
        x = jnp.tanh(latents / 3.0) * 3.0  # taesd clamp
        x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        x = nn.relu(x)
        layer = 0
        for stage in range(cfg.num_stages):
            for block in range(3):
                x = TAEBlock(c, dtype=self.dtype, name=f"block_{layer}")(x)
                layer += 1
            b, h, w, ch = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, ch), "nearest")
            x = nn.Conv(c, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name=f"upconv_{stage}")(x)
        x = TAEBlock(c, dtype=self.dtype, name=f"block_{layer}")(x)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class TAEEncoder(nn.Module):
    config: TAEConfig = TAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):  # (B, H, W, 3) in [0,1] -> (B, H/8, W/8, C)
        cfg = self.config
        c = cfg.base_channels
        x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(pixels)
        layer = 0
        for stage in range(cfg.num_stages):
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"downconv_{stage}")(x)
            for block in range(3):
                x = TAEBlock(c, dtype=self.dtype, name=f"block_{layer}")(x)
                layer += 1
        return nn.Conv(cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


def load_taesd_decoder(config: TAEConfig, path: str) -> Dict[str, Any]:
    """Import a taesd ``decoder.safetensors`` (torch sequential layout:
    ``decoder.N.weight`` convs / ``N.conv.M`` block convs) into TAEDecoder params."""
    from .weight_import import read_safetensors

    w = read_safetensors(path)
    w = {k.removeprefix("decoder."): v for k, v in w.items()}

    def conv(key):
        out = {"kernel": np.ascontiguousarray(np.asarray(w[f"{key}.weight"], np.float32).transpose(2, 3, 1, 0))}
        if f"{key}.bias" in w:
            out["bias"] = np.asarray(w[f"{key}.bias"], np.float32)
        return out

    # taesd decoder sequential: 0=clamp,1=conv_in,2=relu, then blocks/upsamples
    params: Dict[str, Any] = {"conv_in": conv("1")}
    index = 3
    layer = 0
    for stage in range(config.num_stages):
        for _ in range(3):
            params[f"block_{layer}"] = {
                "conv_0": conv(f"{index}.conv.0"),
                "conv_2": conv(f"{index}.conv.2"),
                "conv_4": conv(f"{index}.conv.4"),
            }
            layer += 1
            index += 1
        index += 1  # Upsample module (no params)
        params[f"upconv_{stage}"] = conv(str(index))
        index += 1
    params[f"block_{layer}"] = {
        "conv_0": conv(f"{index}.conv.0"),
        "conv_2": conv(f"{index}.conv.2"),
        "conv_4": conv(f"{index}.conv.4"),
    }
    index += 1
    params["conv_out"] = conv(str(index))
    return {"params": params}
