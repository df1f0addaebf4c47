"""LTX-2 latent upsampler in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ltxvideo2/upsampler.py
(``LTX2LatentUpsampler``): the multistage-validation second stage that
upscales stage-1 video latents before refinement:

- initial conv + GroupNorm(32) + SiLU, ``num_blocks_per_stage`` res blocks
  (conv-GN-silu-conv-GN, activation applied AFTER the residual add, :54-61);
- the upsampler head: spatial = per-frame Conv2d to 4·mid + 2x pixel shuffle
  (:162-165); spatiotemporal = Conv3d to 8·mid + 3D shuffle (:153-157);
  temporal = Conv3d to 2·mid + frame shuffle with first-frame crop
  (:166-170, :208-210); rational = conv to num²·mid + shuffle(num) +
  binomial-blur downsample(den) for scales 0.75/1.5/2/4 (:98-120);
- mirrored post-upsample res blocks and a final conv back to ``in_channels``.

``upsample_ltx2_video_latents`` (:250-265) denormalizes with the video VAE's
per-channel statistics, upsamples, and renormalizes.  Layout: flax NTHWC —
torch (B, C, F, H, W) maps to (B, F, H, W, C).  Only ``dims=3`` checkpoints
(the shipped configuration) are supported.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

_RATIONAL_SCALES = {0.75: (3, 4), 1.5: (3, 2), 2.0: (2, 1), 4.0: (4, 1)}


@dataclasses.dataclass(frozen=True)
class LTX2UpsamplerConfig:
    in_channels: int = 128
    mid_channels: int = 512
    num_blocks_per_stage: int = 4
    spatial_upsample: bool = True
    temporal_upsample: bool = False
    spatial_scale: float = 2.0
    rational_resampler: bool = False

    @classmethod
    def tiny(cls) -> "LTX2UpsamplerConfig":
        return cls(in_channels=4, mid_channels=32, num_blocks_per_stage=1)


def _pixel_shuffle_2d(x: jax.Array, p1: int, p2: int) -> jax.Array:
    """(N, H, W, c·p1·p2) → (N, H·p1, W·p2, c), channel split [c, p1, p2]."""
    n, h, w, c = x.shape
    cp = c // (p1 * p2)
    x = x.reshape(n, h, w, cp, p1, p2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * p1, w * p2, cp)


def _pixel_shuffle_3d(x: jax.Array, p: Tuple[int, int, int]) -> jax.Array:
    """(B, F, H, W, c·p1·p2·p3) → (B, F·p1, H·p2, W·p3, c)."""
    b, f, h, w, c = x.shape
    p1, p2, p3 = p
    cp = c // (p1 * p2 * p3)
    x = x.reshape(b, f, h, w, cp, p1, p2, p3)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, f * p1, h * p2, w * p3, cp)


def _binomial_kernel(size: int) -> np.ndarray:
    k = np.array([math.comb(size - 1, i) for i in range(size)], np.float64)
    k2 = np.outer(k, k)
    return (k2 / k2.sum()).astype(np.float32)


def _blur_downsample(x: jax.Array, stride: int, size: int = 5) -> jax.Array:
    """Depthwise binomial blur + stride (reference LTX2BlurDownsample)."""
    if stride == 1:
        return x
    c = x.shape[-1]
    kernel = jnp.asarray(_binomial_kernel(size))[:, :, None, None]
    kernel = jnp.tile(kernel, (1, 1, 1, c))  # (kh, kw, 1, C) depthwise
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride, stride),
        padding=[(size // 2, size // 2)] * 2, feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class _GN(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=min(32, self.features), epsilon=1e-5, dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32)).astype(x.dtype)


class UpsamplerResBlock(nn.Module):
    """LTX2UpsamplerResBlock (:41-61): note silu AFTER the residual add."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = _GN(self.channels, self.dtype, name="norm1")(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = _GN(self.channels, self.dtype, name="norm2")(h)
        return nn.silu(h + x)


class LTX2LatentUpsampler(nn.Module):
    config: LTX2UpsamplerConfig = LTX2UpsamplerConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latents):  # (B, F, H, W, C)
        cfg = self.config
        mid = cfg.mid_channels
        b, f = latents.shape[:2]

        x = nn.Conv(mid, (3, 3, 3), padding=1, dtype=self.dtype, name="initial_conv")(latents)
        x = _GN(mid, self.dtype, name="initial_norm")(x)
        x = nn.silu(x)
        for i in range(cfg.num_blocks_per_stage):
            x = UpsamplerResBlock(mid, self.dtype, name=f"res_{i}")(x)

        if cfg.spatial_upsample and cfg.temporal_upsample:
            x = nn.Conv(8 * mid, (3, 3, 3), padding=1, dtype=self.dtype, name="up_conv")(x)
            x = _pixel_shuffle_3d(x, (2, 2, 2))
        elif cfg.spatial_upsample:
            if cfg.rational_resampler:
                num, den = _RATIONAL_SCALES[float(cfg.spatial_scale)]
                flat = x.reshape(b * f, *x.shape[2:])
                flat = nn.Conv(num * num * mid, (3, 3), padding=1, dtype=self.dtype,
                               name="up_conv")(flat)
                flat = _pixel_shuffle_2d(flat, num, num)
                flat = _blur_downsample(flat, den)
                x = flat.reshape(b, f, *flat.shape[1:])
            else:
                flat = x.reshape(b * f, *x.shape[2:])
                flat = nn.Conv(4 * mid, (3, 3), padding=1, dtype=self.dtype, name="up_conv")(flat)
                flat = _pixel_shuffle_2d(flat, 2, 2)
                x = flat.reshape(b, f, *flat.shape[1:])
        elif cfg.temporal_upsample:
            x = nn.Conv(2 * mid, (3, 3, 3), padding=1, dtype=self.dtype, name="up_conv")(x)
            # frame shuffle then first-frame crop (:208-210)
            bb, ff, h, w, c = x.shape
            x = x.reshape(bb, ff, h, w, c // 2, 2).transpose(0, 1, 5, 2, 3, 4)
            x = x.reshape(bb, ff * 2, h, w, c // 2)[:, 1:]
        else:
            raise ValueError("either spatial_upsample or temporal_upsample must be set")

        for i in range(cfg.num_blocks_per_stage):
            x = UpsamplerResBlock(mid, self.dtype, name=f"post_res_{i}")(x)
        return nn.Conv(cfg.in_channels, (3, 3, 3), padding=1, dtype=self.dtype,
                       name="final_conv")(x)


def upsample_ltx2_video_latents(
    latents: jax.Array,  # (B, F, H, W, C) normalized diffusion latents
    upsampler: LTX2LatentUpsampler,
    variables,
    latents_mean: jax.Array,
    latents_std: jax.Array,
    scaling_factor: float = 1.0,
) -> jax.Array:
    """Stage-2 spatial upscale (reference :250-265): denormalize with the
    video VAE statistics, upsample, renormalize."""
    mean = latents_mean.reshape(1, 1, 1, 1, -1)
    std = latents_std.reshape(1, 1, 1, 1, -1)
    raw = latents * std / scaling_factor + mean
    up = upsampler.apply(variables, raw)
    return (up - mean) * scaling_factor / std


def _conv_nd(w: dict, key: str, spatial: int) -> dict:
    weight = np.asarray(w[f"{key}.weight"], np.float32)
    perm = (2, 3, 4, 1, 0) if spatial == 3 else (2, 3, 1, 0)
    out = {"kernel": np.ascontiguousarray(weight.transpose(*perm))}
    if f"{key}.bias" in w:
        out["bias"] = np.asarray(w[f"{key}.bias"], np.float32)
    return out


def _gn(w: dict, key: str) -> dict:
    return {"norm": {"scale": np.asarray(w[f"{key}.weight"], np.float32),
                     "bias": np.asarray(w[f"{key}.bias"], np.float32)}}


def ltx2_upsampler_params(w: dict, config: LTX2UpsamplerConfig) -> dict:
    params: dict = {
        "initial_conv": _conv_nd(w, "initial_conv", 3),
        "initial_norm": _gn(w, "initial_norm"),
        "final_conv": _conv_nd(w, "final_conv", 3),
    }
    for prefix, ours in (("res_blocks", "res"), ("post_upsample_res_blocks", "post_res")):
        for i in range(config.num_blocks_per_stage):
            params[f"{ours}_{i}"] = {
                "conv1": _conv_nd(w, f"{prefix}.{i}.conv1", 3),
                "norm1": _gn(w, f"{prefix}.{i}.norm1"),
                "conv2": _conv_nd(w, f"{prefix}.{i}.conv2", 3),
                "norm2": _gn(w, f"{prefix}.{i}.norm2"),
            }
    if config.spatial_upsample and config.temporal_upsample:
        params["up_conv"] = _conv_nd(w, "upsampler.0", 3)
    elif config.spatial_upsample and config.rational_resampler:
        params["up_conv"] = _conv_nd(w, "upsampler.conv", 2)
    elif config.spatial_upsample:
        params["up_conv"] = _conv_nd(w, "upsampler.0", 2)
    else:
        params["up_conv"] = _conv_nd(w, "upsampler.0", 3)
    return {"params": params}


def load_ltx2_latent_upsampler(path: str, config: Optional[LTX2UpsamplerConfig] = None):
    """(module, variables) from an LTX-2 upsampler safetensors checkpoint;
    the config rides the file's safetensors metadata when present
    (reference :238-247)."""
    import json

    from ..weight_import import read_safetensors

    if config is None:
        try:
            from safetensors import safe_open

            with safe_open(path, framework="np") as handle:
                meta = handle.metadata() or {}
            raw = json.loads(meta.get("config", "{}"))
        except Exception:
            raw = {}
        if raw.get("dims", 3) != 3:
            raise NotImplementedError("only dims=3 LTX-2 upsampler checkpoints are supported")
        config = LTX2UpsamplerConfig(
            in_channels=raw.get("in_channels", 128),
            mid_channels=raw.get("mid_channels", 512),
            num_blocks_per_stage=raw.get("num_blocks_per_stage", 4),
            spatial_upsample=raw.get("spatial_upsample", True),
            temporal_upsample=raw.get("temporal_upsample", False),
            spatial_scale=raw.get("spatial_scale", 2.0),
            rational_resampler=raw.get("rational_resampler", False),
        )
    module = LTX2LatentUpsampler(config)
    return module, ltx2_upsampler_params(read_safetensors(path), config)
