"""LTX-2 vocoder in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ltxvideo2/vocoder.py (``LTX2Vocoder`` /
``LTX2VocoderWithBWE``): a BigVGAN-style generator — transposed-conv upsample
stack with parallel multi-kernel ResBlocks averaged per stage, SnakeBeta
activations wrapped in anti-aliased up/down sinc resampling (kaiser-windowed
filters), tanh/clamp output — plus the bandwidth-extension path: causal STFT
→ log-mel of the 16 kHz output feeds a second generator whose residual adds
onto a hann-resampled 48 kHz skip.

All fixed filters (kaiser sinc, hann resampler) are computed in numpy at
trace time; STFT/mel bases ride the checkpoint as parameters.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    delta_f = 4 * half_width
    half_size = kernel_size // 2
    amplitude = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if amplitude > 50.0:
        beta = 0.1102 * (amplitude - 8.7)
    elif amplitude >= 21.0:
        beta = 0.5842 * (amplitude - 21) ** 0.4 + 0.07886 * (amplitude - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    even = kernel_size % 2 == 0
    time = (np.arange(-half_size, half_size) + 0.5) if even else (np.arange(kernel_size) - half_size)
    if cutoff == 0.0:
        return np.zeros_like(time)
    time = 2 * cutoff * time
    sinc = np.where(time == 0, 1.0, np.sin(math.pi * time) / (math.pi * time))
    kernel = 2 * cutoff * window * sinc
    return (kernel / kernel.sum()).astype(np.float32)


def _depthwise_corr(x: jax.Array, kernel: np.ndarray, stride: int = 1) -> jax.Array:
    """Grouped 1-D correlation with a shared fixed filter.  x (B, C, T)."""
    channels = x.shape[1]
    rhs = jnp.asarray(np.tile(kernel[None, None], (channels, 1, 1)), x.dtype)
    return jax.lax.conv_general_dilated(
        x, rhs, window_strides=(stride,), padding="VALID",
        feature_group_count=channels,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


def downsample1d(x: jax.Array, ratio: int, kernel_size: Optional[int] = None) -> jax.Array:
    """(B, C, T) anti-aliased decimation (reference DownSample1d)."""
    kernel_size = kernel_size or int(6 * ratio // 2) * 2
    pad_left = kernel_size // 2 + (kernel_size % 2) - 1
    pad_right = kernel_size // 2
    kernel = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)), mode="edge")
    return _depthwise_corr(x, kernel, stride=ratio)


def _depthwise_transpose(x: jax.Array, kernel: np.ndarray, ratio: int) -> jax.Array:
    """Grouped conv_transpose with a shared fixed filter (no padding).
    Equivalent to zero-stuffing by ``ratio`` then full true convolution."""
    channels = x.shape[1]
    k = kernel.shape[0]
    rhs = jnp.asarray(np.tile(kernel[::-1][None, None], (channels, 1, 1)), x.dtype)
    return jax.lax.conv_general_dilated(
        x, rhs, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(ratio,), feature_group_count=channels,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


def upsample1d(
    x: jax.Array, ratio: int, kernel_size: Optional[int] = None, window_type: str = "kaiser"
) -> jax.Array:
    """(B, C, T) anti-aliased interpolation (reference UpSample1d)."""
    if window_type == "hann":
        rolloff = 0.99
        width_filter = 6
        width = math.ceil(width_filter / rolloff)
        kernel_size = 2 * width * ratio + 1
        pad = width
        pad_left = 2 * width * ratio
        pad_right = kernel_size - ratio
        time_axis = (np.arange(kernel_size) / ratio - width) * rolloff
        clamped = np.clip(time_axis, -width_filter, width_filter)
        window = np.cos(clamped * math.pi / width_filter / 2) ** 2
        kernel = (np.sinc(time_axis) * window * rolloff / ratio).astype(np.float32)
    else:
        kernel_size = kernel_size or int(6 * ratio // 2) * 2
        pad = kernel_size // ratio - 1
        pad_left = pad * ratio + (kernel_size - ratio) // 2
        pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
        kernel = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    y = ratio * _depthwise_transpose(x, kernel, ratio)
    return y[..., pad_left : y.shape[-1] - pad_right]


class SnakeBeta(nn.Module):
    """x + sin²(x·e^α)/(e^β+eps), per-channel log-scale params (reference)."""

    channels: int
    use_beta: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, C, T)
        alpha = jnp.exp(self.param("alpha", nn.initializers.zeros, (self.channels,), jnp.float32))
        shape = (1, self.channels, 1)
        if self.use_beta:
            amp = jnp.exp(self.param("beta", nn.initializers.zeros, (self.channels,), jnp.float32))
        else:
            amp = alpha
        return x + (1.0 / (amp.reshape(shape) + 1e-9)) * jnp.square(jnp.sin(x * alpha.reshape(shape)))


class AntiAliasSnake(nn.Module):
    """upsample → SnakeBeta → downsample (reference AntiAliasAct1d)."""

    channels: int
    use_beta: bool = True
    ratio: int = 2
    kernel_size: int = 12

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = upsample1d(x, self.ratio, self.kernel_size)
        x = SnakeBeta(self.channels, self.use_beta, name="act")(x)
        return downsample1d(x, self.ratio, self.kernel_size)


def _conv1d_same(x, kernel, bias, dilation=1, name=None):
    del name
    pad = dilation * (kernel.shape[-1] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + bias[None, :, None] if bias is not None else y


class Conv1d(nn.Module):
    """torch-layout 1-D conv params (O, I, K), NCH activations."""

    out_channels: int
    in_channels: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "weight", nn.initializers.lecun_normal(),
            (self.out_channels, self.in_channels, self.kernel_size), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32) if self.use_bias else None
        return _conv1d_same(x, kernel, bias, self.dilation)


class VocoderResBlock(nn.Module):
    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    act_fn: str = "leaky_relu"
    negative_slope: float = 0.1
    antialias: bool = False
    antialias_ratio: int = 2
    antialias_kernel: int = 12

    def _act(self, name):
        if self.act_fn in ("snakebeta", "snake"):
            use_beta = self.act_fn == "snakebeta"
            if self.antialias:
                return AntiAliasSnake(
                    self.channels, use_beta, self.antialias_ratio, self.antialias_kernel, name=name
                )
            return SnakeBeta(self.channels, use_beta, name=name)
        slope = self.negative_slope
        return lambda x: jnp.where(x >= 0, x, slope * x)

    @nn.compact
    def __call__(self, x):
        for i, dilation in enumerate(self.dilations):
            h = self._act(f"act1_{i}")(x)
            h = Conv1d(self.channels, self.channels, self.kernel_size, dilation, name=f"conv1_{i}")(h)
            h = self._act(f"act2_{i}")(h)
            h = Conv1d(self.channels, self.channels, self.kernel_size, 1, name=f"conv2_{i}")(h)
            x = x + h
        return x


@dataclasses.dataclass(frozen=True)
class LTX2VocoderConfig:
    in_channels: int = 128
    hidden_channels: int = 1024
    out_channels: int = 2
    upsample_kernel_sizes: Tuple[int, ...] = (16, 15, 8, 4, 4)
    upsample_factors: Tuple[int, ...] = (6, 5, 2, 2, 2)
    resnet_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resnet_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    act_fn: str = "leaky_relu"
    negative_slope: float = 0.1
    antialias: bool = False
    antialias_ratio: int = 2
    antialias_kernel: int = 12
    final_act_fn: Optional[str] = "tanh"
    final_bias: bool = True

    @classmethod
    def tiny(cls) -> "LTX2VocoderConfig":
        return cls(
            in_channels=8, hidden_channels=16, upsample_kernel_sizes=(4, 4),
            upsample_factors=(2, 2), resnet_kernel_sizes=(3,),
            resnet_dilations=((1, 3),), act_fn="snakebeta", antialias=True,
            final_act_fn=None, final_bias=False,
        )


class LTX2Vocoder(nn.Module):
    config: LTX2VocoderConfig = LTX2VocoderConfig()

    @nn.compact
    def __call__(self, mel: jax.Array, time_last: bool = False) -> jax.Array:
        """mel (B, C_stereo, T, M) (or (B, C, M, T) when time_last) → waveform
        (B, out_channels, T·Πfactors)."""
        cfg = self.config
        if not time_last:
            mel = jnp.swapaxes(mel, 2, 3)
        x = mel.reshape(mel.shape[0], -1, mel.shape[-1])  # (B, C*M, T)
        x = Conv1d(cfg.hidden_channels, cfg.in_channels, 7, name="conv_in")(x)

        channels = cfg.hidden_channels
        n_res = len(cfg.resnet_kernel_sizes)
        for i, (factor, kernel_size) in enumerate(zip(cfg.upsample_factors, cfg.upsample_kernel_sizes)):
            out_ch = channels // 2
            if cfg.act_fn == "leaky_relu":
                x = jnp.where(x >= 0, x, cfg.negative_slope * x)
            # learned ConvTranspose1d with padding (K - stride)//2
            weight = self.param(
                f"up_{i}_weight", nn.initializers.lecun_normal(),
                (channels, out_ch, kernel_size), jnp.float32,
            )
            bias = self.param(f"up_{i}_bias", nn.initializers.zeros, (out_ch,), jnp.float32)
            rhs = jnp.transpose(weight, (1, 0, 2))[:, :, ::-1]
            y = jax.lax.conv_general_dilated(
                x, rhs, window_strides=(1,), padding=[(kernel_size - 1, kernel_size - 1)],
                lhs_dilation=(factor,), dimension_numbers=("NCH", "OIH", "NCH"),
            )
            crop = (kernel_size - factor) // 2
            if crop:
                y = y[..., crop:-crop]
            x = y + bias[None, :, None]

            outs = []
            for j, (rk, dils) in enumerate(zip(cfg.resnet_kernel_sizes, cfg.resnet_dilations)):
                outs.append(
                    VocoderResBlock(
                        out_ch, rk, tuple(dils), cfg.act_fn, cfg.negative_slope,
                        cfg.antialias, cfg.antialias_ratio, cfg.antialias_kernel,
                        name=f"res_{i * n_res + j}",
                    )(x)
                )
            x = jnp.mean(jnp.stack(outs, axis=0), axis=0)
            channels = out_ch

        if cfg.act_fn in ("snakebeta", "snake"):
            use_beta = cfg.act_fn == "snakebeta"
            if cfg.antialias:
                x = AntiAliasSnake(channels, use_beta, cfg.antialias_ratio, cfg.antialias_kernel, name="act_out")(x)
            else:
                x = SnakeBeta(channels, use_beta, name="act_out")(x)
        else:
            x = jnp.where(x >= 0, x, 0.01 * x)  # torch LeakyReLU() default
        x = Conv1d(cfg.out_channels, channels, 7, use_bias=cfg.final_bias, name="conv_out")(x)
        if cfg.final_act_fn == "tanh":
            x = jnp.tanh(x)
        elif cfg.final_act_fn == "clamp":
            x = jnp.clip(x, -1.0, 1.0)
        return x


def load_ltx2_vocoder(config: LTX2VocoderConfig, path: str, prefix: str = ""):
    """Import an ``LTX2Vocoder`` torch checkpoint (optionally under a prefix,
    e.g. ``vocoder.`` inside ``LTX2VocoderWithBWE``)."""
    from ..weight_import import read_safetensors

    w = read_safetensors(path)
    if prefix:
        w = {k[len(prefix):]: v for k, v in w.items() if k.startswith(prefix)}
    f32 = lambda key: np.asarray(w[key], np.float32)

    params: dict = {
        "conv_in": {"weight": f32("conv_in.weight"), "bias": f32("conv_in.bias")},
    }
    n_res = len(config.resnet_kernel_sizes)

    def act(dst, src, params_node, channels):
        node: dict = {"alpha": f32(f"{src}.alpha") if f"{src}.alpha" in w else f32(f"{src}.act.alpha")}
        inner = src if f"{src}.alpha" in w else f"{src}.act"
        if f"{inner}.beta" in w:
            node["beta"] = f32(f"{inner}.beta")
        if config.antialias:
            params_node[dst] = {"act": node}
        else:
            params_node[dst] = node

    for i in range(len(config.upsample_factors)):
        params[f"up_{i}_weight"] = f32(f"upsamplers.{i}.weight")
        params[f"up_{i}_bias"] = f32(f"upsamplers.{i}.bias")
    for r in range(len(config.upsample_factors) * n_res):
        block: dict = {}
        for i in range(len(config.resnet_dilations[r % n_res])):
            block[f"conv1_{i}"] = {"weight": f32(f"resnets.{r}.convs1.{i}.weight"),
                                   "bias": f32(f"resnets.{r}.convs1.{i}.bias")}
            block[f"conv2_{i}"] = {"weight": f32(f"resnets.{r}.convs2.{i}.weight"),
                                   "bias": f32(f"resnets.{r}.convs2.{i}.bias")}
            if config.act_fn in ("snakebeta", "snake"):
                act(f"act1_{i}", f"resnets.{r}.acts1.{i}", block, None)
                act(f"act2_{i}", f"resnets.{r}.acts2.{i}", block, None)
        params[f"res_{r}"] = block
    if config.act_fn in ("snakebeta", "snake"):
        act("act_out", "act_out", params, None)
    conv_out = {"weight": f32("conv_out.weight")}
    if config.final_bias:
        conv_out["bias"] = f32("conv_out.bias")
    params["conv_out"] = conv_out
    return {"params": params}
