"""LTX-2 audio autoencoder in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ltxvideo2/audio_autoencoder.py
(``AutoencoderKLLTX2Audio``): a causal conv VAE over stereo log-mel
spectrograms — 3 resolutions (ch_mult 1/2/4 on base 128), 2 resnet blocks per
level with per-pixel (channel) RMS norm, asymmetric causal padding on the
temporal axis ("height"), strided causal downsampling / nearest-upsample with
crop, double-z posterior (8 latent channels) and per-channel latent
statistics.  The shipped config uses NO attention blocks and pixel norm
(audio_autoencoder.py:757-775 defaults).

Layout: flax NHWC — torch (B, C, T, M) maps to (B, T, M, C); the torch
"height" (causal/temporal) axis is our axis 1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

LATENT_DOWNSAMPLE_FACTOR = 4


@dataclasses.dataclass(frozen=True)
class LTX2AudioVAEConfig:
    base_channels: int = 128
    in_channels: int = 2  # stereo mel
    output_channels: int = 2
    latent_channels: int = 8
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    mel_bins: int = 64
    causality_axis: str = "height"

    @classmethod
    def tiny(cls) -> "LTX2AudioVAEConfig":
        return cls(base_channels=8, ch_mult=(1, 2), num_res_blocks=1, mel_bins=8)


def _causal_pad(x: jax.Array, kernel: Tuple[int, int], axis: str) -> jax.Array:
    """Asymmetric pad (reference LTX2AudioCausalConv2d): the causal axis pads
    entirely on the left/top.  x is NHWC with (T, M) spatial dims."""
    pad_t = kernel[0] - 1
    pad_m = kernel[1] - 1
    if axis == "none":
        pads = ((pad_t // 2, pad_t - pad_t // 2), (pad_m // 2, pad_m - pad_m // 2))
    elif axis == "height":  # temporal causal
        pads = ((pad_t, 0), (pad_m // 2, pad_m - pad_m // 2))
    elif axis in ("width", "width-compatibility"):
        pads = ((pad_t // 2, pad_t - pad_t // 2), (pad_m, 0))
    else:
        raise ValueError(f"invalid causality_axis {axis!r}")
    return jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))


class CausalConv(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    axis: str = "height"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _causal_pad(x, self.kernel, self.axis)
        return nn.Conv(
            self.features, self.kernel, padding="VALID", dtype=self.dtype, name="conv"
        )(x)


def _pixel_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Per-location channel RMS (reference LTX2AudioPixelNorm, dim=channel)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


class AudioResnetBlock(nn.Module):
    out_channels: int
    axis: str = "height"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _pixel_norm(x)
        h = nn.silu(h)
        h = CausalConv(self.out_channels, (3, 3), self.axis, self.dtype, name="conv1")(h)
        h = _pixel_norm(h)
        h = nn.silu(h)
        h = CausalConv(self.out_channels, (3, 3), self.axis, self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = CausalConv(self.out_channels, (1, 1), self.axis, self.dtype, name="nin_shortcut")(x)
        return x + h


class AudioDownsample(nn.Module):
    """Strided conv with causal pre-pad (reference LTX2AudioDownsample)."""

    channels: int
    axis: str = "height"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.axis == "none":
            pads = ((0, 1), (0, 1))
        elif self.axis == "height":
            pads = ((2, 0), (0, 1))
        elif self.axis == "width":
            pads = ((0, 1), (2, 0))
        elif self.axis == "width-compatibility":
            pads = ((0, 1), (1, 0))
        else:
            raise ValueError(self.axis)
        x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class AudioUpsample(nn.Module):
    """Nearest 2x + causal conv + first-row crop (reference LTX2AudioUpsample)."""

    channels: int
    axis: str = "height"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, m, c = x.shape
        x = jax.image.resize(x, (b, 2 * t, 2 * m, c), "nearest")
        x = CausalConv(self.channels, (3, 3), self.axis, self.dtype, name="conv")(x)
        if self.axis == "height":
            x = x[:, 1:]
        elif self.axis == "width":
            x = x[:, :, 1:]
        return x


class LTX2AudioEncoder(nn.Module):
    config: LTX2AudioVAEConfig = LTX2AudioVAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):  # (B, T, M, in_channels) log-mel
        cfg = self.config
        axis = cfg.causality_axis
        h = CausalConv(cfg.base_channels, (3, 3), axis, self.dtype, name="conv_in")(mel)
        in_mult = (1,) + tuple(cfg.ch_mult)
        for level in range(len(cfg.ch_mult)):
            out_ch = cfg.base_channels * cfg.ch_mult[level]
            for block in range(cfg.num_res_blocks):
                h = AudioResnetBlock(out_ch, axis, self.dtype, name=f"down_{level}_block_{block}")(h)
            if level != len(cfg.ch_mult) - 1:
                h = AudioDownsample(h.shape[-1], axis, self.dtype, name=f"down_{level}_downsample")(h)
        h = AudioResnetBlock(h.shape[-1], axis, self.dtype, name="mid_block_1")(h)
        h = AudioResnetBlock(h.shape[-1], axis, self.dtype, name="mid_block_2")(h)
        h = _pixel_norm(h)
        h = nn.silu(h)
        return CausalConv(2 * cfg.latent_channels, (3, 3), axis, self.dtype, name="conv_out")(h)


class LTX2AudioDecoder(nn.Module):
    config: LTX2AudioVAEConfig = LTX2AudioVAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latents):  # (B, T_lat, M_lat, latent_channels)
        cfg = self.config
        axis = cfg.causality_axis
        frames = latents.shape[1]
        target_t = frames * LATENT_DOWNSAMPLE_FACTOR
        if axis != "none":
            target_t = max(target_t - (LATENT_DOWNSAMPLE_FACTOR - 1), 1)

        h = CausalConv(
            cfg.base_channels * cfg.ch_mult[-1], (3, 3), axis, self.dtype, name="conv_in"
        )(latents)
        h = AudioResnetBlock(h.shape[-1], axis, self.dtype, name="mid_block_1")(h)
        h = AudioResnetBlock(h.shape[-1], axis, self.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(cfg.ch_mult))):
            out_ch = cfg.base_channels * cfg.ch_mult[level]
            for block in range(cfg.num_res_blocks + 1):
                h = AudioResnetBlock(out_ch, axis, self.dtype, name=f"up_{level}_block_{block}")(h)
            if level != 0:
                h = AudioUpsample(h.shape[-1], axis, self.dtype, name=f"up_{level}_upsample")(h)
        h = _pixel_norm(h)
        h = nn.silu(h)
        out = CausalConv(cfg.output_channels, (3, 3), axis, self.dtype, name="conv_out")(h)
        # crop/pad to target frames x mel bins (reference decoder tail)
        out = out[:, : min(out.shape[1], target_t), : min(out.shape[2], cfg.mel_bins)]
        pad_t = max(target_t - out.shape[1], 0)
        pad_m = max(cfg.mel_bins - out.shape[2], 0)
        if pad_t or pad_m:
            out = jnp.pad(out, ((0, 0), (0, pad_t), (0, pad_m), (0, 0)))
        return out


class LTX2AudioVAE(nn.Module):
    """Encoder+decoder with the per-channel latent statistics buffers."""

    config: LTX2AudioVAEConfig = LTX2AudioVAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = LTX2AudioEncoder(self.config, self.dtype)
        self.decoder = LTX2AudioDecoder(self.config, self.dtype)
        self.latents_mean = self.param(
            "latents_mean", nn.initializers.zeros, (self.config.latent_channels,), jnp.float32
        )
        self.latents_std = self.param(
            "latents_std", nn.initializers.ones, (self.config.latent_channels,), jnp.float32
        )

    def encode(self, mel, rng: Optional[jax.Array] = None):
        """log-mel (B, T, M, C) → normalized latents (posterior mean unless an
        rng is provided for sampling)."""
        moments = self.encoder(mel)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return (mean - self.latents_mean) / self.latents_std

    def decode(self, latents):
        return self.decoder(latents * self.latents_std + self.latents_mean)

    def __call__(self, mel):
        return self.decode(self.encode(mel))


def load_ltx2_audio_vae(config: LTX2AudioVAEConfig, path: str):
    """Import an ``AutoencoderKLLTX2Audio`` torch checkpoint."""
    from ..weight_import import read_safetensors

    w = read_safetensors(path)

    def conv(key):
        out = {"conv": {"kernel": np.ascontiguousarray(
            np.asarray(w[f"{key}.weight"], np.float32).transpose(2, 3, 1, 0))}}
        if f"{key}.bias" in w:
            out["conv"]["bias"] = np.asarray(w[f"{key}.bias"], np.float32)
        return out

    def conv_maybe_causal(key):
        # causal conv modules wrap an inner `.conv`
        inner = f"{key}.conv" if f"{key}.conv.weight" in w else key
        return conv(inner)

    def resnet(dst, src, params):
        params[f"{dst}"] = {
            "conv1": conv_maybe_causal(f"{src}.conv1"),
            "conv2": conv_maybe_causal(f"{src}.conv2"),
        }
        if f"{src}.nin_shortcut.conv.weight" in w or f"{src}.nin_shortcut.weight" in w:
            params[dst]["nin_shortcut"] = conv_maybe_causal(f"{src}.nin_shortcut")

    cfg = config
    enc: dict = {"conv_in": conv_maybe_causal("encoder.conv_in"),
                 "conv_out": conv_maybe_causal("encoder.conv_out")}
    for level in range(len(cfg.ch_mult)):
        for block in range(cfg.num_res_blocks):
            resnet(f"down_{level}_block_{block}", f"encoder.down.{level}.block.{block}", enc)
        if level != len(cfg.ch_mult) - 1:
            enc[f"down_{level}_downsample"] = conv(f"encoder.down.{level}.downsample.conv")
    resnet("mid_block_1", "encoder.mid.block_1", enc)
    resnet("mid_block_2", "encoder.mid.block_2", enc)

    dec: dict = {"conv_in": conv_maybe_causal("decoder.conv_in"),
                 "conv_out": conv_maybe_causal("decoder.conv_out")}
    for level in range(len(cfg.ch_mult)):
        for block in range(cfg.num_res_blocks + 1):
            resnet(f"up_{level}_block_{block}", f"decoder.up.{level}.block.{block}", dec)
        if level != 0:
            # AudioUpsample wraps a CausalConv named "conv" → one extra level
            dec[f"up_{level}_upsample"] = {"conv": conv_maybe_causal(f"decoder.up.{level}.upsample")}
    resnet("mid_block_1", "decoder.mid.block_1", dec)
    resnet("mid_block_2", "decoder.mid.block_2", dec)

    params = {
        "encoder": enc,
        "decoder": dec,
        "latents_mean": np.asarray(
            w.get("per_channel_statistics.mean-of-means", np.zeros(cfg.latent_channels)), np.float32
        ),
        "latents_std": np.asarray(
            w.get("per_channel_statistics.std-of-means", np.ones(cfg.latent_channels)), np.float32
        ),
    }
    return {"params": params}
