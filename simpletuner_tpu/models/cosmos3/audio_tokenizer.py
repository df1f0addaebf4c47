"""Cosmos3 AVAE audio tokenizer in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/cosmos3/audio_tokenizer.py
(``Cosmos3AVAEAudioTokenizer``, the sound-generation submodality of the omni
model):

- **Encoder** (``Cosmos3AudioSpectrogramConvNeXtEncoder``, :111-230): an STFT
  front-end (hann window, center=False, onesided; real++imag stacked to
  ``n_fft+2`` channels per audio channel) feeding a 1x1 conv, then per stage
  ``num_blocks`` ConvNeXt blocks (depthwise k7, scale-only fp32 LayerNorm,
  1x1 → SnakeBeta → 1x1) and a strided conv (k=2·stride, pad ceil(stride/2)),
  closed by a bias-free 1x1 to ``enc_latent_dim`` moments.
- **Bottleneck**: Oobleck diagonal gaussian — mean ++ scale split, std =
  softplus(scale)+1e-4, mode = mean.
- **Decoder** (``Cosmos3AudioDecoder``, :314-352): Oobleck — k7 conv in,
  per (reversed) stride a SnakeBeta + ConvTranspose (k=2s, pad ceil(s/2),
  output_padding s%2) + three dilated residual units (dilation 1/3/9), then
  SnakeBeta + bias-free k7 conv out, clamped to [-1, 1].
- ``Snake1d`` (:41-64) is log-scale SnakeBeta:
  ``x + (exp(beta)+1e-9)^-1 · sin(exp(alpha)·x)^2``.

Weight-normed torch convs are folded to plain kernels at import
(``weight = g · v / ||v||``).  Layout: flax NTC — torch (B, C, T) maps to
(B, T, C); the public encode/decode keep the torch (B, C, T) interface.
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


@dataclasses.dataclass(frozen=True)
class Cosmos3AudioTokenizerConfig:
    """Defaults mirror the shipped AVAE config (audio_tokenizer.py:440-483)."""

    sampling_rate: int = 48000
    vocoder_input_dim: int = 64  # latent channels (== transformer sound_dim)
    input_channels: int = 1
    stereo: bool = True
    enc_dim: int = 192
    enc_num_blocks: int = 2
    enc_n_fft: int = 64
    enc_hop_length: int = 16
    enc_latent_dim: int = 128
    enc_c_mults: Tuple[int, ...] = (1, 2, 4)
    enc_strides: Tuple[int, ...] = (4, 5, 6)
    enc_use_snake: bool = True
    dec_dim: int = 320
    dec_c_mults: Tuple[int, ...] = (1, 2, 4, 8, 16)
    dec_strides: Tuple[int, ...] = (2, 4, 5, 6, 8)
    dec_out_channels: int = 2
    normalize_volume: bool = True

    @property
    def audio_channels(self) -> int:
        return self.input_channels * (2 if self.stereo else 1)

    @property
    def hop_size(self) -> int:
        return int(np.prod(self.dec_strides))

    @classmethod
    def tiny(cls) -> "Cosmos3AudioTokenizerConfig":
        return cls(
            vocoder_input_dim=4,
            enc_dim=8,
            enc_num_blocks=1,
            enc_n_fft=16,
            enc_hop_length=4,
            enc_latent_dim=8,
            enc_c_mults=(1, 2),
            enc_strides=(2, 2),
            dec_dim=8,
            dec_c_mults=(1, 2, 4),
            dec_strides=(4, 2, 2),
        )


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """Log-scale SnakeBeta (audio_tokenizer.py:55-64); x is NTC, params (C,)."""
    a = jnp.exp(alpha)
    b = jnp.exp(beta)
    return x + jnp.sin(a * x) ** 2 / (b + 1e-9)


def stft_features(wave: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """torch.stft equivalent (audio_tokenizer.py:196-211): pad
    (n_fft-hop)/2-split, periodic hann, center=False, onesided; returns
    (B, frames, n_fft+2) real++imag features."""
    pad_left = (n_fft - hop) // 2
    pad_right = (n_fft - hop) - pad_left
    wave = jnp.pad(wave.astype(jnp.float32), ((0, 0), (pad_left, pad_right)))
    n_frames = 1 + (wave.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = wave[:, idx]  # (B, frames, n_fft)
    window = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n_fft) / n_fft)
    spec = jnp.fft.rfft(frames * window, axis=-1)  # (B, frames, n_fft/2+1)
    return jnp.concatenate([jnp.real(spec), jnp.imag(spec)], axis=-1)


class ConvNeXtBlock(nn.Module):
    """Cosmos3AudioConvNeXtBlock (audio_tokenizer.py:67-108), non-causal."""

    hidden: int
    use_snake: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        inter = self.hidden * 4
        h = nn.Conv(self.hidden, (7,), feature_group_count=self.hidden,
                    padding=[(3, 3)], dtype=self.dtype, name="dwconv")(x)
        # FP32LayerNorm(bias=False) over channels
        scale = self.param("norm_scale", nn.initializers.ones, (self.hidden,), jnp.float32)
        h32 = h.astype(jnp.float32)
        h32 = (h32 - h32.mean(-1, keepdims=True)) * jax.lax.rsqrt(
            h32.var(-1, keepdims=True) + 1e-5
        ) * scale
        h = h32.astype(x.dtype)
        h = nn.Conv(inter, (1,), dtype=self.dtype, name="pwconv1")(h)
        if self.use_snake:
            alpha = self.param("act_alpha", nn.initializers.zeros, (inter,), jnp.float32)
            beta = self.param("act_beta", nn.initializers.zeros, (inter,), jnp.float32)
            h = snake_beta(h, alpha, beta)
        else:
            h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.hidden, (1,), dtype=self.dtype, name="pwconv2")(h)
        return x + h


class ConvTranspose1d(nn.Module):
    """torch ConvTranspose1d semantics via lhs-dilated conv with a flipped
    kernel; kernel stored (k, in, out) unflipped."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, I)
        k, p, s = self.kernel_size, self.padding, self.stride
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, self.in_channels, self.out_channels), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), jnp.flip(kernel, 0).astype(self.dtype),
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p + self.output_padding)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(y.dtype)


class ResidualUnit(nn.Module):
    """Cosmos3AudioResidualUnit (audio_tokenizer.py:234-268)."""

    dim: int
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (7 - 1) * self.dilation // 2
        a1 = self.param("snake1_alpha", nn.initializers.zeros, (self.dim,), jnp.float32)
        b1 = self.param("snake1_beta", nn.initializers.zeros, (self.dim,), jnp.float32)
        h = snake_beta(x, a1, b1)
        h = nn.Conv(self.dim, (7,), kernel_dilation=(self.dilation,),
                    padding=[(pad, pad)], dtype=self.dtype, name="conv1")(h)
        a2 = self.param("snake2_alpha", nn.initializers.zeros, (self.dim,), jnp.float32)
        b2 = self.param("snake2_beta", nn.initializers.zeros, (self.dim,), jnp.float32)
        h = snake_beta(h, a2, b2)
        h = nn.Conv(self.dim, (1,), dtype=self.dtype, name="conv2")(h)
        return x + h


class SpecConvNeXtEncoder(nn.Module):
    """Cosmos3AudioSpectrogramConvNeXtEncoder (audio_tokenizer.py:111-230)."""

    config: Cosmos3AudioTokenizerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio):  # (B, C, T) waveform, torch interface
        cfg = self.config
        batch, channels, samples = audio.shape
        spec = stft_features(audio.reshape(batch * channels, samples),
                             cfg.enc_n_fft, cfg.enc_hop_length)
        frames = spec.shape[1]
        # (B·C, T, F2) -> (B, T, C·F2): channel-major like the torch reshape
        spec = spec.reshape(batch, channels, frames, cfg.enc_n_fft + 2)
        spec = spec.transpose(0, 2, 1, 3).reshape(batch, frames, channels * (cfg.enc_n_fft + 2))

        layer = 0
        h = nn.Conv(cfg.enc_c_mults[0] * cfg.enc_dim, (1,), use_bias=False,
                    dtype=self.dtype, name=f"layer_{layer}")(spec.astype(self.dtype))
        layer += 1
        for index, stride in enumerate(cfg.enc_strides):
            input_dim = cfg.enc_c_mults[index] * cfg.enc_dim
            output_dim = (
                cfg.enc_c_mults[index + 1] * cfg.enc_dim
                if index < len(cfg.enc_c_mults) - 1
                else cfg.enc_c_mults[-1] * cfg.enc_dim
            )
            for _ in range(cfg.enc_num_blocks):
                h = ConvNeXtBlock(input_dim, cfg.enc_use_snake, self.dtype,
                                  name=f"layer_{layer}")(h)
                layer += 1
            pad = math.ceil(stride / 2)
            h = nn.Conv(output_dim, (2 * stride,), strides=(stride,),
                        padding=[(pad, pad)], dtype=self.dtype, name=f"layer_{layer}")(h)
            layer += 1
        h = nn.Conv(cfg.enc_latent_dim, (1,), use_bias=False, dtype=self.dtype,
                    name=f"layer_{layer}")(h)
        return h  # (B, T_lat, enc_latent_dim) moments


class OobleckDecoder(nn.Module):
    """Cosmos3AudioDecoder (audio_tokenizer.py:314-352)."""

    config: Cosmos3AudioTokenizerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latents):  # (B, T_lat, vocoder_input_dim)
        cfg = self.config
        mults = (1,) + tuple(cfg.dec_c_mults)
        strides = tuple(reversed(cfg.dec_strides))
        h = nn.Conv(cfg.dec_dim * mults[-1], (7,), padding=[(3, 3)],
                    dtype=self.dtype, name="conv1")(latents.astype(self.dtype))
        for i, stride in enumerate(strides):
            input_dim = cfg.dec_dim * mults[len(strides) - i]
            output_dim = cfg.dec_dim * mults[len(strides) - i - 1]
            a = self.param(f"block_{i}_snake_alpha", nn.initializers.zeros, (input_dim,), jnp.float32)
            b = self.param(f"block_{i}_snake_beta", nn.initializers.zeros, (input_dim,), jnp.float32)
            h = snake_beta(h, a, b)
            h = ConvTranspose1d(
                input_dim, output_dim, kernel_size=2 * stride, stride=stride,
                padding=math.ceil(stride / 2), output_padding=stride % 2,
                dtype=self.dtype, name=f"block_{i}_convt",
            )(h)
            for j, dilation in enumerate((1, 3, 9)):
                h = ResidualUnit(output_dim, dilation, self.dtype,
                                 name=f"block_{i}_res_{j}")(h)
        a = self.param("snake_out_alpha", nn.initializers.zeros, (cfg.dec_dim,), jnp.float32)
        b = self.param("snake_out_beta", nn.initializers.zeros, (cfg.dec_dim,), jnp.float32)
        h = snake_beta(h, a, b)
        return nn.Conv(cfg.dec_out_channels, (7,), padding=[(3, 3)], use_bias=False,
                       dtype=self.dtype, name="conv2")(h)


class Cosmos3AudioTokenizer(nn.Module):
    """Encoder + Oobleck-VAE bottleneck + decoder; torch (B, C, T) interface."""

    config: Cosmos3AudioTokenizerConfig = Cosmos3AudioTokenizerConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = SpecConvNeXtEncoder(self.config, self.dtype)
        self.decoder = OobleckDecoder(self.config, self.dtype)

    def encode(self, sample, rng: Optional[jax.Array] = None):
        """waveform (B, C, T) → latents (B, C_lat, T_lat) (posterior mode
        unless an rng is given; Oobleck std = softplus(scale)+1e-4)."""
        cfg = self.config
        if cfg.normalize_volume:
            sample = sample / (jnp.abs(sample).max() + 1e-5) * 0.95
        pad = (cfg.hop_size - sample.shape[-1] % cfg.hop_size) % cfg.hop_size
        if pad:
            sample = jnp.pad(sample, ((0, 0), (0, 0), (0, pad)))
        moments = self.encoder(sample)  # (B, T, 2*C_lat)
        mean, scale = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jax.nn.softplus(scale) + 1e-4
            mean = mean + std * jax.random.normal(rng, mean.shape)
        return mean.transpose(0, 2, 1)  # (B, C_lat, T_lat)

    def decode(self, latents):
        """latents (B, C_lat, T_lat) → waveform (B, audio_channels, N),
        clamped to [-1, 1] (audio_tokenizer.py:605)."""
        audio = self.decoder(latents.transpose(0, 2, 1))
        return jnp.clip(audio.transpose(0, 2, 1), -1.0, 1.0)

    def __call__(self, sample):
        return self.decode(self.encode(sample))


def _fold_weight_norm(w: dict, key: str) -> np.ndarray:
    """weight-normed Conv1d → effective torch kernel (O, I, k)."""
    if f"{key}.weight" in w:
        return np.asarray(w[f"{key}.weight"], np.float32)
    g = np.asarray(w[f"{key}.weight_g"], np.float32)  # (O, 1, 1)
    v = np.asarray(w[f"{key}.weight_v"], np.float32)  # (O, I, k)
    norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _conv1d(w: dict, key: str) -> dict:
    out = {"kernel": np.ascontiguousarray(_fold_weight_norm(w, key).transpose(2, 1, 0))}
    if f"{key}.bias" in w:
        out["bias"] = np.asarray(w[f"{key}.bias"], np.float32)
    return out


def _snake(w: dict, key: str, dst: dict, alpha_name: str, beta_name: str) -> None:
    dst[alpha_name] = np.asarray(w[f"{key}.alpha"], np.float32).reshape(-1)
    dst[beta_name] = np.asarray(w[f"{key}.beta"], np.float32).reshape(-1)


def cosmos3_audio_tokenizer_params(w: dict, config: Cosmos3AudioTokenizerConfig) -> dict:
    """Map a ``Cosmos3AVAEAudioTokenizer`` torch state dict to our tree."""
    cfg = config
    enc: dict = {}
    layer = 0
    enc[f"layer_{layer}"] = _conv1d(w, f"encoder.layers.{layer}")
    layer += 1
    for index in range(len(cfg.enc_strides)):
        for _ in range(cfg.enc_num_blocks):
            src = f"encoder.layers.{layer}"
            blk = {
                # dwconv is a Sequential(pad, conv) -> index 1
                "dwconv": _conv1d(w, f"{src}.dwconv.1"),
                "norm_scale": np.asarray(w[f"{src}.norm.weight"], np.float32),
                "pwconv1": _conv1d(w, f"{src}.pwconv1"),
                "pwconv2": _conv1d(w, f"{src}.pwconv2"),
            }
            if f"{src}.act.alpha" in w:
                _snake(w, f"{src}.act", blk, "act_alpha", "act_beta")
            enc[f"layer_{layer}"] = blk
            layer += 1
        enc[f"layer_{layer}"] = _conv1d(w, f"encoder.layers.{layer}")
        layer += 1
    enc[f"layer_{layer}"] = _conv1d(w, f"encoder.layers.{layer}")

    dec: dict = {"conv1": _conv1d(w, "decoder.conv1"), "conv2": _conv1d(w, "decoder.conv2")}
    _snake(w, "decoder.snake1", dec, "snake_out_alpha", "snake_out_beta")
    for i in range(len(cfg.dec_strides)):
        src = f"decoder.block.{i}"
        _snake(w, f"{src}.snake1", dec, f"block_{i}_snake_alpha", f"block_{i}_snake_beta")
        # ConvTranspose1d torch kernel (I, O, k) -> ours (k, I, O)
        kt = _fold_weight_norm(w, f"{src}.conv_t1")
        dec[f"block_{i}_convt"] = {
            "kernel": np.ascontiguousarray(kt.transpose(2, 0, 1)),
            "bias": np.asarray(w[f"{src}.conv_t1.bias"], np.float32),
        }
        for j, unit in enumerate(("res_unit1", "res_unit2", "res_unit3")):
            node = {
                "conv1": _conv1d(w, f"{src}.{unit}.conv1"),
                "conv2": _conv1d(w, f"{src}.{unit}.conv2"),
            }
            _snake(w, f"{src}.{unit}.snake1", node, "snake1_alpha", "snake1_beta")
            _snake(w, f"{src}.{unit}.snake2", node, "snake2_alpha", "snake2_beta")
            dec[f"block_{i}_res_{j}"] = node
    return {"params": {"encoder": enc, "decoder": dec}}


def load_cosmos3_audio_tokenizer(config: Cosmos3AudioTokenizerConfig, path: str) -> dict:
    """Import a ``Cosmos3AVAEAudioTokenizer`` torch checkpoint from disk.
    Decoder-only checkpoints (no ``encoder.*`` keys) are rejected — encode
    requires encoder weights (audio_tokenizer.py:567-571)."""
    from ..weight_import import read_safetensors

    w = read_safetensors(path)
    if not any(k.startswith("encoder.") for k in w):
        raise ValueError(
            "decoder-only Cosmos3 AVAE checkpoint: encoder weights are "
            "required for encode(); re-convert with encoder weights"
        )
    return cosmos3_audio_tokenizer_params(w, config)
