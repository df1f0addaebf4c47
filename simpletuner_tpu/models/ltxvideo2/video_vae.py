"""LTX-2 video autoencoder in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ltxvideo2/autoencoder.py
(``AutoencoderKLLTX2Video``): a causal 3D-conv VAE over RGB video.

- ``LTX2VideoCausalConv3d`` (autoencoder.py:86-176): temporal axis padded by
  replicating the first frame (k_t-1 frames when causal; split-replicate both
  ends otherwise); spatial axes padded symmetrically with a configurable mode
  (zeros for the encoder, reflect for the decoder).
- ``PerChannelRMSNorm`` (autoencoder.py:52-82): per-location channel RMS with
  eps 1e-8, no affine.
- ``LTX2VideoResnetBlock3d`` (autoencoder.py:181-303): rms→silu→conv ×2 with
  an affine LayerNorm + plain 1×1×1 Conv3d shortcut when channels change.
- ``LTXVideoDownsampler3d`` (autoencoder.py:307-351): first-frames temporal
  front-pad, causal conv to out/∏stride channels, pixel-unshuffle, plus a
  grouped-mean pixel-unshuffle residual.
- ``LTX2VideoUpsampler3d`` (autoencoder.py:355-402): causal conv to
  in·∏stride/upscale channels, pixel-shuffle, drop the first stride_t-1
  frames; optional channel-tiled pixel-shuffle residual.
- Encoder (autoencoder.py:755-904): 4×4 spatial patchify with channel order
  [C, p_t, p_w, p_h], conv_in to ``latent_channels``, down blocks
  (resnets keep width; the downsampler changes it), mid block, rms/silu,
  conv_out to latent+1 channels where the final channel is a shared log-var
  broadcast over the latent width (the "repeat last channel" tail at :900-902).
- Decoder (autoencoder.py:908-1081): conv_in, mid, residual up blocks with
  upsample_factor 2, rms/silu, conv_out to 3·p², inverse patchify.

Layout: flax NTHWC — torch (B, C, T, H, W) maps to (B, T, H, W, C).
Timestep-conditioned decoding and noise injection are off in the shipped
LTX-2 config (autoencoder.py:1147,1152) and are not implemented.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

_STRIDES = {
    "spatial": (1, 2, 2),
    "temporal": (2, 1, 1),
    "spatiotemporal": (2, 2, 2),
}


@dataclasses.dataclass(frozen=True)
class LTX2VideoVAEConfig:
    """Defaults mirror ``AutoencoderKLLTX2Video`` (autoencoder.py:1130-1163)."""

    in_channels: int = 3
    latent_channels: int = 128
    block_out_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    layers_per_block: Tuple[int, ...] = (4, 6, 6, 2, 2)
    spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True, True)
    downsample_type: Tuple[str, ...] = ("spatial", "temporal", "spatiotemporal", "spatiotemporal")
    decoder_block_out_channels: Tuple[int, ...] = (256, 512, 1024)
    decoder_layers_per_block: Tuple[int, ...] = (5, 5, 5, 5)
    decoder_spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True)
    upsample_type: Tuple[str, ...] = ("spatiotemporal", "spatiotemporal", "spatiotemporal")
    upsample_residual: Tuple[bool, ...] = (True, True, True)
    upsample_factor: Tuple[int, ...] = (2, 2, 2)
    patch_size: int = 4
    patch_size_t: int = 1
    encoder_causal: bool = True
    decoder_causal: bool = True
    encoder_spatial_padding_mode: str = "zeros"
    decoder_spatial_padding_mode: str = "reflect"

    @classmethod
    def tiny(cls) -> "LTX2VideoVAEConfig":
        return cls(
            latent_channels=4,
            block_out_channels=(8, 16),
            layers_per_block=(1, 1, 1),
            spatio_temporal_scaling=(True, True),
            downsample_type=("spatial", "spatiotemporal"),
            decoder_block_out_channels=(12, 16),
            decoder_layers_per_block=(1, 1, 1),
            decoder_spatio_temporal_scaling=(True, True),
            upsample_type=("spatial", "spatiotemporal"),
            upsample_residual=(True, True),
            upsample_factor=(2, 2),
            patch_size=2,
        )

    @property
    def spatial_compression_ratio(self) -> int:
        scaled = sum(
            t in ("spatial", "spatiotemporal")
            for t, on in zip(self.downsample_type, self.spatio_temporal_scaling)
            if on
        )
        return self.patch_size * 2**scaled

    @property
    def temporal_compression_ratio(self) -> int:
        scaled = sum(
            t in ("temporal", "spatiotemporal")
            for t, on in zip(self.downsample_type, self.spatio_temporal_scaling)
            if on
        )
        return self.patch_size_t * 2**scaled


def _rms(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """PerChannelRMSNorm (autoencoder.py:52-82): channel RMS, no affine."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True) + eps).astype(x.dtype)


def _pixel_unshuffle(x: jax.Array, stride: Tuple[int, int, int]) -> jax.Array:
    """Space/time-to-channel with torch channel order [C, s_t, s_h, s_w]."""
    b, t, h, w, c = x.shape
    s0, s1, s2 = stride
    x = x.reshape(b, t // s0, s0, h // s1, s1, w // s2, s2, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, t // s0, h // s1, w // s2, c * s0 * s1 * s2)


def _pixel_shuffle(x: jax.Array, stride: Tuple[int, int, int]) -> jax.Array:
    """Channel-to-space/time, channel split [C', s_t, s_h, s_w] (C' major)."""
    b, t, h, w, c = x.shape
    s0, s1, s2 = stride
    cp = c // (s0 * s1 * s2)
    x = x.reshape(b, t, h, w, cp, s0, s1, s2)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t * s0, h * s1, w * s2, cp)


def patchify_video(x: jax.Array, patch: int, patch_t: int) -> jax.Array:
    """Encoder patchify (autoencoder.py:878-882): channel order
    [C, p_t, p_w, p_h] — the reference's "weird patching order"."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // patch_t, patch_t, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 6, 4)
    return x.reshape(b, t // patch_t, h // patch, w // patch, c * patch_t * patch * patch)


def unpatchify_video(x: jax.Array, patch: int, patch_t: int) -> jax.Array:
    """Decoder unpatchify (autoencoder.py:1077-1079), inverse channel order."""
    b, t, h, w, c = x.shape
    cp = c // (patch_t * patch * patch)
    x = x.reshape(b, t, h, w, cp, patch_t, patch, patch)
    x = x.transpose(0, 1, 5, 2, 7, 3, 6, 4)
    return x.reshape(b, t * patch_t, h * patch, w * patch, cp)


class VideoCausalConv(nn.Module):
    """LTX2VideoCausalConv3d (autoencoder.py:86-176): replicate-pad the
    temporal axis (fully left when causal), pad spatial axes symmetrically
    with ``spatial_mode`` semantics, then a VALID conv."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    spatial_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = True):
        kt, kh, kw = self.kernel
        left = kt - 1 if causal else (kt - 1) // 2
        right = 0 if causal else (kt - 1) // 2
        parts = []
        if left:
            parts.append(jnp.repeat(x[:, :1], left, axis=1))
        parts.append(x)
        if right:
            parts.append(jnp.repeat(x[:, -1:], right, axis=1))
        if len(parts) > 1:
            x = jnp.concatenate(parts, axis=1)
        ph, pw = kh // 2, kw // 2
        if ph or pw:
            mode = "reflect" if self.spatial_mode == "reflect" else "constant"
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)
        return nn.Conv(
            self.features, self.kernel, strides=self.stride, padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class VideoResnetBlock(nn.Module):
    """LTX2VideoResnetBlock3d (autoencoder.py:181-303), without the unused
    noise-injection / timestep-conditioning branches."""

    out_channels: int
    spatial_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = True):
        h = _rms(x)
        h = nn.silu(h)
        h = VideoCausalConv(self.out_channels, spatial_mode=self.spatial_mode,
                            dtype=self.dtype, name="conv1")(h, causal)
        h = _rms(h)
        h = nn.silu(h)
        h = VideoCausalConv(self.out_channels, spatial_mode=self.spatial_mode,
                            dtype=self.dtype, name="conv2")(h, causal)
        if x.shape[-1] != self.out_channels:
            # affine LayerNorm + plain (non-causal) 1x1x1 Conv3d shortcut
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x)
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VideoDownsampler(nn.Module):
    """LTXVideoDownsampler3d (autoencoder.py:307-351)."""

    out_channels: int
    stride: Tuple[int, int, int]
    spatial_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = True):
        s0, s1, s2 = self.stride
        vol = s0 * s1 * s2
        group = (x.shape[-1] * vol) // self.out_channels
        if s0 > 1:
            x = jnp.concatenate([x[:, : s0 - 1], x], axis=1)
        residual = _pixel_unshuffle(x, self.stride)
        residual = residual.reshape(*residual.shape[:-1], -1, group).mean(axis=-1)
        h = VideoCausalConv(self.out_channels // vol, spatial_mode=self.spatial_mode,
                            dtype=self.dtype, name="conv")(x, causal)
        return _pixel_unshuffle(h, self.stride) + residual


class VideoUpsampler(nn.Module):
    """LTX2VideoUpsampler3d (autoencoder.py:355-402)."""

    stride: Tuple[int, int, int]
    residual: bool = False
    upscale_factor: int = 1
    spatial_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = True):
        s0, s1, s2 = self.stride
        vol = s0 * s1 * s2
        out_c = (x.shape[-1] * vol) // self.upscale_factor
        res = None
        if self.residual:
            res = _pixel_shuffle(x, self.stride)
            res = jnp.tile(res, (1, 1, 1, 1, vol // self.upscale_factor))
            res = res[:, s0 - 1 :]
        h = VideoCausalConv(out_c, spatial_mode=self.spatial_mode,
                            dtype=self.dtype, name="conv")(x, causal)
        h = _pixel_shuffle(h, self.stride)[:, s0 - 1 :]
        return h + res if res is not None else h


class VideoDownBlock(nn.Module):
    """LTX2VideoDownBlock3D (autoencoder.py:406-525): resnets keep the width;
    the downsampler performs the channel change."""

    out_channels: int
    num_layers: int
    downsample_type: Optional[str]  # None when spatio_temporal_scale is off
    spatial_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = True):
        for j in range(self.num_layers):
            x = VideoResnetBlock(x.shape[-1], self.spatial_mode, self.dtype,
                                 name=f"res_{j}")(x, causal)
        if self.downsample_type is not None:
            x = VideoDownsampler(self.out_channels, _STRIDES[self.downsample_type],
                                 self.spatial_mode, self.dtype, name="downsample")(x, causal)
        return x


class VideoMidBlock(nn.Module):
    """LTX2VideoMidBlock3d (autoencoder.py:530-611)."""

    num_layers: int
    spatial_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = True):
        for j in range(self.num_layers):
            x = VideoResnetBlock(x.shape[-1], self.spatial_mode, self.dtype,
                                 name=f"res_{j}")(x, causal)
        return x


class VideoUpBlock(nn.Module):
    """LTX2VideoUpBlock3d (autoencoder.py:615-750): optional channel-changing
    conv_in resnet, residual upsampler, then resnets at the output width."""

    out_channels: int
    num_layers: int
    upsample_type: Optional[str]
    upsample_residual: bool = False
    upscale_factor: int = 1
    spatial_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = True):
        ups_in = self.out_channels * self.upscale_factor
        conv_in_out = ups_in if self.upsample_type is not None else self.out_channels
        if x.shape[-1] != conv_in_out:
            x = VideoResnetBlock(conv_in_out, self.spatial_mode, self.dtype,
                                 name="conv_in")(x, causal)
        if self.upsample_type is not None:
            x = VideoUpsampler(_STRIDES[self.upsample_type], self.upsample_residual,
                               self.upscale_factor, self.spatial_mode, self.dtype,
                               name="upsample")(x, causal)
        for j in range(self.num_layers):
            x = VideoResnetBlock(self.out_channels, self.spatial_mode, self.dtype,
                                 name=f"res_{j}")(x, causal)
        return x


class LTX2VideoEncoder(nn.Module):
    """LTX2VideoEncoder3d (autoencoder.py:755-904)."""

    config: LTX2VideoVAEConfig = LTX2VideoVAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video, causal: Optional[bool] = None):
        cfg = self.config
        mode = cfg.encoder_spatial_padding_mode
        causal = cfg.encoder_causal if causal is None else causal
        x = patchify_video(video, cfg.patch_size, cfg.patch_size_t)
        x = VideoCausalConv(cfg.latent_channels, spatial_mode=mode, dtype=self.dtype,
                            name="conv_in")(x, causal)
        for i, out_ch in enumerate(cfg.block_out_channels):
            down_type = cfg.downsample_type[i] if cfg.spatio_temporal_scaling[i] else None
            x = VideoDownBlock(out_ch, cfg.layers_per_block[i], down_type, mode,
                               self.dtype, name=f"down_{i}")(x, causal)
        x = VideoMidBlock(cfg.layers_per_block[-1], mode, self.dtype, name="mid")(x, causal)
        x = _rms(x)
        x = nn.silu(x)
        x = VideoCausalConv(cfg.latent_channels + 1, spatial_mode=mode, dtype=self.dtype,
                            name="conv_out")(x, causal)
        # last channel is a shared log-var, broadcast to the latent width
        # (the reference's repeat-and-concat tail, autoencoder.py:900-902)
        logvar = jnp.repeat(x[..., -1:], cfg.latent_channels, axis=-1)
        return jnp.concatenate([x[..., :-1], logvar], axis=-1)


class LTX2VideoDecoder(nn.Module):
    """LTX2VideoDecoder3d (autoencoder.py:908-1081).  Per-block tuples arrive
    in config order and are reversed here, as in the reference constructor."""

    config: LTX2VideoVAEConfig = LTX2VideoVAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, causal: Optional[bool] = None):
        cfg = self.config
        mode = cfg.decoder_spatial_padding_mode
        causal = cfg.decoder_causal if causal is None else causal
        block_out = tuple(reversed(cfg.decoder_block_out_channels))
        layers = tuple(reversed(cfg.decoder_layers_per_block))
        scaling = tuple(reversed(cfg.decoder_spatio_temporal_scaling))
        up_type = tuple(reversed(cfg.upsample_type))
        up_res = tuple(reversed(cfg.upsample_residual))
        up_factor = tuple(reversed(cfg.upsample_factor))

        x = VideoCausalConv(block_out[0], spatial_mode=mode, dtype=self.dtype,
                            name="conv_in")(latents, causal)
        x = VideoMidBlock(layers[0], mode, self.dtype, name="mid")(x, causal)
        for i in range(len(block_out)):
            out_ch = block_out[i] // up_factor[i]
            x = VideoUpBlock(out_ch, layers[i + 1],
                             up_type[i] if scaling[i] else None,
                             up_res[i], up_factor[i], mode, self.dtype,
                             name=f"up_{i}")(x, causal)
        x = _rms(x)
        x = nn.silu(x)
        x = VideoCausalConv(cfg.in_channels * cfg.patch_size**2 * cfg.patch_size_t,
                            spatial_mode=mode, dtype=self.dtype, name="conv_out")(x, causal)
        return unpatchify_video(x, cfg.patch_size, cfg.patch_size_t)


class LTX2VideoVAE(nn.Module):
    """Encoder+decoder with the per-channel latent statistics buffers
    (autoencoder.py:1198-1201)."""

    config: LTX2VideoVAEConfig = LTX2VideoVAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = LTX2VideoEncoder(self.config, self.dtype)
        self.decoder = LTX2VideoDecoder(self.config, self.dtype)
        self.latents_mean = self.param(
            "latents_mean", nn.initializers.zeros, (self.config.latent_channels,), jnp.float32
        )
        self.latents_std = self.param(
            "latents_std", nn.initializers.ones, (self.config.latent_channels,), jnp.float32
        )

    def encode(self, video, rng: Optional[jax.Array] = None):
        """video (B, T, H, W, 3) → normalized latents (posterior mean unless
        an rng is provided for sampling)."""
        moments = self.encoder(video)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return (mean - self.latents_mean) / self.latents_std

    def decode(self, latents):
        return self.decoder(latents * self.latents_std + self.latents_mean)

    def __call__(self, video):
        return self.decode(self.encode(video))


def _conv3d(w: dict, key: str) -> dict:
    out = {"kernel": np.ascontiguousarray(
        np.asarray(w[f"{key}.weight"], np.float32).transpose(2, 3, 4, 1, 0))}
    if f"{key}.bias" in w:
        out["bias"] = np.asarray(w[f"{key}.bias"], np.float32)
    return out


def _causal(w: dict, key: str) -> dict:
    # LTX2VideoCausalConv3d wraps an inner nn.Conv3d called `.conv`
    return {"conv": _conv3d(w, f"{key}.conv")}


def _resnet(w: dict, key: str) -> dict:
    out = {"conv1": _causal(w, f"{key}.conv1"), "conv2": _causal(w, f"{key}.conv2")}
    if f"{key}.conv_shortcut.weight" in w:
        out["norm3"] = {
            "scale": np.asarray(w[f"{key}.norm3.weight"], np.float32),
            "bias": np.asarray(w[f"{key}.norm3.bias"], np.float32),
        }
        out["conv_shortcut"] = _conv3d(w, f"{key}.conv_shortcut")
    return out


def ltx2_video_vae_params(w: dict, config: LTX2VideoVAEConfig) -> dict:
    """Map an ``AutoencoderKLLTX2Video`` torch state dict to our param tree."""
    cfg = config
    enc: dict = {"conv_in": _causal(w, "encoder.conv_in"),
                 "conv_out": _causal(w, "encoder.conv_out")}
    for i in range(len(cfg.block_out_channels)):
        blk: dict = {}
        for j in range(cfg.layers_per_block[i]):
            blk[f"res_{j}"] = _resnet(w, f"encoder.down_blocks.{i}.resnets.{j}")
        if cfg.spatio_temporal_scaling[i]:
            # VideoDownsampler wraps a VideoCausalConv named "conv"
            blk["downsample"] = {"conv": _causal(w, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
        enc[f"down_{i}"] = blk
    enc["mid"] = {
        f"res_{j}": _resnet(w, f"encoder.mid_block.resnets.{j}")
        for j in range(cfg.layers_per_block[-1])
    }

    dec: dict = {"conv_in": _causal(w, "decoder.conv_in"),
                 "conv_out": _causal(w, "decoder.conv_out")}
    layers = tuple(reversed(cfg.decoder_layers_per_block))
    dec["mid"] = {
        f"res_{j}": _resnet(w, f"decoder.mid_block.resnets.{j}")
        for j in range(layers[0])
    }
    scaling = tuple(reversed(cfg.decoder_spatio_temporal_scaling))
    for i in range(len(cfg.decoder_block_out_channels)):
        blk = {}
        if f"decoder.up_blocks.{i}.conv_in.conv1.conv.weight" in w:
            blk["conv_in"] = _resnet(w, f"decoder.up_blocks.{i}.conv_in")
        if scaling[i]:
            blk["upsample"] = {"conv": _causal(w, f"decoder.up_blocks.{i}.upsamplers.0.conv")}
        for j in range(layers[i + 1]):
            blk[f"res_{j}"] = _resnet(w, f"decoder.up_blocks.{i}.resnets.{j}")
        dec[f"up_{i}"] = blk
    params = {
        "encoder": enc,
        "decoder": dec,
        "latents_mean": np.asarray(w.get("latents_mean", np.zeros(cfg.latent_channels)), np.float32),
        "latents_std": np.asarray(w.get("latents_std", np.ones(cfg.latent_channels)), np.float32),
    }
    return {"params": params}


def load_ltx2_video_vae(config: LTX2VideoVAEConfig, path: str) -> dict:
    """Import an ``AutoencoderKLLTX2Video`` torch checkpoint from disk."""
    from ..weight_import import read_safetensors

    return ltx2_video_vae_params(read_safetensors(path), config)
