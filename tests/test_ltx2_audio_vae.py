"""LTX-2 audio VAE import validated against a torch oracle of the reference
math (AutoencoderKLLTX2Audio; reference helpers/models/ltxvideo2/
audio_autoencoder.py): causal asymmetric padding, per-pixel channel RMS norm,
strided causal downsample, nearest-upsample with first-row crop, double-z
posterior, per-channel latent statistics, and the decoder's crop/pad tail."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.ltxvideo2.audio_vae import (
    LATENT_DOWNSAMPLE_FACTOR,
    LTX2AudioVAE,
    LTX2AudioVAEConfig,
    load_ltx2_audio_vae,
)

pytestmark = pytest.mark.slow

CFG = LTX2AudioVAEConfig.tiny()


def _fixture(rng):
    w = {}

    def conv(key, out_c, in_c, k=3):
        w[f"{key}.weight"] = rng.normal(0, 0.1, (out_c, in_c, k, k)).astype(np.float32)
        w[f"{key}.bias"] = rng.normal(0, 0.1, (out_c,)).astype(np.float32)

    def resnet(src, in_c, out_c):
        conv(f"{src}.conv1.conv", out_c, in_c)
        conv(f"{src}.conv2.conv", out_c, out_c)
        if in_c != out_c:
            conv(f"{src}.nin_shortcut.conv", out_c, in_c, k=1)

    base = CFG.base_channels
    conv("encoder.conv_in.conv", base, CFG.in_channels)
    ch = base
    for level, mult in enumerate(CFG.ch_mult):
        out_c = base * mult
        for block in range(CFG.num_res_blocks):
            resnet(f"encoder.down.{level}.block.{block}", ch, out_c)
            ch = out_c
        if level != len(CFG.ch_mult) - 1:
            conv(f"encoder.down.{level}.downsample.conv", ch, ch)
    resnet("encoder.mid.block_1", ch, ch)
    resnet("encoder.mid.block_2", ch, ch)
    conv("encoder.conv_out.conv", 2 * CFG.latent_channels, ch)

    top = base * CFG.ch_mult[-1]
    conv("decoder.conv_in.conv", top, CFG.latent_channels)
    resnet("decoder.mid.block_1", top, top)
    resnet("decoder.mid.block_2", top, top)
    ch = top
    for level in reversed(range(len(CFG.ch_mult))):
        out_c = base * CFG.ch_mult[level]
        for block in range(CFG.num_res_blocks + 1):
            resnet(f"decoder.up.{level}.block.{block}", ch, out_c)
            ch = out_c
        if level != 0:
            conv(f"decoder.up.{level}.upsample.conv", ch, ch)
    conv("decoder.conv_out.conv", CFG.output_channels, ch)
    w["per_channel_statistics.mean-of-means"] = rng.normal(0, 0.3, (CFG.latent_channels,)).astype(np.float32)
    w["per_channel_statistics.std-of-means"] = rng.uniform(0.5, 1.5, (CFG.latent_channels,)).astype(np.float32)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _causal_conv(w, key, x, k=3):
    # x (B, C, T, M); causal axis "height" = T
    pad = (k - 1) // 2 if k == 3 else 0
    x = F.pad(x, (pad, (k - 1) - pad if k == 3 else 0, k - 1, 0))
    return F.conv2d(x, _t(w[f"{key}.weight"]), _t(w[f"{key}.bias"]))


def _pixel_norm(x, eps=1e-6):
    return x * torch.rsqrt(x.pow(2).mean(dim=1, keepdim=True) + eps)


def _resnet(w, src, x):
    out_c = w[f"{src}.conv1.conv.weight"].shape[0]
    h = F.silu(_pixel_norm(x))
    h = _causal_conv(w, f"{src}.conv1.conv", h)
    h = F.silu(_pixel_norm(h))
    h = _causal_conv(w, f"{src}.conv2.conv", h)
    if x.shape[1] != out_c:
        x = F.pad(x, (0, 0, 0, 0))
        x = F.conv2d(x, _t(w[f"{src}.nin_shortcut.conv.weight"]), _t(w[f"{src}.nin_shortcut.conv.bias"]))
    return x + h


def _oracle_encode(w, mel):
    x = _t(mel).permute(0, 3, 1, 2)  # NHWC → NCHW
    h = _causal_conv(w, "encoder.conv_in.conv", x)
    for level in range(len(CFG.ch_mult)):
        for block in range(CFG.num_res_blocks):
            h = _resnet(w, f"encoder.down.{level}.block.{block}", h)
        if level != len(CFG.ch_mult) - 1:
            h = F.pad(h, (0, 1, 2, 0))
            h = F.conv2d(h, _t(w[f"encoder.down.{level}.downsample.conv.weight"]),
                         _t(w[f"encoder.down.{level}.downsample.conv.bias"]), stride=2)
    h = _resnet(w, "encoder.mid.block_1", h)
    h = _resnet(w, "encoder.mid.block_2", h)
    h = F.silu(_pixel_norm(h))
    moments = _causal_conv(w, "encoder.conv_out.conv", h)
    mean = moments[:, : CFG.latent_channels]
    stats_m = _t(w["per_channel_statistics.mean-of-means"]).view(1, -1, 1, 1)
    stats_s = _t(w["per_channel_statistics.std-of-means"]).view(1, -1, 1, 1)
    return ((mean - stats_m) / stats_s).permute(0, 2, 3, 1).numpy()


def _oracle_decode(w, latents):
    stats_m = _t(w["per_channel_statistics.mean-of-means"]).view(1, -1, 1, 1)
    stats_s = _t(w["per_channel_statistics.std-of-means"]).view(1, -1, 1, 1)
    z = _t(latents).permute(0, 3, 1, 2) * stats_s + stats_m
    frames = z.shape[2]
    target_t = max(frames * LATENT_DOWNSAMPLE_FACTOR - (LATENT_DOWNSAMPLE_FACTOR - 1), 1)
    h = _causal_conv(w, "decoder.conv_in.conv", z)
    h = _resnet(w, "decoder.mid.block_1", h)
    h = _resnet(w, "decoder.mid.block_2", h)
    for level in reversed(range(len(CFG.ch_mult))):
        for block in range(CFG.num_res_blocks + 1):
            h = _resnet(w, f"decoder.up.{level}.block.{block}", h)
        if level != 0:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _causal_conv(w, f"decoder.up.{level}.upsample.conv", h)
            h = h[:, :, 1:, :]
    h = F.silu(_pixel_norm(h))
    out = _causal_conv(w, "decoder.conv_out.conv", h)
    out = out[:, : CFG.output_channels, : min(out.shape[2], target_t), : min(out.shape[3], CFG.mel_bins)]
    pad_t = max(target_t - out.shape[2], 0)
    pad_m = max(CFG.mel_bins - out.shape[3], 0)
    if pad_t or pad_m:
        out = F.pad(out, (0, pad_m, 0, pad_t))
    return out.permute(0, 2, 3, 1).numpy()


def test_ltx2_audio_vae_matches_oracle(tmp_path):
    from safetensors.numpy import save_file

    w = _fixture(np.random.default_rng(141))
    path = tmp_path / "audio_vae.safetensors"
    save_file(w, str(path))

    variables = load_ltx2_audio_vae(CFG, str(path))
    vae = LTX2AudioVAE(CFG)
    rng = np.random.default_rng(43)
    mel = rng.normal(0, 1, (2, 9, CFG.mel_bins, CFG.in_channels)).astype(np.float32)

    z = vae.apply(variables, jnp.asarray(mel), method=LTX2AudioVAE.encode)
    ref_z = _oracle_encode(w, mel)
    np.testing.assert_allclose(np.asarray(z), ref_z, rtol=2e-4, atol=2e-4)

    out = vae.apply(variables, z, method=LTX2AudioVAE.decode)
    ref_out = _oracle_decode(w, ref_z)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=5e-4, atol=5e-4)
