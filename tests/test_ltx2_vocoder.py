"""LTX-2 vocoder import validated against a torch oracle of the reference math
(LTX2Vocoder; reference helpers/models/ltxvideo2/vocoder.py): transposed-conv
upsample stack, per-stage averaged multi-kernel ResBlocks, SnakeBeta inside
anti-aliased kaiser-sinc up/down resampling."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.ltxvideo2.vocoder import (
    LTX2Vocoder,
    LTX2VocoderConfig,
    kaiser_sinc_filter1d,
    load_ltx2_vocoder,
)

pytestmark = pytest.mark.slow

CFG = LTX2VocoderConfig.tiny()


def _fixture(rng):
    w = {}

    def conv(key, out_c, in_c, k, bias=True):
        w[f"{key}.weight"] = rng.normal(0, 0.1, (out_c, in_c, k)).astype(np.float32)
        if bias:
            w[f"{key}.bias"] = rng.normal(0, 0.1, (out_c,)).astype(np.float32)

    def snake(key, channels):
        w[f"{key}.act.alpha"] = rng.normal(0, 0.3, (channels,)).astype(np.float32)
        w[f"{key}.act.beta"] = rng.normal(0, 0.3, (channels,)).astype(np.float32)

    conv("conv_in", CFG.hidden_channels, CFG.in_channels, 7)
    ch = CFG.hidden_channels
    n_res = len(CFG.resnet_kernel_sizes)
    for i, (factor, k) in enumerate(zip(CFG.upsample_factors, CFG.upsample_kernel_sizes)):
        out_ch = ch // 2
        w[f"upsamplers.{i}.weight"] = rng.normal(0, 0.1, (ch, out_ch, k)).astype(np.float32)
        w[f"upsamplers.{i}.bias"] = rng.normal(0, 0.1, (out_ch,)).astype(np.float32)
        for j, (rk, dils) in enumerate(zip(CFG.resnet_kernel_sizes, CFG.resnet_dilations)):
            r = i * n_res + j
            for d in range(len(dils)):
                conv(f"resnets.{r}.convs1.{d}", out_ch, out_ch, rk)
                conv(f"resnets.{r}.convs2.{d}", out_ch, out_ch, rk)
                snake(f"resnets.{r}.acts1.{d}", out_ch)
                snake(f"resnets.{r}.acts2.{d}", out_ch)
        ch = out_ch
    snake("act_out", ch)
    conv("conv_out", CFG.out_channels, ch, 7, bias=CFG.final_bias)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _snake(w, key, x):
    alpha = torch.exp(_t(w[f"{key}.act.alpha"])).view(1, -1, 1)
    beta = torch.exp(_t(w[f"{key}.act.beta"])).view(1, -1, 1)
    return x + (1.0 / (beta + 1e-9)) * torch.sin(x * alpha).pow(2)


def _down(x, ratio, kernel_size):
    pad_left = kernel_size // 2 + (kernel_size % 2) - 1
    pad_right = kernel_size // 2
    filt = _t(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)).view(1, 1, -1)
    c = x.shape[1]
    x = F.pad(x, (pad_left, pad_right), mode="replicate")
    return F.conv1d(x, filt.expand(c, -1, -1), stride=ratio, groups=c)


def _up(x, ratio, kernel_size):
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    filt = _t(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)).view(1, 1, -1)
    c = x.shape[1]
    x = F.pad(x, (pad, pad), mode="replicate")
    y = ratio * F.conv_transpose1d(x, filt.expand(c, -1, -1), stride=ratio, groups=c)
    return y[..., pad_left:-pad_right]


def _aa_snake(w, key, x):
    x = _up(x, CFG.antialias_ratio, CFG.antialias_kernel)
    x = _snake(w, key, x)
    return _down(x, CFG.antialias_ratio, CFG.antialias_kernel)


def _oracle(w, mel):
    x = _t(mel).transpose(2, 3).flatten(1, 2)
    x = F.conv1d(x, _t(w["conv_in.weight"]), _t(w["conv_in.bias"]), padding=3)
    n_res = len(CFG.resnet_kernel_sizes)
    for i, (factor, k) in enumerate(zip(CFG.upsample_factors, CFG.upsample_kernel_sizes)):
        x = F.conv_transpose1d(x, _t(w[f"upsamplers.{i}.weight"]), _t(w[f"upsamplers.{i}.bias"]),
                               stride=factor, padding=(k - factor) // 2)
        outs = []
        for j, (rk, dils) in enumerate(zip(CFG.resnet_kernel_sizes, CFG.resnet_dilations)):
            r = i * n_res + j
            h = x
            for d, dilation in enumerate(dils):
                t = _aa_snake(w, f"resnets.{r}.acts1.{d}", h)
                t = F.conv1d(t, _t(w[f"resnets.{r}.convs1.{d}.weight"]),
                             _t(w[f"resnets.{r}.convs1.{d}.bias"]),
                             dilation=dilation, padding=dilation * (rk - 1) // 2)
                t = _aa_snake(w, f"resnets.{r}.acts2.{d}", t)
                t = F.conv1d(t, _t(w[f"resnets.{r}.convs2.{d}.weight"]),
                             _t(w[f"resnets.{r}.convs2.{d}.bias"]), padding=(rk - 1) // 2)
                h = h + t
            outs.append(h)
        x = torch.stack(outs, dim=0).mean(dim=0)
    x = _aa_snake(w, "act_out", x)
    x = F.conv1d(x, _t(w["conv_out.weight"]), padding=3)
    return x.numpy()


def test_ltx2_vocoder_matches_oracle(tmp_path):
    from safetensors.numpy import save_file

    w = _fixture(np.random.default_rng(151))
    path = tmp_path / "vocoder.safetensors"
    save_file(w, str(path))

    variables = load_ltx2_vocoder(CFG, str(path))
    vocoder = LTX2Vocoder(CFG)
    rng = np.random.default_rng(47)
    mel = rng.normal(0, 1, (2, 2, 6, CFG.in_channels // 2)).astype(np.float32)

    out = vocoder.apply(variables, jnp.asarray(mel))
    ref = _oracle(w, mel)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)
