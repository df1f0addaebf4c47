"""Cosmos3 AVAE audio tokenizer validated against a torch oracle of the
reference math (Cosmos3AVAEAudioTokenizer; reference
helpers/models/cosmos3/audio_tokenizer.py): STFT ConvNeXt encoder (hann,
center=False, real++imag channels, scale-only fp32 LayerNorm, SnakeBeta),
Oobleck VAE bottleneck (mode = mean), and the Oobleck decoder (weight-normed
convs, ConvTranspose with output_padding=stride%2, dilated residual units)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.cosmos3.audio_tokenizer import (
    Cosmos3AudioTokenizer,
    Cosmos3AudioTokenizerConfig,
    cosmos3_audio_tokenizer_params,
)

pytestmark = pytest.mark.slow

CFG = Cosmos3AudioTokenizerConfig.tiny()


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _fixture(rng):
    w = {}

    def wn_conv(key, out_c, in_c, k, bias=True):
        v = rng.normal(0, 0.3, (out_c, in_c, k)).astype(np.float32)
        w[f"{key}.weight_v"] = v
        w[f"{key}.weight_g"] = rng.uniform(0.5, 1.5, (out_c, 1, 1)).astype(np.float32)
        if bias:
            w[f"{key}.bias"] = rng.normal(0, 0.05, (out_c,)).astype(np.float32)

    def conv(key, out_c, in_c, k, bias=True):
        w[f"{key}.weight"] = rng.normal(0, 0.1, (out_c, in_c, k)).astype(np.float32)
        if bias:
            w[f"{key}.bias"] = rng.normal(0, 0.05, (out_c,)).astype(np.float32)

    def snake(key, c):
        w[f"{key}.alpha"] = rng.normal(0, 0.3, (1, c, 1)).astype(np.float32)
        w[f"{key}.beta"] = rng.normal(0, 0.3, (1, c, 1)).astype(np.float32)

    def convnext(key, h):
        conv(f"{key}.dwconv.1", h, 1, 7)  # depthwise: groups=h -> (h, 1, 7)
        w[f"{key}.norm.weight"] = rng.normal(1, 0.1, (h,)).astype(np.float32)
        conv(f"{key}.pwconv1", 4 * h, h, 1)
        snake(f"{key}.act", 4 * h)
        conv(f"{key}.pwconv2", h, 4 * h, 1)

    ed = CFG.enc_dim  # 8
    in_feat = (CFG.enc_n_fft + 2) * CFG.audio_channels  # 36
    wn_conv("encoder.layers.0", ed, in_feat, 1, bias=False)
    convnext("encoder.layers.1", ed)
    wn_conv("encoder.layers.2", 2 * ed, ed, 4)  # stride 2, pad 1
    convnext("encoder.layers.3", 2 * ed)
    wn_conv("encoder.layers.4", 2 * ed, 2 * ed, 4)
    wn_conv("encoder.layers.5", CFG.enc_latent_dim, 2 * ed, 1, bias=False)

    dd = CFG.dec_dim  # 8
    mults = (1,) + tuple(CFG.dec_c_mults)  # (1,1,2,4)
    wn_conv("decoder.conv1", dd * mults[-1], CFG.vocoder_input_dim, 7)
    strides = tuple(reversed(CFG.dec_strides))  # (2,2,4)
    for i, s in enumerate(strides):
        in_c = dd * mults[len(strides) - i]
        out_c = dd * mults[len(strides) - i - 1]
        snake(f"decoder.block.{i}.snake1", in_c)
        # ConvTranspose1d weight (I, O, k)
        v = rng.normal(0, 0.3, (in_c, out_c, 2 * s)).astype(np.float32)
        w[f"decoder.block.{i}.conv_t1.weight_v"] = v
        w[f"decoder.block.{i}.conv_t1.weight_g"] = rng.uniform(0.5, 1.5, (in_c, 1, 1)).astype(np.float32)
        w[f"decoder.block.{i}.conv_t1.bias"] = rng.normal(0, 0.05, (out_c,)).astype(np.float32)
        for j, dil in enumerate((1, 3, 9)):
            u = f"decoder.block.{i}.res_unit{j+1}"
            snake(f"{u}.snake1", out_c)
            wn_conv(f"{u}.conv1", out_c, out_c, 7)
            snake(f"{u}.snake2", out_c)
            wn_conv(f"{u}.conv2", out_c, out_c, 1)
    snake("decoder.snake1", dd)
    wn_conv("decoder.conv2", CFG.dec_out_channels, dd, 7, bias=False)
    return w


# ---- torch oracle ----

def _fold(w, key):
    if f"{key}.weight" in w:
        return _t(w[f"{key}.weight"])
    v = _t(w[f"{key}.weight_v"])
    g = _t(w[f"{key}.weight_g"])
    return g * v / v.pow(2).sum(dim=(1, 2), keepdim=True).sqrt()


def _conv(w, key, x, stride=1, padding=0, dilation=1, groups=1):
    bias = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.conv1d(x, _fold(w, key), bias, stride=stride, padding=padding,
                    dilation=dilation, groups=groups)


def _snake_t(w, key, x):
    a = torch.exp(_t(w[f"{key}.alpha"]))
    b = torch.exp(_t(w[f"{key}.beta"]))
    return x + (b + 1e-9).reciprocal() * torch.sin(a * x).pow(2)


def _convnext_t(w, key, x):
    h = _conv(w, f"{key}.dwconv.1", F.pad(x, (3, 3)), groups=x.shape[1])
    h = F.layer_norm(h.permute(0, 2, 1).float(), (h.shape[1],),
                     _t(w[f"{key}.norm.weight"]), None, eps=1e-5).permute(0, 2, 1)
    h = _conv(w, f"{key}.pwconv1", h)
    h = _snake_t(w, f"{key}.act", h)
    h = _conv(w, f"{key}.pwconv2", h)
    return x + h


def _encode_t(w, audio):  # (B, C, T) -> (B, C_lat, T_lat) posterior mean
    audio = audio / (audio.abs().max() + 1e-5) * 0.95
    pad = (CFG.hop_size - audio.shape[-1] % CFG.hop_size) % CFG.hop_size
    if pad:
        audio = F.pad(audio, (0, pad))
    b, c, t = audio.shape
    flat = audio.reshape(b * c, t)
    n_fft, hop = CFG.enc_n_fft, CFG.enc_hop_length
    pl = (n_fft - hop) // 2
    flat = F.pad(flat, (pl, (n_fft - hop) - pl)).float()
    window = torch.hann_window(n_fft)
    spec = torch.stft(flat, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                      window=window, center=False, onesided=True, return_complex=True)
    real, imag = torch.view_as_real(spec).chunk(2, dim=-1)
    spec = torch.cat([real, imag], dim=1).squeeze(-1)  # (B*C, n_fft+2, frames)
    spec = spec.reshape(b, c * spec.shape[1], spec.shape[2])

    h = _conv(w, "encoder.layers.0", spec)
    h = _convnext_t(w, "encoder.layers.1", h)
    h = _conv(w, "encoder.layers.2", h, stride=2, padding=1)
    h = _convnext_t(w, "encoder.layers.3", h)
    h = _conv(w, "encoder.layers.4", h, stride=2, padding=1)
    h = _conv(w, "encoder.layers.5", h)
    mean, _scale = h.chunk(2, dim=1)
    return mean


def _decode_t(w, latents):  # (B, C_lat, T_lat) -> (B, out, N)
    h = _conv(w, "decoder.conv1", latents, padding=3)
    strides = tuple(reversed(CFG.dec_strides))
    for i, s in enumerate(strides):
        h = _snake_t(w, f"decoder.block.{i}.snake1", h)
        h = F.conv_transpose1d(h, _fold(w, f"decoder.block.{i}.conv_t1"),
                               _t(w[f"decoder.block.{i}.conv_t1.bias"]),
                               stride=s, padding=math.ceil(s / 2), output_padding=s % 2)
        for j, dil in enumerate((1, 3, 9)):
            u = f"decoder.block.{i}.res_unit{j+1}"
            r = _snake_t(w, f"{u}.snake1", h)
            r = _conv(w, f"{u}.conv1", r, padding=3 * dil, dilation=dil)
            r = _snake_t(w, f"{u}.snake2", r)
            r = _conv(w, f"{u}.conv2", r)
            h = h + r
    h = _snake_t(w, "decoder.snake1", h)
    h = _conv(w, "decoder.conv2", h, padding=3)
    return h.clamp(-1.0, 1.0)


def test_cosmos3_audio_tokenizer_matches_oracle():
    w = _fixture(np.random.default_rng(501))
    variables = jax.tree_util.tree_map(jnp.asarray, cosmos3_audio_tokenizer_params(w, CFG))
    tok = Cosmos3AudioTokenizer(CFG)

    rng = np.random.default_rng(502)
    audio = rng.normal(0, 0.3, (1, 2, 62)).astype(np.float32)

    ref_lat = _encode_t(w, _t(audio)).numpy()
    ours_lat = tok.apply(variables, jnp.asarray(audio), method=tok.encode)
    np.testing.assert_allclose(np.asarray(ours_lat), ref_lat, rtol=3e-4, atol=3e-4)

    latents = rng.normal(0, 1, (1, CFG.vocoder_input_dim, 4)).astype(np.float32)
    ref_audio = _decode_t(w, _t(latents)).numpy()
    ours_audio = tok.apply(variables, jnp.asarray(latents), method=tok.decode)
    np.testing.assert_allclose(np.asarray(ours_audio), ref_audio, rtol=3e-4, atol=3e-4)

    assert ours_lat.shape == (1, CFG.vocoder_input_dim, 4)  # 64 samples / hop 16
    assert ours_audio.shape == (1, 2, 4 * CFG.hop_size)

    sampled = tok.apply(variables, jnp.asarray(audio), method=tok.encode,
                        rng=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(sampled), np.asarray(ours_lat))


def test_cosmos3_audio_tokenizer_rejects_decoder_only(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.cosmos3.audio_tokenizer import load_cosmos3_audio_tokenizer

    w = {k: v for k, v in _fixture(np.random.default_rng(503)).items()
         if k.startswith("decoder.")}
    path = tmp_path / "avae.safetensors"
    save_file(w, str(path))
    with pytest.raises(ValueError, match="decoder-only"):
        load_cosmos3_audio_tokenizer(CFG, str(path))
