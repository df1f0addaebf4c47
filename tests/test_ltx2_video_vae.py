"""LTX-2 video VAE validated against a torch oracle of the reference math
(AutoencoderKLLTX2Video; reference helpers/models/ltxvideo2/autoencoder.py):
causal 3D convs (replicate temporal pad, zeros/reflect spatial pad), per-pixel
channel RMS norm, LayerNorm+1x1x1-conv resnet shortcuts, pixel-unshuffle
downsamplers with grouped-mean residuals, pixel-shuffle upsamplers with
channel-tiled residuals and first-frame crops, the [C, p_t, p_w, p_h]
patchify order, and the shared-log-var moment tail."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.ltxvideo2.video_vae import (
    LTX2VideoVAE,
    LTX2VideoVAEConfig,
    LTX2VideoDecoder,
    LTX2VideoEncoder,
    ltx2_video_vae_params,
)

pytestmark = pytest.mark.slow

CFG = LTX2VideoVAEConfig.tiny()


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _fixture(rng):
    w = {}

    def conv3(key, out_c, in_c, k=3):
        w[f"{key}.weight"] = rng.normal(0, 0.08, (out_c, in_c, k, k, k)).astype(np.float32)
        w[f"{key}.bias"] = rng.normal(0, 0.02, (out_c,)).astype(np.float32)

    def resnet(key, in_c, out_c):
        conv3(f"{key}.conv1.conv", out_c, in_c)
        conv3(f"{key}.conv2.conv", out_c, out_c)
        if in_c != out_c:
            w[f"{key}.norm3.weight"] = rng.normal(1, 0.05, (in_c,)).astype(np.float32)
            w[f"{key}.norm3.bias"] = rng.normal(0, 0.05, (in_c,)).astype(np.float32)
            conv3(f"{key}.conv_shortcut", out_c, in_c, k=1)

    lat = CFG.latent_channels  # 4
    conv3("encoder.conv_in.conv", lat, CFG.in_channels * CFG.patch_size**2)
    resnet("encoder.down_blocks.0.resnets.0", lat, lat)
    conv3("encoder.down_blocks.0.downsamplers.0.conv.conv", 8 // 4, lat)  # spatial (1,2,2)
    resnet("encoder.down_blocks.1.resnets.0", 8, 8)
    conv3("encoder.down_blocks.1.downsamplers.0.conv.conv", 16 // 8, 8)  # spatiotemporal
    resnet("encoder.mid_block.resnets.0", 16, 16)
    conv3("encoder.conv_out.conv", lat + 1, 16)

    conv3("decoder.conv_in.conv", 16, lat)
    resnet("decoder.mid_block.resnets.0", 16, 16)
    # up0: spatiotemporal, out 16//2=8, no conv_in (in==ups_in==16)
    conv3("decoder.up_blocks.0.upsamplers.0.conv.conv", 16 * 8 // 2, 16)
    resnet("decoder.up_blocks.0.resnets.0", 8, 8)
    # up1: out 12//2=6, ups_in=12 != 8 -> conv_in resnet (exercises norm3)
    resnet("decoder.up_blocks.1.conv_in", 8, 12)
    conv3("decoder.up_blocks.1.upsamplers.0.conv.conv", 12 * 4 // 2, 12)  # spatial
    resnet("decoder.up_blocks.1.resnets.0", 6, 6)
    conv3("decoder.conv_out.conv", CFG.in_channels * CFG.patch_size**2, 6)

    w["latents_mean"] = rng.normal(0, 0.3, (lat,)).astype(np.float32)
    w["latents_std"] = rng.uniform(0.5, 1.5, (lat,)).astype(np.float32)
    return w


# ---- torch oracle (reference math, NCTHW layout) ----

def _rms_t(x):
    return x / torch.sqrt(torch.mean(x**2, dim=1, keepdim=True) + 1e-8)


def _cconv(w, key, x, causal, mode):
    weight, bias = _t(w[f"{key}.weight"]), _t(w[f"{key}.bias"])
    kt, kh, kw = weight.shape[2:]
    if causal:
        x = torch.cat([x[:, :, :1].repeat(1, 1, kt - 1, 1, 1), x], dim=2)
    else:
        left = x[:, :, :1].repeat(1, 1, (kt - 1) // 2, 1, 1)
        right = x[:, :, -1:].repeat(1, 1, (kt - 1) // 2, 1, 1)
        x = torch.cat([left, x, right], dim=2)
    if kh // 2 or kw // 2:
        x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2, 0, 0),
                  mode="reflect" if mode == "reflect" else "constant")
    return F.conv3d(x, weight, bias)


def _resnet_t(w, key, x, causal, mode):
    h = _cconv(w, f"{key}.conv1.conv", F.silu(_rms_t(x)), causal, mode)
    h = _cconv(w, f"{key}.conv2.conv", F.silu(_rms_t(h)), causal, mode)
    if f"{key}.conv_shortcut.weight" in w:
        x = F.layer_norm(x.movedim(1, -1), (x.shape[1],),
                         _t(w[f"{key}.norm3.weight"]), _t(w[f"{key}.norm3.bias"]),
                         eps=1e-6).movedim(-1, 1)
        x = F.conv3d(x, _t(w[f"{key}.conv_shortcut.weight"]), _t(w[f"{key}.conv_shortcut.bias"]))
    return x + h


def _unshuffle_t(x, s):
    b, c, t, h, wd = x.shape
    x = x.reshape(b, c, t // s[0], s[0], h // s[1], s[1], wd // s[2], s[2])
    return x.permute(0, 1, 3, 5, 7, 2, 4, 6).reshape(
        b, c * s[0] * s[1] * s[2], t // s[0], h // s[1], wd // s[2])


def _shuffle_t(x, s):
    b, c, t, h, wd = x.shape
    cp = c // (s[0] * s[1] * s[2])
    x = x.reshape(b, cp, s[0], s[1], s[2], t, h, wd)
    return x.permute(0, 1, 5, 2, 6, 3, 7, 4).reshape(b, cp, t * s[0], h * s[1], wd * s[2])


def _down_t(w, key, x, stride, out_ch, causal, mode):
    if stride[0] > 1:
        x = torch.cat([x[:, :, : stride[0] - 1], x], dim=2)
    group = (x.shape[1] * stride[0] * stride[1] * stride[2]) // out_ch
    res = _unshuffle_t(x, stride)
    res = res.reshape(res.shape[0], -1, group, *res.shape[2:]).mean(dim=2)
    h = _cconv(w, f"{key}.conv.conv", x, causal, mode)
    return _unshuffle_t(h, stride) + res


def _up_t(w, key, x, stride, residual, factor, causal, mode):
    res = None
    if residual:
        res = _shuffle_t(x, stride)
        res = res.repeat(1, (stride[0] * stride[1] * stride[2]) // factor, 1, 1, 1)
        res = res[:, :, stride[0] - 1:]
    h = _cconv(w, f"{key}.conv.conv", x, causal, mode)
    h = _shuffle_t(h, stride)[:, :, stride[0] - 1:]
    return h + res if res is not None else h


def _encode_t(w, video):  # video (B, 3, T, H, W)
    p, pt = CFG.patch_size, CFG.patch_size_t
    b, c, t, h, wd = video.shape
    x = video.reshape(b, c, t // pt, pt, h // p, p, wd // p, p)
    x = x.permute(0, 1, 3, 7, 5, 2, 4, 6).reshape(b, c * pt * p * p, t // pt, h // p, wd // p)
    mode, causal = "zeros", True
    x = _cconv(w, "encoder.conv_in.conv", x, causal, mode)
    x = _resnet_t(w, "encoder.down_blocks.0.resnets.0", x, causal, mode)
    x = _down_t(w, "encoder.down_blocks.0.downsamplers.0", x, (1, 2, 2), 8, causal, mode)
    x = _resnet_t(w, "encoder.down_blocks.1.resnets.0", x, causal, mode)
    x = _down_t(w, "encoder.down_blocks.1.downsamplers.0", x, (2, 2, 2), 16, causal, mode)
    x = _resnet_t(w, "encoder.mid_block.resnets.0", x, causal, mode)
    x = _cconv(w, "encoder.conv_out.conv", F.silu(_rms_t(x)), causal, mode)
    last = x[:, -1:].repeat(1, x.shape[1] - 2, 1, 1, 1)
    return torch.cat([x, last], dim=1)


def _decode_t(w, latents):  # latents (B, lat, T, H, W)
    mode, causal = "reflect", True
    x = _cconv(w, "decoder.conv_in.conv", latents, causal, mode)
    x = _resnet_t(w, "decoder.mid_block.resnets.0", x, causal, mode)
    # reversed block order: up0 spatiotemporal residual, up1 spatial residual
    x = _up_t(w, "decoder.up_blocks.0.upsamplers.0", x, (2, 2, 2), True, 2, causal, mode)
    x = _resnet_t(w, "decoder.up_blocks.0.resnets.0", x, causal, mode)
    x = _resnet_t(w, "decoder.up_blocks.1.conv_in", x, causal, mode)
    x = _up_t(w, "decoder.up_blocks.1.upsamplers.0", x, (1, 2, 2), True, 2, causal, mode)
    x = _resnet_t(w, "decoder.up_blocks.1.resnets.0", x, causal, mode)
    x = _cconv(w, "decoder.conv_out.conv", F.silu(_rms_t(x)), causal, mode)
    p, pt = CFG.patch_size, CFG.patch_size_t
    b, c, t, h, wd = x.shape
    x = x.reshape(b, -1, pt, p, p, t, h, wd)
    x = x.permute(0, 1, 5, 2, 6, 4, 7, 3)
    return x.reshape(b, x.shape[1], t * pt, h * p, wd * p)


def test_ltx2_video_vae_matches_oracle():
    w = _fixture(np.random.default_rng(401))
    variables = jax.tree_util.tree_map(jnp.asarray, ltx2_video_vae_params(w, CFG))

    rng = np.random.default_rng(402)
    video = rng.normal(0, 1, (1, 3, 5, 16, 16)).astype(np.float32)  # NCTHW

    ref_moments = _encode_t(w, _t(video)).numpy()
    ours_moments = LTX2VideoEncoder(CFG).apply(
        {"params": variables["params"]["encoder"]},
        jnp.asarray(video.transpose(0, 2, 3, 4, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(ours_moments).transpose(0, 4, 1, 2, 3), ref_moments, rtol=2e-4, atol=2e-4
    )

    latents = rng.normal(0, 1, (1, CFG.latent_channels, 3, 2, 2)).astype(np.float32)
    ref_dec = _decode_t(w, _t(latents)).numpy()
    ours_dec = LTX2VideoDecoder(CFG).apply(
        {"params": variables["params"]["decoder"]},
        jnp.asarray(latents.transpose(0, 2, 3, 4, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(ours_dec).transpose(0, 4, 1, 2, 3), ref_dec, rtol=2e-4, atol=2e-4
    )


def test_ltx2_video_vae_roundtrip_shapes():
    w = _fixture(np.random.default_rng(403))
    variables = jax.tree_util.tree_map(jnp.asarray, ltx2_video_vae_params(w, CFG))
    vae = LTX2VideoVAE(CFG)

    video = jnp.asarray(np.random.default_rng(404).normal(0, 1, (1, 5, 16, 16, 3)), jnp.float32)
    latents = vae.apply(variables, video, method=vae.encode)
    # spatial 8x (patch 2 * 2 scalings), temporal causal 8k+1 -> (5-1)/2+1 = 3
    assert latents.shape == (1, 3, 2, 2, CFG.latent_channels)
    recon = vae.apply(variables, latents, method=vae.decode)
    assert recon.shape == video.shape
    assert np.isfinite(np.asarray(recon)).all()

    # sampling path draws from the shared-log-var posterior
    sampled = vae.apply(variables, video, method=vae.encode, rng=jax.random.PRNGKey(0))
    assert sampled.shape == latents.shape
    assert not np.allclose(np.asarray(sampled), np.asarray(latents))

    assert CFG.spatial_compression_ratio == 8
    assert CFG.temporal_compression_ratio == 2
