"""HunyuanVideo 1.5 SR-stage upsamplers validated against a torch oracle of
the reference math (helpers/models/hunyuanvideo/modules/upsample.py:
SRTo720pUpsampler residual causal stacks; SRTo1080pUpsampler bilinear resize
+ channel-repeat residual + RMS-norm resnet levels; causal convs replicate-pad
(k-1,0) temporal and k//2 spatial)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.hunyuanvideo.sr_upsampler import (
    SR720Config,
    SR1080Config,
    SRTo720pUpsampler,
    SRTo1080pUpsampler,
    sr720_params_from_checkpoint,
    sr1080_params_from_checkpoint,
)

pytestmark = pytest.mark.slow


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _cconv(w, key, x):
    weight, bias = _t(w[f"{key}.weight"]), _t(w[f"{key}.bias"])
    k = weight.shape[2]
    x = F.pad(x, (k // 2, k // 2, k // 2, k // 2, k - 1, 0), mode="replicate")
    return F.conv3d(x, weight, bias)


def _rms_t(x, gamma):
    y = F.normalize(x, dim=1) * (x.shape[1] ** 0.5)
    return y * _t(gamma).view(1, -1, 1, 1, 1)


def test_sr720_matches_oracle():
    cfg = SR720Config.tiny()
    rng = np.random.default_rng(801)
    w = {}

    def conv(key, out_c, in_c):
        w[f"{key}.weight"] = rng.normal(0, 0.1, (out_c, in_c, 3, 3, 3)).astype(np.float32)
        w[f"{key}.bias"] = rng.normal(0, 0.03, (out_c,)).astype(np.float32)

    conv("in_conv.conv", cfg.hidden_channels, cfg.in_channels)
    for i in range(cfg.num_blocks):
        for j in (0, 2, 4):
            conv(f"blocks.{i}.block.{j}.conv", cfg.hidden_channels, cfg.hidden_channels)
    conv("out_conv.conv", cfg.out_channels, cfg.hidden_channels)

    x = rng.normal(0, 1, (1, cfg.in_channels, 3, 6, 6)).astype(np.float32)  # NCTHW

    y = _cconv(w, "in_conv.conv", _t(x))
    for i in range(cfg.num_blocks):
        h = _cconv(w, f"blocks.{i}.block.0.conv", y)
        h = _cconv(w, f"blocks.{i}.block.2.conv", F.silu(h))
        h = _cconv(w, f"blocks.{i}.block.4.conv", F.silu(h))
        y = y + h
    y = _cconv(w, "out_conv.conv", y)
    ref = (y + _t(x)).numpy()  # global residual, same shape

    variables = jax.tree_util.tree_map(jnp.asarray, sr720_params_from_checkpoint(w, cfg))
    ours = SRTo720pUpsampler(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 4, 1, 2, 3), ref, rtol=2e-4, atol=2e-4
    )


def test_sr1080_matches_oracle():
    cfg = SR1080Config.tiny()  # levels (8, 12), 2 blocks per level
    rng = np.random.default_rng(802)
    w = {}

    def conv(key, out_c, in_c, k=3):
        w[f"{key}.weight"] = rng.normal(0, 0.1, (out_c, in_c, k, k, k)).astype(np.float32)
        w[f"{key}.bias"] = rng.normal(0, 0.03, (out_c,)).astype(np.float32)

    conv("conv_in.conv", cfg.block_out_channels[0], cfg.z_channels)
    block_in = cfg.block_out_channels[0]
    for level, ch in enumerate(cfg.block_out_channels):
        for i in range(cfg.num_res_blocks + 1):
            src = f"up.{level}.block.{i}"
            w[f"{src}.norm1.gamma"] = rng.normal(1, 0.05, (block_in, 1, 1, 1)).astype(np.float32)
            conv(f"{src}.conv1.conv", ch, block_in)
            w[f"{src}.norm2.gamma"] = rng.normal(1, 0.05, (ch, 1, 1, 1)).astype(np.float32)
            conv(f"{src}.conv2.conv", ch, ch)
            if block_in != ch:
                conv(f"{src}.nin_shortcut", ch, block_in, k=1)
            block_in = ch
    w["norm_out.gamma"] = rng.normal(1, 0.05, (block_in, 1, 1, 1)).astype(np.float32)
    conv("conv_out.conv", cfg.out_channels, block_in)

    z = rng.normal(0, 1, (1, cfg.z_channels, 2, 4, 4)).astype(np.float32)
    target = (6, 6)

    zt = _t(z)
    b = zt.shape[0]
    zt = zt.permute(0, 2, 1, 3, 4).reshape(-1, cfg.z_channels, 4, 4)
    zt = F.interpolate(zt, size=target, mode="bilinear", align_corners=False)
    zt = zt.reshape(b, 2, cfg.z_channels, *target).permute(0, 2, 1, 3, 4)
    repeats = cfg.block_out_channels[0] // cfg.z_channels
    h = _cconv(w, "conv_in.conv", zt) + zt.repeat_interleave(repeats, dim=1)
    block_in = cfg.block_out_channels[0]
    for level, ch in enumerate(cfg.block_out_channels):
        for i in range(cfg.num_res_blocks + 1):
            src = f"up.{level}.block.{i}"
            r = _cconv(w, f"{src}.conv1.conv", F.silu(_rms_t(h, w[f"{src}.norm1.gamma"])))
            r = _cconv(w, f"{src}.conv2.conv", F.silu(_rms_t(r, w[f"{src}.norm2.gamma"])))
            if block_in != ch:
                h = F.conv3d(h, _t(w[f"{src}.nin_shortcut.weight"]), _t(w[f"{src}.nin_shortcut.bias"]))
            h = h + r
            block_in = ch
    h = F.silu(_rms_t(h, w["norm_out.gamma"]))
    ref = _cconv(w, "conv_out.conv", h).numpy()

    variables = jax.tree_util.tree_map(jnp.asarray, sr1080_params_from_checkpoint(w, cfg))
    ours = SRTo1080pUpsampler(cfg).apply(
        variables, jnp.asarray(z.transpose(0, 2, 3, 4, 1)), target_shape=target
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 4, 1, 2, 3), ref, rtol=3e-4, atol=3e-4
    )
