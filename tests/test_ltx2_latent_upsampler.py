"""LTX-2 latent upsampler validated against a torch oracle of the reference
math (LTX2LatentUpsampler; reference helpers/models/ltxvideo2/upsampler.py):
GroupNorm res blocks with post-residual SiLU, per-frame 2x pixel-shuffle
spatial head, rational resampler (shuffle(num) + binomial blur-down(den)),
and the stage-2 denormalize/renormalize wrapper."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.ltxvideo2.latent_upsampler import (
    LTX2LatentUpsampler,
    LTX2UpsamplerConfig,
    ltx2_upsampler_params,
    upsample_ltx2_video_latents,
)

pytestmark = pytest.mark.slow


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _fixture(rng, cfg):
    w = {}

    def conv3(key, out_c, in_c):
        w[f"{key}.weight"] = rng.normal(0, 0.05, (out_c, in_c, 3, 3, 3)).astype(np.float32)
        w[f"{key}.bias"] = rng.normal(0, 0.02, (out_c,)).astype(np.float32)

    def conv2(key, out_c, in_c):
        w[f"{key}.weight"] = rng.normal(0, 0.05, (out_c, in_c, 3, 3)).astype(np.float32)
        w[f"{key}.bias"] = rng.normal(0, 0.02, (out_c,)).astype(np.float32)

    def gn(key, c):
        w[f"{key}.weight"] = rng.normal(1, 0.05, (c,)).astype(np.float32)
        w[f"{key}.bias"] = rng.normal(0, 0.05, (c,)).astype(np.float32)

    mid = cfg.mid_channels
    conv3("initial_conv", mid, cfg.in_channels)
    gn("initial_norm", mid)
    for prefix in ("res_blocks", "post_upsample_res_blocks"):
        for i in range(cfg.num_blocks_per_stage):
            conv3(f"{prefix}.{i}.conv1", mid, mid)
            gn(f"{prefix}.{i}.norm1", mid)
            conv3(f"{prefix}.{i}.conv2", mid, mid)
            gn(f"{prefix}.{i}.norm2", mid)
    if cfg.rational_resampler:
        num, _ = {0.75: (3, 4), 1.5: (3, 2), 2.0: (2, 1), 4.0: (4, 1)}[cfg.spatial_scale]
        conv2("upsampler.conv", num * num * mid, mid)
    else:
        conv2("upsampler.0", 4 * mid, mid)
    conv3("final_conv", cfg.in_channels, mid)
    return w


def _gn_t(w, key, x):
    groups = min(32, x.shape[1])
    return F.group_norm(x, groups, _t(w[f"{key}.weight"]), _t(w[f"{key}.bias"]), eps=1e-5)


def _conv3_t(w, key, x):
    return F.conv3d(x, _t(w[f"{key}.weight"]), _t(w[f"{key}.bias"]), padding=1)


def _res_t(w, key, x):
    h = _gn_t(w, f"{key}.norm1", _conv3_t(w, f"{key}.conv1", x))
    h = _gn_t(w, f"{key}.norm2", _conv3_t(w, f"{key}.conv2", F.silu(h)))
    return F.silu(h + x)


def _oracle(w, cfg, latents):  # (B, C, F, H, W)
    b, _, f, _, _ = latents.shape
    x = F.silu(_gn_t(w, "initial_norm", _conv3_t(w, "initial_conv", latents)))
    for i in range(cfg.num_blocks_per_stage):
        x = _res_t(w, f"res_blocks.{i}", x)

    flat = x.permute(0, 2, 1, 3, 4).flatten(0, 1)  # (B*F, C, H, W)
    if cfg.rational_resampler:
        num, den = {0.75: (3, 4), 1.5: (3, 2), 2.0: (2, 1), 4.0: (4, 1)}[cfg.spatial_scale]
        flat = F.conv2d(flat, _t(w["upsampler.conv.weight"]), _t(w["upsampler.conv.bias"]), padding=1)
        flat = F.pixel_shuffle(flat, num)
        if den > 1:
            k = torch.tensor([math.comb(4, i) for i in range(5)]).float()
            k2 = torch.outer(k, k)
            kernel = (k2 / k2.sum())[None, None].expand(flat.shape[1], 1, 5, 5)
            flat = F.conv2d(flat, kernel, stride=den, padding=2, groups=flat.shape[1])
    else:
        flat = F.conv2d(flat, _t(w["upsampler.0.weight"]), _t(w["upsampler.0.bias"]), padding=1)
        flat = F.pixel_shuffle(flat, 2)
    x = flat.reshape(b, f, *flat.shape[1:]).permute(0, 2, 1, 3, 4)

    for i in range(cfg.num_blocks_per_stage):
        x = _res_t(w, f"post_upsample_res_blocks.{i}", x)
    return _conv3_t(w, "final_conv", x).numpy()


@pytest.mark.parametrize("rational", [False, True])
def test_ltx2_latent_upsampler_matches_oracle(rational):
    cfg = LTX2UpsamplerConfig.tiny()
    if rational:
        import dataclasses

        cfg = dataclasses.replace(cfg, rational_resampler=True, spatial_scale=1.5)
    rng = np.random.default_rng(901 + rational)
    w = _fixture(rng, cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, ltx2_upsampler_params(w, cfg))

    latents = rng.normal(0, 1, (1, cfg.in_channels, 2, 4, 4)).astype(np.float32)
    ref = _oracle(w, cfg, _t(latents))
    ours = LTX2LatentUpsampler(cfg).apply(variables, jnp.asarray(latents.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 4, 1, 2, 3), ref, rtol=3e-4, atol=3e-4
    )


def test_upsample_wrapper_normalization():
    cfg = LTX2UpsamplerConfig.tiny()
    rng = np.random.default_rng(903)
    w = _fixture(rng, cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, ltx2_upsampler_params(w, cfg))
    module = LTX2LatentUpsampler(cfg)

    latents = jnp.asarray(rng.normal(0, 1, (1, 2, 4, 4, cfg.in_channels)), jnp.float32)
    mean = jnp.asarray(rng.normal(0, 0.3, (cfg.in_channels,)), jnp.float32)
    std = jnp.asarray(rng.uniform(0.5, 1.5, (cfg.in_channels,)), jnp.float32)

    out = upsample_ltx2_video_latents(latents, module, variables, mean, std, scaling_factor=0.7)
    assert out.shape == (1, 2, 8, 8, cfg.in_channels)
    # manual: denorm -> apply -> renorm
    raw = latents * std / 0.7 + mean
    up = module.apply(variables, raw)
    expected = (up - mean) * 0.7 / std
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)
