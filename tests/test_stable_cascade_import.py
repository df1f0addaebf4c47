"""Stable Cascade Stage-C import validated against a torch oracle of the
reference math (StableCascadeUNet; reference
helpers/models/stable_cascade/unet.py): [res, timestep, attn] layer triples,
GlobalResponseNorm, the chunked [r, sca, crp] timestep modulation, prepended
self-attention kv, LN+k2s2 down/up scalers, and the sin-first (half-1)
ratio embedding."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.stable_cascade.transformer import (
    StableCascadeConfig,
    StableCascadeUNet,
    cascade_ratio_embedding,
)
from simpletuner_tpu.models.weight_import import stable_cascade_params_from_checkpoint

pytestmark = pytest.mark.slow

ARCH = StableCascadeConfig.tiny()


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.06, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def conv(name, out_c, in_c, k, groups=1):
        w[f"{name}.weight"] = rng.normal(0, 0.06, (out_c, in_c // groups, k, k)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.02, (out_c,)).astype(np.float32)

    def layer(res, time, attn, c):
        conv(f"{res}.depthwise", c, c, ARCH.kernel_size, groups=c)
        lin(f"{res}.channelwise.0", c * 4, c + (0 if "skip" not in res else 0))
        w[f"{res}.channelwise.2.gamma"] = rng.normal(0, 0.05, (1, 1, 1, c * 4)).astype(np.float32)
        w[f"{res}.channelwise.2.beta"] = rng.normal(0, 0.05, (1, 1, 1, c * 4)).astype(np.float32)
        lin(f"{res}.channelwise.4", c, c * 4)
        lin(f"{time}.mapper", 2 * c, ARCH.timestep_ratio_embedding_dim)
        for cond in ARCH.timestep_conditioning_type:
            lin(f"{time}.mapper_{cond}", 2 * c, ARCH.timestep_ratio_embedding_dim)
        lin(f"{attn}.kv_mapper.1", c, ARCH.conditioning_dim)
        lin(f"{attn}.attention.to_q", c, c)
        lin(f"{attn}.attention.to_k", c, c)
        lin(f"{attn}.attention.to_v", c, c)
        lin(f"{attn}.attention.to_out.0", c, c)

    lin("clip_txt_pooled_mapper", ARCH.conditioning_dim * ARCH.clip_seq,
        ARCH.clip_text_pooled_in_channels)
    lin("clip_txt_mapper", ARCH.conditioning_dim, ARCH.clip_text_in_channels)
    conv("embedding.1", ARCH.block_out_channels[0], ARCH.in_channels, 1)
    conv("clf.1", ARCH.out_channels, ARCH.block_out_channels[0], 1)
    levels = len(ARCH.block_out_channels)
    for i in range(levels):
        if i > 0:
            conv(f"down_downscalers.{i}.1", ARCH.block_out_channels[i],
                 ARCH.block_out_channels[i - 1], 2)
        for j in range(ARCH.down_num_layers_per_block[i]):
            base = j * 3
            layer(f"down_blocks.{i}.{base}", f"down_blocks.{i}.{base + 1}",
                  f"down_blocks.{i}.{base + 2}", ARCH.block_out_channels[i])
    for u in range(levels):
        level = levels - 1 - u
        for j in range(ARCH.up_num_layers_per_block[::-1][level]):
            base = j * 3
            c = ARCH.block_out_channels[level]
            c_skip = c if j == 0 and u > 0 else 0
            res = f"up_blocks.{u}.{base}"
            conv(f"{res}.depthwise", c, c, ARCH.kernel_size, groups=c)
            lin(f"{res}.channelwise.0", c * 4, c + c_skip)
            w[f"{res}.channelwise.2.gamma"] = rng.normal(0, 0.05, (1, 1, 1, c * 4)).astype(np.float32)
            w[f"{res}.channelwise.2.beta"] = rng.normal(0, 0.05, (1, 1, 1, c * 4)).astype(np.float32)
            lin(f"{res}.channelwise.4", c, c * 4)
            lin(f"up_blocks.{u}.{base + 1}.mapper", 2 * c, ARCH.timestep_ratio_embedding_dim)
            for cond in ARCH.timestep_conditioning_type:
                lin(f"up_blocks.{u}.{base + 1}.mapper_{cond}", 2 * c,
                    ARCH.timestep_ratio_embedding_dim)
            lin(f"up_blocks.{u}.{base + 2}.kv_mapper.1", c, ARCH.conditioning_dim)
            for p in ("to_q", "to_k", "to_v"):
                lin(f"up_blocks.{u}.{base + 2}.attention.{p}", c, c)
            lin(f"up_blocks.{u}.{base + 2}.attention.to_out.0", c, c)
        if level > 0:
            wt = rng.normal(0, 0.06, (ARCH.block_out_channels[level],
                                      ARCH.block_out_channels[level - 1], 2, 2)).astype(np.float32)
            w[f"up_upscalers.{u}.1.weight"] = wt
            w[f"up_upscalers.{u}.1.bias"] = rng.normal(0, 0.02, (ARCH.block_out_channels[level - 1],)).astype(np.float32)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    return F.linear(x, _t(w[f"{key}.weight"]), _t(w[f"{key}.bias"]))


def _lnt(x, eps=1e-6):  # channels-last param-free LN of NCHW input
    x = x.permute(0, 2, 3, 1)
    x = F.layer_norm(x, (x.shape[-1],), eps=eps)
    return x.permute(0, 3, 1, 2)


def _res_t(w, key, x, skip=None):
    res = x
    h = F.conv2d(x, _t(w[f"{key}.depthwise.weight"]), _t(w[f"{key}.depthwise.bias"]),
                 padding=ARCH.kernel_size // 2, groups=x.shape[1])
    h = _lnt(h)
    if skip is not None:
        h = torch.cat([h, skip], dim=1)
    h = h.permute(0, 2, 3, 1)
    h = _lin(w, f"{key}.channelwise.0", h)
    h = F.gelu(h)
    gamma = _t(w[f"{key}.channelwise.2.gamma"])
    beta = _t(w[f"{key}.channelwise.2.beta"])
    agg = torch.norm(h, p=2, dim=(1, 2), keepdim=True)
    snd = agg / (agg.mean(dim=-1, keepdim=True) + 1e-6)
    h = gamma * (h * snd) + beta + h
    h = _lin(w, f"{key}.channelwise.4", h).permute(0, 3, 1, 2)
    return h + res


def _time_t(w, key, x, r_embed):
    pieces = r_embed.chunk(len(ARCH.timestep_conditioning_type) + 1, dim=1)
    a, b = _lin(w, f"{key}.mapper", pieces[0])[:, :, None, None].chunk(2, dim=1)
    for i, cond in enumerate(ARCH.timestep_conditioning_type):
        ac, bc = _lin(w, f"{key}.mapper_{cond}", pieces[i + 1])[:, :, None, None].chunk(2, dim=1)
        a, b = a + ac, b + bc
    return x * (1 + a) + b


def _attn_t(w, key, x, clip, heads):
    b, c, hh, ww = x.shape
    kv = _lin(w, f"{key}.kv_mapper.1", F.silu(clip))
    norm_x = _lnt(x)
    tokens = norm_x.view(b, c, -1).transpose(1, 2)
    kv = torch.cat([tokens, kv], dim=1)
    hd = c // heads
    q = _lin(w, f"{key}.attention.to_q", tokens).view(b, -1, heads, hd).transpose(1, 2)
    k = _lin(w, f"{key}.attention.to_k", kv).view(b, -1, heads, hd).transpose(1, 2)
    v = _lin(w, f"{key}.attention.to_v", kv).view(b, -1, heads, hd).transpose(1, 2)
    out = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, -1, c)
    out = _lin(w, f"{key}.attention.to_out.0", out)
    return x + out.transpose(1, 2).view(b, c, hh, ww)


def _ratio_embed_t(ratio):
    r = _t(ratio) * 10000.0
    half = ARCH.timestep_ratio_embedding_dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = torch.exp(torch.arange(half).float() * -emb)
    args = r[:, None] * freqs[None]
    return torch.cat([args.sin(), args.cos()], dim=1)


def _oracle(w, sample, ratio, pooled, text):
    b = sample.shape[0]
    r_embed = _ratio_embed_t(ratio)
    zero = _ratio_embed_t(np.zeros_like(ratio))
    for _ in ARCH.timestep_conditioning_type:
        r_embed = torch.cat([r_embed, zero], dim=1)

    pooled_t = _t(pooled).unsqueeze(1)
    pool_tokens = _lin(w, "clip_txt_pooled_mapper", pooled_t).view(
        b, ARCH.clip_seq, ARCH.conditioning_dim)
    txt = _lin(w, "clip_txt_mapper", _t(text))
    clip = torch.cat([txt, pool_tokens], dim=1)
    clip = F.layer_norm(clip, (ARCH.conditioning_dim,), eps=1e-6)

    x = _t(sample).permute(0, 3, 1, 2)
    x = F.conv2d(x, _t(w["embedding.1.weight"]), _t(w["embedding.1.bias"]))
    x = _lnt(x)

    levels = len(ARCH.block_out_channels)
    level_outputs = []
    for i in range(levels):
        if i > 0:
            x = _lnt(x)
            x = F.conv2d(x, _t(w[f"down_downscalers.{i}.1.weight"]),
                         _t(w[f"down_downscalers.{i}.1.bias"]), stride=2)
        for j in range(ARCH.down_num_layers_per_block[i]):
            base = j * 3
            x = _res_t(w, f"down_blocks.{i}.{base}", x)
            x = _time_t(w, f"down_blocks.{i}.{base + 1}", x, r_embed)
            x = _attn_t(w, f"down_blocks.{i}.{base + 2}", x, clip, ARCH.num_attention_heads[i])
        level_outputs.insert(0, x)

    x = level_outputs[0]
    for u in range(levels):
        level = levels - 1 - u
        for j in range(ARCH.up_num_layers_per_block[::-1][level]):
            base = j * 3
            skip = level_outputs[u] if j == 0 and u > 0 else None
            x = _res_t(w, f"up_blocks.{u}.{base}", x, skip)
            x = _time_t(w, f"up_blocks.{u}.{base + 1}", x, r_embed)
            x = _attn_t(w, f"up_blocks.{u}.{base + 2}", x, clip, ARCH.num_attention_heads[level])
        if level > 0:
            x = _lnt(x)
            x = F.conv_transpose2d(x, _t(w[f"up_upscalers.{u}.1.weight"]),
                                   _t(w[f"up_upscalers.{u}.1.bias"]), stride=2)

    x = _lnt(x)
    out = F.conv2d(x, _t(w["clf.1.weight"]), _t(w["clf.1.bias"]))
    return out.permute(0, 2, 3, 1).numpy()


def test_stable_cascade_import_matches_oracle():
    w = _fixture(np.random.default_rng(1201))
    params = stable_cascade_params_from_checkpoint(dict(w), ARCH)
    module = StableCascadeUNet(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(1202)
    sample = rng.normal(0, 1, (2, 8, 8, ARCH.in_channels)).astype(np.float32)
    pooled = rng.normal(0, 1, (2, ARCH.clip_text_pooled_in_channels)).astype(np.float32)
    text = rng.normal(0, 1, (2, 6, ARCH.clip_text_in_channels)).astype(np.float32)
    ratio = rng.uniform(0.05, 0.95, (2,)).astype(np.float32)

    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        sample=jnp.asarray(sample),
        timestep_ratio=jnp.asarray(ratio),
        clip_text_pooled=jnp.asarray(pooled),
        clip_text=jnp.asarray(text),
    )
    ref = _oracle(w, sample, ratio, pooled, text)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=6e-4, atol=6e-4)


def test_stable_cascade_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.stable_cascade.model import StableCascade
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("stable_cascade") is StableCascade
    w = _fixture(np.random.default_rng(1203))
    path = tmp_path / "cascade.safetensors"
    save_file(w, str(path))
    model = StableCascade(
        TrainingConfig(
            {"model_family": "stable_cascade", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
