"""UNet weight import round trip (diffusers layout) for SD-style and

SDXL-style tiny archs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.sd1x.model import SD1x
from simpletuner_tpu.models.sdxl.model import SDXL
from simpletuner_tpu.models.unet import UNetConfig
from simpletuner_tpu.models.weight_import import unet_params_from_diffusers

pytestmark = pytest.mark.slow

def _params_to_diffusers(params, arch):
    w = {}

    def conv(dst, node):
        w[f"{dst}.weight"] = np.asarray(node["kernel"]).transpose(3, 2, 0, 1)
        w[f"{dst}.bias"] = np.asarray(node["bias"])

    def norm(dst, node):
        w[f"{dst}.weight"] = np.asarray(node["scale"])
        w[f"{dst}.bias"] = np.asarray(node["bias"])

    def lin(dst, node):
        w[f"{dst}.weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            w[f"{dst}.bias"] = np.asarray(node["bias"])

    def resnet(dst, node):
        norm(f"{dst}.norm1", node["GroupNorm_0"])
        conv(f"{dst}.conv1", node["conv1"])
        lin(f"{dst}.time_emb_proj", node["time_emb_proj"])
        norm(f"{dst}.norm2", node["GroupNorm_1"])
        conv(f"{dst}.conv2", node["conv2"])
        if "conv_shortcut" in node:
            conv(f"{dst}.conv_shortcut", node["conv_shortcut"])

    def tblock(dst, node):
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{dst}.{n}", node[n])
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                lin(f"{dst}.{attn}.{proj}", node[attn][proj])
            lin(f"{dst}.{attn}.to_out.0", node[attn]["to_out"])
        lin(f"{dst}.ff.net.0.proj", node["ff_proj"])
        lin(f"{dst}.ff.net.2", node["ff_out"])

    def spatial(dst, node, depth):
        norm(f"{dst}.norm", node["GroupNorm_0"])
        lin(f"{dst}.proj_in", node["proj_in"])
        lin(f"{dst}.proj_out", node["proj_out"])
        for i in range(depth):
            tblock(f"{dst}.transformer_blocks.{i}", node[f"blocks_{i}"])

    levels = len(arch.block_out_channels)
    lpb = arch.layers_per_block
    depth_at = lambda lvl: arch.transformer_layers[min(lvl, len(arch.transformer_layers) - 1)]

    conv("conv_in", params["conv_in"])
    lin("time_embedding.linear_1", params["time_embed_0"])
    lin("time_embedding.linear_2", params["time_embed_2"])
    if "add_embed_0" in params:
        lin("add_embedding.linear_1", params["add_embed_0"])
        lin("add_embedding.linear_2", params["add_embed_2"])
    norm("conv_norm_out", params["conv_norm_out"])
    conv("conv_out", params["conv_out"])
    resnet("mid_block.resnets.0", params["mid_res_0"])
    resnet("mid_block.resnets.1", params["mid_res_1"])
    spatial("mid_block.attentions.0", params["mid_attn"], depth_at(levels - 1))

    for level in range(levels):
        for block in range(lpb):
            resnet(f"down_blocks.{level}.resnets.{block}", params[f"down_{level}_res_{block}"])
            if arch.cross_attention_blocks[level]:
                spatial(f"down_blocks.{level}.attentions.{block}", params[f"down_{level}_attn_{block}"], depth_at(level))
        if level < levels - 1:
            conv(f"down_blocks.{level}.downsamplers.0.conv", params[f"down_{level}_downsample"]["conv"])
    for u in range(levels):
        level = levels - 1 - u
        for block in range(lpb + 1):
            resnet(f"up_blocks.{u}.resnets.{block}", params[f"up_{level}_res_{block}"])
            if arch.cross_attention_blocks[level]:
                spatial(f"up_blocks.{u}.attentions.{block}", params[f"up_{level}_attn_{block}"], depth_at(level))
        if level > 0:
            conv(f"up_blocks.{u}.upsamplers.0.conv", params[f"up_{level}_upsample"]["conv"])
    return w

def _roundtrip(model):
    batch = model.example_batch(batch_size=1, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(3), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(4), batch)
    ref = np.asarray(model.model_predict(variables, prepared))

    host = jax.device_get(variables["params"])
    sd = _params_to_diffusers(host, model.arch)
    imported = unet_params_from_diffusers(sd, model.arch)
    merged = dict(variables)
    merged["params"] = jax.tree_util.tree_map(jnp.asarray, imported)
    got = np.asarray(model.model_predict(merged, prepared))
    np.testing.assert_allclose(got, ref, atol=1e-5)

def test_sd_unet_roundtrip():
    cfg = TrainingConfig(
        {"model_family": "sd1x", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    _roundtrip(SD1x(cfg))

def test_sdxl_unet_roundtrip():
    cfg = TrainingConfig(
        {"model_family": "sdxl", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    _roundtrip(SDXL(cfg))