"""VAE weight import round trip: our params -> diffusers torch layout ->
import -> identical encode/decode outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.models.vae import AutoencoderKL, VAEConfig
from simpletuner_tpu.models.weight_import import vae_params_from_diffusers

pytestmark = pytest.mark.slow

def _params_to_diffusers(params, config):
    w = {}

    def conv(dst, node):
        w[f"{dst}.weight"] = np.asarray(node["kernel"]).transpose(3, 2, 0, 1)
        w[f"{dst}.bias"] = np.asarray(node["bias"])

    def norm(dst, node):
        w[f"{dst}.weight"] = np.asarray(node["scale"])
        w[f"{dst}.bias"] = np.asarray(node["bias"])

    def lin(dst, node):
        w[f"{dst}.weight"] = np.asarray(node["kernel"]).T
        w[f"{dst}.bias"] = np.asarray(node["bias"])

    def resnet(dst, node):
        norm(f"{dst}.norm1", node["norm1"])
        conv(f"{dst}.conv1", node["conv1"])
        norm(f"{dst}.norm2", node["norm2"])
        conv(f"{dst}.conv2", node["conv2"])
        if "conv_shortcut" in node:
            conv(f"{dst}.conv_shortcut", node["conv_shortcut"])

    def attn(dst, node):
        norm(f"{dst}.group_norm", node["norm"])
        lin(f"{dst}.to_q", node["to_q"])
        lin(f"{dst}.to_k", node["to_k"])
        lin(f"{dst}.to_v", node["to_v"])
        lin(f"{dst}.to_out.0", node["to_out"])

    levels = len(config.channel_multipliers)
    for side in ("encoder", "decoder"):
        node = params[side]
        conv(f"{side}.conv_in", node["conv_in"])
        resnet(f"{side}.mid_block.resnets.0", node["mid_block_1"])
        resnet(f"{side}.mid_block.resnets.1", node["mid_block_2"])
        attn(f"{side}.mid_block.attentions.0", node["mid_attn"])
        norm(f"{side}.conv_norm_out", node["norm_out"])
        conv(f"{side}.conv_out", node["conv_out"])
    for level in range(levels):
        for block in range(config.layers_per_block):
            resnet(f"encoder.down_blocks.{level}.resnets.{block}", params["encoder"][f"down_{level}_block_{block}"])
        if level < levels - 1:
            conv(f"encoder.down_blocks.{level}.downsamplers.0.conv", params["encoder"][f"down_{level}_downsample"])
        for block in range(config.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{level}.resnets.{block}", params["decoder"][f"up_{level}_block_{block}"])
        if level < levels - 1:
            conv(f"decoder.up_blocks.{level}.upsamplers.0.conv", params["decoder"][f"up_{level}_upsample"])
    conv("quant_conv", params["quant_conv"])
    conv("post_quant_conv", params["post_quant_conv"])
    return w

def test_vae_roundtrip():
    config = VAEConfig.tiny()
    vae = AutoencoderKL(config)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = vae.init(jax.random.PRNGKey(1), x)

    host = jax.device_get(variables["params"])
    diffusers_sd = _params_to_diffusers(host, config)
    imported = vae_params_from_diffusers(diffusers_sd, config)
    imported_vars = {"params": jax.tree_util.tree_map(jnp.asarray, imported)}

    ref_lat = vae.apply(variables, x, method=AutoencoderKL.encode)
    got_lat = vae.apply(imported_vars, x, method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(got_lat), np.asarray(ref_lat), atol=1e-5)

    ref_img = vae.apply(variables, ref_lat, method=AutoencoderKL.decode)
    got_img = vae.apply(imported_vars, ref_lat, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(got_img), np.asarray(ref_img), atol=1e-5)