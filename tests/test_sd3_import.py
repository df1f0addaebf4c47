"""SD3 weight import round trip (diffusers layout, learned pos embed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.sd3 import SD3, SD3Config
from simpletuner_tpu.models.weight_import import sd3_params_from_diffusers

pytestmark = pytest.mark.slow

def _params_to_diffusers(params, arch):
    w = {}

    def lin(dst, node, swap=False):
        kernel = np.asarray(node["kernel"])
        bias = node.get("bias")
        if swap:
            half = kernel.shape[1] // 2
            kernel = np.concatenate([kernel[:, half:], kernel[:, :half]], axis=1)
            if bias is not None:
                bias = np.concatenate([np.asarray(bias)[half:], np.asarray(bias)[:half]])
        w[f"{dst}.weight"] = kernel.T
        if bias is not None:
            w[f"{dst}.bias"] = np.asarray(bias)

    p, dim = arch.patch_size, arch.hidden_size
    in_ch = arch.in_channels
    kernel = np.asarray(params["patch_in"]["kernel"]).reshape(p, p, in_ch, dim)
    w["pos_embed.proj.weight"] = kernel.transpose(3, 2, 0, 1)
    w["pos_embed.proj.bias"] = np.asarray(params["patch_in"]["bias"])
    w["pos_embed.pos_embed"] = np.asarray(params["pos_embed"]).reshape(1, -1, dim)
    lin("context_embedder", params["context_in"])
    lin("time_text_embed.timestep_embedder.linear_1", params["time_in"]["in_layer"])
    lin("time_text_embed.timestep_embedder.linear_2", params["time_in"]["out_layer"])
    lin("time_text_embed.text_embedder.linear_1", params["pooled_in"]["in_layer"])
    lin("time_text_embed.text_embedder.linear_2", params["pooled_in"]["out_layer"])
    lin("norm_out.linear", params["final_mod"]["lin"], swap=True)
    lin("proj_out", params["final_proj"])

    for i in range(arch.depth):
        src = f"transformer_blocks.{i}"
        block = params[f"block_{i}"]
        last = i == arch.depth - 1
        lin(f"{src}.norm1.linear", block["img_mod"]["lin"])
        lin(f"{src}.norm1_context.linear", block["txt_mod"]["lin"], swap=last)
        for ours, theirs in (
            ("img_attn_q", "attn.to_q"), ("img_attn_k", "attn.to_k"), ("img_attn_v", "attn.to_v"),
            ("txt_attn_q", "attn.add_q_proj"), ("txt_attn_k", "attn.add_k_proj"), ("txt_attn_v", "attn.add_v_proj"),
            ("img_attn_proj", "attn.to_out.0"),
            ("img_mlp_in", "ff.net.0.proj"), ("img_mlp_out", "ff.net.2"),
        ):
            lin(f"{src}.{theirs}", block[ours])
        if not last:
            lin(f"{src}.attn.to_add_out", block["txt_attn_proj"])
            lin(f"{src}.ff_context.net.0.proj", block["txt_mlp_in"])
            lin(f"{src}.ff_context.net.2", block["txt_mlp_out"])
        if arch.qk_norm:
            w[f"{src}.attn.norm_q.weight"] = np.asarray(block["img_attn_norm_q"]["scale"])
            w[f"{src}.attn.norm_k.weight"] = np.asarray(block["img_attn_norm_k"]["scale"])
            w[f"{src}.attn.norm_added_q.weight"] = np.asarray(block["txt_attn_norm_q"]["scale"])
            w[f"{src}.attn.norm_added_k.weight"] = np.asarray(block["txt_attn_norm_k"]["scale"])
    return w

def test_sd3_roundtrip():
    arch = SD3Config(hidden_size=64, depth=2, num_heads=2, context_dim=96, pooled_dim=96,
                     pos_embed_max_size=8)
    cfg = TrainingConfig(
        {"model_family": "sd3", "model_type": "lora", "lora_rank": 4,
         "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    model = SD3(cfg, arch=arch)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(3), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(4), batch)
    ref = np.asarray(model.model_predict(variables, prepared))

    sd = _params_to_diffusers(jax.device_get(variables["params"]), arch)
    imported = sd3_params_from_diffusers(sd, arch)
    merged = dict(variables)
    merged["params"] = jax.tree_util.tree_map(jnp.asarray, imported)
    got = np.asarray(model.model_predict(merged, prepared))
    np.testing.assert_allclose(got, ref, atol=1e-5)