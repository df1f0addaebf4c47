"""Wan weight import round trip (diffusers WanTransformer3DModel layout)."""

import jax
import jax.numpy as jnp
import numpy as np

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.wan import Wan, WanConfig
from simpletuner_tpu.models.weight_import import wan_params_from_diffusers

import pytest

pytestmark = pytest.mark.slow

def _params_to_diffusers(params, arch):
    w = {}
    dim = arch.hidden_size
    pt, ph, pw = arch.patch

    def lin(dst, node):
        w[f"{dst}.weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            w[f"{dst}.bias"] = np.asarray(node["bias"])

    kernel = np.asarray(params["patch_in"]["kernel"]).reshape(pt, ph, pw, arch.in_channels, dim)
    w["patch_embedding.weight"] = kernel.transpose(4, 3, 0, 1, 2)
    w["patch_embedding.bias"] = np.asarray(params["patch_in"]["bias"])
    lin("condition_embedder.text_embedder.linear_1", params["text_in0"])
    lin("condition_embedder.text_embedder.linear_2", params["text_in2"])
    lin("condition_embedder.time_embedder.linear_1", params["time_in"]["in_layer"])
    lin("condition_embedder.time_embedder.linear_2", params["time_in"]["out_layer"])
    lin("condition_embedder.time_proj", params["time_proj"])
    w["scale_shift_table"] = np.asarray(params["final_scale_shift_table"]).reshape(1, 2, dim)
    lin("proj_out", params["final_proj"])

    i = 0
    while f"block_{i}" in params:
        src = f"blocks.{i}"
        b = params[f"block_{i}"]
        w[f"{src}.scale_shift_table"] = np.asarray(b["scale_shift_table"]).reshape(1, 6, dim)
        for ours, theirs in (
            ("self_attn_q", "attn1.to_q"), ("self_attn_k", "attn1.to_k"),
            ("self_attn_v", "attn1.to_v"), ("self_attn_proj", "attn1.to_out.0"),
            ("cross_attn_q", "attn2.to_q"), ("cross_attn_k", "attn2.to_k"),
            ("cross_attn_v", "attn2.to_v"), ("cross_attn_proj", "attn2.to_out.0"),
            ("ffn_in", "ffn.net.0.proj"), ("ffn_out", "ffn.net.2"),
        ):
            lin(f"{src}.{theirs}", b[ours])
        w[f"{src}.norm2.weight"] = np.asarray(b["cross_norm"]["LayerNorm_0"]["scale"])
        w[f"{src}.norm2.bias"] = np.asarray(b["cross_norm"]["LayerNorm_0"]["bias"])
        for ours, theirs in (
            ("self_attn_norm_q", "attn1.norm_q"), ("self_attn_norm_k", "attn1.norm_k"),
            ("cross_attn_norm_q", "attn2.norm_q"), ("cross_attn_norm_k", "attn2.norm_k"),
        ):
            w[f"{src}.{theirs}.weight"] = np.asarray(b[ours]["scale"])
        i += 1
    return w

def test_wan_roundtrip():
    cfg = TrainingConfig(
        {"model_family": "wan", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    model = Wan(cfg)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(3), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(4), batch)
    ref = np.asarray(model.model_predict(variables, prepared))

    sd = _params_to_diffusers(jax.device_get(variables["params"]), model.arch)
    imported = wan_params_from_diffusers(sd, model.arch)
    merged = dict(variables)
    merged["params"] = jax.tree_util.tree_map(jnp.asarray, imported)
    got = np.asarray(model.model_predict(merged, prepared))
    np.testing.assert_allclose(got, ref, atol=1e-5)