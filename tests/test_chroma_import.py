"""Chroma import: diffusers-layout fixture -> flax params (key/shape parity,
fused single-block qkv+mlp, approximator wiring, slot-layout sanity)."""

import numpy as np
import jax
import jax.numpy as jnp

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.chroma.model import Chroma
from simpletuner_tpu.models.chroma.transformer import ChromaConfig, chroma_input_vec
from simpletuner_tpu.models.weight_import import chroma_params_from_diffusers

import pytest

pytestmark = pytest.mark.slow

ARCH = ChromaConfig.tiny()

def _fixture(rng):
    d = ARCH.hidden_size
    mlp = int(d * ARCH.mlp_ratio)
    ah = ARCH.approximator_hidden
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    lin("x_embedder", d, ARCH.in_channels)
    lin("context_embedder", d, ARCH.txt_in_features)
    lin("proj_out", ARCH.in_channels, d)
    lin("distilled_guidance_layer.in_proj", ah, ARCH.approximator_channels)
    lin("distilled_guidance_layer.out_proj", d, ah)
    for i in range(ARCH.approximator_layers):
        lin(f"distilled_guidance_layer.layers.{i}.linear_1", ah, ah)
        lin(f"distilled_guidance_layer.layers.{i}.linear_2", ah, ah)
        w[f"distilled_guidance_layer.norms.{i}.weight"] = np.ones(ah, np.float32)
    for i in range(ARCH.depth_double):
        p = f"transformer_blocks.{i}"
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{p}.attn.{n}", d, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            w[f"{p}.attn.{n}.weight"] = np.ones(ARCH.head_dim, np.float32)
        lin(f"{p}.attn.to_out.0", d, d)
        lin(f"{p}.attn.to_add_out", d, d)
        lin(f"{p}.ff.net.0.proj", mlp, d)
        lin(f"{p}.ff.net.2", d, mlp)
        lin(f"{p}.ff_context.net.0.proj", mlp, d)
        lin(f"{p}.ff_context.net.2", d, mlp)
    for i in range(ARCH.depth_single):
        p = f"single_transformer_blocks.{i}"
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{p}.attn.{n}", d, d)
        w[f"{p}.attn.norm_q.weight"] = np.ones(ARCH.head_dim, np.float32)
        w[f"{p}.attn.norm_k.weight"] = np.ones(ARCH.head_dim, np.float32)
        lin(f"{p}.proj_mlp", mlp, d)
        lin(f"{p}.proj_out", d, d + mlp)
    return w

def test_chroma_mod_len():
    assert ARCH.mod_len == 3 * ARCH.depth_single + 12 * ARCH.depth_double + 2
    vec = chroma_input_vec(ARCH, jnp.asarray([0.25, 0.5]))
    assert vec.shape == (2, ARCH.mod_len, ARCH.approximator_channels)
    # slot-index embedding must differ across slots (the approximator's only
    # way to produce distinct per-block modulations)
    assert float(jnp.abs(vec[0, 0] - vec[0, 1]).max()) > 1e-3

def test_chroma_import_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.weight_import import load_transformer_params

    w = _fixture(np.random.default_rng(41))
    path = tmp_path / "chroma.safetensors"
    save_file(w, str(path))
    model = Chroma(
        TrainingConfig(
            {"model_family": "chroma", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))  # validates keys+shapes
    batch = model.example_batch(batch_size=1, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert bool(jnp.all(jnp.isfinite(pred)))

def test_chroma_fused_single_qkv_orientation(tmp_path):
    """linear1 = [q; k; v; mlp] stacked on the output dim, transposed."""
    w = _fixture(np.random.default_rng(43))
    params = chroma_params_from_diffusers(w, ARCH)
    d = ARCH.hidden_size
    k1 = params["single_0"]["linear1"]["kernel"]
    np.testing.assert_allclose(
        k1[:, :d], w["single_transformer_blocks.0.attn.to_q.weight"].T, rtol=1e-6
    )
    np.testing.assert_allclose(
        k1[:, 3 * d :], w["single_transformer_blocks.0.proj_mlp.weight"].T, rtol=1e-6
    )