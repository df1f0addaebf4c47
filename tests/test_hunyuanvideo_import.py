"""HunyuanVideo 1.5 weight import: diffusers-layout fixture -> flax params
(key/shape parity + finite forward through refiner/ByT5/image streams)."""

import numpy as np
import jax
import jax.numpy as jnp

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.hunyuanvideo.model import HunyuanVideo
from simpletuner_tpu.models.hunyuanvideo.transformer import HunyuanVideo15Config
from simpletuner_tpu.models.weight_import import hunyuanvideo_params_from_diffusers

import pytest

pytestmark = pytest.mark.slow

ARCH = HunyuanVideo15Config.tiny()

def _fixture(rng):
    d = ARCH.hidden_size
    mlp = int(d * ARCH.mlp_ratio)
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def norm(name, feats):
        w[f"{name}.weight"] = np.ones(feats, np.float32)
        w[f"{name}.bias"] = np.zeros(feats, np.float32)

    w["x_embedder.proj.weight"] = rng.normal(
        0, 0.02, (d, ARCH.in_channels, 1, 1, 1)
    ).astype(np.float32)
    w["x_embedder.proj.bias"] = rng.normal(0, 0.02, (d,)).astype(np.float32)
    lin("time_embed.timestep_embedder.linear_1", d, 256)
    lin("time_embed.timestep_embedder.linear_2", d, d)
    w["cond_type_embed.weight"] = rng.normal(0, 0.02, (3, d)).astype(np.float32)
    norm("context_embedder_2.norm", ARCH.text2_dim)
    lin("context_embedder_2.linear_1", 2048, ARCH.text2_dim)
    lin("context_embedder_2.linear_2", 2048, 2048)
    lin("context_embedder_2.linear_3", d, 2048)
    norm("image_embedder.norm_in", ARCH.image_embed_dim)
    lin("image_embedder.linear_1", ARCH.image_embed_dim, ARCH.image_embed_dim)
    lin("image_embedder.linear_2", d, ARCH.image_embed_dim)
    norm("image_embedder.norm_out", d)
    lin("norm_out.linear", 2 * d, d)
    lin("proj_out", ARCH.out_channels, d)

    lin("context_embedder.time_text_embed.timestep_embedder.linear_1", d, 256)
    lin("context_embedder.time_text_embed.timestep_embedder.linear_2", d, d)
    lin("context_embedder.time_text_embed.text_embedder.linear_1", d, ARCH.text_dim)
    lin("context_embedder.time_text_embed.text_embedder.linear_2", d, d)
    lin("context_embedder.proj_in", d, ARCH.text_dim)
    for i in range(ARCH.refiner_depth):
        src = f"context_embedder.token_refiner.refiner_blocks.{i}"
        norm(f"{src}.norm1", d)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{src}.attn.{n}", d, d)
        lin(f"{src}.attn.to_out.0", d, d)
        norm(f"{src}.norm2", d)
        lin(f"{src}.ff.net.0.proj", mlp, d)
        lin(f"{src}.ff.net.2", d, mlp)
        lin(f"{src}.norm_out.linear", 2 * d, d)

    for i in range(ARCH.depth):
        src = f"transformer_blocks.{i}"
        lin(f"{src}.norm1.linear", 6 * d, d)
        lin(f"{src}.norm1_context.linear", 6 * d, d)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{src}.attn.{n}", d, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            w[f"{src}.attn.{n}.weight"] = np.ones(ARCH.head_dim, np.float32)
        lin(f"{src}.attn.to_out.0", d, d)
        lin(f"{src}.attn.to_add_out", d, d)
        lin(f"{src}.ff.net.0.proj", mlp, d)
        lin(f"{src}.ff.net.2", d, mlp)
        lin(f"{src}.ff_context.net.0.proj", mlp, d)
        lin(f"{src}.ff_context.net.2", d, mlp)
    return w

def test_hunyuan_import_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.weight_import import load_transformer_params

    w = _fixture(np.random.default_rng(61))
    path = tmp_path / "hy15.safetensors"
    save_file(w, str(path))
    model = HunyuanVideo(
        TrainingConfig(
            {"model_family": "hunyuanvideo", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))  # keys + shapes
    batch = model.example_batch(batch_size=1, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert bool(jnp.all(jnp.isfinite(pred)))

def test_hunyuan_masked_text_stream():
    """Padded qwen/byt5 tokens must not change the video-token output."""
    model = HunyuanVideo(
        TrainingConfig(
            {"model_family": "hunyuanvideo", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny", "seed": 0}
        )
    )
    batch = model.example_batch(batch_size=1, resolution=32)
    rng = np.random.default_rng(3)
    batch["text_embeds"] = jnp.asarray(rng.normal(0, 1, (1, 8, ARCH.text_dim)), jnp.float32)
    batch["text_embeds_2"] = jnp.asarray(rng.normal(0, 1, (1, 4, ARCH.text2_dim)), jnp.float32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    mask = np.ones((1, 8), np.int32)
    mask[:, 5:] = 0
    prepared["text_mask"] = jnp.asarray(mask)

    out1 = model.model_predict(variables, prepared)
    # mutate the masked-out tokens: output must be invariant
    text2 = np.asarray(prepared["text_embeds"]).copy()
    text2[:, 5:] += 7.0
    prepared2 = dict(prepared, text_embeds=jnp.asarray(text2))
    out2 = model.model_predict(variables, prepared2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-5)