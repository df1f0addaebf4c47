"""LLM text-encoder parity vs transformers (torch CPU) — output-parity test for

the non-CLIP/T5 conditioning stacks (VERDICT r1 Next #4: lumina2/sana need
Gemma-2, qwen_image Qwen2.5, hunyuanvideo Llama-3, flux2 Mistral-3, kolors
ChatGLM)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simpletuner_tpu.models.llm_encoder import (
    LLMEncoder,
    LLMEncoderConfig,
    llm_params_from_hf,
)

pytestmark = pytest.mark.slow

def _torch_state(model, prefix="model."):
    return {prefix + k: v.detach().numpy() for k, v in model.state_dict().items()}

def _run_ours(cfg, weights, ids, mask):
    params = llm_params_from_hf(weights, cfg)
    module = LLMEncoder(cfg, dtype=jnp.float32)
    return np.asarray(
        module.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(ids),
            jnp.asarray(mask),
        )
    )

def _ids(cfg, batch=2, seq=10, pad_last=3):
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    mask[1, -pad_last:] = 0
    return ids, mask

def test_llama_parity():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaModel

    cfg = LLMEncoderConfig.tiny("llama")
    hf = LlamaModel(
        LlamaConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim, rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_eps,
            attention_bias=False,
        )
    ).eval()
    ids, mask = _ids(cfg)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    ours = _run_ours(cfg, _torch_state(hf), ids, mask)
    # compare only non-padded positions (padded rows see different masks)
    np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], rtol=2e-3, atol=2e-4)

def test_qwen2_parity():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2Model

    cfg = LLMEncoderConfig.tiny("qwen2")
    hf = Qwen2Model(
        Qwen2Config(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
            rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_eps,
        )
    ).eval()
    ids, mask = _ids(cfg)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    ours = _run_ours(cfg, _torch_state(hf), ids, mask)
    np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], rtol=2e-3, atol=2e-4)

def test_mistral_parity():
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralModel

    cfg = LLMEncoderConfig.tiny("mistral")
    hf = MistralModel(
        MistralConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim, rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_eps,
        )
    ).eval()
    ids, mask = _ids(cfg)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    ours = _run_ours(cfg, _torch_state(hf), ids, mask)
    np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], rtol=2e-3, atol=2e-4)

def test_gemma2_parity():
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2Model

    cfg = LLMEncoderConfig.tiny("gemma2")
    hf = Gemma2Model(
        Gemma2Config(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim, rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_eps,
            query_pre_attn_scalar=16.0, attn_logit_softcapping=50.0,
            sliding_window=4096, hidden_activation="gelu_pytorch_tanh",
        )
    ).eval()
    ids, mask = _ids(cfg)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    ours = _run_ours(cfg, _torch_state(hf), ids, mask)
    np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], rtol=3e-3, atol=3e-4)

def test_chatglm_shapes_and_layout():
    """No in-env torch oracle for ChatGLM3 (trust_remote_code); validate the
    fused-qkv import layout + finite forward."""
    cfg = LLMEncoderConfig.tiny("chatglm")
    rng = np.random.default_rng(4)
    n_inner = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim
    w = {
        "transformer.embedding.word_embeddings.weight": rng.normal(
            0, 0.02, (cfg.vocab_size, cfg.hidden_size)
        ).astype(np.float32),
        "transformer.encoder.final_layernorm.weight": np.ones(cfg.hidden_size, np.float32),
    }
    for i in range(cfg.num_layers):
        src = f"transformer.encoder.layers.{i}"
        w[f"{src}.input_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        w[f"{src}.self_attention.query_key_value.weight"] = rng.normal(
            0, 0.02, (n_inner, cfg.hidden_size)
        ).astype(np.float32)
        w[f"{src}.self_attention.query_key_value.bias"] = rng.normal(0, 0.02, (n_inner,)).astype(np.float32)
        w[f"{src}.self_attention.dense.weight"] = rng.normal(
            0, 0.02, (cfg.hidden_size, cfg.num_heads * cfg.head_dim)
        ).astype(np.float32)
        w[f"{src}.post_attention_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        w[f"{src}.mlp.dense_h_to_4h.weight"] = rng.normal(
            0, 0.02, (2 * cfg.intermediate_size, cfg.hidden_size)
        ).astype(np.float32)
        w[f"{src}.mlp.dense_4h_to_h.weight"] = rng.normal(
            0, 0.02, (cfg.hidden_size, cfg.intermediate_size)
        ).astype(np.float32)
    ids, mask = _ids(cfg)
    out = _run_ours(cfg, w, ids, mask)
    assert out.shape == (2, 10, cfg.hidden_size)
    assert np.isfinite(out).all()

def test_text_encoder_builder_tiny():
    from simpletuner_tpu.models.common import TextEncoderSpec
    from simpletuner_tpu.models.text_encoders import load_text_encoders

    for family in ("gemma-2", "qwen2.5-vl", "llama-3", "mistral-3", "chatglm"):
        (enc,) = load_text_encoders(
            (TextEncoderSpec(name=family, family=family, max_length=16),), tiny=True
        )
        out = enc.encode(["a prompt", "another prompt"])
        assert out["last_hidden_state"].shape[0] == 2
        assert out["pooled"].shape[-1] == out["last_hidden_state"].shape[-1]
        assert np.isfinite(out["last_hidden_state"]).all()