"""Cosmos3 MoT import validated against a torch oracle of the reference math
(Cosmos3OmniTransformer; reference helpers/models/cosmos3/transformer.py):
dual-pathway MoT layers (causal understanding GQA + full-attention generation
pathway over [und, gen] keys), interleaved mRoPE (rotate-half), per-head
affine RMS q/k norms, SwiGLU MLPs, timestep embeds added onto noisy vision
tokens, lm_head + proj_out heads."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.cosmos3.transformer import (
    Cosmos3Config,
    Cosmos3OmniTransformer,
    cosmos3_position_ids,
)
from simpletuner_tpu.models.weight_import import cosmos3_params_from_checkpoint

pytestmark = pytest.mark.slow

ARCH = Cosmos3Config.tiny()
HID = ARCH.hidden_size


def _fixture(rng):
    w = {}

    def lin(key, out_c, in_c, bias=False):
        w[f"{key}.weight"] = rng.normal(0, 0.05, (out_c, in_c)).astype(np.float32)
        if bias:
            w[f"{key}.bias"] = rng.normal(0, 0.05, (out_c,)).astype(np.float32)

    def rms(key, dim):
        w[key] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    w["embed_tokens.weight"] = rng.normal(0, 0.05, (ARCH.vocab_size, HID)).astype(np.float32)
    rms("norm.weight", HID)
    rms("norm_moe_gen.weight", HID)
    lin("lm_head", ARCH.vocab_size, HID)
    lin("proj_in", HID, ARCH.patch_latent_dim, bias=True)
    lin("proj_out", ARCH.patch_latent_dim, HID, bias=True)
    lin("time_embedder.linear_1", HID, 256, bias=True)
    lin("time_embedder.linear_2", HID, HID, bias=True)
    q_dim = ARCH.num_heads * ARCH.head_dim
    kv_dim = ARCH.num_kv_heads * ARCH.head_dim
    for i in range(ARCH.num_layers):
        src = f"layers.{i}"
        lin(f"{src}.self_attn.to_q", q_dim, HID)
        lin(f"{src}.self_attn.to_k", kv_dim, HID)
        lin(f"{src}.self_attn.to_v", kv_dim, HID)
        lin(f"{src}.self_attn.to_out", HID, q_dim)
        lin(f"{src}.self_attn.add_q_proj", q_dim, HID)
        lin(f"{src}.self_attn.add_k_proj", kv_dim, HID)
        lin(f"{src}.self_attn.add_v_proj", kv_dim, HID)
        lin(f"{src}.self_attn.to_add_out", HID, q_dim)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            rms(f"{src}.self_attn.{n}.weight", ARCH.head_dim)
        for n in ("input_layernorm", "post_attention_layernorm",
                  "input_layernorm_moe_gen", "post_attention_layernorm_moe_gen"):
            rms(f"{src}.{n}.weight", HID)
        for branch in ("mlp", "mlp_moe_gen"):
            lin(f"{src}.{branch}.gate_proj", ARCH.intermediate_size, HID)
            lin(f"{src}.{branch}.up_proj", ARCH.intermediate_size, HID)
            lin(f"{src}.{branch}.down_proj", HID, ARCH.intermediate_size)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    bias = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.linear(x, _t(w[f"{key}.weight"]), bias)


def _rms(x, g, eps=1e-6):
    y = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps)
    return _t(g) * y


def _rotate_half(x):
    half = x.shape[-1] // 2
    return torch.cat((-x[..., half:], x[..., :half]), dim=-1)


def _mrope(position_ids):
    hd = ARCH.head_dim
    inv = 1.0 / (ARCH.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    freqs = _t(position_ids).float()[:, :, None] * _t(inv)[None, None]  # (3, S, hd/2)
    t_dim, h_dim, w_dim = ARCH.rope_axes_dim
    mixed = freqs[0].clone()
    for dim, offset in enumerate((1, 2), start=1):
        length = ARCH.rope_axes_dim[dim] * 3
        idx = slice(offset, length, 3)
        mixed[..., idx] = freqs[dim][..., idx]
    emb = torch.cat([mixed, mixed], dim=-1)
    return emb.cos(), emb.sin()


def _mlp(w, src, x):
    return _lin(w, f"{src}.down_proj", F.silu(_lin(w, f"{src}.gate_proj", x)) * _lin(w, f"{src}.up_proj", x))


def _oracle(w, text_ids, vision, position_ids, sigmas_1000):
    # single-sample oracle (reference runs unbatched flattened sequences)
    und = _t(w["embed_tokens.weight"])[torch.from_numpy(text_ids)]
    gen = _lin(w, "proj_in", _t(vision))
    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = (sigmas_1000 * ARCH.timestep_scale)[:, None] * freqs[None]
    tp = _t(np.concatenate([np.cos(args), np.sin(args)], -1))
    temb = _lin(w, "time_embedder.linear_2", F.silu(_lin(w, "time_embedder.linear_1", tp)))
    gen = gen + temb

    und_len = und.shape[0]
    cos, sin = _mrope(position_ids)
    cos_u, sin_u = cos[:und_len], sin[:und_len]
    cos_g, sin_g = cos[und_len:], sin[und_len:]
    heads, kv_heads, hd = ARCH.num_heads, ARCH.num_kv_heads, ARCH.head_dim
    n_rep = heads // kv_heads

    for i in range(ARCH.num_layers):
        src = f"layers.{i}"
        und_n = _rms(und, w[f"{src}.input_layernorm.weight"])
        gen_n = _rms(gen, w[f"{src}.input_layernorm_moe_gen.weight"])

        q_u = _lin(w, f"{src}.self_attn.to_q", und_n).view(-1, heads, hd)
        k_u = _lin(w, f"{src}.self_attn.to_k", und_n).view(-1, kv_heads, hd)
        v_u = _lin(w, f"{src}.self_attn.to_v", und_n).view(-1, kv_heads, hd)
        q_g = _lin(w, f"{src}.self_attn.add_q_proj", gen_n).view(-1, heads, hd)
        k_g = _lin(w, f"{src}.self_attn.add_k_proj", gen_n).view(-1, kv_heads, hd)
        v_g = _lin(w, f"{src}.self_attn.add_v_proj", gen_n).view(-1, kv_heads, hd)
        q_u = _rms(q_u, w[f"{src}.self_attn.norm_q.weight"])
        k_u = _rms(k_u, w[f"{src}.self_attn.norm_k.weight"])
        q_g = _rms(q_g, w[f"{src}.self_attn.norm_added_q.weight"])
        k_g = _rms(k_g, w[f"{src}.self_attn.norm_added_k.weight"])

        q_u = q_u * cos_u.unsqueeze(1) + _rotate_half(q_u) * sin_u.unsqueeze(1)
        k_u = k_u * cos_u.unsqueeze(1) + _rotate_half(k_u) * sin_u.unsqueeze(1)
        q_g = q_g * cos_g.unsqueeze(1) + _rotate_half(q_g) * sin_g.unsqueeze(1)
        k_g = k_g * cos_g.unsqueeze(1) + _rotate_half(k_g) * sin_g.unsqueeze(1)

        def expand_kv(k):
            return k.repeat_interleave(n_rep, dim=1)

        causal_out = F.scaled_dot_product_attention(
            q_u.unsqueeze(0).transpose(1, 2),
            expand_kv(k_u).unsqueeze(0).transpose(1, 2),
            expand_kv(v_u).unsqueeze(0).transpose(1, 2),
            is_causal=True,
        ).transpose(1, 2).squeeze(0).flatten(-2, -1)
        all_k = torch.cat([k_u, k_g], dim=0)
        all_v = torch.cat([v_u, v_g], dim=0)
        full_out = F.scaled_dot_product_attention(
            q_g.unsqueeze(0).transpose(1, 2),
            expand_kv(all_k).unsqueeze(0).transpose(1, 2),
            expand_kv(all_v).unsqueeze(0).transpose(1, 2),
            is_causal=False,
        ).transpose(1, 2).squeeze(0).flatten(-2, -1)

        und = und + _lin(w, f"{src}.self_attn.to_out", causal_out)
        gen = gen + _lin(w, f"{src}.self_attn.to_add_out", full_out)
        und = und + _mlp(w, f"{src}.mlp", _rms(und, w[f"{src}.post_attention_layernorm.weight"]))
        gen = gen + _mlp(w, f"{src}.mlp_moe_gen", _rms(gen, w[f"{src}.post_attention_layernorm_moe_gen.weight"]))

    und_out = _rms(und, w["norm.weight"])
    gen_out = _rms(gen, w["norm_moe_gen.weight"])
    return _lin(w, "proj_out", gen_out).numpy(), _lin(w, "lm_head", und_out).numpy()


def test_cosmos3_import_matches_oracle():
    w = _fixture(np.random.default_rng(171))
    params = cosmos3_params_from_checkpoint(w, ARCH)

    module = Cosmos3OmniTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(59)
    t, h, wd = 2, 4, 4
    und_len = 5
    gen_len = t * (h // 2) * (wd // 2)
    text_ids = rng.integers(1, ARCH.vocab_size, (und_len,))
    vision = rng.normal(0, 1, (gen_len, ARCH.patch_latent_dim)).astype(np.float32)
    pos = cosmos3_position_ids(ARCH, und_len, t, h, wd)
    sigmas_1000 = rng.uniform(100, 900, (gen_len,)).astype(np.float32)

    vision_pred, logits = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        text_ids=jnp.asarray(text_ids[None], jnp.int32),
        vision_tokens=jnp.asarray(vision[None]),
        position_ids=jnp.asarray(pos[None]),
        timesteps=jnp.asarray(sigmas_1000[None]),
    )
    ref_vision, ref_logits = _oracle(w, text_ids, vision, pos, sigmas_1000)
    np.testing.assert_allclose(np.asarray(vision_pred)[0], ref_vision, rtol=6e-4, atol=6e-4)
    np.testing.assert_allclose(np.asarray(logits)[0], ref_logits, rtol=6e-4, atol=6e-4)


def test_cosmos3_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.cosmos3.model import Cosmos3
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("cosmos3") is Cosmos3
    w = _fixture(np.random.default_rng(173))
    path = tmp_path / "cosmos3.safetensors"
    save_file(w, str(path))
    model = Cosmos3(
        TrainingConfig(
            {"model_family": "cosmos3", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
