"""Ideogram-4 import validated against a torch oracle of the reference math
(Ideogram4Transformer; reference helpers/models/ideogram/transformer.py):
packed [LLM, image] sequence with indicator masking/embedding, feature-concat
Qwen taps through RMS+proj, sin-first (half-1)-denominator scalar time
embedding, interleaved mRoPE (theta 5e6), fused qkv + segment-masked
attention, 4-param tanh-gated modulation with post-norms on attn/FFN outputs,
and the double-silu final adaLN."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.ideogram.transformer import (
    LLM_TOKEN_INDICATOR,
    OUTPUT_IMAGE_INDICATOR,
    IdeogramConfig,
    IdeogramTransformer,
)
from simpletuner_tpu.models.weight_import import ideogram_params_from_checkpoint

pytestmark = pytest.mark.slow

ARCH = IdeogramConfig.tiny()
E = ARCH.emb_dim
HD = ARCH.head_dim


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.06, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def rms(name, dim):
        w[name] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    lin("input_proj", E, ARCH.in_channels)
    rms("llm_cond_norm.weight", ARCH.llm_features_dim)
    lin("llm_cond_proj", E, ARCH.llm_features_dim)
    lin("t_embedding.mlp_in", E, E)
    lin("t_embedding.mlp_out", E, E)
    lin("adaln_proj", ARCH.adanln_dim, E)
    w["embed_image_indicator.weight"] = rng.normal(0, 0.05, (2, E)).astype(np.float32)
    for i in range(ARCH.num_layers):
        src = f"layers.{i}"
        lin(f"{src}.attention.qkv", 3 * E, E, bias=False)
        lin(f"{src}.attention.o", E, E, bias=False)
        rms(f"{src}.attention.norm_q.weight", HD)
        rms(f"{src}.attention.norm_k.weight", HD)
        lin(f"{src}.feed_forward.w1", ARCH.intermediate_size, E, bias=False)
        lin(f"{src}.feed_forward.w2", E, ARCH.intermediate_size, bias=False)
        lin(f"{src}.feed_forward.w3", ARCH.intermediate_size, E, bias=False)
        for n in ("attention_norm1", "attention_norm2", "ffn_norm1", "ffn_norm2"):
            rms(f"{src}.{n}.weight", E)
        lin(f"{src}.adaln_modulation", 4 * E, ARCH.adanln_dim)
    lin("final_layer.linear", ARCH.in_channels, E)
    lin("final_layer.adaln_modulation", E, ARCH.adanln_dim)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    b = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.linear(x, _t(w[f"{key}.weight"]), b)


def _rms_t(x, g, eps):
    return F.rms_norm(x.float(), (x.shape[-1],), _t(g), eps)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return torch.cat((-x[..., half:], x[..., :half]), dim=-1)


def _mrope_t(position_ids):  # (B, L, 3)
    inv = 1.0 / (ARCH.rope_theta ** (np.arange(0, HD, 2, dtype=np.float64) / HD))
    pos = _t(position_ids).float().permute(2, 0, 1)  # (3, B, L)
    freqs = pos[..., None] * _t(inv)  # (3, B, L, hd/2)
    mixed = freqs[0].clone()
    for axis, offset in ((1, 1), (2, 2)):
        length = ARCH.mrope_section[axis] * 3
        idx = torch.arange(offset, length, 3)
        mixed[..., idx] = freqs[axis][..., idx]
    emb = torch.cat([mixed, mixed], dim=-1)
    return emb.cos(), emb.sin()


def _oracle(w, llm_features, x, t, position_ids, segment_ids, indicator):
    llm_mask = _t(indicator == LLM_TOKEN_INDICATOR)[..., None]
    img_mask = _t(indicator == OUTPUT_IMAGE_INDICATOR)[..., None]

    xt = _t(x) * img_mask
    xt = _lin(w, "input_proj", xt) * img_mask

    half = E // 2
    freq = torch.exp(torch.arange(half).float() * (-math.log(1e4) / (half - 1)))
    scaled = 1e4 * _t(t)
    emb = scaled.unsqueeze(-1) * freq
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    t_cond = _lin(w, "t_embedding.mlp_out", F.silu(_lin(w, "t_embedding.mlp_in", emb)))
    t_cond = t_cond.unsqueeze(1)
    adaln_input = F.silu(_lin(w, "adaln_proj", t_cond))

    llm = _t(llm_features) * llm_mask
    llm = _rms_t(llm, w["llm_cond_norm.weight"], 1e-6)
    llm = _lin(w, "llm_cond_proj", llm) * llm_mask

    h = xt + llm
    idx = _t(indicator == OUTPUT_IMAGE_INDICATOR).long()
    h = h + _t(w["embed_image_indicator.weight"])[idx]

    cos, sin = _mrope_t(position_ids)
    seg = torch.from_numpy(segment_ids)
    attn_mask = (seg.unsqueeze(2) == seg.unsqueeze(1)).unsqueeze(1)

    for i in range(ARCH.num_layers):
        src = f"layers.{i}"
        mod = _lin(w, f"{src}.adaln_modulation", adaln_input)
        scale_msa, gate_msa, scale_mlp, gate_mlp = mod.chunk(4, dim=-1)
        gate_msa, gate_mlp = torch.tanh(gate_msa), torch.tanh(gate_mlp)

        hn = _rms_t(h, w[f"{src}.attention_norm1.weight"], ARCH.norm_eps) * (1.0 + scale_msa)
        b, L, _ = hn.shape
        qkv = _lin(w, f"{src}.attention.qkv", hn).view(b, L, 3, ARCH.num_heads, HD)
        q, k, v = qkv.unbind(2)
        q = _rms_t(q, w[f"{src}.attention.norm_q.weight"], 1e-5)
        k = _rms_t(k, w[f"{src}.attention.norm_k.weight"], 1e-5)
        q, k, v = q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        q = q * cos.unsqueeze(1) + _rotate_half(q) * sin.unsqueeze(1)
        k = k * cos.unsqueeze(1) + _rotate_half(k) * sin.unsqueeze(1)
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
        out = out.transpose(1, 2).reshape(b, L, E)
        out = _lin(w, f"{src}.attention.o", out)
        h = h + gate_msa * _rms_t(out, w[f"{src}.attention_norm2.weight"], ARCH.norm_eps)

        hn = _rms_t(h, w[f"{src}.ffn_norm1.weight"], ARCH.norm_eps) * (1.0 + scale_mlp)
        ff = _lin(w, f"{src}.feed_forward.w2",
                  F.silu(_lin(w, f"{src}.feed_forward.w1", hn)) * _lin(w, f"{src}.feed_forward.w3", hn))
        h = h + gate_mlp * _rms_t(ff, w[f"{src}.ffn_norm2.weight"], ARCH.norm_eps)

    hn = F.layer_norm(h, (E,), eps=1e-6)
    scale = 1.0 + _lin(w, "final_layer.adaln_modulation", F.silu(adaln_input))
    return _lin(w, "final_layer.linear", hn * scale).numpy()


def test_ideogram_import_matches_oracle():
    w = _fixture(np.random.default_rng(971))
    params = ideogram_params_from_checkpoint(dict(w), ARCH)
    module = IdeogramTransformer(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(972)
    b, txt, img = 2, 4, 16  # 4x4 grid
    llm = rng.normal(0, 1, (b, txt + img, ARCH.llm_features_dim)).astype(np.float32)
    x = rng.normal(0, 1, (b, txt + img, ARCH.in_channels)).astype(np.float32)
    t = rng.uniform(0.05, 0.95, (b,)).astype(np.float32)
    pos = np.zeros((b, txt + img, 3), np.int64)
    pos[:, :txt] = np.arange(txt)[None, :, None]
    h_idx = np.repeat(np.arange(4), 4)
    w_idx = np.tile(np.arange(4), 4)
    pos[:, txt:, 1] = h_idx
    pos[:, txt:, 2] = w_idx
    pos[:, txt:] += 65536
    seg = np.ones((b, txt + img), np.int64)
    seg[1, 2:txt] = 0  # padded text tokens in sample 1
    ind = np.concatenate(
        [np.full((b, txt), LLM_TOKEN_INDICATOR), np.full((b, img), OUTPUT_IMAGE_INDICATOR)], axis=1
    )

    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        llm_features=jnp.asarray(llm),
        x=jnp.asarray(x),
        t=jnp.asarray(t),
        position_ids=jnp.asarray(pos),
        segment_ids=jnp.asarray(seg),
        indicator=jnp.asarray(ind),
    )
    ref = _oracle(w, llm, x, t, pos, seg, ind)
    # compare on image positions (reference: only those are meaningful)
    np.testing.assert_allclose(
        np.asarray(ours)[:, txt:], ref[:, txt:], rtol=5e-4, atol=5e-4
    )


def test_ideogram_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.ideogram.model import Ideogram
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("ideogram") is Ideogram
    w = _fixture(np.random.default_rng(973))
    path = tmp_path / "ideogram.safetensors"
    save_file(w, str(path))
    model = Ideogram(
        TrainingConfig(
            {"model_family": "ideogram", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
