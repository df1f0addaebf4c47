"""Sana weight import validated against a numpy oracle of the reference math

(diffusers SanaTransformer2DModel: linear self-attn, softmax cross-attn,
GLUMBConv Mix-FFN; reference helpers/models/sana/transformer.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simpletuner_tpu.models.sana.transformer import SanaConfig, SanaTransformer
from simpletuner_tpu.models.weight_import import sana_params_from_diffusers

pytestmark = pytest.mark.slow

ARCH = SanaConfig(
    in_channels=4, patch_size=1, hidden_size=64, depth=2,
    self_heads=4, self_head_dim=16, cross_heads=2, cross_head_dim=32, text_dim=48,
    ffn_ratio=2.5,
)

def _torch_fixture(rng):
    d = ARCH.hidden_size
    inner_self = ARCH.self_heads * ARCH.self_head_dim
    inner_cross = ARCH.cross_heads * ARCH.cross_head_dim
    hidden = int(d * ARCH.ffn_ratio)
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    w["patch_embed.proj.weight"] = rng.normal(0, 0.02, (d, ARCH.in_channels, 1, 1)).astype(np.float32)
    w["patch_embed.proj.bias"] = rng.normal(0, 0.02, (d,)).astype(np.float32)
    lin("caption_projection.linear_1", d, ARCH.text_dim)
    lin("caption_projection.linear_2", d, d)
    w["caption_norm.weight"] = rng.normal(1, 0.05, (d,)).astype(np.float32)
    lin("time_embed.emb.timestep_embedder.linear_1", d, 256)
    lin("time_embed.emb.timestep_embedder.linear_2", d, d)
    lin("time_embed.linear", 6 * d, d)
    w["scale_shift_table"] = rng.normal(0, 0.1, (2, d)).astype(np.float32)
    lin("proj_out", ARCH.in_channels, d)
    for i in range(ARCH.depth):
        src = f"transformer_blocks.{i}"
        w[f"{src}.scale_shift_table"] = rng.normal(0, 0.1, (6, d)).astype(np.float32)
        lin(f"{src}.attn1.to_q", inner_self, d)
        lin(f"{src}.attn1.to_k", inner_self, d)
        lin(f"{src}.attn1.to_v", inner_self, d)
        lin(f"{src}.attn1.to_out.0", d, inner_self)
        lin(f"{src}.attn2.to_q", inner_cross, d)
        lin(f"{src}.attn2.to_k", inner_cross, d)
        lin(f"{src}.attn2.to_v", inner_cross, d)
        lin(f"{src}.attn2.to_out.0", d, inner_cross)
        w[f"{src}.ff.conv_inverted.weight"] = rng.normal(0, 0.02, (hidden * 2, d, 1, 1)).astype(np.float32)
        w[f"{src}.ff.conv_inverted.bias"] = rng.normal(0, 0.02, (hidden * 2,)).astype(np.float32)
        w[f"{src}.ff.conv_depth.weight"] = rng.normal(0, 0.1, (hidden * 2, 1, 3, 3)).astype(np.float32)
        w[f"{src}.ff.conv_depth.bias"] = rng.normal(0, 0.02, (hidden * 2,)).astype(np.float32)
        w[f"{src}.ff.conv_point.weight"] = rng.normal(0, 0.02, (d, hidden, 1, 1)).astype(np.float32)
    return w

def _t_linear(w, name, x):
    return x @ w[f"{name}.weight"].T + w[f"{name}.bias"]

def _silu(x):
    return x / (1.0 + np.exp(-x))

def _gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))

def _ln(x, eps=1e-6):
    return (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + eps)

def _rms(x, g, eps=1e-5):
    return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * g

def _softmax_attention(q, k, v, heads):
    b, s, inner = q.shape
    d = inner // heads
    t = k.shape[1]
    q = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return (p @ v).transpose(0, 2, 1, 3).reshape(b, s, inner)

def _linear_attention(q, k, v, heads, eps=1e-15):
    b, s, inner = q.shape
    d = inner // heads
    q = np.maximum(q.reshape(b, s, heads, d), 0.0)
    k = np.maximum(k.reshape(b, s, heads, d), 0.0)
    v = v.reshape(b, s, heads, d)
    kv = np.einsum("bshd,bshe->bhde", k, v)
    k_sum = k.sum(1)
    norm = np.einsum("bshd,bhd->bsh", q, k_sum) + eps
    out = np.einsum("bshd,bhde->bshe", q, kv) / norm[..., None]
    return out.reshape(b, s, inner)

def _depthwise3x3(x, wgt, b):  # x (B,H,W,C), torch weight (C,1,3,3)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros_like(x)
    for i in range(3):
        for j in range(3):
            out = out + xp[:, i : i + x.shape[1], j : j + x.shape[2], :] * wgt[:, 0, i, j]
    return out + b

def _glumbconv(w, src, x_tokens, h, wd):
    b, s, d = x_tokens.shape
    x = x_tokens.reshape(b, h, wd, d)
    inv = x @ w[f"{src}.conv_inverted.weight"][:, :, 0, 0].T + w[f"{src}.conv_inverted.bias"]
    inv = _silu(inv)
    dep = _depthwise3x3(inv, w[f"{src}.conv_depth.weight"], w[f"{src}.conv_depth.bias"])
    a, gate = np.split(dep, 2, axis=-1)
    gated = a * _silu(gate)
    out = gated @ w[f"{src}.conv_point.weight"][:, :, 0, 0].T
    return out.reshape(b, s, d)

def _oracle(w, latents, timesteps, context):
    d = ARCH.hidden_size
    b, h, wd, c = latents.shape
    x = latents.reshape(b, h * wd, c) @ w["patch_embed.proj.weight"][:, :, 0, 0].T + w["patch_embed.proj.bias"]

    txt = _t_linear(w, "caption_projection.linear_2",
                    _gelu_tanh(_t_linear(w, "caption_projection.linear_1", context)))
    txt = _rms(txt, w["caption_norm.weight"])

    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = (timesteps * 1000.0)[:, None].astype(np.float64) * freqs[None]
    t_proj = np.concatenate([np.cos(args), np.sin(args)], axis=-1).astype(np.float32)
    t_emb = _t_linear(w, "time_embed.emb.timestep_embedder.linear_2",
                      _silu(_t_linear(w, "time_embed.emb.timestep_embedder.linear_1", t_proj)))
    t6 = _t_linear(w, "time_embed.linear", _silu(t_emb)).reshape(b, 6, d)

    for i in range(ARCH.depth):
        src = f"transformer_blocks.{i}"
        mods = w[f"{src}.scale_shift_table"][None] + t6
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [mods[:, j][:, None, :] for j in range(6)]
        xn = _ln(x) * (1 + sc_msa) + sh_msa
        attn = _linear_attention(
            _t_linear(w, f"{src}.attn1.to_q", xn),
            _t_linear(w, f"{src}.attn1.to_k", xn),
            _t_linear(w, f"{src}.attn1.to_v", xn),
            ARCH.self_heads,
        )
        x = x + g_msa * _t_linear(w, f"{src}.attn1.to_out.0", attn)
        xc = _ln(x)
        attn = _softmax_attention(
            _t_linear(w, f"{src}.attn2.to_q", xc),
            _t_linear(w, f"{src}.attn2.to_k", txt),
            _t_linear(w, f"{src}.attn2.to_v", txt),
            ARCH.cross_heads,
        )
        x = x + _t_linear(w, f"{src}.attn2.to_out.0", attn)
        xf = _ln(x) * (1 + sc_mlp) + sh_mlp
        x = x + g_mlp * _glumbconv(w, f"{src}.ff", xf, h, wd)

    final = w["scale_shift_table"][None] + t_emb[:, None, :]
    shift, scale = final[:, 0][:, None, :], final[:, 1][:, None, :]
    x = _ln(x) * (1 + scale) + shift
    x = _t_linear(w, "proj_out", x)
    return x.reshape(b, h, wd, ARCH.in_channels)

def test_sana_import_matches_oracle():
    w = _torch_fixture(np.random.default_rng(11))
    params = sana_params_from_diffusers(w, ARCH)

    module = SanaTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    latents = rng.normal(0, 1, (2, 8, 8, ARCH.in_channels)).astype(np.float32)
    timesteps = np.asarray([0.1, 0.75], np.float32)
    context = rng.normal(0, 1, (2, 10, ARCH.text_dim)).astype(np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        context=jnp.asarray(context),
    )
    ref = _oracle(w, latents, timesteps, context)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)

def test_sana_import_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.sana.model import Sana
    from simpletuner_tpu.models.weight_import import load_transformer_params

    w = _torch_fixture(np.random.default_rng(13))
    path = tmp_path / "sana.safetensors"
    save_file(w, str(path))
    model = Sana(
        TrainingConfig({"model_family": "sana", "model_type": "lora", "lora_rank": 0}),
        arch=ARCH,
    )
    variables = load_transformer_params(model, str(path))
    out = model.module.apply(
        variables,
        latents=jnp.zeros((1, 8, 8, ARCH.in_channels)),
        timesteps=jnp.asarray([0.5]),
        context=jnp.zeros((1, 8, ARCH.text_dim)),
    )
    assert bool(jnp.all(jnp.isfinite(out)))