"""LTX-Video weight import validated against a numpy oracle of the reference
math (vendored LTXVideoTransformer3DModel; reference
helpers/models/ltxvideo/transformer.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from simpletuner_tpu.models.ltxvideo.transformer import LTXConfig, LTXTransformer, ltx_rope
from simpletuner_tpu.models.weight_import import ltx_params_from_diffusers

import pytest

pytestmark = pytest.mark.slow

ARCH = LTXConfig(
    in_channels=8, out_channels=8, hidden_size=48, depth=2, num_heads=2,
    head_dim=24, text_dim=32, cross_dim=48,
)

def _fixture(rng):
    d = ARCH.hidden_size
    inner = ARCH.num_heads * ARCH.head_dim
    ff = int(d * ARCH.ffn_ratio)
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    lin("proj_in", d, ARCH.in_channels)
    lin("caption_projection.linear_1", d, ARCH.text_dim)
    lin("caption_projection.linear_2", d, d)
    lin("time_embed.emb.timestep_embedder.linear_1", d, 256)
    lin("time_embed.emb.timestep_embedder.linear_2", d, d)
    lin("time_embed.linear", 6 * d, d)
    w["scale_shift_table"] = rng.normal(0, 0.1, (2, d)).astype(np.float32)
    lin("proj_out", ARCH.out_channels, d)
    for i in range(ARCH.depth):
        src = f"transformer_blocks.{i}"
        w[f"{src}.scale_shift_table"] = rng.normal(0, 0.1, (6, d)).astype(np.float32)
        for attn in ("attn1", "attn2"):
            lin(f"{src}.{attn}.to_q", inner, d)
            lin(f"{src}.{attn}.to_k", inner, d)
            lin(f"{src}.{attn}.to_v", inner, d)
            lin(f"{src}.{attn}.to_out.0", d, inner)
            w[f"{src}.{attn}.norm_q.weight"] = rng.normal(1, 0.05, (inner,)).astype(np.float32)
            w[f"{src}.{attn}.norm_k.weight"] = rng.normal(1, 0.05, (inner,)).astype(np.float32)
        lin(f"{src}.ff.net.0.proj", ff, d)
        lin(f"{src}.ff.net.2", d, ff)
    return w

def _t_lin(w, name, x):
    return x @ w[f"{name}.weight"].T + w[f"{name}.bias"]

def _silu(x):
    return x / (1.0 + np.exp(-x))

def _gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))

def _rms(x, g=None, eps=1e-6):
    y = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps)
    return y if g is None else y * g

def _ln(x, eps=1e-6):
    return (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + eps)

def _rope_apply(x, cos, sin):
    x1, x2 = x[..., 0::2], x[..., 1::2]
    rot = np.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos[None] + rot * sin[None]

def _attn(q, k, v, heads):
    b, s, inner = q.shape
    dh = inner // heads
    t = k.shape[1]
    q = q.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return (p @ v).transpose(0, 2, 1, 3).reshape(b, s, inner)

def _oracle(w, latents, timesteps, context):
    d = ARCH.hidden_size
    b, t, h, wd, c = latents.shape
    x = _t_lin(w, "proj_in", latents.reshape(b, t * h * wd, c))
    txt = _t_lin(w, "caption_projection.linear_2",
                 _gelu_tanh(_t_lin(w, "caption_projection.linear_1", context)))

    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = (timesteps * 1000.0)[:, None].astype(np.float64) * freqs[None]
    tp = np.concatenate([np.cos(args), np.sin(args)], -1).astype(np.float32)
    t_emb = _t_lin(w, "time_embed.emb.timestep_embedder.linear_2",
                   _silu(_t_lin(w, "time_embed.emb.timestep_embedder.linear_1", tp)))
    t6 = _t_lin(w, "time_embed.linear", _silu(t_emb)).reshape(b, 6, d)

    cos, sin = ltx_rope(ARCH, t, h, wd)
    for i in range(ARCH.depth):
        src = f"transformer_blocks.{i}"
        mods = w[f"{src}.scale_shift_table"][None] + t6
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [mods[:, j][:, None, :] for j in range(6)]
        xn = _rms(x) * (1 + sc_msa) + sh_msa
        q = _rope_apply(_rms(_t_lin(w, f"{src}.attn1.to_q", xn), w[f"{src}.attn1.norm_q.weight"]), cos, sin)
        k = _rope_apply(_rms(_t_lin(w, f"{src}.attn1.to_k", xn), w[f"{src}.attn1.norm_k.weight"]), cos, sin)
        v = _t_lin(w, f"{src}.attn1.to_v", xn)
        x = x + g_msa * _t_lin(w, f"{src}.attn1.to_out.0", _attn(q, k, v, ARCH.num_heads))
        q = _rms(_t_lin(w, f"{src}.attn2.to_q", x), w[f"{src}.attn2.norm_q.weight"])
        k = _rms(_t_lin(w, f"{src}.attn2.to_k", txt), w[f"{src}.attn2.norm_k.weight"])
        v = _t_lin(w, f"{src}.attn2.to_v", txt)
        x = x + _t_lin(w, f"{src}.attn2.to_out.0", _attn(q, k, v, ARCH.num_heads))
        xf = _rms(x) * (1 + sc_mlp) + sh_mlp
        x = x + g_mlp * _t_lin(w, f"{src}.ff.net.2", _gelu_tanh(_t_lin(w, f"{src}.ff.net.0.proj", xf)))

    final = w["scale_shift_table"][None] + t_emb[:, None, :]
    shift, scale = final[:, 0][:, None, :], final[:, 1][:, None, :]
    x = _ln(x) * (1 + scale) + shift
    x = _t_lin(w, "proj_out", x)
    return x.reshape(b, t, h, wd, ARCH.out_channels)

def test_ltx_import_matches_oracle():
    w = _fixture(np.random.default_rng(31))
    params = ltx_params_from_diffusers(w, ARCH)

    module = LTXTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(15)
    latents = rng.normal(0, 1, (2, 3, 4, 4, ARCH.in_channels)).astype(np.float32)
    timesteps = np.asarray([0.3, 0.8], np.float32)
    context = rng.normal(0, 1, (2, 9, ARCH.text_dim)).astype(np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        context=jnp.asarray(context),
    )
    ref = _oracle(w, latents, timesteps, context)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)

def test_ltx_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.ltxvideo.model import LTXVideo
    from simpletuner_tpu.models.weight_import import load_transformer_params

    w = _fixture(np.random.default_rng(33))
    path = tmp_path / "ltx.safetensors"
    save_file(w, str(path))
    model = LTXVideo(
        TrainingConfig({"model_family": "ltxvideo", "model_type": "lora", "lora_rank": 0}),
        arch=ARCH,
    )
    variables = load_transformer_params(model, str(path))
    out = model.module.apply(
        variables,
        latents=jnp.zeros((1, 2, 4, 4, ARCH.in_channels)),
        timesteps=jnp.asarray([0.5]),
        context=jnp.zeros((1, 8, ARCH.text_dim)),
    )
    assert bool(jnp.all(jnp.isfinite(out)))