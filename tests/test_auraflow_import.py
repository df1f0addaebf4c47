"""AuraFlow weight import validated against a numpy oracle of the reference
math (vendored AuraFlowTransformer2DModel semantics; reference
helpers/models/auraflow/transformer.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from simpletuner_tpu.models.auraflow.transformer import AuraFlowConfig, AuraFlowTransformer
from simpletuner_tpu.models.weight_import import auraflow_params_from_diffusers

import pytest

pytestmark = pytest.mark.slow

ARCH = AuraFlowConfig(
    in_channels=4, patch_size=2, hidden_size=64, depth_double=1, depth_single=2,
    num_heads=2, text_dim=48, pos_embed_max_size=64,
)

def _fixture(rng):
    d = ARCH.hidden_size
    hid = ARCH.ffn_hidden
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    lin("pos_embed.proj", d, ARCH.patch_size ** 2 * ARCH.in_channels)
    w["pos_embed.pos_embed"] = rng.normal(0, 0.1, (1, ARCH.pos_embed_max_size, d)).astype(np.float32)
    lin("context_embedder", d, ARCH.text_dim, bias=False)
    w["register_tokens"] = rng.normal(0, 0.02, (1, 8, d)).astype(np.float32)
    lin("time_step_proj.linear_1", d, 256)
    lin("time_step_proj.linear_2", d, d)
    lin("norm_out.linear", 2 * d, d, bias=False)
    lin("proj_out", ARCH.patch_size ** 2 * ARCH.in_channels, d, bias=False)

    def ff(src):
        lin(f"{src}.linear_1", hid, d, bias=False)
        lin(f"{src}.linear_2", hid, d, bias=False)
        lin(f"{src}.out_projection", d, hid, bias=False)

    for i in range(ARCH.depth_double):
        src = f"joint_transformer_blocks.{i}"
        lin(f"{src}.norm1.linear", 6 * d, d, bias=False)
        lin(f"{src}.norm1_context.linear", 6 * d, d, bias=False)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{src}.attn.{n}", d, d, bias=False)
        lin(f"{src}.attn.to_out.0", d, d, bias=False)
        lin(f"{src}.attn.to_add_out", d, d, bias=False)
        ff(f"{src}.ff")
        ff(f"{src}.ff_context")
    for i in range(ARCH.depth_single):
        src = f"single_transformer_blocks.{i}"
        lin(f"{src}.norm1.linear", 6 * d, d, bias=False)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{src}.attn.{n}", d, d, bias=False)
        lin(f"{src}.attn.to_out.0", d, d, bias=False)
        ff(f"{src}.ff")
    return w

def _t_lin(w, name, x):
    y = x @ w[f"{name}.weight"].T
    if f"{name}.bias" in w:
        y = y + w[f"{name}.bias"]
    return y

def _silu(x):
    return x / (1.0 + np.exp(-x))

def _ln(x, eps=1e-5):
    return (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + eps)

def _attn(q, k, v, heads):
    b, s, inner = q.shape
    dh = inner // heads
    t = k.shape[1]
    q = _ln(q.reshape(b, s, heads, dh)).transpose(0, 2, 1, 3)
    k = _ln(k.reshape(b, t, heads, dh)).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return (p @ v).transpose(0, 2, 1, 3).reshape(b, s, inner)

def _ff(w, src, x):
    return _t_lin(w, f"{src}.out_projection", _silu(_t_lin(w, f"{src}.linear_1", x)) * _t_lin(w, f"{src}.linear_2", x))

def _mods(w, name, temb):
    m = _silu(temb) @ w[f"{name}.weight"].T
    return np.split(m, 6, axis=-1)

def _oracle(w, latents, timesteps, context):
    d = ARCH.hidden_size
    p = ARCH.patch_size
    b, h, wd, c = latents.shape
    hh, ww = h // p, wd // p
    patches = latents.reshape(b, hh, p, ww, p, c).transpose(0, 1, 3, 5, 2, 4).reshape(b, hh * ww, c * p * p)
    x = _t_lin(w, "pos_embed.proj", patches)
    gm = int(ARCH.pos_embed_max_size ** 0.5)
    sh_, sw_ = gm // 2 - hh // 2, gm // 2 - ww // 2
    idx = (np.arange(sh_, sh_ + hh)[:, None] * gm + np.arange(sw_, sw_ + ww)[None, :]).reshape(-1)
    x = x + w["pos_embed.pos_embed"][0][idx][None]

    ctx = context @ w["context_embedder.weight"].T
    ctx = np.concatenate([np.repeat(w["register_tokens"], b, axis=0), ctx], axis=1)

    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = (timesteps * 1000.0)[:, None].astype(np.float64) * freqs[None]
    tp = np.concatenate([np.cos(args), np.sin(args)], -1).astype(np.float32)
    temb = _t_lin(w, "time_step_proj.linear_2", _silu(_t_lin(w, "time_step_proj.linear_1", tp)))

    for i in range(ARCH.depth_double):
        src = f"joint_transformer_blocks.{i}"
        sh, sc, gm_, shm, scm, gmlp = _mods(w, f"{src}.norm1.linear", temb)
        csh, csc, cgm, cshm, cscm, cgmlp = _mods(w, f"{src}.norm1_context.linear", temb)
        xn = _ln(x) * (1 + sc[:, None]) + sh[:, None]
        cn = _ln(ctx) * (1 + csc[:, None]) + csh[:, None]
        q = np.concatenate([cn @ w[f"{src}.attn.add_q_proj.weight"].T, xn @ w[f"{src}.attn.to_q.weight"].T], axis=1)
        k = np.concatenate([cn @ w[f"{src}.attn.add_k_proj.weight"].T, xn @ w[f"{src}.attn.to_k.weight"].T], axis=1)
        v = np.concatenate([cn @ w[f"{src}.attn.add_v_proj.weight"].T, xn @ w[f"{src}.attn.to_v.weight"].T], axis=1)
        a = _attn(q, k, v, ARCH.num_heads)
        cl = ctx.shape[1]
        a_c, a_i = a[:, :cl], a[:, cl:]
        a_i = a_i @ w[f"{src}.attn.to_out.0.weight"].T
        a_c = a_c @ w[f"{src}.attn.to_add_out.weight"].T
        mid = _ln(x + gm_[:, None] * a_i) * (1 + scm[:, None]) + shm[:, None]
        x = x + gmlp[:, None] * _ff(w, f"{src}.ff", mid)
        cmid = _ln(ctx + cgm[:, None] * a_c) * (1 + cscm[:, None]) + cshm[:, None]
        ctx = ctx + cgmlp[:, None] * _ff(w, f"{src}.ff_context", cmid)

    stream = np.concatenate([ctx, x], axis=1)
    cl = ctx.shape[1]
    for i in range(ARCH.depth_single):
        src = f"single_transformer_blocks.{i}"
        sh, sc, gm_, shm, scm, gmlp = _mods(w, f"{src}.norm1.linear", temb)
        sn = _ln(stream) * (1 + sc[:, None]) + sh[:, None]
        a = _attn(
            sn @ w[f"{src}.attn.to_q.weight"].T,
            sn @ w[f"{src}.attn.to_k.weight"].T,
            sn @ w[f"{src}.attn.to_v.weight"].T,
            ARCH.num_heads,
        ) @ w[f"{src}.attn.to_out.0.weight"].T
        mid = _ln(stream + gm_[:, None] * a) * (1 + scm[:, None]) + shm[:, None]
        stream = stream + gmlp[:, None] * _ff(w, f"{src}.ff", mid)
    x = stream[:, cl:]

    fm = _silu(temb) @ w["norm_out.linear.weight"].T
    scale, shift = np.split(fm, 2, axis=-1)
    x = x * (1 + scale[:, None]) + shift[:, None]
    x = x @ w["proj_out.weight"].T
    x = x.reshape(b, hh, ww, p, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, c)
    return x

def test_auraflow_import_matches_oracle():
    w = _fixture(np.random.default_rng(21))
    params = auraflow_params_from_diffusers(w, ARCH)

    module = AuraFlowTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    latents = rng.normal(0, 1, (2, 8, 8, ARCH.in_channels)).astype(np.float32)
    timesteps = np.asarray([0.2, 0.9], np.float32)
    context = rng.normal(0, 1, (2, 11, ARCH.text_dim)).astype(np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        context=jnp.asarray(context),
    )
    ref = _oracle(w, latents, timesteps, context)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)

def test_auraflow_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.auraflow.model import AuraFlow
    from simpletuner_tpu.models.weight_import import load_transformer_params

    w = _fixture(np.random.default_rng(23))
    path = tmp_path / "aura.safetensors"
    save_file(w, str(path))
    model = AuraFlow(
        TrainingConfig({"model_family": "auraflow", "model_type": "lora", "lora_rank": 0}),
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