"""FLUX.2 weight import validated against a numpy oracle of the reference math
(vendored Flux2Transformer2DModel; reference helpers/models/flux2/
transformer.py): global shared modulation, [text, image] joint attention with
per-head RMS q/k norms, 4-axis theta-2000 RoPE, SwiGLU FFN with fused gate,
ViT-22B parallel single blocks with fused qkv+mlp projections, and x1000
timestep/guidance sinusoids."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpletuner_tpu.models.flux2.transformer import Flux2Config, Flux2Transformer
from simpletuner_tpu.models.weight_import import flux2_params_from_diffusers

pytestmark = pytest.mark.slow

ARCH = Flux2Config.tiny()


def _fixture(rng):
    d = ARCH.hidden_size
    inner = ARCH.num_heads * ARCH.head_dim
    mlp = ARCH.mlp_hidden
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)

    def rms(name, dim):
        w[name] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    lin("x_embedder", d, ARCH.patch_size ** 2 * ARCH.in_channels)
    lin("context_embedder", d, ARCH.txt_in_features)
    lin("time_guidance_embed.timestep_embedder.linear_1", d, 256)
    lin("time_guidance_embed.timestep_embedder.linear_2", d, d)
    lin("time_guidance_embed.guidance_embedder.linear_1", d, 256)
    lin("time_guidance_embed.guidance_embedder.linear_2", d, d)
    lin("double_stream_modulation_img.linear", 6 * d, d)
    lin("double_stream_modulation_txt.linear", 6 * d, d)
    lin("single_stream_modulation.linear", 3 * d, d)
    lin("norm_out.linear", 2 * d, d)
    lin("proj_out", ARCH.patch_size ** 2 * ARCH.in_channels, d)
    for i in range(ARCH.depth_double):
        src = f"transformer_blocks.{i}"
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{src}.attn.{n}", inner, d)
        lin(f"{src}.attn.to_out.0", d, inner)
        lin(f"{src}.attn.to_add_out", d, inner)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            rms(f"{src}.attn.{n}.weight", ARCH.head_dim)
        lin(f"{src}.ff.linear_in", 2 * mlp, d)
        lin(f"{src}.ff.linear_out", d, mlp)
        lin(f"{src}.ff_context.linear_in", 2 * mlp, d)
        lin(f"{src}.ff_context.linear_out", d, mlp)
    for i in range(ARCH.depth_single):
        src = f"single_transformer_blocks.{i}"
        lin(f"{src}.attn.to_qkv_mlp_proj", 3 * inner + 2 * mlp, d)
        lin(f"{src}.attn.to_out", d, inner + mlp)
        rms(f"{src}.attn.norm_q.weight", ARCH.head_dim)
        rms(f"{src}.attn.norm_k.weight", ARCH.head_dim)
    return w


def _t_lin(w, name, x):
    return x @ w[f"{name}.weight"].T


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _ln(x, eps=1e-6):
    return (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + eps)


def _rms(x, g, eps=1e-6):
    return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * g


def _rope_table(ids):
    parts = []
    for i, dax in enumerate(ARCH.axes_dim):
        freqs = 1.0 / ARCH.rope_theta ** (np.arange(0, dax, 2, dtype=np.float64) / dax)
        parts.append(ids[:, i : i + 1] * freqs[None])
    return np.concatenate(parts, axis=-1)


def _rope(x, ang):
    cos = np.cos(ang)[None, :, None, :]
    sin = np.sin(ang)[None, :, None, :]
    x0, x1 = x[..., 0::2], x[..., 1::2]
    return np.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1).reshape(x.shape)


def _attention(q, k, v):
    b, s, h, dd = q.shape
    q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dd)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return (p @ v).transpose(0, 2, 1, 3).reshape(b, s, h * dd)


def _swiglu_ff(w, src, x):
    h = _t_lin(w, f"{src}.linear_in", x)
    gate, up = np.split(h, 2, axis=-1)
    return _t_lin(w, f"{src}.linear_out", _silu(gate) * up)


def _oracle(w, latents, txt_raw, sigmas, guidance):
    p = ARCH.patch_size
    b, H, W, c = latents.shape
    hh, ww = H // p, W // p
    heads, hd = ARCH.num_heads, ARCH.head_dim
    inner = heads * hd
    mlp = ARCH.mlp_hidden

    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)

    def embed(values, prefix):
        args = (values * 1000.0)[:, None].astype(np.float64) * freqs[None]
        tp = np.concatenate([np.cos(args), np.sin(args)], -1).astype(np.float32)
        return _t_lin(w, f"{prefix}.linear_2", _silu(_t_lin(w, f"{prefix}.linear_1", tp)))

    temb = embed(sigmas, "time_guidance_embed.timestep_embedder")
    temb = temb + embed(guidance, "time_guidance_embed.guidance_embedder")

    def modulation(name, sets):
        mod = _t_lin(w, name, _silu(temb))[:, None, :]
        parts = np.split(mod, 3 * sets, axis=-1)
        return [parts[3 * i : 3 * (i + 1)] for i in range(sets)]

    mod_img = modulation("double_stream_modulation_img.linear", 2)
    mod_txt = modulation("double_stream_modulation_txt.linear", 2)
    (mod_single,) = modulation("single_stream_modulation.linear", 1)

    x = latents.reshape(b, hh, p, ww, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * ww, p * p * c)
    x = _t_lin(w, "x_embedder", x)
    txt = _t_lin(w, "context_embedder", txt_raw)
    txt_len = txt.shape[1]

    rows = np.repeat(np.arange(hh), ww)
    cols = np.tile(np.arange(ww), hh)
    img_ids = np.stack([np.zeros_like(rows), rows, cols, np.zeros_like(rows)], -1).astype(np.float64)
    ell = np.arange(txt_len)
    txt_ids = np.stack([np.zeros_like(ell), np.zeros_like(ell), np.zeros_like(ell), ell], -1).astype(np.float64)
    ang = _rope_table(np.concatenate([txt_ids, img_ids], axis=0))

    for i in range(ARCH.depth_double):
        src = f"transformer_blocks.{i}"
        (i_sh1, i_sc1, i_g1), (i_sh2, i_sc2, i_g2) = mod_img
        (t_sh1, t_sc1, t_g1), (t_sh2, t_sc2, t_g2) = mod_txt
        x_n = (1 + i_sc1) * _ln(x) + i_sh1
        t_n = (1 + t_sc1) * _ln(txt) + t_sh1

        def qkv(src_p, xx, names):
            to_h = lambda a: a.reshape(b, -1, heads, hd)
            return (to_h(_t_lin(w, f"{src_p}.{n}", xx)) for n in names)

        qi, ki, vi = qkv(f"{src}.attn", x_n, ("to_q", "to_k", "to_v"))
        qt, kt, vt = qkv(f"{src}.attn", t_n, ("add_q_proj", "add_k_proj", "add_v_proj"))
        qi = _rms(qi, w[f"{src}.attn.norm_q.weight"])
        ki = _rms(ki, w[f"{src}.attn.norm_k.weight"])
        qt = _rms(qt, w[f"{src}.attn.norm_added_q.weight"])
        kt = _rms(kt, w[f"{src}.attn.norm_added_k.weight"])
        q = _rope(np.concatenate([qt, qi], 1), ang)
        k = _rope(np.concatenate([kt, ki], 1), ang)
        v = np.concatenate([vt, vi], 1)
        attn = _attention(q, k, v)
        a_t, a_i = attn[:, :txt_len], attn[:, txt_len:]
        x = x + i_g1 * _t_lin(w, f"{src}.attn.to_out.0", a_i)
        txt = txt + t_g1 * _t_lin(w, f"{src}.attn.to_add_out", a_t)
        x = x + i_g2 * _swiglu_ff(w, f"{src}.ff", _ln(x) * (1 + i_sc2) + i_sh2)
        txt = txt + t_g2 * _swiglu_ff(w, f"{src}.ff_context", _ln(txt) * (1 + t_sc2) + t_sh2)

    stream = np.concatenate([txt, x], axis=1)
    for i in range(ARCH.depth_single):
        src = f"single_transformer_blocks.{i}"
        sh, sc, g = mod_single
        s_n = (1 + sc) * _ln(stream) + sh
        fused = _t_lin(w, f"{src}.attn.to_qkv_mlp_proj", s_n)
        q, k, v, mg, mu = np.split(fused, [inner, 2 * inner, 3 * inner, 3 * inner + mlp], axis=-1)
        to_h = lambda a: a.reshape(b, -1, heads, hd)
        q = _rope(_rms(to_h(q), w[f"{src}.attn.norm_q.weight"]), ang)
        k = _rope(_rms(to_h(k), w[f"{src}.attn.norm_k.weight"]), ang)
        attn = _attention(q, k, to_h(v))
        merged = np.concatenate([attn, _silu(mg) * mu], axis=-1)
        stream = stream + g * _t_lin(w, f"{src}.attn.to_out", merged)

    x = stream[:, txt_len:]
    ada = _t_lin(w, "norm_out.linear", _silu(temb))
    scale, shift = np.split(ada, 2, axis=-1)
    x = _ln(x) * (1 + scale[:, None]) + shift[:, None]
    out = _t_lin(w, "proj_out", x)
    return out.reshape(b, hh, ww, p, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, H, W, c)


def test_flux2_import_matches_oracle():
    w = _fixture(np.random.default_rng(101))
    params = flux2_params_from_diffusers(w, ARCH)

    module = Flux2Transformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(29)
    latents = rng.normal(0, 1, (2, 8, 8, ARCH.in_channels)).astype(np.float32)
    txt = rng.normal(0, 1, (2, 6, ARCH.txt_in_features)).astype(np.float32)
    sigmas = np.asarray([0.2, 0.9], np.float32)
    guidance = np.asarray([4.0, 4.0], np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(sigmas),
        context=jnp.asarray(txt),
        guidance=jnp.asarray(guidance),
    )
    ref = _oracle(w, latents, txt, sigmas, guidance)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


def test_flux2_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.flux2.model import Flux2
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("flux2") is Flux2
    w = _fixture(np.random.default_rng(103))
    path = tmp_path / "flux2.safetensors"
    save_file(w, str(path))
    model = Flux2(
        TrainingConfig(
            {"model_family": "flux2", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
