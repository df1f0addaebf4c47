"""HiDream-I1 weight import validated against a numpy oracle of the reference
math (vendored HiDreamImageTransformer2DModel; reference
helpers/models/hidream/transformer.py): [image, text] joint attention with
full-width RMS q/k norms and Flux-style axial RoPE, per-block llama text
segments (appended / truncated), DeepSeek MoE with un-normalized top-k gate
scores + shared expert, zero-init adaLN (fixture uses random ada weights so
the modulation path is exercised)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpletuner_tpu.models.hidream.transformer import HiDreamConfig, HiDreamTransformer
from simpletuner_tpu.models.weight_import import hidream_params_from_diffusers

pytestmark = pytest.mark.slow

ARCH = HiDreamConfig.tiny()
N_BLOCKS = ARCH.depth_double + ARCH.depth_single
N_SEL = 2  # selected llama layers in the fixture


def _fixture(rng):
    d = ARCH.hidden_size
    inner = ARCH.num_heads * ARCH.head_dim
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.05, (out_f,)).astype(np.float32)

    lin("x_embedder.proj", d, ARCH.patch_size ** 2 * ARCH.in_channels)
    lin("t_embedder.timestep_embedder.linear_1", d, 256)
    lin("t_embedder.timestep_embedder.linear_2", d, d)
    lin("p_embedder.pooled_embedder.linear_1", d, ARCH.pooled_dim)
    lin("p_embedder.pooled_embedder.linear_2", d, d)
    for i in range(N_BLOCKS):
        lin(f"caption_projection.{i}.linear", d, ARCH.llama_dim, bias=False)
    lin(f"caption_projection.{N_BLOCKS}.linear", d, ARCH.t5_dim, bias=False)
    lin("final_layer.adaLN_modulation.1", 2 * d, d)
    lin("final_layer.linear", ARCH.patch_size ** 2 * ARCH.in_channels, d)

    def attn(src, text_branch):
        for n in ("to_q", "to_k", "to_v", "to_out"):
            lin(f"{src}.{n}", inner, d if n != "to_out" else inner)
        w[f"{src}.q_rms_norm.weight"] = rng.normal(1, 0.05, (inner,)).astype(np.float32)
        w[f"{src}.k_rms_norm.weight"] = rng.normal(1, 0.05, (inner,)).astype(np.float32)
        if text_branch:
            for n in ("to_q_t", "to_k_t", "to_v_t", "to_out_t"):
                lin(f"{src}.{n}", inner, d if n != "to_out_t" else inner)
            w[f"{src}.q_rms_norm_t.weight"] = rng.normal(1, 0.05, (inner,)).astype(np.float32)
            w[f"{src}.k_rms_norm_t.weight"] = rng.normal(1, 0.05, (inner,)).astype(np.float32)

    def ffn(src, hidden):
        lin(f"{src}.w1", hidden, d, bias=False)
        lin(f"{src}.w2", d, hidden, bias=False)
        lin(f"{src}.w3", hidden, d, bias=False)

    def moe(src):
        w[f"{src}.gate.weight"] = rng.normal(0, 0.2, (ARCH.num_experts, d)).astype(np.float32)
        for e in range(ARCH.num_experts):
            ffn(f"{src}.experts.{e}", ARCH.ffn_inner)
        ffn(f"{src}.shared_experts", ARCH.shared_ffn_inner)

    for i in range(ARCH.depth_double):
        src = f"double_stream_blocks.{i}.block"
        lin(f"{src}.adaLN_modulation.1", 12 * d, d)
        attn(f"{src}.attn1", text_branch=True)
        moe(f"{src}.ff_i")
        ffn(f"{src}.ff_t", ARCH.ffn_inner)
    for i in range(ARCH.depth_single):
        src = f"single_stream_blocks.{i}.block"
        lin(f"{src}.adaLN_modulation.1", 6 * d, d)
        attn(f"{src}.attn1", text_branch=False)
        moe(f"{src}.ff_i")
    return w


def _t_lin(w, name, x):
    y = x @ w[f"{name}.weight"].T
    if f"{name}.bias" in w:
        y = y + w[f"{name}.bias"]
    return y


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _ln(x, eps=1e-6):
    return (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + eps)


def _rms_full(x, g, eps=1e-5):
    return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * g


def _rope_table(ids):
    # flux-style: per axis, angles = pos * theta^{-2k/d}; pairs consecutive
    parts = []
    for i, dax in enumerate(ARCH.axes_dim):
        freqs = 1.0 / ARCH.rope_theta ** (np.arange(0, dax, 2, dtype=np.float64) / dax)
        parts.append(ids[:, i : i + 1] * freqs[None])
    return np.concatenate(parts, axis=-1)  # (S, head_dim/2)


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


def _ffn(w, src, x):
    return _silu(_t_lin(w, f"{src}.w1", x)) * _t_lin(w, f"{src}.w3", x) @ w[f"{src}.w2.weight"].T


def _moe(w, src, x):
    b, s, d = x.shape
    scores = x.reshape(-1, d) @ w[f"{src}.gate.weight"].T
    scores = np.exp(scores - scores.max(-1, keepdims=True))
    scores = scores / scores.sum(-1, keepdims=True)
    order = np.argsort(-scores, axis=-1)
    topk = order[:, : ARCH.top_k]
    out = np.zeros((b * s, d), np.float32)
    flat = x.reshape(-1, d)
    for e in range(ARCH.num_experts):
        sel = (topk == e).any(axis=-1)
        weight = np.where(sel, scores[:, e], 0.0)  # raw score, no renorm
        y = _ffn(w, f"{src}.experts.{e}", flat)
        out += y * weight[:, None]
    out += _ffn(w, f"{src}.shared_experts", flat)
    return out.reshape(b, s, d)


def _attn_block(w, src, img_n, txt_n, ang):
    b = img_n.shape[0]
    heads, hd = ARCH.num_heads, ARCH.head_dim
    inner = heads * hd

    def proj(x, suffix=""):
        q = _rms_full(_t_lin(w, f"{src}.to_q{suffix}", x), w[f"{src}.q_rms_norm{suffix}.weight"])
        k = _rms_full(_t_lin(w, f"{src}.to_k{suffix}", x), w[f"{src}.k_rms_norm{suffix}.weight"])
        v = _t_lin(w, f"{src}.to_v{suffix}", x)
        to_h = lambda a: a.reshape(b, -1, heads, hd)
        return to_h(q), to_h(k), to_h(v)

    if txt_n is not None:
        qi, ki, vi = proj(img_n)
        qt, kt, vt = proj(txt_n, "_t")
        q = np.concatenate([qi, qt], axis=1)
        k = np.concatenate([ki, kt], axis=1)
        v = np.concatenate([vi, vt], axis=1)
    else:
        q, k, v = proj(img_n)
    q, k = _rope(q, ang), _rope(k, ang)
    attn = _attention(q, k, v)
    if txt_n is not None:
        il = img_n.shape[1]
        return _t_lin(w, f"{src}.to_out", attn[:, :il]), _t_lin(w, f"{src}.to_out_t", attn[:, il:])
    return _t_lin(w, f"{src}.to_out", attn)


def _oracle(w, latents, t5, llama, pooled, sigmas):
    p = ARCH.patch_size
    b, H, W, c = latents.shape
    hh, ww = H // p, W // p
    d = ARCH.hidden_size

    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = (sigmas * 1000.0)[:, None].astype(np.float64) * freqs[None]
    tp = np.concatenate([np.cos(args), np.sin(args)], -1).astype(np.float32)
    adaln = _t_lin(w, "t_embedder.timestep_embedder.linear_2",
                   _silu(_t_lin(w, "t_embedder.timestep_embedder.linear_1", tp)))
    adaln = adaln + _t_lin(w, "p_embedder.pooled_embedder.linear_2",
                           _silu(_t_lin(w, "p_embedder.pooled_embedder.linear_1", pooled)))

    x = latents.reshape(b, hh, p, ww, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * ww, p * p * c)
    x = _t_lin(w, "x_embedder.proj", x)

    t5_p = _t_lin(w, f"caption_projection.{N_BLOCKS}.linear", t5)
    llama_p = [
        _t_lin(w, f"caption_projection.{i}.linear", llama[:, i % N_SEL]) for i in range(N_BLOCKS)
    ]
    txt = np.concatenate([t5_p, llama_p[N_BLOCKS - 1]], axis=1)
    txt_base = txt.shape[1]
    ll_len = llama_p[0].shape[1]

    rows = np.repeat(np.arange(hh), ww)
    cols = np.tile(np.arange(ww), hh)
    img_ids = np.stack([np.zeros_like(rows), rows, cols], axis=-1).astype(np.float64)
    txt_len = txt_base + ll_len
    ids = np.concatenate([img_ids, np.zeros((txt_len, 3))], axis=0)
    ang = _rope_table(ids)

    for i in range(ARCH.depth_double):
        src = f"double_stream_blocks.{i}.block"
        ada = _t_lin(w, f"{src}.adaLN_modulation.1", _silu(adaln))
        m = [v[:, None, :] for v in np.split(ada, 12, axis=-1)]
        cur_txt = np.concatenate([txt, llama_p[i]], axis=1)
        img_n = _ln(x) * (1 + m[1]) + m[0]
        txt_n = _ln(cur_txt) * (1 + m[7]) + m[6]
        a_i, a_t = _attn_block(w, f"{src}.attn1", img_n, txt_n, ang)
        x = x + m[2] * a_i
        cur_txt = cur_txt + m[8] * a_t
        img_f = _ln(x) * (1 + m[4]) + m[3]
        x = x + m[5] * _moe(w, f"{src}.ff_i", img_f)
        txt_f = _ln(cur_txt) * (1 + m[10]) + m[9]
        cur_txt = cur_txt + m[11] * _ffn(w, f"{src}.ff_t", txt_f)
        txt = cur_txt[:, :txt_base]

    stream = np.concatenate([x, txt], axis=1)
    s_len = stream.shape[1]
    for i in range(ARCH.depth_single):
        src = f"single_stream_blocks.{i}.block"
        ada = _t_lin(w, f"{src}.adaLN_modulation.1", _silu(adaln))
        m = [v[:, None, :] for v in np.split(ada, 6, axis=-1)]
        merged = np.concatenate([stream, llama_p[ARCH.depth_double + i]], axis=1)
        x_n = _ln(merged) * (1 + m[1]) + m[0]
        a = _attn_block(w, f"{src}.attn1", x_n, None, ang)
        merged = merged + m[2] * a
        x_f = _ln(merged) * (1 + m[4]) + m[3]
        merged = merged + m[5] * _moe(w, f"{src}.ff_i", x_f)
        stream = merged[:, :s_len]

    x = stream[:, : hh * ww]
    ada = _t_lin(w, "final_layer.adaLN_modulation.1", _silu(adaln))
    shift, scale = np.split(ada, 2, axis=-1)
    x = _ln(x) * (1 + scale[:, None]) + shift[:, None]
    out = _t_lin(w, "final_layer.linear", x)
    return out.reshape(b, hh, ww, p, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, H, W, c)


def test_hidream_import_matches_oracle():
    w = _fixture(np.random.default_rng(91))
    params = hidream_params_from_diffusers(w, ARCH)

    module = HiDreamTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(23)
    latents = rng.normal(0, 1, (2, 8, 8, ARCH.in_channels)).astype(np.float32)
    t5 = rng.normal(0, 1, (2, 5, ARCH.t5_dim)).astype(np.float32)
    llama = rng.normal(0, 1, (2, N_SEL, 4, ARCH.llama_dim)).astype(np.float32)
    pooled = rng.normal(0, 1, (2, ARCH.pooled_dim)).astype(np.float32)
    sigmas = np.asarray([0.3, 0.75], np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(sigmas),
        t5_embeds=jnp.asarray(t5),
        llama_embeds=jnp.asarray(llama),
        pooled=jnp.asarray(pooled),
    )
    ref = _oracle(w, latents, t5, llama, pooled, sigmas)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


def test_hidream_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.hidream.model import HiDream
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("hidream") is HiDream
    w = _fixture(np.random.default_rng(93))
    path = tmp_path / "hidream.safetensors"
    save_file(w, str(path))
    model = HiDream(
        TrainingConfig(
            {"model_family": "hidream", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
