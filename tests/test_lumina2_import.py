"""Lumina2 Next-DiT weight import validated against a numpy oracle of the
reference math (vendored Lumina2Transformer2DModel; reference
helpers/models/lumina2/transformer.py): GQA attention with per-head RMS q/k
norm and 3-axis complex RoPE, SwiGLU FFN, tanh-gated sandwich norms, ragged
[caption, image] joint packing (the oracle packs per sample exactly like the
reference; the flax module keeps static shapes and masks — outputs must
match on every valid token)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpletuner_tpu.models.lumina2.transformer import Lumina2Config, Lumina2Transformer
from simpletuner_tpu.models.weight_import import lumina2_params_from_diffusers

pytestmark = pytest.mark.slow

ARCH = Lumina2Config.tiny()


def _fixture(rng):
    d = ARCH.hidden_size
    dh = ARCH.head_dim
    q_inner = ARCH.num_heads * dh
    kv_inner = ARCH.num_kv_heads * dh
    inner = ARCH.ffn_inner
    tdim = ARCH.time_dim
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def rms(name, dim):
        w[name] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    lin("x_embedder", d, ARCH.patch_size ** 2 * ARCH.in_channels)
    lin("time_caption_embed.timestep_embedder.linear_1", tdim, 256)
    lin("time_caption_embed.timestep_embedder.linear_2", tdim, tdim)
    rms("time_caption_embed.caption_embedder.0.weight", ARCH.cap_feat_dim)
    lin("time_caption_embed.caption_embedder.1", d, ARCH.cap_feat_dim)
    lin("norm_out.linear_1", d, tdim)
    lin("norm_out.linear_2", ARCH.patch_size ** 2 * ARCH.in_channels, d)

    def block(src, modulated):
        lin(f"{src}.attn.to_q", q_inner, d, bias=False)
        lin(f"{src}.attn.to_k", kv_inner, d, bias=False)
        lin(f"{src}.attn.to_v", kv_inner, d, bias=False)
        rms(f"{src}.attn.norm_q.weight", dh)
        rms(f"{src}.attn.norm_k.weight", dh)
        lin(f"{src}.attn.to_out.0", d, q_inner, bias=False)
        lin(f"{src}.feed_forward.linear_1", inner, d, bias=False)
        lin(f"{src}.feed_forward.linear_2", d, inner, bias=False)
        lin(f"{src}.feed_forward.linear_3", inner, d, bias=False)
        rms(f"{src}.norm2.weight", d)
        rms(f"{src}.ffn_norm1.weight", d)
        rms(f"{src}.ffn_norm2.weight", d)
        if modulated:
            lin(f"{src}.norm1.linear", 4 * d, tdim)
            rms(f"{src}.norm1.norm.weight", d)
        else:
            rms(f"{src}.norm1.weight", d)

    for i in range(ARCH.refiner_depth):
        block(f"context_refiner.{i}", modulated=False)
        block(f"noise_refiner.{i}", modulated=True)
    for i in range(ARCH.depth):
        block(f"layers.{i}", modulated=True)
    return w


def _t_lin(w, name, x):
    y = x @ w[f"{name}.weight"].T
    if f"{name}.bias" in w:
        y = y + w[f"{name}.bias"]
    return y


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _rms(x, g, eps):
    return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * g


def _angles(positions):
    parts = []
    for i, dax in enumerate(ARCH.axes_dim):
        freqs = 1.0 / ARCH.rope_theta ** (np.arange(0, dax, 2) / dax)
        parts.append(positions[:, i : i + 1] * freqs[None])
    return np.concatenate(parts, axis=-1)  # (S, head_dim/2)


def _rope(x, angles):
    # x (S, H, D); interleaved complex rotation
    cos = np.cos(angles)[:, None, :]
    sin = np.sin(angles)[:, None, :]
    x0, x1 = x[..., 0::2], x[..., 1::2]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return np.stack([o0, o1], axis=-1).reshape(x.shape)


def _attention(q, k, v):
    # (S, H, D) dense self-attention, GQA already expanded
    s, h, dd = q.shape
    q = q.transpose(1, 0, 2)
    k = k.transpose(1, 0, 2)
    v = v.transpose(1, 0, 2)
    logits = q @ k.transpose(0, 2, 1) / np.sqrt(dd)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return (p @ v).transpose(1, 0, 2).reshape(s, h * dd)


def _block(w, src, x, angles, temb, modulated):
    d = ARCH.hidden_size
    dh = ARCH.head_dim
    eps = ARCH.norm_eps
    if modulated:
        mod = _t_lin(w, f"{src}.norm1.linear", _silu(temb))
        sc_msa, g_msa, sc_mlp, g_mlp = np.split(mod, 4, axis=-1)
        x_n = _rms(x, w[f"{src}.norm1.norm.weight"], eps) * (1 + sc_msa)
    else:
        x_n = _rms(x, w[f"{src}.norm1.weight"], eps)
    s = x.shape[0]
    q = _t_lin(w, f"{src}.attn.to_q", x_n).reshape(s, ARCH.num_heads, dh)
    k = _t_lin(w, f"{src}.attn.to_k", x_n).reshape(s, ARCH.num_kv_heads, dh)
    v = _t_lin(w, f"{src}.attn.to_v", x_n).reshape(s, ARCH.num_kv_heads, dh)
    q = _rms(q, w[f"{src}.attn.norm_q.weight"], 1e-5)
    k = _rms(k, w[f"{src}.attn.norm_k.weight"], 1e-5)
    q, k = _rope(q, angles), _rope(k, angles)
    n_rep = ARCH.num_heads // ARCH.num_kv_heads
    k = np.repeat(k, n_rep, axis=1)
    v = np.repeat(v, n_rep, axis=1)
    attn = _t_lin(w, f"{src}.attn.to_out.0", _attention(q, k, v))

    def ffn(h):
        return _t_lin(
            w, f"{src}.feed_forward.linear_2",
            _silu(_t_lin(w, f"{src}.feed_forward.linear_1", h))
            * _t_lin(w, f"{src}.feed_forward.linear_3", h),
        )

    if modulated:
        x = x + np.tanh(g_msa) * _rms(attn, w[f"{src}.norm2.weight"], eps)
        h = _rms(x, w[f"{src}.ffn_norm1.weight"], eps) * (1 + sc_mlp)
        x = x + np.tanh(g_mlp) * _rms(ffn(h), w[f"{src}.ffn_norm2.weight"], eps)
    else:
        x = x + _rms(attn, w[f"{src}.norm2.weight"], eps)
        x = x + _rms(ffn(_rms(x, w[f"{src}.ffn_norm1.weight"], eps)), w[f"{src}.ffn_norm2.weight"], eps)
    return x


def _oracle_sample(w, latents, cap_feats, eff_len, timestep):
    """Reference forward for ONE sample with ragged packing (no padding)."""
    p = ARCH.patch_size
    h_lat, w_lat, c = latents.shape
    hh, ww = h_lat // p, w_lat // p

    # timestep embedding ([cos, sin], downscale_freq_shift=0) → 2-layer MLP
    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.float64(timestep) * freqs
    tp = np.concatenate([np.cos(args), np.sin(args)]).astype(np.float32)
    temb = _t_lin(w, "time_caption_embed.timestep_embedder.linear_2",
                  _silu(_t_lin(w, "time_caption_embed.timestep_embedder.linear_1", tp)))

    cap = _rms(cap_feats, w["time_caption_embed.caption_embedder.0.weight"], ARCH.norm_eps)
    cap = _t_lin(w, "time_caption_embed.caption_embedder.1", cap)[:eff_len]

    x = latents.reshape(hh, p, ww, p, c).transpose(0, 2, 1, 3, 4).reshape(hh * ww, p * p * c)
    x = _t_lin(w, "x_embedder", x)

    cap_pos = np.stack([np.arange(eff_len), np.zeros(eff_len), np.zeros(eff_len)], axis=-1)
    rows = np.repeat(np.arange(hh), ww)
    cols = np.tile(np.arange(ww), hh)
    img_pos = np.stack([np.full(hh * ww, eff_len), rows, cols], axis=-1).astype(np.float64)
    cap_ang = _angles(cap_pos)
    img_ang = _angles(img_pos)

    for i in range(ARCH.refiner_depth):
        cap = _block(w, f"context_refiner.{i}", cap, cap_ang, None, modulated=False)
    for i in range(ARCH.refiner_depth):
        x = _block(w, f"noise_refiner.{i}", x, img_ang, temb, modulated=True)

    joint = np.concatenate([cap, x], axis=0)
    ang = np.concatenate([cap_ang, img_ang], axis=0)
    for i in range(ARCH.depth):
        joint = _block(w, f"layers.{i}", joint, ang, temb, modulated=True)

    emb = _t_lin(w, "norm_out.linear_1", _silu(temb))
    x = joint[eff_len:]
    x = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-6)
    x = x * (1 + emb)
    out = _t_lin(w, "norm_out.linear_2", x)
    return out.reshape(hh, ww, p, p, c).transpose(0, 2, 1, 3, 4).reshape(h_lat, w_lat, c)


def test_lumina2_import_matches_oracle():
    w = _fixture(np.random.default_rng(71))
    params = lumina2_params_from_diffusers(w, ARCH)

    module = Lumina2Transformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(19)
    latents = rng.normal(0, 1, (2, 8, 8, ARCH.in_channels)).astype(np.float32)
    cap = rng.normal(0, 1, (2, 6, ARCH.cap_feat_dim)).astype(np.float32)
    mask = np.asarray([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], np.int32)
    timesteps = np.asarray([0.85, 0.4], np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        context=jnp.asarray(cap),
        context_mask=jnp.asarray(mask),
    )
    for i in range(2):
        ref = _oracle_sample(w, latents[i], cap[i], int(mask[i].sum()), timesteps[i])
        np.testing.assert_allclose(np.asarray(out)[i], ref, rtol=4e-4, atol=4e-4)


def test_lumina2_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.lumina2.model import Lumina2
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("lumina2") is Lumina2
    w = _fixture(np.random.default_rng(73))
    path = tmp_path / "lumina2.safetensors"
    save_file(w, str(path))
    model = Lumina2(
        TrainingConfig(
            {"model_family": "lumina2", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
