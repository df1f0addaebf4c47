"""Z-Image Omni weight import validated against a numpy oracle of the
reference math (helpers/models/z_image_omni/transformer.py
ZImageOmniTransformer2DModel): scale-only adaLN from a 256-dim cond with
per-token noisy/clean selection and tanh gates (:362-456), bias-free
attention with per-head RMS q/k norms (eps 1e-5) and 3-axis complex RoPE at
theta 256 (:497-559), SwiGLU FFN dim*8/3 (:307), three refiner stacks, and
the [caption, cond image, noisy image, siglip] unified sequence (:1224-1247)
with caption positions 1..len / images at the caption end position / siglip
at end+1 rescaled onto the LATENT pixel grid (:791-951).

Padding note: the flax module uses fixed-length captions where pad positions
get the learned cap_pad_token at position (0,0,0), attended — the same
treatment the reference applies to its SEQ_MULTI_OF alignment padding.  The
oracle mirrors that exact layout, so parity holds token-for-token.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpletuner_tpu.models.z_image_omni.transformer import (
    ZImageOmniConfig,
    ZImageOmniTransformer,
)
from simpletuner_tpu.models.weight_import import z_image_omni_params_from_diffusers

pytestmark = pytest.mark.slow

ARCH = ZImageOmniConfig.tiny()


def _fixture(rng):
    d = ARCH.hidden_size
    dh = ARCH.head_dim
    inner = ARCH.ffn_inner
    adaln = ARCH.adaln_dim
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def rms(name, dim):
        w[name] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    lin("t_embedder.mlp.0", ARCH.t_mid_size, 256)
    lin("t_embedder.mlp.2", adaln, ARCH.t_mid_size)
    lin(f"all_x_embedder.{ARCH.patch_size}-1", d, ARCH.patch_size ** 2 * ARCH.in_channels)
    rms("cap_embedder.0.weight", ARCH.cap_feat_dim)
    lin("cap_embedder.1", d, ARCH.cap_feat_dim)
    rms("siglip_embedder.0.weight", ARCH.siglip_feat_dim)
    lin("siglip_embedder.1", d, ARCH.siglip_feat_dim)
    w["cap_pad_token"] = rng.normal(0, 0.02, (1, d)).astype(np.float32)
    lin(f"all_final_layer.{ARCH.patch_size}-1.adaLN_modulation.1", d, adaln)
    lin(f"all_final_layer.{ARCH.patch_size}-1.linear", ARCH.patch_size ** 2 * ARCH.in_channels, d)

    def block(src, modulated):
        lin(f"{src}.attention.to_q", d, d, bias=False)
        lin(f"{src}.attention.to_k", d, d, bias=False)
        lin(f"{src}.attention.to_v", d, d, bias=False)
        rms(f"{src}.attention.norm_q.weight", dh)
        rms(f"{src}.attention.norm_k.weight", dh)
        lin(f"{src}.attention.to_out.0", d, d, bias=False)
        lin(f"{src}.feed_forward.w1", inner, d, bias=False)
        lin(f"{src}.feed_forward.w2", d, inner, bias=False)
        lin(f"{src}.feed_forward.w3", inner, d, bias=False)
        rms(f"{src}.attention_norm1.weight", d)
        rms(f"{src}.attention_norm2.weight", d)
        rms(f"{src}.ffn_norm1.weight", d)
        rms(f"{src}.ffn_norm2.weight", d)
        if modulated:
            lin(f"{src}.adaLN_modulation.0", 4 * d, adaln)

    for i in range(ARCH.refiner_depth):
        block(f"noise_refiner.{i}", modulated=True)
        block(f"context_refiner.{i}", modulated=False)
        block(f"siglip_refiner.{i}", modulated=False)
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
    # positions (S, 3) -> (S, head_dim/2)
    parts = []
    for i, dax in enumerate(ARCH.axes_dim):
        freqs = 1.0 / ARCH.rope_theta ** (np.arange(0, dax, 2) / dax)
        parts.append(positions[:, i : i + 1].astype(np.float64) * freqs[None])
    return np.concatenate(parts, axis=-1)


def _rope(x, angles):
    cos = np.cos(angles)[:, None, :]
    sin = np.sin(angles)[:, None, :]
    x0, x1 = x[..., 0::2], x[..., 1::2]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return np.stack([o0, o1], axis=-1).reshape(x.shape)


def _attention(q, k, v):
    s, h, dd = q.shape
    q, k, v = (t.transpose(1, 0, 2) for t in (q, k, v))
    logits = q @ k.transpose(0, 2, 1) / np.sqrt(dd)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return (p @ v).transpose(1, 0, 2).reshape(s, h * dd)


def _block(w, src, x, angles, modulated, t_noisy=None, t_clean=None, noise_mask=None):
    d = ARCH.hidden_size
    dh = ARCH.head_dim
    eps = ARCH.norm_eps
    s = x.shape[0]
    if modulated:
        mod_noisy = _t_lin(w, f"{src}.adaLN_modulation.0", t_noisy)  # no SiLU — raw cond
        mod_clean = _t_lin(w, f"{src}.adaLN_modulation.0", t_clean)
        mod = np.where(noise_mask[:, None] == 1, mod_noisy[None], mod_clean[None])
        sc_msa, g_msa, sc_mlp, g_mlp = np.split(mod, 4, axis=-1)
        sc_msa, sc_mlp = 1.0 + sc_msa, 1.0 + sc_mlp
        g_msa, g_mlp = np.tanh(g_msa), np.tanh(g_mlp)
        x_n = _rms(x, w[f"{src}.attention_norm1.weight"], eps) * sc_msa
    else:
        x_n = _rms(x, w[f"{src}.attention_norm1.weight"], eps)
    q = _t_lin(w, f"{src}.attention.to_q", x_n).reshape(s, ARCH.num_heads, dh)
    k = _t_lin(w, f"{src}.attention.to_k", x_n).reshape(s, ARCH.num_kv_heads, dh)
    v = _t_lin(w, f"{src}.attention.to_v", x_n).reshape(s, ARCH.num_kv_heads, dh)
    q = _rms(q, w[f"{src}.attention.norm_q.weight"], 1e-5)
    k = _rms(k, w[f"{src}.attention.norm_k.weight"], 1e-5)
    q, k = _rope(q, angles), _rope(k, angles)
    attn = _t_lin(w, f"{src}.attention.to_out.0", _attention(q, k, v))

    def ffn(h):
        return _t_lin(
            w, f"{src}.feed_forward.w2",
            _silu(_t_lin(w, f"{src}.feed_forward.w1", h))
            * _t_lin(w, f"{src}.feed_forward.w3", h),
        )

    if modulated:
        x = x + g_msa * _rms(attn, w[f"{src}.attention_norm2.weight"], eps)
        h = _rms(x, w[f"{src}.ffn_norm1.weight"], eps) * sc_mlp
        x = x + g_mlp * _rms(ffn(h), w[f"{src}.ffn_norm2.weight"], eps)
    else:
        x = x + _rms(attn, w[f"{src}.attention_norm2.weight"], eps)
        x = x + _rms(
            ffn(_rms(x, w[f"{src}.ffn_norm1.weight"], eps)), w[f"{src}.ffn_norm2.weight"], eps
        )
    return x


def _t_embed(w, t):
    # reference TimestepEmbedder.timestep_embedding (:100-110): cat[cos, sin]
    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.float64(t) * freqs
    emb = np.concatenate([np.cos(args), np.sin(args)]).astype(np.float32)
    return _t_lin(w, "t_embedder.mlp.2", _silu(_t_lin(w, "t_embedder.mlp.0", emb)))


def _oracle_sample(w, latents, cap_feats, eff_len, timestep, cond_latents=None, siglip=None):
    """Reference forward for one sample; fixed-length captions with attended
    pad tokens at position (0,0,0) exactly like the flax module."""
    p = ARCH.patch_size
    h_lat, w_lat, c = latents.shape
    hh, ww = h_lat // p, w_lat // p
    cap_len = cap_feats.shape[0]

    t_noisy = _t_embed(w, timestep * ARCH.t_scale)
    t_clean = _t_embed(w, 1.0 * ARCH.t_scale)

    cap = _rms(cap_feats, w["cap_embedder.0.weight"], ARCH.norm_eps)
    cap = _t_lin(w, "cap_embedder.1", cap)
    cap[eff_len:] = w["cap_pad_token"][0]

    def patchify(v):
        return v.reshape(hh, p, ww, p, c).transpose(0, 2, 1, 3, 4).reshape(hh * ww, p * p * c)

    x = _t_lin(w, f"all_x_embedder.{p}-1", patchify(latents))

    cap_pos = np.zeros((cap_len, 3), np.int64)
    cap_pos[:eff_len, 0] = np.arange(1, eff_len + 1)  # cu_len starts at 1
    cap_end = 1 + eff_len
    rows = np.repeat(np.arange(hh), ww)
    cols = np.tile(np.arange(ww), hh)
    img_pos = np.stack([np.full(hh * ww, cap_end), rows, cols], axis=-1)
    cap_ang = _angles(cap_pos)
    img_ang = _angles(img_pos)

    if cond_latents is not None:
        cond = _t_lin(w, f"all_x_embedder.{p}-1", patchify(cond_latents))
        x = np.concatenate([cond, x], axis=0)
        x_ang = np.concatenate([img_ang, img_ang], axis=0)
        x_mask = np.concatenate([np.zeros(hh * ww, np.int64), np.ones(hh * ww, np.int64)])
    else:
        x_ang = img_ang
        x_mask = np.ones(hh * ww, np.int64)

    for i in range(ARCH.refiner_depth):
        x = _block(w, f"noise_refiner.{i}", x, x_ang, True, t_noisy, t_clean, x_mask)
    for i in range(ARCH.refiner_depth):
        cap = _block(w, f"context_refiner.{i}", cap, cap_ang, False)

    segments = [cap, x]
    seg_ang = [cap_ang, x_ang]
    cap_mask_value = 0 if cond_latents is not None else 1
    seg_mask = [np.full(cap_len, cap_mask_value, np.int64), x_mask]

    if siglip is not None:
        sh, sw, sc = siglip.shape
        sig = _rms(siglip.reshape(sh * sw, sc), w["siglip_embedder.0.weight"], ARCH.norm_eps)
        sig = _t_lin(w, "siglip_embedder.1", sig)
        # positions rescale onto the latent PIXEL grid with int truncation
        sig_rows = (np.repeat(np.arange(sh), sw) / max(sh - 1, 1) * (h_lat - 1)).astype(np.int64)
        sig_cols = (np.tile(np.arange(sw), sh) / max(sw - 1, 1) * (w_lat - 1)).astype(np.int64)
        sig_pos = np.stack([np.full(sh * sw, cap_end + 1), sig_rows, sig_cols], axis=-1)
        sig_ang = _angles(sig_pos)
        for i in range(ARCH.refiner_depth):
            sig = _block(w, f"siglip_refiner.{i}", sig, sig_ang, False)
        segments.append(sig)
        seg_ang.append(sig_ang)
        seg_mask.append(np.zeros(sh * sw, np.int64))

    unified = np.concatenate(segments, axis=0)
    ang = np.concatenate(seg_ang, axis=0)
    mask = np.concatenate(seg_mask, axis=0)
    for i in range(ARCH.depth):
        unified = _block(w, f"layers.{i}", unified, ang, True, t_noisy, t_clean, mask)

    noisy_start = cap_len + (hh * ww if cond_latents is not None else 0)
    x = unified[noisy_start : noisy_start + hh * ww]
    x = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-6)
    scale = 1.0 + _t_lin(w, f"all_final_layer.{p}-1.adaLN_modulation.1", _silu(t_noisy))
    out = _t_lin(w, f"all_final_layer.{p}-1.linear", x * scale)
    return out.reshape(hh, ww, p, p, c).transpose(0, 2, 1, 3, 4).reshape(h_lat, w_lat, c)


def test_z_image_omni_import_matches_oracle_t2i():
    w = _fixture(np.random.default_rng(311))
    params = z_image_omni_params_from_diffusers(w, ARCH)

    module = ZImageOmniTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(37)
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
        ref = _oracle_sample(w, latents[i], cap[i].copy(), int(mask[i].sum()), timesteps[i])
        np.testing.assert_allclose(np.asarray(out)[i], ref, rtol=5e-4, atol=5e-4)


def test_z_image_omni_import_matches_oracle_cond_siglip():
    w = _fixture(np.random.default_rng(313))
    params = z_image_omni_params_from_diffusers(w, ARCH)

    module = ZImageOmniTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(41)
    latents = rng.normal(0, 1, (1, 8, 8, ARCH.in_channels)).astype(np.float32)
    cond = rng.normal(0, 1, (1, 8, 8, ARCH.in_channels)).astype(np.float32)
    siglip = rng.normal(0, 1, (1, 3, 3, ARCH.siglip_feat_dim)).astype(np.float32)
    cap = rng.normal(0, 1, (1, 5, ARCH.cap_feat_dim)).astype(np.float32)
    timesteps = np.asarray([0.6], np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        context=jnp.asarray(cap),
        context_mask=jnp.ones((1, 5), jnp.int32),
        siglip_embeds=jnp.asarray(siglip),
        cond_latents=jnp.asarray(cond),
    )
    ref = _oracle_sample(
        w, latents[0], cap[0].copy(), 5, timesteps[0], cond_latents=cond[0], siglip=siglip[0]
    )
    np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=5e-4, atol=5e-4)


def test_z_image_omni_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params
    from simpletuner_tpu.models.z_image_omni.model import ZImageOmni

    assert ModelRegistry.get("z_image_omni") is ZImageOmni
    w = _fixture(np.random.default_rng(317))
    path = tmp_path / "z_image_omni.safetensors"
    save_file(w, str(path))
    model = ZImageOmni(
        TrainingConfig(
            {"model_family": "z_image_omni", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
