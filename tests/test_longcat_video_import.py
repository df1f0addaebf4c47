"""LongCat-Video import validated against a torch oracle of the reference
math (LongCatVideoTransformer3DModel; reference
helpers/models/longcat_video/transformer.py): Conv3d patchify, framewise
adaLN over the fp32 time MLP, fused-qkv self-attention with interleaved
3D rope and fp32 RMS q/k norms, masked cross attention with an ungated
residual, the modulated-tensor FFN residual quirk, SwiGLU 2/3-width FFN,
and the [pt,ph,pw,C]-split unpatchify."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.longcat_video.transformer import (
    LongCatVideoConfig,
    LongCatVideoTransformer,
)
from simpletuner_tpu.models.weight_import import longcat_video_params_from_checkpoint

pytestmark = pytest.mark.slow

ARCH = LongCatVideoConfig.tiny()
D = ARCH.hidden_size
HD = ARCH.head_dim


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.06, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def rms(name, dim):
        w[name] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    w["x_embedder.proj.weight"] = rng.normal(0, 0.06, (D, ARCH.in_channels, *ARCH.patch_size)).astype(np.float32)
    w["x_embedder.proj.bias"] = rng.normal(0, 0.02, (D,)).astype(np.float32)
    lin("t_embedder.mlp.0", ARCH.adaln_tembed_dim, ARCH.frequency_embedding_size)
    lin("t_embedder.mlp.2", ARCH.adaln_tembed_dim, ARCH.adaln_tembed_dim)
    lin("y_embedder.y_proj.0", D, ARCH.caption_channels)
    lin("y_embedder.y_proj.2", D, D)
    for i in range(ARCH.depth):
        src = f"blocks.{i}"
        lin(f"{src}.adaLN_modulation.1", 6 * D, ARCH.adaln_tembed_dim)
        lin(f"{src}.attn.qkv", 3 * D, D)
        lin(f"{src}.attn.proj", D, D)
        rms(f"{src}.attn.q_norm.weight", HD)
        rms(f"{src}.attn.k_norm.weight", HD)
        rms(f"{src}.pre_crs_attn_norm.weight", D)
        w[f"{src}.pre_crs_attn_norm.bias"] = rng.normal(0, 0.02, (D,)).astype(np.float32)
        lin(f"{src}.cross_attn.q_linear", D, D)
        lin(f"{src}.cross_attn.kv_linear", 2 * D, D)
        lin(f"{src}.cross_attn.proj", D, D)
        rms(f"{src}.cross_attn.q_norm.weight", HD)
        rms(f"{src}.cross_attn.k_norm.weight", HD)
        lin(f"{src}.ffn.w1", ARCH.ffn_hidden, D, bias=False)
        lin(f"{src}.ffn.w2", D, ARCH.ffn_hidden, bias=False)
        lin(f"{src}.ffn.w3", ARCH.ffn_hidden, D, bias=False)
    lin("final_layer.adaLN_modulation.1", 2 * D, ARCH.adaln_tembed_dim)
    lin("final_layer.linear", int(np.prod(ARCH.patch_size)) * ARCH.out_channels, D)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    b = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.linear(x, _t(w[f"{key}.weight"]), b)


def _rms_t(x, g, eps=1e-6):
    y = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps)
    return y.type_as(x) * _t(g)


def _rotate_half_t(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).flatten(-2)


def _rope_t(grid):
    hd = HD
    dim_t = hd - 4 * (hd // 6)
    dim_h = dim_w = 2 * (hd // 6)
    t, h, wd = grid

    def axis(n, dim):
        freqs = 1.0 / 10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim)
        return np.repeat(np.outer(np.linspace(0, n - 1, n), freqs), 2, axis=-1)

    at = axis(t, dim_t)[:, None, None, :]
    ah = axis(h, dim_h)[None, :, None, :]
    aw = axis(wd, dim_w)[None, None, :, :]
    full = np.concatenate(
        [np.broadcast_to(at, (t, h, wd, at.shape[-1])),
         np.broadcast_to(ah, (t, h, wd, ah.shape[-1])),
         np.broadcast_to(aw, (t, h, wd, aw.shape[-1]))], -1,
    ).reshape(t * h * wd, hd)
    return _t(np.cos(full)), _t(np.sin(full))


def _oracle(w, latents, timesteps, context, mask):
    b, t_in, h_in, w_in, _ = latents.shape
    pt, ph, pw = ARCH.patch_size
    grid = (t_in // pt, h_in // ph, w_in // pw)
    tl = grid[0]
    seq = tl * grid[1] * grid[2]
    spatial = seq // tl

    x_nct = _t(latents).permute(0, 4, 1, 2, 3)
    x = F.conv3d(x_nct, _t(w["x_embedder.proj.weight"]), _t(w["x_embedder.proj.bias"]),
                 stride=ARCH.patch_size)
    x = x.flatten(2).transpose(1, 2)

    half = ARCH.frequency_embedding_size // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = timesteps[:, None] * freqs[None]
    t_freq = _t(np.concatenate([np.cos(args), np.sin(args)], -1))
    t_emb = _lin(w, "t_embedder.mlp.2", F.silu(_lin(w, "t_embedder.mlp.0", t_freq)))
    t_frames = t_emb[:, None].expand(b, tl, ARCH.adaln_tembed_dim)

    ctx = _lin(w, "y_embedder.y_proj.2",
               F.gelu(_lin(w, "y_embedder.y_proj.0", _t(context)), approximate="tanh"))

    cos, sin = _rope_t(grid)
    mask_t = torch.from_numpy(mask).bool()
    heads = ARCH.num_heads

    for i in range(ARCH.depth):
        src = f"blocks.{i}"
        mod = _lin(w, f"{src}.adaLN_modulation.1", F.silu(t_frames))
        mod = mod.reshape(b, tl, 1, 6, D)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = mod.unbind(3)

        def modulate(a, shift, scale):
            a4 = F.layer_norm(a.reshape(b, tl, spatial, D).float(), (D,), eps=1e-6)
            return ((a4 * (scale + 1.0) + shift).reshape(b, seq, D)).type_as(a)

        x_m = modulate(x, sh_msa, sc_msa)
        qkv = _lin(w, f"{src}.attn.qkv", x_m).view(b, seq, 3, heads, HD).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)  # (B, H, S, D)
        q = _rms_t(q, w[f"{src}.attn.q_norm.weight"])
        k = _rms_t(k, w[f"{src}.attn.k_norm.weight"])
        cosr, sinr = cos.view(1, 1, -1, HD), sin.view(1, 1, -1, HD)
        q = q * cosr + _rotate_half_t(q) * sinr
        k = k * cosr + _rotate_half_t(k) * sinr
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, seq, D)
        out = _lin(w, f"{src}.attn.proj", out)
        x = x + (g_msa * out.view(b, tl, spatial, D)).view(b, seq, D)

        x_n = F.layer_norm(x.float(), (D,), _t(w[f"{src}.pre_crs_attn_norm.weight"]),
                           _t(w[f"{src}.pre_crs_attn_norm.bias"]), eps=1e-6)
        q = _lin(w, f"{src}.cross_attn.q_linear", x_n).view(b, seq, heads, HD).transpose(1, 2)
        kv = _lin(w, f"{src}.cross_attn.kv_linear", ctx).view(b, -1, 2, heads, HD)
        ck = kv[:, :, 0].transpose(1, 2)
        cv = kv[:, :, 1].transpose(1, 2)
        q = _rms_t(q, w[f"{src}.cross_attn.q_norm.weight"])
        ck = _rms_t(ck, w[f"{src}.cross_attn.k_norm.weight"])
        cattn = F.scaled_dot_product_attention(q, ck, cv, attn_mask=mask_t[:, None, None, :])
        cattn = cattn.transpose(1, 2).reshape(b, seq, D)
        x = x + _lin(w, f"{src}.cross_attn.proj", cattn)

        x = modulate(x, sh_mlp, sc_mlp)
        ff = _lin(w, f"{src}.ffn.w2",
                  F.silu(_lin(w, f"{src}.ffn.w1", x)) * _lin(w, f"{src}.ffn.w3", x))
        x = x + (g_mlp * ff.view(b, tl, spatial, D)).view(b, seq, D)

    mod = _lin(w, "final_layer.adaLN_modulation.1", F.silu(t_frames)).reshape(b, tl, 1, 2, D)
    shift, scale = mod.unbind(3)
    x4 = F.layer_norm(x.reshape(b, tl, spatial, D).float(), (D,), eps=1e-6)
    x = ((x4 * (scale + 1.0) + shift).reshape(b, seq, D))
    out = _lin(w, "final_layer.linear", x)
    out = out.view(b, tl, grid[1], grid[2], pt, ph, pw, ARCH.out_channels)
    out = out.permute(0, 7, 1, 4, 2, 5, 3, 6)
    out = out.reshape(b, ARCH.out_channels, t_in, h_in, w_in)
    return out.permute(0, 2, 3, 4, 1).numpy()


def test_longcat_video_import_matches_oracle():
    w = _fixture(np.random.default_rng(1101))
    params = longcat_video_params_from_checkpoint(dict(w), ARCH)
    module = LongCatVideoTransformer(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(1102)
    latents = rng.normal(0, 1, (2, 2, 8, 8, ARCH.in_channels)).astype(np.float32)
    context = rng.normal(0, 1, (2, 7, ARCH.caption_channels)).astype(np.float32)
    timesteps = rng.uniform(50, 950, (2,)).astype(np.float32)
    mask = np.ones((2, 7), np.int64)
    mask[1, 4:] = 0

    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        context=jnp.asarray(context),
        context_mask=jnp.asarray(mask),
    )
    ref = _oracle(w, latents, timesteps, context, mask)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=6e-4, atol=6e-4)


def test_longcat_video_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.longcat_video.model import LongcatVideo
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("longcat_video") is LongcatVideo
    w = _fixture(np.random.default_rng(1103))
    path = tmp_path / "longcat.safetensors"
    save_file(w, str(path))
    model = LongcatVideo(
        TrainingConfig(
            {"model_family": "longcat_video", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
