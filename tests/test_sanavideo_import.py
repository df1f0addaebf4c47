"""Sana-Video import validated against a torch oracle of the reference math
(SanaVideoTransformer3DModel; reference helpers/models/sanavideo/
transformer.py): Conv3d patchify, the Wan-style rope with its
build-vs-split size asymmetry, relu linear attention with rotated
score/unrotated normalizer, across-heads RMS q/k norms, sdpa cross
attention, GLUMBTempConv FFN with the temporal residual conv, pixart
AdaLayerNormSingle modulation, and the (2,dim)-table output norm."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.sanavideo.transformer import (
    SanaVideoConfig,
    SanaVideoTransformer,
)
from simpletuner_tpu.models.weight_import import sanavideo_params_from_checkpoint

pytestmark = pytest.mark.slow

ARCH = SanaVideoConfig.tiny()
D = ARCH.hidden_size  # 24
HD = ARCH.head_dim


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.06, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    w["patch_embedding.weight"] = rng.normal(0, 0.06, (D, ARCH.in_channels, *ARCH.patch_size)).astype(np.float32)
    w["patch_embedding.bias"] = rng.normal(0, 0.02, (D,)).astype(np.float32)
    lin("time_embed.emb.timestep_embedder.linear_1", D, 256)
    lin("time_embed.emb.timestep_embedder.linear_2", D, D)
    lin("time_embed.linear", 6 * D, D)
    lin("caption_projection.linear_1", D, ARCH.caption_channels)
    lin("caption_projection.linear_2", D, D)
    w["caption_norm.weight"] = rng.normal(1, 0.05, (D,)).astype(np.float32)
    inner_cross = ARCH.cross_heads * ARCH.cross_head_dim
    hidden_ff = int(ARCH.mlp_ratio * D)
    for i in range(ARCH.num_layers):
        src = f"transformer_blocks.{i}"
        w[f"{src}.scale_shift_table"] = rng.normal(0, 0.05, (6, D)).astype(np.float32)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{src}.attn1.{n}", D, D, bias=False)
        lin(f"{src}.attn1.to_out.0", D, D, bias=True)
        w[f"{src}.attn1.norm_q.weight"] = rng.normal(1, 0.05, (D,)).astype(np.float32)
        w[f"{src}.attn1.norm_k.weight"] = rng.normal(1, 0.05, (D,)).astype(np.float32)
        lin(f"{src}.attn2.to_q", inner_cross, D)
        lin(f"{src}.attn2.to_k", inner_cross, D)
        lin(f"{src}.attn2.to_v", inner_cross, D)
        lin(f"{src}.attn2.to_out.0", D, inner_cross)
        w[f"{src}.attn2.norm_q.weight"] = rng.normal(1, 0.05, (inner_cross,)).astype(np.float32)
        w[f"{src}.attn2.norm_k.weight"] = rng.normal(1, 0.05, (inner_cross,)).astype(np.float32)
        w[f"{src}.ff.conv_inverted.weight"] = rng.normal(0, 0.06, (hidden_ff * 2, D, 1, 1)).astype(np.float32)
        w[f"{src}.ff.conv_inverted.bias"] = rng.normal(0, 0.02, (hidden_ff * 2,)).astype(np.float32)
        w[f"{src}.ff.conv_depth.weight"] = rng.normal(0, 0.06, (hidden_ff * 2, 1, 3, 3)).astype(np.float32)
        w[f"{src}.ff.conv_depth.bias"] = rng.normal(0, 0.02, (hidden_ff * 2,)).astype(np.float32)
        w[f"{src}.ff.conv_point.weight"] = rng.normal(0, 0.06, (D, hidden_ff, 1, 1)).astype(np.float32)
        w[f"{src}.ff.conv_temp.weight"] = rng.normal(0, 0.06, (D, D, 3, 1)).astype(np.float32)
    w["scale_shift_table"] = rng.normal(0, 0.05, (2, D)).astype(np.float32)
    lin("proj_out", int(np.prod(ARCH.patch_size)) * ARCH.out_channels, D)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    b = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.linear(x, _t(w[f"{key}.weight"]), b)


def _rms_full(x, g):
    y = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + 1e-5)
    return y * _t(g)


def _rope_t(grid):
    hd = ARCH.head_dim
    h_dim = w_dim = 2 * (hd // 6)
    t_dim = hd - h_dim - w_dim
    max_len = ARCH.rope_max_seq_len
    cos_list, sin_list = [], []
    for dim in (t_dim, h_dim, w_dim):
        freqs = 1.0 / 10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        ang = np.outer(np.arange(max_len, dtype=np.float64), freqs)
        cos_list.append(np.repeat(np.cos(ang), 2, axis=1))
        sin_list.append(np.repeat(np.sin(ang), 2, axis=1))
    full_cos = np.concatenate(cos_list, 1)
    full_sin = np.concatenate(sin_list, 1)
    split = [hd - 2 * (hd // 3), hd // 3, hd // 3]
    b = np.cumsum([0] + split)
    t, h, wd = grid
    pc, ps = [], []
    for i, size in enumerate((t, h, wd)):
        sc = full_cos[:size, b[i]:b[i + 1]]
        ss = full_sin[:size, b[i]:b[i + 1]]
        shape = [1, 1, 1, sc.shape[1]]; shape[i] = size
        reps = [t, h, wd, 1]; reps[i] = 1
        pc.append(np.tile(sc.reshape(shape), reps))
        ps.append(np.tile(ss.reshape(shape), reps))
    return (_t(np.concatenate(pc, -1).reshape(t * h * wd, hd)),
            _t(np.concatenate(ps, -1).reshape(t * h * wd, hd)))


def _apply_rope_t(x, cos, sin):  # x (B, N, H, C)
    x1, x2 = x.unflatten(-1, (-1, 2)).unbind(-1)
    c = cos[None, :, None, 0::2]
    s = sin[None, :, None, 1::2]
    out = torch.empty_like(x)
    out[..., 0::2] = x1 * c - x2 * s
    out[..., 1::2] = x1 * s + x2 * c
    return out


def _oracle(w, latents, timesteps, context):
    b, t_in, h_in, w_in, _ = latents.shape
    pt, ph, pw = ARCH.patch_size
    grid = (t_in // pt, h_in // ph, w_in // pw)
    tl, hl, wl = grid
    seq = tl * hl * wl

    x_nct = _t(latents).permute(0, 4, 1, 2, 3)  # NCTHW
    x = F.conv3d(x_nct, _t(w["patch_embedding.weight"]), _t(w["patch_embedding.bias"]),
                 stride=ARCH.patch_size)
    x = x.flatten(2).transpose(1, 2)  # (B, S, D)

    half = 128
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = timesteps[:, None] * freqs[None]
    proj = _t(np.concatenate([np.cos(args), np.sin(args)], -1))
    emb = _lin(w, "time_embed.emb.timestep_embedder.linear_2",
               F.silu(_lin(w, "time_embed.emb.timestep_embedder.linear_1", proj)))
    t6 = _lin(w, "time_embed.linear", F.silu(emb)).reshape(b, 6, D)

    ctx = _lin(w, "caption_projection.linear_2",
               F.gelu(_lin(w, "caption_projection.linear_1", _t(context)), approximate="tanh"))
    ctx = _rms_full(ctx, w["caption_norm.weight"])

    cos, sin = _rope_t(grid)
    heads = ARCH.num_heads

    for i in range(ARCH.num_layers):
        src = f"transformer_blocks.{i}"
        mods = _t(w[f"{src}.scale_shift_table"])[None, None] + t6[:, None]
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = mods.unbind(2)

        xn = F.layer_norm(x, (D,), eps=ARCH.norm_eps) * (1 + sc_msa) + sh_msa
        q = _rms_full(_lin(w, f"{src}.attn1.to_q", xn), w[f"{src}.attn1.norm_q.weight"])
        k = _rms_full(_lin(w, f"{src}.attn1.to_k", xn), w[f"{src}.attn1.norm_k.weight"])
        v = _lin(w, f"{src}.attn1.to_v", xn)
        q = F.relu(q.unflatten(2, (heads, -1)))
        k = F.relu(k.unflatten(2, (heads, -1)))
        v4 = v.unflatten(2, (heads, -1))
        q_rot = _apply_rope_t(q, cos, sin)
        k_rot = _apply_rope_t(k, cos, sin)
        # B,H,C,N layout math (reference :168-184)
        qp, kp = q.permute(0, 2, 3, 1), k.permute(0, 2, 3, 1)
        qrp, krp, vp = (a.permute(0, 2, 3, 1).float() for a in (q_rot, k_rot, v4))
        z = 1 / (kp.sum(dim=-1, keepdim=True).transpose(-2, -1) @ qp + 1e-15)
        scores = vp @ krp.transpose(-1, -2)
        hs = (scores @ qrp) * z
        hs = hs.flatten(1, 2).transpose(1, 2)
        x = x + g_msa * _lin(w, f"{src}.attn1.to_out.0", hs)

        q = _rms_full(_lin(w, f"{src}.attn2.to_q", x), w[f"{src}.attn2.norm_q.weight"])
        k = _rms_full(_lin(w, f"{src}.attn2.to_k", ctx), w[f"{src}.attn2.norm_k.weight"])
        v = _lin(w, f"{src}.attn2.to_v", ctx)
        ch = ARCH.cross_heads
        out = F.scaled_dot_product_attention(
            q.unflatten(2, (ch, -1)).transpose(1, 2),
            k.unflatten(2, (ch, -1)).transpose(1, 2),
            v.unflatten(2, (ch, -1)).transpose(1, 2),
        ).transpose(1, 2).flatten(2, 3)
        x = x + _lin(w, f"{src}.attn2.to_out.0", out)

        xn = F.layer_norm(x, (D,), eps=ARCH.norm_eps) * (1 + sc_mlp) + sh_mlp
        grid5 = xn.unflatten(1, (tl, hl, wl))  # (B, T, H, W, D)
        flat = grid5.reshape(b * tl, hl, wl, D).permute(0, 3, 1, 2)
        y = F.conv2d(flat, _t(w[f"{src}.ff.conv_inverted.weight"]), _t(w[f"{src}.ff.conv_inverted.bias"]))
        y = F.silu(y)
        y = F.conv2d(y, _t(w[f"{src}.ff.conv_depth.weight"]), _t(w[f"{src}.ff.conv_depth.bias"]),
                     padding=1, groups=y.shape[1])
        y, gate = y.chunk(2, dim=1)
        y = y * F.silu(gate)
        y = F.conv2d(y, _t(w[f"{src}.ff.conv_point.weight"]), None)
        yt = y.reshape(b, tl, D, hl * wl).permute(0, 2, 1, 3)
        yt = yt + F.conv2d(yt, _t(w[f"{src}.ff.conv_temp.weight"]), None, padding=(1, 0))
        ff = yt.permute(0, 2, 3, 1).reshape(b, tl, hl, wl, D).flatten(1, 3)
        x = x + g_mlp * ff

    mods = _t(w["scale_shift_table"])[None] + emb[:, None]
    shift, scale = mods.chunk(2, dim=1)
    x = F.layer_norm(x, (D,), eps=1e-6) * (1 + scale) + shift
    out = _lin(w, "proj_out", x)
    out = out.reshape(b, tl, hl, wl, pt, ph, pw, ARCH.out_channels)
    out = out.permute(0, 7, 1, 4, 2, 5, 3, 6).flatten(6, 7).flatten(4, 5).flatten(2, 3)
    return out.permute(0, 2, 3, 4, 1).numpy()  # NCTHW -> NTHWC


def test_sanavideo_import_matches_oracle():
    w = _fixture(np.random.default_rng(991))
    params = sanavideo_params_from_checkpoint(dict(w), ARCH)
    module = SanaVideoTransformer(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(992)
    latents = rng.normal(0, 1, (2, 2, 8, 8, ARCH.in_channels)).astype(np.float32)
    context = rng.normal(0, 1, (2, 7, ARCH.caption_channels)).astype(np.float32)
    timesteps = rng.uniform(50, 950, (2,)).astype(np.float32)

    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        context=jnp.asarray(context),
    )
    ref = _oracle(w, latents, timesteps, context)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=6e-4, atol=6e-4)


def test_sanavideo_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.sanavideo.model import SanaVideo
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("sanavideo") is SanaVideo
    w = _fixture(np.random.default_rng(993))
    path = tmp_path / "sanavideo.safetensors"
    save_file(w, str(path))
    model = SanaVideo(
        TrainingConfig(
            {"model_family": "sanavideo", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
