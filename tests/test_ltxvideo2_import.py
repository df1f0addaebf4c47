"""LTX-2 audiovisual transformer import validated against a torch oracle of
the reference math (vendored LTX2VideoTransformer3DModel; reference
helpers/models/ltxvideo2/transformer.py): tokenwise adaLN-single modulation,
full-width affine RMS q/k norms, fractional-coordinate interleaved RoPE
(video 3-axis, audio 1-axis, temporal-only cross rope), a2v/v2a cross
attention with per-block+global modulation, and dual output heads."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.ltxvideo2.transformer import (
    LTX2Config,
    LTX2Transformer,
    ltx2_audio_coords,
    ltx2_video_coords,
)
from simpletuner_tpu.models.weight_import import ltx2_params_from_diffusers

pytestmark = pytest.mark.slow

ARCH = LTX2Config.tiny()
DIM = ARCH.inner_dim
ADIM = ARCH.audio_inner_dim


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.05, (out_f,)).astype(np.float32)

    def adaln(src, dim, n):
        lin(f"{src}.emb.timestep_embedder.linear_1", dim, 256)
        lin(f"{src}.emb.timestep_embedder.linear_2", dim, dim)
        lin(f"{src}.linear", n * dim, dim)

    def attn(src, q_dim, kv_dim, heads, hd, out_dim):
        inner = heads * hd
        lin(f"{src}.to_q", inner, q_dim)
        lin(f"{src}.to_k", inner, kv_dim)
        lin(f"{src}.to_v", inner, kv_dim)
        w[f"{src}.norm_q.weight"] = rng.normal(1, 0.05, (inner,)).astype(np.float32)
        w[f"{src}.norm_k.weight"] = rng.normal(1, 0.05, (inner,)).astype(np.float32)
        lin(f"{src}.to_out.0", out_dim, inner)

    lin("proj_in", DIM, ARCH.in_channels)
    lin("audio_proj_in", ADIM, ARCH.audio_in_channels)
    lin("caption_projection.linear_1", DIM, ARCH.caption_channels)
    lin("caption_projection.linear_2", DIM, DIM)
    lin("audio_caption_projection.linear_1", ADIM, ARCH.caption_channels)
    lin("audio_caption_projection.linear_2", ADIM, ADIM)
    adaln("time_embed", DIM, 6)
    adaln("audio_time_embed", ADIM, 6)
    adaln("av_cross_attn_video_scale_shift", DIM, 4)
    adaln("av_cross_attn_video_a2v_gate", DIM, 1)
    adaln("av_cross_attn_audio_scale_shift", ADIM, 4)
    adaln("av_cross_attn_audio_v2a_gate", ADIM, 1)
    w["scale_shift_table"] = rng.normal(0, 0.2, (2, DIM)).astype(np.float32)
    w["audio_scale_shift_table"] = rng.normal(0, 0.2, (2, ADIM)).astype(np.float32)
    lin("proj_out", ARCH.in_channels, DIM)
    lin("audio_proj_out", ARCH.audio_in_channels, ADIM)
    for i in range(ARCH.num_layers):
        src = f"transformer_blocks.{i}"
        w[f"{src}.scale_shift_table"] = rng.normal(0, 0.2, (6, DIM)).astype(np.float32)
        w[f"{src}.audio_scale_shift_table"] = rng.normal(0, 0.2, (6, ADIM)).astype(np.float32)
        w[f"{src}.video_a2v_cross_attn_scale_shift_table"] = rng.normal(0, 0.2, (5, DIM)).astype(np.float32)
        w[f"{src}.audio_a2v_cross_attn_scale_shift_table"] = rng.normal(0, 0.2, (5, ADIM)).astype(np.float32)
        attn(f"{src}.attn1", DIM, DIM, ARCH.num_heads, ARCH.head_dim, DIM)
        attn(f"{src}.audio_attn1", ADIM, ADIM, ARCH.audio_num_heads, ARCH.audio_head_dim, ADIM)
        attn(f"{src}.attn2", DIM, DIM, ARCH.num_heads, ARCH.head_dim, DIM)
        attn(f"{src}.audio_attn2", ADIM, ADIM, ARCH.audio_num_heads, ARCH.audio_head_dim, ADIM)
        attn(f"{src}.audio_to_video_attn", DIM, ADIM, ARCH.audio_num_heads, ARCH.audio_head_dim, DIM)
        attn(f"{src}.video_to_audio_attn", ADIM, DIM, ARCH.audio_num_heads, ARCH.audio_head_dim, ADIM)
        lin(f"{src}.ff.net.0.proj", 4 * DIM, DIM)
        lin(f"{src}.ff.net.2", DIM, 4 * DIM)
        lin(f"{src}.audio_ff.net.0.proj", 4 * ADIM, ADIM)
        lin(f"{src}.audio_ff.net.2", ADIM, 4 * ADIM)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, name, x):
    return F.linear(x, _t(w[f"{name}.weight"]), _t(w[f"{name}.bias"]))


def _rms(x, g=None, eps=1e-6):
    y = x * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps)
    return y * _t(g) if g is not None else y


def _rope_tables(coords, max_positions, dim, theta):
    ndims = coords.shape[1]
    elems = 2 * ndims
    n_freq = dim // elems
    frac = coords / np.asarray(max_positions, np.float64)[None, :]
    pow_indices = theta ** np.linspace(0.0, 1.0, n_freq, dtype=np.float64)
    freqs = pow_indices * math.pi / 2.0
    ang = (frac[:, :, None] * 2.0 - 1.0) * freqs[None, None]
    ang = np.swapaxes(ang, 1, 2).reshape(coords.shape[0], -1)
    cos = np.repeat(np.cos(ang), 2, axis=-1)
    sin = np.repeat(np.sin(ang), 2, axis=-1)
    pad = dim % elems
    if pad:
        cos = np.concatenate([np.ones_like(cos[:, :pad]), cos], axis=-1)
        sin = np.concatenate([np.zeros_like(sin[:, :pad]), sin], axis=-1)
    return _t(cos), _t(sin)


def _apply_rope(x, rope):
    cos, sin = rope
    x0, x1 = x.unflatten(-1, (-1, 2)).unbind(-1)
    rotated = torch.stack([-x1, x0], dim=-1).flatten(2)
    return x.float() * cos[None] + rotated.float() * sin[None]


def _attention(w, src, x, context, heads, hd, q_rope=None, k_rope=None, bias=None):
    b, ql = x.shape[:2]
    q = _rms(_lin(w, f"{src}.to_q", x), w[f"{src}.norm_q.weight"])
    k = _rms(_lin(w, f"{src}.to_k", context), w[f"{src}.norm_k.weight"])
    v = _lin(w, f"{src}.to_v", context)
    if q_rope is not None:
        q = _apply_rope(q, q_rope)
        k = _apply_rope(k, k_rope if k_rope is not None else q_rope)
    q = q.view(b, ql, heads, hd).transpose(1, 2)
    k = k.view(b, -1, heads, hd).transpose(1, 2)
    v = v.view(b, -1, heads, hd).transpose(1, 2)
    out = F.scaled_dot_product_attention(q, k, v, attn_mask=bias)
    out = out.transpose(1, 2).reshape(b, ql, heads * hd)
    return _lin(w, f"{src}.to_out.0", out)


def _adaln(w, src, timesteps, n, dim):
    b = timesteps.shape[0]
    flat = timesteps.reshape(-1)
    half = 128
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
    args = flat.float()[:, None] * 1000.0 * freqs[None]
    tp = torch.cat([torch.cos(args), torch.sin(args)], -1)
    emb = _lin(w, f"{src}.emb.timestep_embedder.linear_2",
               F.silu(_lin(w, f"{src}.emb.timestep_embedder.linear_1", tp)))
    mod = _lin(w, f"{src}.linear", F.silu(emb))
    return mod.view(b, -1, n * dim), emb.view(b, -1, dim)


def _mods(table, temb, n, dim):
    b = temb.shape[0]
    values = _t(table)[None, None] + temb.view(b, -1, n, dim)
    return values.unbind(2)


def _oracle(w, video, audio, text, sigmas, frames, height, width):
    b = video.shape[0]
    x = _lin(w, "proj_in", _t(video))
    a = _lin(w, "audio_proj_in", _t(audio))
    t_v = _lin(w, "caption_projection.linear_2",
               F.gelu(_lin(w, "caption_projection.linear_1", _t(text)), approximate="tanh"))
    t_a = _lin(w, "audio_caption_projection.linear_2",
               F.gelu(_lin(w, "audio_caption_projection.linear_1", _t(text)), approximate="tanh"))

    ts = torch.from_numpy(sigmas)
    temb, emb_t = _adaln(w, "time_embed", ts, 6, DIM)
    temb_a, emb_ta = _adaln(w, "audio_time_embed", ts, 6, ADIM)
    temb_ca, _ = _adaln(w, "av_cross_attn_video_scale_shift", ts, 4, DIM)
    temb_ca_gate, _ = _adaln(w, "av_cross_attn_video_a2v_gate", ts, 1, DIM)
    temb_ca_a, _ = _adaln(w, "av_cross_attn_audio_scale_shift", ts, 4, ADIM)
    temb_ca_a_gate, _ = _adaln(w, "av_cross_attn_audio_v2a_gate", ts, 1, ADIM)

    v_coords = ltx2_video_coords(ARCH, frames, height, width)
    a_coords = ltx2_audio_coords(ARCH, audio.shape[1])
    v_max = (ARCH.pos_embed_max_pos, ARCH.base_height, ARCH.base_width)
    a_max = (ARCH.audio_pos_embed_max_pos,)
    ca_max = (max(ARCH.pos_embed_max_pos, ARCH.audio_pos_embed_max_pos),)
    v_rope = _rope_tables(v_coords, v_max, DIM, ARCH.rope_theta)
    a_rope = _rope_tables(a_coords, a_max, ADIM, ARCH.rope_theta)
    ca_v_rope = _rope_tables(v_coords[:, :1], ca_max, ARCH.audio_cross_attention_dim, ARCH.rope_theta)
    ca_a_rope = _rope_tables(a_coords, ca_max, ARCH.audio_cross_attention_dim, ARCH.rope_theta)

    heads, hd = ARCH.num_heads, ARCH.head_dim
    a_heads, a_hd = ARCH.audio_num_heads, ARCH.audio_head_dim
    for i in range(ARCH.num_layers):
        src = f"transformer_blocks.{i}"
        sh1, sc1, g1, sh2, sc2, g2 = _mods(w[f"{src}.scale_shift_table"], temb, 6, DIM)
        ash1, asc1, ag1, ash2, asc2, ag2 = _mods(w[f"{src}.audio_scale_shift_table"], temb_a, 6, ADIM)

        x_n = _rms(x) * (1 + sc1) + sh1
        x = x + g1 * _attention(w, f"{src}.attn1", x_n, x_n, heads, hd, q_rope=v_rope)
        a_n = _rms(a) * (1 + asc1) + ash1
        a = a + ag1 * _attention(w, f"{src}.audio_attn1", a_n, a_n, a_heads, a_hd, q_rope=a_rope)

        x = x + _attention(w, f"{src}.attn2", _rms(x), t_v, heads, hd)
        a = a + _attention(w, f"{src}.audio_attn2", _rms(a), t_a, a_heads, a_hd)

        v_norm = _rms(x)
        a_norm = _rms(a)
        v_table = w[f"{src}.video_a2v_cross_attn_scale_shift_table"]
        a_table = w[f"{src}.audio_a2v_cross_attn_scale_shift_table"]
        v_a2v_sc, v_a2v_sh, v_v2a_sc, v_v2a_sh = _mods(v_table[:4], temb_ca, 4, DIM)
        (a2v_gate,) = _mods(v_table[4:], temb_ca_gate, 1, DIM)
        a_a2v_sc, a_a2v_sh, a_v2a_sc, a_v2a_sh = _mods(a_table[:4], temb_ca_a, 4, ADIM)
        (v2a_gate,) = _mods(a_table[4:], temb_ca_a_gate, 1, ADIM)

        q_v = v_norm * (1 + v_a2v_sc) + v_a2v_sh
        kv_a = a_norm * (1 + a_a2v_sc) + a_a2v_sh
        x = x + a2v_gate * _attention(
            w, f"{src}.audio_to_video_attn", q_v, kv_a, a_heads, a_hd,
            q_rope=ca_v_rope, k_rope=ca_a_rope,
        )
        q_a = a_norm * (1 + a_v2a_sc) + a_v2a_sh
        kv_v = v_norm * (1 + v_v2a_sc) + v_v2a_sh
        a = a + v2a_gate * _attention(
            w, f"{src}.video_to_audio_attn", q_a, kv_v, a_heads, a_hd,
            q_rope=ca_a_rope, k_rope=ca_v_rope,
        )

        x_f = _rms(x) * (1 + sc2) + sh2
        x = x + g2 * _lin(w, f"{src}.ff.net.2", F.gelu(_lin(w, f"{src}.ff.net.0.proj", x_f), approximate="tanh"))
        a_f = _rms(a) * (1 + asc2) + ash2
        a = a + ag2 * _lin(w, f"{src}.audio_ff.net.2",
                           F.gelu(_lin(w, f"{src}.audio_ff.net.0.proj", a_f), approximate="tanh"))

    values = _t(w["scale_shift_table"])[None, None] + emb_t[:, :, None]
    shift, scale = values[:, :, 0], values[:, :, 1]
    x = F.layer_norm(x, (DIM,), eps=1e-6) * (1 + scale) + shift
    video_out = _lin(w, "proj_out", x)
    a_values = _t(w["audio_scale_shift_table"])[None, None] + emb_ta[:, :, None]
    a_shift, a_scale = a_values[:, :, 0], a_values[:, :, 1]
    a = F.layer_norm(a, (ADIM,), eps=1e-6) * (1 + a_scale) + a_shift
    audio_out = _lin(w, "audio_proj_out", a)
    return video_out.numpy(), audio_out.numpy()


def test_ltx2_import_matches_oracle():
    w = _fixture(np.random.default_rng(131))
    params = ltx2_params_from_diffusers(w, ARCH)

    module = LTX2Transformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(37)
    frames, height, width = 2, 3, 4
    video = rng.normal(0, 1, (2, frames * height * width, ARCH.in_channels)).astype(np.float32)
    audio = rng.normal(0, 1, (2, 5, ARCH.audio_in_channels)).astype(np.float32)
    text = rng.normal(0, 1, (2, 6, ARCH.caption_channels)).astype(np.float32)
    sigmas = np.asarray([0.3, 0.8], np.float32)

    video_out, audio_out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        video_tokens=jnp.asarray(video),
        audio_tokens=jnp.asarray(audio),
        text_embeds=jnp.asarray(text),
        timesteps=jnp.asarray(sigmas),
        num_frames=frames, height=height, width=width,
    )
    ref_v, ref_a = _oracle(w, video, audio, text, sigmas, frames, height, width)
    np.testing.assert_allclose(np.asarray(video_out), ref_v, rtol=6e-4, atol=6e-4)
    np.testing.assert_allclose(np.asarray(audio_out), ref_a, rtol=6e-4, atol=6e-4)


def test_ltx2_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.ltxvideo2.model import LTXVideo2
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("ltxvideo2") is LTXVideo2
    w = _fixture(np.random.default_rng(133))
    path = tmp_path / "ltx2.safetensors"
    save_file(w, str(path))
    model = LTXVideo2(
        TrainingConfig(
            {"model_family": "ltxvideo2", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    loss, aux = model.loss_fn(variables, jax.random.PRNGKey(0), batch)
    assert np.isfinite(float(loss))
    assert "audio_loss" in aux and np.isfinite(float(aux["audio_loss"]))
