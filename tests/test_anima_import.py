"""Anima import validated against a torch oracle of the reference math
(AnimaTransformerModel; reference helpers/models/anima/transformer.py +
helpers/models/cosmos/transformer.py): the LLM adapter (T5-token embed,
pre-RMS self/cross blocks with half-repeated-rope, norm(out_proj)) feeding
the Cosmos DiT core (padding-mask channel, [C,pt,ph,pw] patchify, sinusoid →
bias-free 3H temb + RMS embedded timestep, per-block adaLN-LoRA with temb
add, NTK-scaled half rope, exact-gelu FF, 2H output adaLN, the non-inverse
unpatchify)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.anima.transformer import AnimaConfig, AnimaTransformer
from simpletuner_tpu.models.weight_import import anima_params_from_checkpoint

pytestmark = pytest.mark.slow

ARCH = AnimaConfig.tiny()
CORE = ARCH.core
H = CORE.hidden_size  # 24
HD = CORE.head_dim
AD = ARCH.adapter_dim  # 32
AHD = AD // ARCH.adapter_heads


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f, bias=False):
        w[f"{name}.weight"] = rng.normal(0, 0.06, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def rms(name, dim):
        w[name] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    # adapter
    w["llm_adapter.embed.weight"] = rng.normal(0, 0.05, (ARCH.adapter_vocab_size, AD)).astype(np.float32)
    for i in range(ARCH.adapter_layers):
        src = f"llm_adapter.blocks.{i}"
        rms(f"{src}.norm_self_attn.weight", AD)
        rms(f"{src}.norm_cross_attn.weight", AD)
        rms(f"{src}.norm_mlp.weight", AD)
        for attn in ("self_attn", "cross_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                lin(f"{src}.{attn}.{proj}", AD, AD)
            rms(f"{src}.{attn}.q_norm.weight", AHD)
            rms(f"{src}.{attn}.k_norm.weight", AHD)
        lin(f"{src}.mlp.0", AD * 4, AD, bias=True)
        lin(f"{src}.mlp.2", AD, AD * 4, bias=True)
    lin("llm_adapter.out_proj", AD, AD, bias=True)
    rms("llm_adapter.norm.weight", AD)

    # core
    patch_in = (CORE.in_channels + 1) * int(np.prod(CORE.patch_size))
    lin("core.patch_embed.proj", H, patch_in)
    lin("core.time_embed.t_embedder.linear_1", H, H)
    lin("core.time_embed.t_embedder.linear_2", 3 * H, H)
    rms("core.time_embed.norm.weight", H)
    for name, size in (("pos_emb_t", CORE.max_size[0] // CORE.patch_size[0]),
                       ("pos_emb_h", CORE.max_size[1] // CORE.patch_size[1]),
                       ("pos_emb_w", CORE.max_size[2] // CORE.patch_size[2])):
        w[f"core.learnable_pos_embed.{name}"] = rng.normal(0, 0.02, (size, H)).astype(np.float32)
    for i in range(CORE.num_layers):
        src = f"core.transformer_blocks.{i}"
        for norm in ("norm1", "norm2", "norm3"):
            lin(f"{src}.{norm}.linear_1", CORE.adaln_lora_dim, H)
            lin(f"{src}.{norm}.linear_2", 3 * H, CORE.adaln_lora_dim)
        for attn, kv in (("attn1", H), ("attn2", CORE.text_embed_dim)):
            lin(f"{src}.{attn}.to_q", H, H)
            lin(f"{src}.{attn}.to_k", H, kv)
            lin(f"{src}.{attn}.to_v", H, kv)
            lin(f"{src}.{attn}.to_out.0", H, H)
            rms(f"{src}.{attn}.norm_q.weight", HD)
            rms(f"{src}.{attn}.norm_k.weight", HD)
        lin(f"{src}.ff.net.0.proj", int(H * CORE.mlp_ratio), H)
        lin(f"{src}.ff.net.2", H, int(H * CORE.mlp_ratio))
    lin("core.norm_out.linear_1", CORE.adaln_lora_dim, H)
    lin("core.norm_out.linear_2", 2 * H, CORE.adaln_lora_dim)
    lin("core.proj_out", int(np.prod(CORE.patch_size)) * CORE.out_channels, H)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    b = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.linear(x, _t(w[f"{key}.weight"]), b)


def _rms_t(x, g, eps=1e-6):
    return F.rms_norm(x.float(), (x.shape[-1],), _t(g), eps)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return torch.cat((-x[..., half:], x[..., :half]), dim=-1)


def _adapter_rope_t(length, head_dim):
    inv = 1.0 / (10000.0 ** ((2.0 / head_dim) * np.arange(head_dim // 2)))
    ang = np.outer(np.arange(length), inv)
    full = _t(np.concatenate([ang, ang], -1))
    return full.cos(), full.sin()


def _adapter_attn(w, key, x, ctx, rope_q, rope_k):
    heads = ARCH.adapter_heads
    b = x.shape[0]
    q = _lin(w, f"{key}.q_proj", x).view(b, -1, heads, AHD).transpose(1, 2)
    k = _lin(w, f"{key}.k_proj", ctx).view(b, -1, heads, AHD).transpose(1, 2)
    v = _lin(w, f"{key}.v_proj", ctx).view(b, -1, heads, AHD).transpose(1, 2)
    q = _rms_t(q, w[f"{key}.q_norm.weight"])
    k = _rms_t(k, w[f"{key}.k_norm.weight"])
    if rope_q is not None:
        cq, sq = rope_q
        ck, sk = rope_k
        q = q * cq[None, None] + _rotate_half(q) * sq[None, None]
        k = k * ck[None, None] + _rotate_half(k) * sk[None, None]
    y = F.scaled_dot_product_attention(q, k, v)
    y = y.transpose(1, 2).reshape(b, x.shape[1], -1)
    return _lin(w, f"{key}.o_proj", y)


def _adapter_t(w, source, ids):
    x = _t(w["llm_adapter.embed.weight"])[torch.from_numpy(ids)]
    rope_t = _adapter_rope_t(x.shape[1], AHD)
    rope_s = _adapter_rope_t(source.shape[1], AHD)
    src_t = _t(source)
    for i in range(ARCH.adapter_layers):
        key = f"llm_adapter.blocks.{i}"
        x = x + _adapter_attn(w, f"{key}.self_attn",
                              _rms_t(x, w[f"{key}.norm_self_attn.weight"]), None or _rms_t(x, w[f"{key}.norm_self_attn.weight"]),
                              rope_t, rope_t)
        x = x + _adapter_attn(w, f"{key}.cross_attn",
                              _rms_t(x, w[f"{key}.norm_cross_attn.weight"]), src_t,
                              rope_t, rope_s)
        h = _lin(w, f"{key}.mlp.0", _rms_t(x, w[f"{key}.norm_mlp.weight"]))
        x = x + _lin(w, f"{key}.mlp.2", F.gelu(h))
    return _rms_t(_lin(w, "llm_adapter.out_proj", x), w["llm_adapter.norm.weight"])


def _core_rope_t(grid):
    hd = HD
    dim_h = dim_w = hd // 6 * 2
    dim_t = hd - dim_h - dim_w
    thetas = [10000.0 * CORE.rope_scale[0] ** (dim_t / (dim_t - 2)),
              10000.0 * CORE.rope_scale[1] ** (dim_h / (dim_h - 2)),
              10000.0 * CORE.rope_scale[2] ** (dim_w / (dim_w - 2))]
    t, h, wd = grid
    tf = 1.0 / thetas[0] ** (np.arange(0, dim_t, 2)[: dim_t // 2] / dim_t)
    hf = 1.0 / thetas[1] ** (np.arange(0, dim_h, 2)[: dim_h // 2] / dim_h)
    wf = 1.0 / thetas[2] ** (np.arange(0, dim_w, 2)[: dim_w // 2] / dim_w)
    emb_t = np.outer(np.arange(t), tf)[:, None, None, :]
    emb_h = np.outer(np.arange(h), hf)[None, :, None, :]
    emb_w = np.outer(np.arange(wd), wf)[None, None, :, :]
    full = np.concatenate(
        [np.broadcast_to(emb_t, (t, h, wd, emb_t.shape[-1])),
         np.broadcast_to(emb_h, (t, h, wd, emb_h.shape[-1])),
         np.broadcast_to(emb_w, (t, h, wd, emb_w.shape[-1]))] * 2, -1,
    ).reshape(t * h * wd, hd)
    return _t(np.cos(full)), _t(np.sin(full))


def _ada_zero(w, key, x, embedded, temb):
    e = F.silu(embedded)
    e = _lin(w, f"{key}.linear_1", e)
    e = _lin(w, f"{key}.linear_2", e) + temb
    shift, scale, gate = e.chunk(3, dim=-1)
    shift, scale, gate = shift[:, None], scale[:, None], gate[:, None]
    normed = F.layer_norm(x, (H,), eps=1e-6) * (1 + scale) + shift
    return normed, gate


def _core_attn(w, key, q_src, kv_src, rope, heads=None):
    heads = heads or CORE.num_heads
    b = q_src.shape[0]
    q = _lin(w, f"{key}.to_q", q_src).unflatten(2, (heads, -1)).transpose(1, 2)
    k = _lin(w, f"{key}.to_k", kv_src).unflatten(2, (heads, -1)).transpose(1, 2)
    v = _lin(w, f"{key}.to_v", kv_src).unflatten(2, (heads, -1)).transpose(1, 2)
    q = _rms_t(q, w[f"{key}.norm_q.weight"], 1e-5)
    k = _rms_t(k, w[f"{key}.norm_k.weight"], 1e-5)
    if rope is not None:
        cos, sin = rope
        q = q * cos[None, None] + _rotate_half(q) * sin[None, None]
        k = k * cos[None, None] + _rotate_half(k) * sin[None, None]
    y = F.scaled_dot_product_attention(q, k, v)
    y = y.transpose(1, 2).flatten(2, 3)
    return _lin(w, f"{key}.to_out.0", y)


def _core_t(w, latents, timesteps, context):
    b, t_in, h_in, w_in, c = latents.shape
    pt, ph, pw = CORE.patch_size
    grid = (t_in // pt, h_in // ph, w_in // pw)
    seq = grid[0] * grid[1] * grid[2]

    x = _t(latents)
    plane = torch.zeros(b, t_in, h_in, w_in, 1)
    x = torch.cat([x, plane], dim=-1)
    c_in = x.shape[-1]
    x = x.reshape(b, grid[0], pt, grid[1], ph, grid[2], pw, c_in)
    x = x.permute(0, 1, 3, 5, 7, 2, 4, 6).reshape(b, seq, c_in * pt * ph * pw)
    x = _lin(w, "core.patch_embed.proj", x)

    half = H // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = timesteps[:, None] * freqs[None]
    proj = _t(np.concatenate([np.cos(args), np.sin(args)], -1))
    temb = _lin(w, "core.time_embed.t_embedder.linear_2",
                F.silu(_lin(w, "core.time_embed.t_embedder.linear_1", proj)))
    embedded = _rms_t(proj, w["core.time_embed.norm.weight"])

    rope = _core_rope_t(grid)
    pe_t = _t(w["core.learnable_pos_embed.pos_emb_t"])[: grid[0]]
    pe_h = _t(w["core.learnable_pos_embed.pos_emb_h"])[: grid[1]]
    pe_w = _t(w["core.learnable_pos_embed.pos_emb_w"])[: grid[2]]
    emb = (pe_t[:, None, None] + pe_h[None, :, None] + pe_w[None, None, :]).reshape(seq, H)
    emb = emb[None].expand(b, -1, -1)
    norm = torch.linalg.vector_norm(emb, dim=-1, keepdim=True)
    norm = 1e-6 + norm * np.sqrt(norm.numel() / emb.numel())
    extra = emb / norm

    ctx = context
    for i in range(CORE.num_layers):
        src = f"core.transformer_blocks.{i}"
        x = x + extra
        normed, gate = _ada_zero(w, f"{src}.norm1", x, embedded, temb)
        x = x + gate * _core_attn(w, f"{src}.attn1", normed, normed, rope)
        normed, gate = _ada_zero(w, f"{src}.norm2", x, embedded, temb)
        x = x + gate * _core_attn(w, f"{src}.attn2", normed, ctx, None)
        normed, gate = _ada_zero(w, f"{src}.norm3", x, embedded, temb)
        ff = _lin(w, f"{src}.ff.net.2", F.gelu(_lin(w, f"{src}.ff.net.0.proj", normed)))
        x = x + gate * ff

    e = F.silu(embedded)
    e = _lin(w, "core.norm_out.linear_1", e)
    e = _lin(w, "core.norm_out.linear_2", e) + temb[..., : 2 * H]
    shift, scale = e.chunk(2, dim=-1)
    x = F.layer_norm(x, (H,), eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    out = _lin(w, "core.proj_out", x)
    out = out.unflatten(2, (ph, pw, pt, -1)).unflatten(1, grid)
    out = out.permute(0, 7, 1, 6, 2, 4, 3, 5).flatten(6, 7).flatten(4, 5).flatten(2, 3)
    return out.permute(0, 2, 3, 4, 1).numpy()  # NCTHW -> NTHWC


def test_anima_import_matches_oracle():
    w = _fixture(np.random.default_rng(1001))
    params = anima_params_from_checkpoint(dict(w), ARCH)
    module = AnimaTransformer(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(1002)
    latents = rng.normal(0, 1, (2, 1, 8, 8, CORE.in_channels)).astype(np.float32)
    source = rng.normal(0, 1, (2, 5, AD)).astype(np.float32)
    ids = rng.integers(1, ARCH.adapter_vocab_size, (2, 7))
    timesteps = rng.uniform(0.05, 0.95, (2,)).astype(np.float32)

    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        text_embeds=jnp.asarray(source),
        t5_ids=jnp.asarray(ids, jnp.int32),
    )
    adapted = _adapter_t(w, source, ids)
    pad = ARCH.adapter_pad_length - adapted.shape[1]
    adapted = F.pad(adapted, (0, 0, 0, pad))
    ref = _core_t(w, latents, timesteps, adapted)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=6e-4, atol=6e-4)


def test_anima_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.anima.model import Anima
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("anima") is Anima
    w = _fixture(np.random.default_rng(1003))
    path = tmp_path / "anima.safetensors"
    save_file(w, str(path))
    model = Anima(
        TrainingConfig(
            {"model_family": "anima", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
