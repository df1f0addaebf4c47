"""Cosmos-Predict2 T2I family validated against a torch oracle of the
reference math (Cosmos2Image, helpers/models/cosmos/model.py + the vendored
CosmosTransformer3DModel): the bare-core checkpoint import, the EDM
preconditioning (c_in = c_skip = 1/(σ+1), c_out = −σ/(σ+1), timestep
σ/(σ+1)), the log-normal σ draw, and the (σ²+1)/σ² loss weight."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.cosmos1.transformer import Cosmos1Config
from simpletuner_tpu.models.cosmos2.model import Cosmos2Image
from simpletuner_tpu.models.weight_import import cosmos1_params_from_checkpoint

pytestmark = pytest.mark.slow

CORE = Cosmos1Config.tiny()
H = CORE.hidden_size
HD = CORE.head_dim


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.06, (out_f, in_f)).astype(np.float32)

    def rms(name, dim):
        w[name] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    patch_in = (CORE.in_channels + 1) * int(np.prod(CORE.patch_size))
    lin("patch_embed.proj", H, patch_in)
    lin("time_embed.t_embedder.linear_1", H, H)
    lin("time_embed.t_embedder.linear_2", 3 * H, H)
    rms("time_embed.norm.weight", H)
    for name, size in (("pos_emb_t", CORE.max_size[0] // CORE.patch_size[0]),
                       ("pos_emb_h", CORE.max_size[1] // CORE.patch_size[1]),
                       ("pos_emb_w", CORE.max_size[2] // CORE.patch_size[2])):
        w[f"learnable_pos_embed.{name}"] = rng.normal(0, 0.02, (size, H)).astype(np.float32)
    for i in range(CORE.num_layers):
        src = f"transformer_blocks.{i}"
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
    lin("norm_out.linear_1", CORE.adaln_lora_dim, H)
    lin("norm_out.linear_2", 2 * H, CORE.adaln_lora_dim)
    lin("proj_out", int(np.prod(CORE.patch_size)) * CORE.out_channels, H)
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


def _core_rope_t(grid):
    dim_h = dim_w = HD // 6 * 2
    dim_t = HD - dim_h - dim_w
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
    ).reshape(t * h * wd, HD)
    return _t(np.cos(full)), _t(np.sin(full))


def _ada_zero(w, key, x, embedded, temb):
    e = F.silu(embedded)
    e = _lin(w, f"{key}.linear_1", e)
    e = _lin(w, f"{key}.linear_2", e) + temb
    shift, scale, gate = e.chunk(3, dim=-1)
    shift, scale, gate = shift[:, None], scale[:, None], gate[:, None]
    normed = F.layer_norm(x, (H,), eps=1e-6) * (1 + scale) + shift
    return normed, gate


def _core_attn(w, key, q_src, kv_src, rope):
    heads = CORE.num_heads
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
    return _lin(w, f"{key}.to_out.0", y.transpose(1, 2).flatten(2, 3))


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
    x = _lin(w, "patch_embed.proj", x)

    half = H // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = timesteps[:, None] * freqs[None]
    proj = _t(np.concatenate([np.cos(args), np.sin(args)], -1))
    temb = _lin(w, "time_embed.t_embedder.linear_2",
                F.silu(_lin(w, "time_embed.t_embedder.linear_1", proj)))
    embedded = _rms_t(proj, w["time_embed.norm.weight"])

    rope = _core_rope_t(grid)
    pe_t = _t(w["learnable_pos_embed.pos_emb_t"])[: grid[0]]
    pe_h = _t(w["learnable_pos_embed.pos_emb_h"])[: grid[1]]
    pe_w = _t(w["learnable_pos_embed.pos_emb_w"])[: grid[2]]
    emb = (pe_t[:, None, None] + pe_h[None, :, None] + pe_w[None, None, :]).reshape(seq, H)
    emb = emb[None].expand(b, -1, -1)
    norm = torch.linalg.vector_norm(emb, dim=-1, keepdim=True)
    norm = 1e-6 + norm * np.sqrt(norm.numel() / emb.numel())
    extra = emb / norm

    ctx = _t(context)
    for i in range(CORE.num_layers):
        src = f"transformer_blocks.{i}"
        x = x + extra
        normed, gate = _ada_zero(w, f"{src}.norm1", x, embedded, temb)
        x = x + gate * _core_attn(w, f"{src}.attn1", normed, normed, rope)
        normed, gate = _ada_zero(w, f"{src}.norm2", x, embedded, temb)
        x = x + gate * _core_attn(w, f"{src}.attn2", normed, ctx, None)
        normed, gate = _ada_zero(w, f"{src}.norm3", x, embedded, temb)
        ff = _lin(w, f"{src}.ff.net.2", F.gelu(_lin(w, f"{src}.ff.net.0.proj", normed)))
        x = x + gate * ff

    e = F.silu(embedded)
    e = _lin(w, "norm_out.linear_1", e)
    e = _lin(w, "norm_out.linear_2", e) + temb[..., : 2 * H]
    shift, scale = e.chunk(2, dim=-1)
    x = F.layer_norm(x, (H,), eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    out = _lin(w, "proj_out", x)
    out = out.unflatten(2, (ph, pw, pt, -1)).unflatten(1, grid)
    out = out.permute(0, 7, 1, 6, 2, 4, 3, 5).flatten(6, 7).flatten(4, 5).flatten(2, 3)
    return out.permute(0, 2, 3, 4, 1).numpy()  # NCTHW -> NTHWC


def _tiny_model(model_type: str = "full"):
    return Cosmos2Image(
        TrainingConfig(
            {"model_family": "cosmos", "model_type": model_type, "lora_rank": 0,
             "model_arch_preset": "tiny", "mixed_precision": "no"}
        )
    )


def test_cosmos2_predict_matches_edm_oracle():
    """Full model_predict (preconditioning + core) against the torch oracle
    of reference model.py:460-495."""
    w = _fixture(np.random.default_rng(1301))
    params = cosmos1_params_from_checkpoint(dict(w), CORE)
    model = _tiny_model()
    model.module  # build

    rng = np.random.default_rng(1302)
    latents = rng.normal(0, 1, (2, 8, 8, CORE.in_channels)).astype(np.float32)
    context = rng.normal(0, 1, (2, 6, CORE.text_embed_dim)).astype(np.float32)
    sigmas = np.array([0.4, 7.5], np.float32)
    noise = rng.normal(0, 1, latents.shape).astype(np.float32)

    batch = {
        "latents": jnp.asarray(latents),
        "text_embeds": jnp.asarray(context),
        "override_noise": jnp.asarray(noise),
        "override_sigmas": jnp.asarray(sigmas),
    }
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    np.testing.assert_allclose(
        np.asarray(prepared["noisy_latents"]),
        latents + sigmas[:, None, None, None] * noise, rtol=1e-6)

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    x0_pred = np.asarray(model.model_predict(variables, prepared))

    # torch oracle
    xt = latents + sigmas[:, None, None, None] * noise
    inv = 1.0 / (sigmas[:, None, None, None] + 1.0)
    r = _core_t(w, (xt * inv)[:, None], sigmas / (sigmas + 1.0), context)[:, 0]
    ref = inv * xt - sigmas[:, None, None, None] * inv * r
    np.testing.assert_allclose(x0_pred, ref, rtol=6e-4, atol=6e-4)

    # EDM loss weight (model.py:497-525): w = (σ²+1)/σ²
    loss = float(model.compute_loss(jnp.asarray(x0_pred), prepared))
    per = ((x0_pred - latents) ** 2).mean(axis=(1, 2, 3))
    expect = (per * (sigmas**2 + 1.0) / sigmas**2).mean()
    np.testing.assert_allclose(loss, expect, rtol=1e-4)


def test_cosmos2_sigma_distribution():
    """σ ~ exp(N(0,1)) clamped to [0.002, 80] (model.py:527-534)."""
    model = _tiny_model()
    batch = model.example_batch(batch_size=512)
    prepared = model.prepare_batch(jax.random.PRNGKey(7), batch)
    sigmas = np.asarray(prepared["sigmas"])
    assert sigmas.min() >= model.sigma_min and sigmas.max() <= model.sigma_max
    logs = np.log(sigmas)
    assert abs(logs.mean()) < 0.2 and abs(logs.std() - 1.0) < 0.15


def test_cosmos2_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("cosmos") is Cosmos2Image
    w = _fixture(np.random.default_rng(1303))
    path = tmp_path / "cosmos.safetensors"
    save_file(w, str(path))
    model = _tiny_model()
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
