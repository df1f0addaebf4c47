"""ERNIE import validated against a torch oracle of the reference math
(ErnieImageTransformer2DModel; reference
helpers/models/ernie/transformer_diffusers.py): [image, text] sequence order,
(text_len, y, x) image rope coordinates with theta 256 and pairwise-duplicated
angles, shared zero-init 6-param adaLN, affine RMS pre-norms + per-head RMS
q/k norms, up·gelu(gate) FFN, and the no-silu final AdaLN-continuous."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.ernie.transformer import ErnieConfig, ErnieTransformer
from simpletuner_tpu.models.weight_import import ernie_params_from_checkpoint

pytestmark = pytest.mark.slow

import dataclasses as _dc

# text_in_dim != hidden_size so the optional text_proj is exercised
ARCH = _dc.replace(ErnieConfig.tiny(), text_in_dim=24)
H = ARCH.hidden_size
HD = ARCH.head_dim


def _fixture(rng, arch=None):
    arch = arch or ARCH
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.06, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def rms(name, dim):
        w[name] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    w["x_embedder.proj.weight"] = rng.normal(0, 0.06, (H, arch.in_channels, 1, 1)).astype(np.float32)
    w["x_embedder.proj.bias"] = rng.normal(0, 0.02, (H,)).astype(np.float32)
    if arch.text_in_dim != arch.hidden_size:
        lin("text_proj", H, arch.text_in_dim, bias=False)
    lin("time_embedding.linear_1", H, H)
    lin("time_embedding.linear_2", H, H)
    lin("adaLN_modulation.1", 6 * H, H)  # nonzero for the test
    for i in range(ARCH.num_layers):
        src = f"layers.{i}"
        rms(f"{src}.adaLN_sa_ln.weight", H)
        rms(f"{src}.adaLN_mlp_ln.weight", H)
        lin(f"{src}.self_attention.to_q", H, H, bias=False)
        lin(f"{src}.self_attention.to_k", H, H, bias=False)
        lin(f"{src}.self_attention.to_v", H, H, bias=False)
        lin(f"{src}.self_attention.to_out.0", H, H, bias=False)
        rms(f"{src}.self_attention.norm_q.weight", HD)
        rms(f"{src}.self_attention.norm_k.weight", HD)
        lin(f"{src}.mlp.gate_proj", ARCH.ffn_hidden_size, H, bias=False)
        lin(f"{src}.mlp.up_proj", ARCH.ffn_hidden_size, H, bias=False)
        lin(f"{src}.mlp.linear_fc2", H, ARCH.ffn_hidden_size, bias=False)
    lin("final_norm.linear", 2 * H, H)
    lin("final_linear", ARCH.out_channels, H)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    b = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.linear(x, _t(w[f"{key}.weight"]), b)


def _rms_t(x, g, eps):
    return F.rms_norm(x.float(), (x.shape[-1],), _t(g), eps)


def _angles_t(ids):  # (B, S, 3) -> (B, S, HD) pairwise-duplicated
    parts = []
    for i, dax in enumerate(ARCH.rope_axes_dim):
        omega = 1.0 / ARCH.rope_theta ** (np.arange(0, dax, 2, dtype=np.float32) / dax)
        parts.append(_t(ids)[..., i, None].float() * _t(omega))
    emb = torch.cat(parts, dim=-1)
    return emb.repeat_interleave(2, dim=-1)


def _apply_rope_t(x, angles):  # x (B, S, heads, HD)
    cos = angles.cos()[:, :, None, :]
    sin = angles.sin()[:, :, None, :]
    half = x.shape[-1] // 2
    rot = torch.cat([-x[..., half:], x[..., :half]], dim=-1)
    return x.float() * cos + rot.float() * sin


def _oracle(w, latents, timesteps, text, text_lens):
    b, h, wd, _ = latents.shape
    n_img = h * wd
    t_max = text.shape[1]

    conv = _t(w["x_embedder.proj.weight"])[:, :, 0, 0]
    img = _t(latents).reshape(b, n_img, ARCH.in_channels) @ conv.T + _t(w["x_embedder.proj.bias"])
    txt = _t(text) @ _t(w["text_proj.weight"]).T
    x = torch.cat([img, txt], dim=1)

    ys = np.repeat(np.arange(h), wd).astype(np.float32)
    xs = np.tile(np.arange(wd), h).astype(np.float32)
    img_ids = np.stack(
        [np.broadcast_to(text_lens[:, None].astype(np.float32), (b, n_img)),
         np.broadcast_to(ys[None], (b, n_img)),
         np.broadcast_to(xs[None], (b, n_img))], axis=-1)
    text_ids = np.concatenate(
        [np.broadcast_to(np.arange(t_max, dtype=np.float32)[None, :, None], (b, t_max, 1)),
         np.zeros((b, t_max, 2), np.float32)], axis=-1)
    angles = _angles_t(np.concatenate([img_ids, text_ids], axis=1))
    valid = np.arange(t_max)[None] < text_lens[:, None]
    key_mask = torch.from_numpy(
        np.concatenate([np.ones((b, n_img), bool), valid], axis=1))

    half = H // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = timesteps[:, None] * freqs[None]
    sample = _t(np.concatenate([np.sin(args), np.cos(args)], -1))
    c = _lin(w, "time_embedding.linear_2", F.silu(_lin(w, "time_embedding.linear_1", sample)))
    mod = _lin(w, "adaLN_modulation.1", F.silu(c))
    temb6 = [m[:, None] for m in mod.chunk(6, dim=-1)]
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = temb6

    for i in range(ARCH.num_layers):
        src = f"layers.{i}"
        hn = _rms_t(x, w[f"{src}.adaLN_sa_ln.weight"], ARCH.eps) * (1 + scale_msa) + shift_msa
        q = _lin(w, f"{src}.self_attention.to_q", hn).unflatten(-1, (ARCH.num_heads, HD))
        k = _lin(w, f"{src}.self_attention.to_k", hn).unflatten(-1, (ARCH.num_heads, HD))
        v = _lin(w, f"{src}.self_attention.to_v", hn).unflatten(-1, (ARCH.num_heads, HD))
        q = _rms_t(q, w[f"{src}.self_attention.norm_q.weight"], 1e-5)
        k = _rms_t(k, w[f"{src}.self_attention.norm_k.weight"], 1e-5)
        q = _apply_rope_t(q, angles)
        k = _apply_rope_t(k, angles)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            attn_mask=key_mask[:, None, None, :],
        ).transpose(1, 2).flatten(2, 3)
        out = _lin(w, f"{src}.self_attention.to_out.0", out)
        x = x + gate_msa * out
        hn = _rms_t(x, w[f"{src}.adaLN_mlp_ln.weight"], ARCH.eps) * (1 + scale_mlp) + shift_mlp
        ff = _lin(w, f"{src}.mlp.linear_fc2",
                  _lin(w, f"{src}.mlp.up_proj", hn) * F.gelu(_lin(w, f"{src}.mlp.gate_proj", hn)))
        x = x + gate_mlp * ff

    fin = _lin(w, "final_norm.linear", c)
    f_scale, f_shift = fin.chunk(2, dim=-1)
    xn = F.layer_norm(x, (H,), eps=ARCH.eps)
    xn = xn * (1 + f_scale[:, None]) + f_shift[:, None]
    out = _lin(w, "final_linear", xn)
    return out[:, :n_img].reshape(b, h, wd, ARCH.out_channels).numpy()


def test_ernie_import_matches_oracle():
    w = _fixture(np.random.default_rng(981))
    params = ernie_params_from_checkpoint(dict(w), ARCH)
    module = ErnieTransformer(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(982)
    b, h, wd = 2, 4, 4
    latents = rng.normal(0, 1, (b, h, wd, ARCH.in_channels)).astype(np.float32)
    text = rng.normal(0, 1, (b, 6, ARCH.text_in_dim)).astype(np.float32)
    timesteps = rng.uniform(50, 950, (b,)).astype(np.float32)
    text_lens = np.array([6, 3], np.int32)

    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        text_embeds=jnp.asarray(text),
        text_lens=jnp.asarray(text_lens),
    )
    ref = _oracle(w, latents, timesteps, text, text_lens)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


def test_ernie_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.ernie.model import Ernie
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("ernie") is Ernie
    w = _fixture(np.random.default_rng(983), arch=ErnieConfig.tiny())
    path = tmp_path / "ernie.safetensors"
    save_file(w, str(path))
    model = Ernie(
        TrainingConfig(
            {"model_family": "ernie", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
