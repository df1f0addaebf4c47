"""Krea-2 import validated against a torch oracle of the reference math
(Krea2Transformer2DModel; reference helpers/models/krea2/transformer.py):
zero-centered RMS norms ((1+w) scale), GQA attention with sigmoid output
gates and theta-1000 interleaved-pair rope, the text-fusion stack (layerwise
blocks over the tapped-layer axis, Linear(L,1) projector, refiner blocks),
shared 6H modulation + per-block additive tables, SwiGLU FFNs, and the
(2,H)-table final layer."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.krea2.transformer import Krea2Config, Krea2Transformer
from simpletuner_tpu.models.weight_import import krea2_params_from_checkpoint

pytestmark = pytest.mark.slow

ARCH = Krea2Config.tiny()
H = ARCH.hidden_size  # 64
HD = ARCH.attention_head_dim


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f, bias=False):
        w[f"{name}.weight"] = rng.normal(0, 0.06, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def attn(name, dim, heads, kv_heads):
        hd = dim // heads
        lin(f"{name}.to_q", hd * heads, dim)
        lin(f"{name}.to_k", hd * kv_heads, dim)
        lin(f"{name}.to_v", hd * kv_heads, dim)
        lin(f"{name}.to_gate", dim, dim)
        lin(f"{name}.to_out.0", dim, dim)
        w[f"{name}.norm_q.weight"] = rng.normal(0, 0.05, (hd,)).astype(np.float32)
        w[f"{name}.norm_k.weight"] = rng.normal(0, 0.05, (hd,)).astype(np.float32)

    def ff(name, dim, inner):
        lin(f"{name}.gate", inner, dim)
        lin(f"{name}.up", inner, dim)
        lin(f"{name}.down", dim, inner)

    def fusion_block(name):
        w[f"{name}.norm1.weight"] = rng.normal(0, 0.05, (ARCH.text_hidden_dim,)).astype(np.float32)
        w[f"{name}.norm2.weight"] = rng.normal(0, 0.05, (ARCH.text_hidden_dim,)).astype(np.float32)
        attn(f"{name}.attn", ARCH.text_hidden_dim, ARCH.text_num_attention_heads,
             ARCH.text_num_key_value_heads)
        ff(f"{name}.ff", ARCH.text_hidden_dim, ARCH.text_intermediate_size)

    lin("img_in", H, ARCH.in_channels, bias=True)
    lin("time_embed.linear_1", H, ARCH.timestep_embed_dim, bias=True)
    lin("time_embed.linear_2", H, H, bias=True)
    lin("time_mod_proj", 6 * H, H, bias=True)
    w["text_fusion.projector.weight"] = rng.normal(0, 0.3, (1, ARCH.num_text_layers)).astype(np.float32)
    for i in range(ARCH.num_layerwise_text_blocks):
        fusion_block(f"text_fusion.layerwise_blocks.{i}")
    for i in range(ARCH.num_refiner_text_blocks):
        fusion_block(f"text_fusion.refiner_blocks.{i}")
    w["txt_in.norm.weight"] = rng.normal(0, 0.05, (ARCH.text_hidden_dim,)).astype(np.float32)
    lin("txt_in.linear_1", H, ARCH.text_hidden_dim, bias=True)
    lin("txt_in.linear_2", H, H, bias=True)
    for i in range(ARCH.num_layers):
        src = f"transformer_blocks.{i}"
        w[f"{src}.scale_shift_table"] = rng.normal(0, 0.05, (6, H)).astype(np.float32)
        w[f"{src}.norm1.weight"] = rng.normal(0, 0.05, (H,)).astype(np.float32)
        w[f"{src}.norm2.weight"] = rng.normal(0, 0.05, (H,)).astype(np.float32)
        attn(f"{src}.attn", H, ARCH.num_attention_heads, ARCH.num_key_value_heads)
        ff(f"{src}.ff", H, ARCH.intermediate_size)
    w["final_layer.scale_shift_table"] = rng.normal(0, 0.05, (2, H)).astype(np.float32)
    w["final_layer.norm.weight"] = rng.normal(0, 0.05, (H,)).astype(np.float32)
    lin("final_layer.linear", ARCH.in_channels, H, bias=True)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    b = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.linear(x, _t(w[f"{key}.weight"]), b)


def _zrms_t(x, weight, eps=1e-5):
    return F.rms_norm(x.float(), (x.shape[-1],), weight=_t(weight) + 1.0, eps=eps)


def _rope_tables(ids):
    cos_parts, sin_parts = [], []
    for i, dax in enumerate(ARCH.axes_dims_rope):
        freqs = 1.0 / ARCH.rope_theta ** (np.arange(0, dax, 2, dtype=np.float64) / dax)
        ang = ids[:, i : i + 1].astype(np.float64) * freqs[None]
        cos_parts.append(np.repeat(np.cos(ang), 2, axis=-1))
        sin_parts.append(np.repeat(np.sin(ang), 2, axis=-1))
    return (_t(np.concatenate(cos_parts, -1)), _t(np.concatenate(sin_parts, -1)))


def _apply_rope_t(x, cos, sin):
    x0, x1 = x[..., 0::2], x[..., 1::2]
    rotated = torch.stack([-x1, x0], dim=-1).reshape(x.shape)
    return x.float() * cos[None, :, None, :] + rotated.float() * sin[None, :, None, :]


def _attn_t(w, key, x, heads, kv_heads, rope=None, key_mask=None):
    dim = x.shape[-1]
    hd = dim // heads
    b, s = x.shape[:2]
    q = _lin(w, f"{key}.to_q", x).view(b, s, heads, hd)
    k = _lin(w, f"{key}.to_k", x).view(b, s, kv_heads, hd)
    v = _lin(w, f"{key}.to_v", x).view(b, s, kv_heads, hd)
    gate = _lin(w, f"{key}.to_gate", x)
    q = _zrms_t(q, w[f"{key}.norm_q.weight"])
    k = _zrms_t(k, w[f"{key}.norm_k.weight"])
    if rope is not None:
        q = _apply_rope_t(q, *rope)
        k = _apply_rope_t(k, *rope)
    n_rep = heads // kv_heads
    qf = q.transpose(1, 2)
    kf = k.repeat_interleave(n_rep, dim=2).transpose(1, 2)
    vf = v.repeat_interleave(n_rep, dim=2).transpose(1, 2)
    mask = None
    if key_mask is not None:
        mask = key_mask[:, None, None, :]
    out = F.scaled_dot_product_attention(qf, kf, vf, attn_mask=mask)
    out = out.transpose(1, 2).reshape(b, s, dim)
    out = out * torch.sigmoid(gate)
    return _lin(w, f"{key}.to_out.0", out)


def _ff_t(w, key, x):
    return _lin(w, f"{key}.down", F.silu(_lin(w, f"{key}.gate", x)) * _lin(w, f"{key}.up", x))


def _fusion_t(w, key, x, key_mask=None):
    h = x + _attn_t(w, f"{key}.attn", _zrms_t(x, w[f"{key}.norm1.weight"]).to(x.dtype),
                    ARCH.text_num_attention_heads, ARCH.text_num_key_value_heads,
                    key_mask=key_mask)
    return h + _ff_t(w, f"{key}.ff", _zrms_t(h, w[f"{key}.norm2.weight"]).to(h.dtype))


def _oracle(w, latents_tokens, text_stack, timesteps, position_ids, mask):
    b, img_len, _ = latents_tokens.shape
    s_txt = text_stack.shape[1]

    half = ARCH.timestep_embed_dim // 2
    freqs = torch.exp(-math.log(1e4) * torch.arange(half).float() / half)
    args = (_t(timesteps) * 1e3)[:, None, None] * freqs
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    temb = _lin(w, "time_embed.linear_2", F.gelu(_lin(w, "time_embed.linear_1", emb), approximate="tanh"))
    temb_mod = _lin(w, "time_mod_proj", F.gelu(temb, approximate="tanh"))

    mask_t = torch.from_numpy(mask).bool()
    text = _t(text_stack).reshape(b * s_txt, ARCH.num_text_layers, ARCH.text_hidden_dim)
    for i in range(ARCH.num_layerwise_text_blocks):
        text = _fusion_t(w, f"text_fusion.layerwise_blocks.{i}", text)
    text = text.reshape(b, s_txt, ARCH.num_text_layers, ARCH.text_hidden_dim).permute(0, 1, 3, 2)
    text = (text @ _t(w["text_fusion.projector.weight"]).T).squeeze(-1)
    for i in range(ARCH.num_refiner_text_blocks):
        text = _fusion_t(w, f"text_fusion.refiner_blocks.{i}", text, key_mask=mask_t)

    text = _lin(w, "txt_in.linear_1", _zrms_t(text, w["txt_in.norm.weight"]))
    text = _lin(w, "txt_in.linear_2", F.gelu(text, approximate="tanh"))

    img = _lin(w, "img_in", _t(latents_tokens))
    stream = torch.cat([text, img], dim=1)
    rope = _rope_tables(position_ids)
    full_mask = torch.cat([mask_t, torch.ones(b, img_len, dtype=torch.bool)], dim=1)

    for i in range(ARCH.num_layers):
        src = f"transformer_blocks.{i}"
        mods = temb_mod.unflatten(-1, (6, H)) + _t(w[f"{src}.scale_shift_table"])
        prescale, preshift, pregate, postscale, postshift, postgate = mods.unbind(-2)
        h = (1.0 + prescale) * _zrms_t(stream, w[f"{src}.norm1.weight"]) + preshift
        attn = _attn_t(w, f"{src}.attn", h, ARCH.num_attention_heads,
                       ARCH.num_key_value_heads, rope=rope, key_mask=full_mask)
        stream = stream + pregate * attn
        h = (1.0 + postscale) * _zrms_t(stream, w[f"{src}.norm2.weight"]) + postshift
        stream = stream + postgate * _ff_t(w, f"{src}.ff", h)

    img = stream[:, s_txt:]
    mod = temb + _t(w["final_layer.scale_shift_table"])
    scale, shift = mod.chunk(2, dim=1)
    img = (1.0 + scale) * _zrms_t(img, w["final_layer.norm.weight"]) + shift
    return _lin(w, "final_layer.linear", img).numpy()


def test_krea2_import_matches_oracle():
    w = _fixture(np.random.default_rng(951))
    params = krea2_params_from_checkpoint(dict(w), ARCH)
    module = Krea2Transformer(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(952)
    b, s_txt, img_len = 2, 5, 16  # 4x4 latent grid
    tokens = rng.normal(0, 1, (b, img_len, ARCH.in_channels)).astype(np.float32)
    text = rng.normal(0, 1, (b, s_txt, ARCH.num_text_layers, ARCH.text_hidden_dim)).astype(np.float32)
    timesteps = rng.uniform(0.05, 0.95, (b,)).astype(np.float32)
    mask = np.ones((b, s_txt), np.int64)
    mask[1, 3:] = 0

    ids = np.zeros((s_txt + img_len, 3), np.float32)
    grid = np.zeros((4, 4, 3), np.float32)
    grid[..., 1] = np.arange(4)[:, None]
    grid[..., 2] = np.arange(4)[None, :]
    ids[s_txt:] = grid.reshape(-1, 3)

    # the importer permutes img_in/final_linear for OUR (ph,pw,c) packing;
    # feed the oracle through the reference (c,ph,pw) order by applying the
    # inverse permutation to the tokens
    from simpletuner_tpu.models.weight_import import _flux_pack_permutation

    perm = _flux_pack_permutation(ARCH.in_channels)
    inv = np.argsort(perm)
    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        hidden_states=jnp.asarray(tokens[:, :, perm]),
        encoder_hidden_states=jnp.asarray(text),
        timesteps=jnp.asarray(timesteps),
        position_ids=jnp.asarray(ids),
        encoder_attention_mask=jnp.asarray(mask),
    )
    ref = _oracle(w, tokens, text, timesteps, ids, mask)
    np.testing.assert_allclose(np.asarray(ours)[:, :, inv], ref, rtol=5e-4, atol=5e-4)


def test_krea2_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.krea2.model import Krea2
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("krea2") is Krea2
    w = _fixture(np.random.default_rng(953))
    path = tmp_path / "krea2.safetensors"
    save_file(w, str(path))
    model = Krea2(
        TrainingConfig(
            {"model_family": "krea2", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()


def test_krea2_reference_latents_training():
    """--krea2_reference_latents (reference krea2/model.py:466-540): a clean
    reference image rides as extra tokens after the target tokens with a
    second identical position grid; predictions slice back to the target
    tokens; a missing conditioning dataset fails loudly; a changed reference
    changes the prediction."""
    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.krea2.model import Krea2

    model = Krea2(
        TrainingConfig(
            {"model_family": "krea2", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny", "krea2_reference_latents": True,
             "max_train_steps": 10}
        )
    )
    batch = model.example_batch(batch_size=1, resolution=32)
    rng = np.random.default_rng(11)
    batch["latents"] = jnp.asarray(rng.normal(size=batch["latents"].shape), jnp.float32)
    ref_a = jnp.asarray(rng.normal(size=batch["latents"].shape), jnp.float32)
    ref_b = ref_a + 3.0

    variables = model.init_params(jax.random.PRNGKey(0), {**batch, "control_latents": ref_a})
    prepared = model.prepare_batch(jax.random.PRNGKey(1), {**batch, "control_latents": ref_a})
    pred_a = model.model_predict(variables, prepared)
    assert pred_a.shape == batch["latents"].shape  # sliced back to target tokens
    assert np.isfinite(np.asarray(pred_a)).all()

    prepared_b = dict(prepared)
    prepared_b["control_latents"] = ref_b
    pred_b = model.model_predict(variables, prepared_b)
    assert float(np.abs(np.asarray(pred_a) - np.asarray(pred_b)).max()) > 1e-6

    # 5D single-frame conditioning squeezes; multi-frame fails loudly
    prepared_c = dict(prepared)
    prepared_c["control_latents"] = ref_a[:, None]
    np.testing.assert_allclose(
        np.asarray(model.model_predict(variables, prepared_c)), np.asarray(pred_a),
        rtol=1e-5, atol=1e-6,
    )
    import pytest

    with pytest.raises(ValueError, match="single frame"):
        bad = dict(prepared)
        bad["control_latents"] = jnp.concatenate([ref_a[:, None]] * 2, axis=1)
        model.model_predict(variables, bad)
    with pytest.raises(ValueError, match="conditioning_latents"):
        missing = {k: v for k, v in prepared.items() if k != "control_latents"}
        model.model_predict(variables, missing)
