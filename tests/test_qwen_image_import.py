"""Qwen-Image weight import validated against a numpy oracle of the reference
math (vendored QwenImageTransformer2DModel; reference
helpers/models/qwen_image/transformer.py), including the centered scale_rope
coordinates and interleaved complex rotary."""

import numpy as np
import jax
import jax.numpy as jnp

from simpletuner_tpu.models.qwen_image.transformer import (
    QwenImageConfig,
    QwenImageTransformer,
    qwen_rope_angles,
)
from simpletuner_tpu.models.weight_import import qwen_image_params_from_diffusers

import pytest

pytestmark = pytest.mark.slow

ARCH = QwenImageConfig.tiny()

def _fixture(rng):
    d = ARCH.hidden_size
    inner = ARCH.num_heads * ARCH.head_dim
    mlp = int(d * ARCH.mlp_ratio)
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    lin("img_in", d, ARCH.in_channels)
    lin("txt_in", d, ARCH.txt_in_features)
    w["txt_norm.weight"] = rng.normal(1, 0.05, (ARCH.txt_in_features,)).astype(np.float32)
    lin("time_text_embed.timestep_embedder.linear_1", d, 256)
    lin("time_text_embed.timestep_embedder.linear_2", d, d)
    lin("norm_out.linear", 2 * d, d)
    lin("proj_out", ARCH.in_channels, d)
    for i in range(ARCH.depth):
        p = f"transformer_blocks.{i}"
        lin(f"{p}.img_mod.1", 6 * d, d)
        lin(f"{p}.txt_mod.1", 6 * d, d)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{p}.attn.{n}", inner, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            w[f"{p}.attn.{n}.weight"] = rng.normal(1, 0.05, (ARCH.head_dim,)).astype(np.float32)
        lin(f"{p}.attn.to_out.0", d, inner)
        lin(f"{p}.attn.to_add_out", d, inner)
        lin(f"{p}.img_mlp.net.0.proj", mlp, d)
        lin(f"{p}.img_mlp.net.2", d, mlp)
        lin(f"{p}.txt_mlp.net.0.proj", mlp, d)
        lin(f"{p}.txt_mlp.net.2", d, mlp)
    return w

def _t_lin(w, name, x):
    return x @ w[f"{name}.weight"].T + w[f"{name}.bias"]

def _silu(x):
    return x / (1.0 + np.exp(-x))

def _gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))

def _ln(x, eps=1e-6):
    return (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + eps)

def _rms(x, g, eps=1e-6):
    return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * g

def _rope(x, angles):
    # x (B, S, H, D); angles (S, D/2); interleaved pairs
    cos = np.cos(angles)[None, :, None, :]
    sin = np.sin(angles)[None, :, None, :]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    out = np.stack([o1, o2], axis=-1).reshape(x.shape)
    return out

def _attention_joint(q, k, v):
    # q/k/v: (B, S, H, D)
    b, s, h, dd = q.shape
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dd)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return (p @ v).transpose(0, 2, 1, 3).reshape(b, s, h * dd)

def _oracle(w, img_tokens, hh, ww, txt, timesteps):
    d = ARCH.hidden_size
    b = img_tokens.shape[0]
    x = _t_lin(w, "img_in", img_tokens)
    t = _rms(txt, w["txt_norm.weight"])
    t = _t_lin(w, "txt_in", t)

    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = (timesteps * 1000.0)[:, None].astype(np.float64) * freqs[None]
    tp = np.concatenate([np.cos(args), np.sin(args)], -1).astype(np.float32)
    temb = _t_lin(w, "time_text_embed.timestep_embedder.linear_2",
                  _silu(_t_lin(w, "time_text_embed.timestep_embedder.linear_1", tp)))

    ang_img, ang_txt = qwen_rope_angles(ARCH, hh, ww, txt.shape[1])
    heads, hd = ARCH.num_heads, ARCH.head_dim

    for i in range(ARCH.depth):
        p = f"transformer_blocks.{i}"
        im = _t_lin(w, f"{p}.img_mod.1", _silu(temb))
        tm = _t_lin(w, f"{p}.txt_mod.1", _silu(temb))
        i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = np.split(im, 6, axis=-1)
        t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = np.split(tm, 6, axis=-1)

        xn = _ln(x) * (1 + i_sc1[:, None]) + i_sh1[:, None]
        tn = _ln(t) * (1 + t_sc1[:, None]) + t_sh1[:, None]

        def qkv(src, xx, prefix):
            s = xx.shape[1]
            q = _t_lin(w, f"{src}.attn.{prefix[0]}", xx).reshape(b, s, heads, hd)
            k = _t_lin(w, f"{src}.attn.{prefix[1]}", xx).reshape(b, s, heads, hd)
            v = _t_lin(w, f"{src}.attn.{prefix[2]}", xx).reshape(b, s, heads, hd)
            return q, k, v

        iq, ik, iv = qkv(p, xn, ("to_q", "to_k", "to_v"))
        tq, tk, tv = qkv(p, tn, ("add_q_proj", "add_k_proj", "add_v_proj"))
        iq = _rms(iq, w[f"{p}.attn.norm_q.weight"])
        ik = _rms(ik, w[f"{p}.attn.norm_k.weight"])
        tq = _rms(tq, w[f"{p}.attn.norm_added_q.weight"])
        tk = _rms(tk, w[f"{p}.attn.norm_added_k.weight"])
        iq, ik = _rope(iq, ang_img), _rope(ik, ang_img)
        tq, tk = _rope(tq, ang_txt), _rope(tk, ang_txt)

        q = np.concatenate([tq, iq], axis=1)
        k = np.concatenate([tk, ik], axis=1)
        v = np.concatenate([tv, iv], axis=1)
        attn = _attention_joint(q, k, v)
        tl = txt.shape[1]
        t_attn, i_attn = attn[:, :tl], attn[:, tl:]

        x = x + i_g1[:, None] * _t_lin(w, f"{p}.attn.to_out.0", i_attn)
        t = t + t_g1[:, None] * _t_lin(w, f"{p}.attn.to_add_out", t_attn)

        xm = _ln(x) * (1 + i_sc2[:, None]) + i_sh2[:, None]
        x = x + i_g2[:, None] * _t_lin(w, f"{p}.img_mlp.net.2",
                                       _gelu_tanh(_t_lin(w, f"{p}.img_mlp.net.0.proj", xm)))
        tm2 = _ln(t) * (1 + t_sc2[:, None]) + t_sh2[:, None]
        t = t + t_g2[:, None] * _t_lin(w, f"{p}.txt_mlp.net.2",
                                       _gelu_tanh(_t_lin(w, f"{p}.txt_mlp.net.0.proj", tm2)))

    final = _t_lin(w, "norm_out.linear", _silu(temb))
    scale, shift = np.split(final, 2, axis=-1)
    x = _ln(x) * (1 + scale[:, None]) + shift[:, None]
    return _t_lin(w, "proj_out", x)

def test_qwen_image_import_matches_oracle():
    w = _fixture(np.random.default_rng(51))
    params = qwen_image_params_from_diffusers(w, ARCH)

    module = QwenImageTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(17)
    hh = ww = 4
    img = rng.normal(0, 1, (2, hh * ww, ARCH.in_channels)).astype(np.float32)
    txt = rng.normal(0, 1, (2, 7, ARCH.txt_in_features)).astype(np.float32)
    timesteps = np.asarray([0.15, 0.6], np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        img=jnp.asarray(img),
        img_hw=jnp.zeros((hh, ww)),
        txt=jnp.asarray(txt),
        timesteps=jnp.asarray(timesteps),
    )
    ref = _oracle(w, img, hh, ww, txt, timesteps)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=4e-4, atol=4e-4)

def test_qwen_image_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.qwen_image.model import QwenImage
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("qwen_image") is QwenImage
    w = _fixture(np.random.default_rng(53))
    path = tmp_path / "qwen.safetensors"
    save_file(w, str(path))
    model = QwenImage(
        TrainingConfig(
            {"model_family": "qwen_image", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert bool(jnp.all(jnp.isfinite(pred)))

def test_mageflow_rides_qwen_layout(tmp_path):
    """MageFlow/Z-Image load Qwen-Image-layout checkpoints with text rope
    disabled (vendor mage_layers.py: text tokens are not rotated)."""
    import dataclasses

    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.mageflow.model import MageFlow
    from simpletuner_tpu.models.qwen_image.transformer import QwenImageTransformer
    from simpletuner_tpu.models.weight_import import load_transformer_params

    w = _fixture(np.random.default_rng(57))
    path = tmp_path / "mage.safetensors"
    save_file(w, str(path))
    model = MageFlow(
        TrainingConfig(
            {"model_family": "mageflow", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    assert model.arch.txt_rope is False
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()

    # the text-rope flag is behavioral: the same weights with rotation enabled
    # must produce a different output
    params = qwen_image_params_from_diffusers(w, model.arch)
    rotated = QwenImageTransformer(
        config=dataclasses.replace(model.arch, txt_rope=True), dtype=jnp.float32
    )
    plain = QwenImageTransformer(config=model.arch, dtype=jnp.float32)
    inputs = model.get_model_inputs(prepared)
    vs = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    out_rot = rotated.apply(vs, **inputs)
    out_plain = plain.apply(vs, **inputs)
    assert float(jnp.abs(out_rot - out_plain).max()) > 1e-6
