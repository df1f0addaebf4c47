"""Zlab i1 weight import validated against a numpy oracle of the reference
math (helpers/models/zlab_i1/transformer.py ZlabI1Transformer2DModel):
timestep-free U-ViT MMDiT — conv patch embed + column-major-first sincos
position table (:38-52, :123-131), 2-round text connector (:204-242), MMDiT
attention with per-modality fused qkv + SHARED RMS q/k norms + 3-axis scaled
rope (:244-384), shared norm1/norm3/norm4 post-norm blocks with LIFO skip
linears (:386-440, :882-921), RMSNorm+linear final layer.  Also covers the
flux2 latent shuffle/normalize round trip (latent_utils.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpletuner_tpu.models.zlab_i1.transformer import (
    ZlabI1Config,
    ZlabI1Transformer,
    sincos_pos_embed,
)
from simpletuner_tpu.models.weight_import import zlab_i1_params_from_checkpoint

pytestmark = pytest.mark.slow

ARCH = ZlabI1Config.tiny()


def _fixture(rng):
    d = ARCH.hidden_size
    dh = ARCH.head_dim
    inner = ARCH.ffn_inner
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    def rms(name, dim):
        w[f"{name}.scale"] = rng.normal(1, 0.05, (dim,)).astype(np.float32)

    w["x_embedder.proj.weight"] = rng.normal(
        0, 0.02, (d, ARCH.in_channels, ARCH.patch_size, ARCH.patch_size)
    ).astype(np.float32)
    w["x_embedder.proj.bias"] = rng.normal(0, 0.02, (d,)).astype(np.float32)
    hw = ARCH.input_size // ARCH.patch_size
    w["pos_embed"] = sincos_pos_embed(
        d, hw, hw, ARCH.image_resolution, ARCH.image_resolution
    ).reshape(1, hw * hw, d)
    w["text_encoder_adapter.learnable_null_caption"] = rng.normal(
        0, 0.02, (1, ARCH.text_num_tokens, ARCH.text_embed_dim)
    ).astype(np.float32)
    lin("text_encoder_adapter.connector_in", d, ARCH.text_embed_dim)

    def conn_attn(src):
        lin(f"{src}.qkv", 3 * d, d)
        rms(f"{src}.q_norm", dh)
        rms(f"{src}.k_norm", dh)
        lin(f"{src}.proj", d, d)

    def swiglu(src):
        lin(f"{src}.w12", 2 * inner, d)
        lin(f"{src}.w3", d, inner)

    for i in (1, 2, 3, 4):
        rms(f"text_encoder_adapter.connector_norm{i}", d)
    conn_attn("text_encoder_adapter.connector_attn")
    conn_attn("text_encoder_adapter.connector_attn2")
    swiglu("text_encoder_adapter.connector_mlp")
    swiglu("text_encoder_adapter.connector_mlp2")

    def block(src, use_skip):
        for i in (1, 2, 3, 4):
            rms(f"{src}.norm{i}", d)
        lin(f"{src}.attn.qkv_image", 3 * d, d)
        lin(f"{src}.attn.qkv_text", 3 * d, d)
        rms(f"{src}.attn.q_norm", dh)
        rms(f"{src}.attn.k_norm", dh)
        lin(f"{src}.attn.proj_image", d, d)
        lin(f"{src}.attn.proj_text", d, d)
        swiglu(f"{src}.mlp_image")
        swiglu(f"{src}.mlp_text")
        if use_skip:
            lin(f"{src}.skip_linear_image", d, 2 * d)
            lin(f"{src}.skip_linear_text", d, 2 * d)

    for i in range(ARCH.num_in_blocks):
        block(f"in_blocks.{i}", False)
        block(f"out_blocks.{i}", True)
    block("mid_block", False)
    rms("final_layer.norm_final", d)
    lin("final_layer.linear", ARCH.patch_size ** 2 * ARCH.in_channels, d)
    return w


def _t_lin(w, name, x):
    y = x @ w[f"{name}.weight"].T
    if f"{name}.bias" in w:
        y = y + w[f"{name}.bias"]
    return y


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _rms(x, g, eps=1e-6):
    return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * g


def _angles(positions, scales):
    parts = []
    for axis, (dax, scale) in enumerate(zip(ARCH.axes_dims, scales)):
        base = 1.0 / ARCH.rope_theta ** (np.arange(0, dax, 2) / dax)
        parts.append(positions[:, axis : axis + 1].astype(np.float64) * scale * base[None])
    return np.concatenate(parts, axis=-1)


def _rope(x, angles):
    cos = np.cos(angles)[:, None, :]
    sin = np.sin(angles)[:, None, :]
    x0, x1 = x[..., 0::2], x[..., 1::2]
    return np.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1).reshape(x.shape)


def _attention(q, k, v, key_mask=None):
    s, h, dd = q.shape
    q, k, v = (t.transpose(1, 0, 2) for t in (q, k, v))
    logits = q @ k.transpose(0, 2, 1) / np.sqrt(dd)
    if key_mask is not None:
        logits = np.where(key_mask[None, None, :], logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return (p @ v).transpose(1, 0, 2).reshape(s, h * dd)


def _swiglu(w, src, x):
    x12 = _t_lin(w, f"{src}.w12", x)
    x1, x2 = np.split(x12, 2, axis=-1)
    return _t_lin(w, f"{src}.w3", _silu(x1) * x2)


def _conn_attn(w, src, x):
    s = x.shape[0]
    dh = ARCH.head_dim
    qkv = _t_lin(w, f"{src}.qkv", x).reshape(s, 3, ARCH.num_heads, dh)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q = _rms(q, w[f"{src}.q_norm.scale"])
    k = _rms(k, w[f"{src}.k_norm.scale"])
    return _t_lin(w, f"{src}.proj", _attention(q, k, v))


def _text_adapter(w, caption):
    x = _t_lin(w, "text_encoder_adapter.connector_in", caption)
    x = x + _conn_attn(
        w, "text_encoder_adapter.connector_attn",
        _rms(x, w["text_encoder_adapter.connector_norm1.scale"]),
    )
    x = x + _swiglu(
        w, "text_encoder_adapter.connector_mlp",
        _rms(x, w["text_encoder_adapter.connector_norm2.scale"]),
    )
    x = x + _conn_attn(
        w, "text_encoder_adapter.connector_attn2",
        _rms(x, w["text_encoder_adapter.connector_norm3.scale"]),
    )
    return x + _swiglu(
        w, "text_encoder_adapter.connector_mlp2",
        _rms(x, w["text_encoder_adapter.connector_norm4.scale"]),
    )


def _block(w, src, img, txt, img_ang, txt_ang, text_mask, skip=None):
    dh = ARCH.head_dim
    if skip is not None:
        img = _t_lin(w, f"{src}.skip_linear_image", np.concatenate([img, skip[0]], -1))
        txt = _t_lin(w, f"{src}.skip_linear_text", np.concatenate([txt, skip[1]], -1))
    img_n = _rms(img, w[f"{src}.norm1.scale"])
    txt_n = _rms(txt, w[f"{src}.norm1.scale"])

    def project(prefix, x):
        qkv = _t_lin(w, f"{src}.attn.qkv_{prefix}", x).reshape(x.shape[0], 3, ARCH.num_heads, dh)
        return qkv[:, 0], qkv[:, 1], qkv[:, 2]

    q_i, k_i, v_i = project("image", img_n)
    q_t, k_t, v_t = project("text", txt_n)
    q_i = _rope(_rms(q_i, w[f"{src}.attn.q_norm.scale"]), img_ang)
    k_i = _rope(_rms(k_i, w[f"{src}.attn.k_norm.scale"]), img_ang)
    q_t = _rope(_rms(q_t, w[f"{src}.attn.q_norm.scale"]), txt_ang)
    k_t = _rope(_rms(k_t, w[f"{src}.attn.k_norm.scale"]), txt_ang)
    q = np.concatenate([q_i, q_t], axis=0)
    k = np.concatenate([k_i, k_t], axis=0)
    v = np.concatenate([v_i, v_t], axis=0)
    img_len = img.shape[0]
    key_mask = np.concatenate([np.ones(img_len, bool), text_mask.astype(bool)])
    out = _attention(q, k, v, key_mask)
    out = out * key_mask[:, None]
    img_attn = _t_lin(w, f"{src}.attn.proj_image", out[:img_len])
    txt_attn = _t_lin(w, f"{src}.attn.proj_text", out[img_len:])
    img = img + _rms(img_attn, w[f"{src}.norm3.scale"])
    txt = txt + _rms(txt_attn, w[f"{src}.norm3.scale"])
    img = img + _rms(_swiglu(w, f"{src}.mlp_image", _rms(img, w[f"{src}.norm2.scale"])),
                     w[f"{src}.norm4.scale"])
    txt = txt + _rms(_swiglu(w, f"{src}.mlp_text", _rms(txt, w[f"{src}.norm2.scale"])),
                     w[f"{src}.norm4.scale"])
    txt = txt * text_mask[:, None]
    return img, txt


def _oracle_sample(w, latents, caption, text_mask):
    p = ARCH.patch_size
    h_lat, w_lat, c = latents.shape
    hh, ww = h_lat // p, w_lat // p

    # conv patch embed: (c, ph, pw)-major flatten + sincos table
    x = latents.reshape(hh, p, ww, p, c).transpose(0, 2, 4, 1, 3).reshape(hh * ww, c * p * p)
    x = x @ w["x_embedder.proj.weight"].reshape(ARCH.hidden_size, -1).T + w["x_embedder.proj.bias"]
    x = x + w["pos_embed"][0]

    txt = _text_adapter(w, caption)

    text_len = caption.shape[0]
    eff = int(text_mask.sum())
    cap_pos = np.zeros((text_len, 3), np.int64)
    cap_pos[:, 0] = np.where(text_mask > 0, np.arange(text_len), 0)
    rows = np.repeat(np.arange(hh), ww)
    cols = np.tile(np.arange(ww), hh)
    img_pos = np.stack([np.full(hh * ww, eff), rows, cols], axis=-1)
    image_scale = 256.0 / float(hh * p * 8)
    image_scale_w = 256.0 / float(ww * p * 8)
    scales = (1.0, image_scale, image_scale_w)
    txt_ang = _angles(cap_pos, scales)
    img_ang = _angles(img_pos, scales)

    skips = []
    for i in range(ARCH.num_in_blocks):
        x, txt = _block(w, f"in_blocks.{i}", x, txt, img_ang, txt_ang, text_mask)
        skips.append((x, txt))
    x, txt = _block(w, "mid_block", x, txt, img_ang, txt_ang, text_mask)
    for i in range(ARCH.num_in_blocks):
        x, txt = _block(w, f"out_blocks.{i}", x, txt, img_ang, txt_ang, text_mask, skips.pop())

    out = _t_lin(w, "final_layer.linear", _rms(x, w["final_layer.norm_final.scale"]))
    out = out.reshape(hh, ww, p, p, c).transpose(0, 2, 1, 3, 4).reshape(h_lat, w_lat, c)
    return out


def test_zlab_i1_import_matches_oracle():
    w = _fixture(np.random.default_rng(401))
    params = zlab_i1_params_from_checkpoint(w, ARCH)

    module = ZlabI1Transformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(43)
    latents = rng.normal(0, 1, (2, ARCH.input_size, ARCH.input_size, ARCH.in_channels)).astype(np.float32)
    cap = rng.normal(0, 1, (2, ARCH.text_num_tokens, ARCH.text_embed_dim)).astype(np.float32)
    mask = np.ones((2, ARCH.text_num_tokens), np.int32)
    mask[1, 7:] = 0
    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray([0.5, 0.9], jnp.float32),
        context=jnp.asarray(cap),
        context_mask=jnp.asarray(mask),
    )
    for i in range(2):
        ref = _oracle_sample(w, latents[i], cap[i], mask[i])
        np.testing.assert_allclose(np.asarray(out)[i], ref, rtol=6e-4, atol=6e-4)


def test_zlab_i1_null_caption_dropout():
    w = _fixture(np.random.default_rng(402))
    params = zlab_i1_params_from_checkpoint(w, ARCH)
    module = ZlabI1Transformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(47)
    latents = rng.normal(0, 1, (1, ARCH.input_size, ARCH.input_size, ARCH.in_channels)).astype(np.float32)
    cap = rng.normal(0, 1, (1, ARCH.text_num_tokens, ARCH.text_embed_dim)).astype(np.float32)

    def run(dropout):
        return np.asarray(
            module.apply(
                {"params": jax.tree_util.tree_map(jnp.asarray, params)},
                latents=jnp.asarray(latents),
                timesteps=jnp.zeros((1,), jnp.float32),
                context=jnp.asarray(cap),
                caption_dropout=jnp.asarray([dropout], jnp.int32),
            )
        )

    dropped = run(1)
    # dropped caption must equal running with the learnable null caption
    null = w["text_encoder_adapter.learnable_null_caption"].astype(np.float32)
    ref = _oracle_sample(w, latents[0], null[0], np.ones(ARCH.text_num_tokens, np.int32))
    np.testing.assert_allclose(dropped[0], ref, rtol=6e-4, atol=6e-4)
    assert not np.allclose(run(0), dropped)


def test_flux2_latent_normalize_round_trip():
    from simpletuner_tpu.models.zlab_i1.latent_utils import (
        normalize_flux2_latents,
        pixel_shuffle_2x,
        pixel_unshuffle_2x,
        unscale_flux2_latents,
    )

    rng = np.random.default_rng(51)
    latents = jnp.asarray(rng.normal(0, 2, (2, 8, 8, 32)).astype(np.float32))
    packed = pixel_unshuffle_2x(latents)
    assert packed.shape == (2, 4, 4, 128)
    np.testing.assert_allclose(np.asarray(pixel_shuffle_2x(packed)), np.asarray(latents), rtol=1e-6)
    normed = normalize_flux2_latents(latents)
    np.testing.assert_allclose(
        np.asarray(unscale_flux2_latents(normed)), np.asarray(latents), rtol=1e-4, atol=1e-4
    )
    # pixel-unshuffle channel order matches the torch permute (c, ph, pw)
    single = np.zeros((1, 2, 2, 4), np.float32)
    single[0, 0, 1, 2] = 1.0  # channel 2, ph 0, pw 1
    packed_single = np.asarray(pixel_unshuffle_2x(jnp.asarray(single)))
    assert packed_single[0, 0, 0, 2 * 4 + 0 * 2 + 1] == 1.0


def test_zlab_i1_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params
    from simpletuner_tpu.models.zlab_i1.model import ZlabI1

    assert ModelRegistry.get("zlab_i1") is ZlabI1
    w = _fixture(np.random.default_rng(403))
    path = tmp_path / "zlab_i1.safetensors"
    save_file({k: v for k, v in w.items()}, str(path))
    model = ZlabI1(
        TrainingConfig(
            {"model_family": "zlab_i1", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1, resolution=ARCH.input_size * 8)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
