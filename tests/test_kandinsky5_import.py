"""Kandinsky-5 import validated against a torch oracle of the reference math
(Kandinsky5Transformer3DModel; reference
helpers/models/kandinsky5_video/transformer_kandinsky5.py): sinusoid time MLP
+ pooled-text LN add, text refiner blocks (6-param zero-init modulation, 1D
pairwise rope), visual decoder blocks (9-param modulation, 3D axis-concat
rope with scale_factor, cross-attention over the text stream), per-head
affine RMS q/k norms, fp32 gated residuals, and the [c, p_t, p_h, p_w]
unpatchify."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.kandinsky5.transformer import (
    Kandinsky5Config,
    Kandinsky5Transformer,
)
from simpletuner_tpu.models.weight_import import kandinsky5_params_from_checkpoint

pytestmark = pytest.mark.slow

ARCH = Kandinsky5Config.tiny()
D = ARCH.model_dim
HD = ARCH.head_dim
HEADS = ARCH.num_heads


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f, bias=True, zero=False):
        scale = 0.0 if zero else 0.06
        w[f"{name}.weight"] = (rng.normal(0, 0.06, (out_f, in_f)) * (0 if zero else 1)).astype(np.float32) \
            if zero else rng.normal(0, 0.06, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = (np.zeros(out_f) if zero else rng.normal(0, 0.02, (out_f,))).astype(np.float32)

    def norm(name):
        w[f"{name}.weight"] = rng.normal(1, 0.05, (D,)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.05, (D,)).astype(np.float32)

    def attn(name):
        for p in ("to_query", "to_key", "to_value", "out_layer"):
            lin(f"{name}.{p}", D, D)
        w[f"{name}.query_norm.weight"] = rng.normal(1, 0.05, (HD,)).astype(np.float32)
        w[f"{name}.key_norm.weight"] = rng.normal(1, 0.05, (HD,)).astype(np.float32)

    def ff(name):
        lin(f"{name}.in_layer", ARCH.ff_dim, D, bias=False)
        lin(f"{name}.out_layer", D, ARCH.ff_dim, bias=False)

    lin("time_embeddings.in_layer", ARCH.time_dim, D)
    lin("time_embeddings.out_layer", ARCH.time_dim, ARCH.time_dim)
    lin("text_embeddings.in_layer", D, ARCH.in_text_dim)
    w["text_embeddings.norm.weight"] = rng.normal(1, 0.05, (D,)).astype(np.float32)
    w["text_embeddings.norm.bias"] = rng.normal(0, 0.05, (D,)).astype(np.float32)
    lin("pooled_text_embeddings.in_layer", ARCH.time_dim, ARCH.in_text_dim2)
    w["pooled_text_embeddings.norm.weight"] = rng.normal(1, 0.05, (ARCH.time_dim,)).astype(np.float32)
    w["pooled_text_embeddings.norm.bias"] = rng.normal(0, 0.05, (ARCH.time_dim,)).astype(np.float32)
    lin("visual_embeddings.in_layer", D, int(np.prod(ARCH.patch_size)) * ARCH.in_visual_dim)
    for i in range(ARCH.num_text_blocks):
        p = f"text_transformer_blocks.{i}"
        lin(f"{p}.text_modulation.out_layer", 6 * D, ARCH.time_dim)  # nonzero for the test
        attn(f"{p}.self_attention")
        ff(f"{p}.feed_forward")
    for i in range(ARCH.num_visual_blocks):
        p = f"visual_transformer_blocks.{i}"
        lin(f"{p}.visual_modulation.out_layer", 9 * D, ARCH.time_dim)
        attn(f"{p}.self_attention")
        attn(f"{p}.cross_attention")
        ff(f"{p}.feed_forward")
    lin("out_layer.modulation.out_layer", 2 * D, ARCH.time_dim)
    lin("out_layer.out_layer", int(np.prod(ARCH.patch_size)) * ARCH.out_visual_dim, D)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    b = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.linear(x, _t(w[f"{key}.weight"]), b)


def _freqs(dim):
    return torch.exp(-math.log(10000.0) * torch.arange(dim, dtype=torch.float64) / dim).float()


def _ln(x):
    return F.layer_norm(x.float(), (x.shape[-1],), eps=1e-5)


def _attn_t(w, key, x, ctx=None, rope=None):
    ctx = x if ctx is None else ctx
    b, s = x.shape[:2]
    sk = ctx.shape[1]
    q = _lin(w, f"{key}.to_query", x).view(b, s, HEADS, HD)
    k = _lin(w, f"{key}.to_key", ctx).view(b, sk, HEADS, HD)
    v = _lin(w, f"{key}.to_value", ctx).view(b, sk, HEADS, HD)

    def rms(g, a):
        y = a.float() * torch.rsqrt(a.float().pow(2).mean(-1, keepdim=True) + 1e-6)
        return y * _t(g)

    q = rms(w[f"{key}.query_norm.weight"], q)
    k = rms(w[f"{key}.key_norm.weight"], k)
    if rope is not None:
        cos, sin = rope  # (S, HD/2)
        def rot(a):
            a0, a1 = a[..., 0::2], a[..., 1::2]
            c = cos[None, :, None, :]
            s_ = sin[None, :, None, :]
            return torch.stack([c * a0 - s_ * a1, s_ * a0 + c * a1], dim=-1).flatten(-2)
        q, k = rot(q), rot(k)
    out = F.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
    ).transpose(1, 2).reshape(b, s, D)
    return _lin(w, f"{key}.out_layer", out)


def _oracle(w, latents, text, pooled, timesteps):
    b, t, h, wd, c = latents.shape
    pt, ph, pw = ARCH.patch_size

    # time embedding
    args = torch.outer(_t(timesteps), _freqs(D // 2))
    sinus = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    temb = _lin(w, "time_embeddings.out_layer",
                F.silu(_lin(w, "time_embeddings.in_layer", sinus)))
    pooled_e = F.layer_norm(_lin(w, "pooled_text_embeddings.in_layer", _t(pooled)),
                            (ARCH.time_dim,), _t(w["pooled_text_embeddings.norm.weight"]),
                            _t(w["pooled_text_embeddings.norm.bias"]), eps=1e-5)
    text_time = temb + pooled_e
    visual_time = text_time

    text_e = F.layer_norm(_lin(w, "text_embeddings.in_layer", _t(text)),
                          (D,), _t(w["text_embeddings.norm.weight"]),
                          _t(w["text_embeddings.norm.bias"]), eps=1e-5)

    # patchify [pt, ph, pw, c]
    x = _t(latents).view(b, t // pt, pt, h // ph, ph, wd // pw, pw, c)
    x = x.permute(0, 1, 3, 5, 2, 4, 6, 7).flatten(4, 7)
    visual = _lin(w, "visual_embeddings.in_layer", x)
    tl, hl, wl = visual.shape[1:4]
    visual = visual.reshape(b, tl * hl * wl, D)

    # ropes
    txt_args = torch.outer(torch.arange(text_e.shape[1]).float(), _freqs(HD // 2))
    txt_rope = (txt_args.cos(), txt_args.sin())
    sc = ARCH.rope_scale
    ta = torch.outer(torch.arange(tl).float(), _freqs(ARCH.axes_dims[0] // 2)) / sc[0]
    ha = torch.outer(torch.arange(hl).float(), _freqs(ARCH.axes_dims[1] // 2)) / sc[1]
    wa = torch.outer(torch.arange(wl).float(), _freqs(ARCH.axes_dims[2] // 2)) / sc[2]
    full = torch.cat([
        ta.view(tl, 1, 1, -1).expand(tl, hl, wl, -1),
        ha.view(1, hl, 1, -1).expand(tl, hl, wl, -1),
        wa.view(1, 1, wl, -1).expand(tl, hl, wl, -1),
    ], dim=-1).reshape(tl * hl * wl, -1)
    vis_rope = (full.cos(), full.sin())

    def modulate(a, shift, scale):
        return _ln(a) * (scale.float() + 1.0) + shift.float()

    for i in range(ARCH.num_text_blocks):
        p = f"text_transformer_blocks.{i}"
        mods = _lin(w, f"{p}.text_modulation.out_layer", F.silu(text_time))
        ap, fp = mods.chunk(2, dim=-1)
        sh, sc_, g = ap.chunk(3, dim=-1)
        out = _attn_t(w, f"{p}.self_attention", modulate(text_e, sh[:, None], sc_[:, None]), rope=txt_rope)
        text_e = text_e.float() + g[:, None].float() * out.float()
        sh, sc_, g = fp.chunk(3, dim=-1)
        out = _lin(w, f"{p}.feed_forward.out_layer",
                   F.gelu(_lin(w, f"{p}.feed_forward.in_layer", modulate(text_e, sh[:, None], sc_[:, None]))))
        text_e = text_e.float() + g[:, None].float() * out.float()

    for i in range(ARCH.num_visual_blocks):
        p = f"visual_transformer_blocks.{i}"
        mods = _lin(w, f"{p}.visual_modulation.out_layer", F.silu(visual_time))
        sp, cp, fp = mods.chunk(3, dim=-1)
        sh, sc_, g = sp.chunk(3, dim=-1)
        out = _attn_t(w, f"{p}.self_attention", modulate(visual, sh[:, None], sc_[:, None]), rope=vis_rope)
        visual = visual.float() + g[:, None].float() * out.float()
        sh, sc_, g = cp.chunk(3, dim=-1)
        out = _attn_t(w, f"{p}.cross_attention", modulate(visual, sh[:, None], sc_[:, None]), ctx=text_e)
        visual = visual.float() + g[:, None].float() * out.float()
        sh, sc_, g = fp.chunk(3, dim=-1)
        out = _lin(w, f"{p}.feed_forward.out_layer",
                   F.gelu(_lin(w, f"{p}.feed_forward.in_layer", modulate(visual, sh[:, None], sc_[:, None]))))
        visual = visual.float() + g[:, None].float() * out.float()

    mods = _lin(w, "out_layer.modulation.out_layer", F.silu(visual_time))
    sh, sc_ = mods.chunk(2, dim=-1)
    visual = modulate(visual, sh[:, None], sc_[:, None])
    out = _lin(w, "out_layer.out_layer", visual)
    out = out.reshape(b, tl, hl, wl, -1)
    out = out.view(b, tl, hl, wl, ARCH.out_visual_dim, pt, ph, pw)
    out = out.permute(0, 1, 5, 2, 6, 3, 7, 4)
    return out.reshape(b, tl * pt, hl * ph, wl * pw, ARCH.out_visual_dim).numpy()


def test_kandinsky5_import_matches_oracle():
    w = _fixture(np.random.default_rng(701))
    params = kandinsky5_params_from_checkpoint(w, ARCH)
    module = Kandinsky5Transformer(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(702)
    latents = rng.normal(0, 1, (2, 2, 8, 8, ARCH.in_visual_dim)).astype(np.float32)
    text = rng.normal(0, 1, (2, 6, ARCH.in_text_dim)).astype(np.float32)
    pooled = rng.normal(0, 1, (2, ARCH.in_text_dim2)).astype(np.float32)
    timesteps = rng.uniform(50, 950, (2,)).astype(np.float32)

    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        text_embeds=jnp.asarray(text),
        pooled_embeds=jnp.asarray(pooled),
        timesteps=jnp.asarray(timesteps),
    )
    ref = _oracle(w, latents, text, pooled, timesteps)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=4e-4, atol=4e-4)


def test_kandinsky5_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.kandinsky5.model import Kandinsky5Image, Kandinsky5Video
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("kandinsky5_video") is Kandinsky5Video
    assert ModelRegistry.get("kandinsky5_image") is Kandinsky5Image

    w = _fixture(np.random.default_rng(703))
    path = tmp_path / "k5.safetensors"
    save_file(w, str(path))

    for family, cls in (("kandinsky5_video", Kandinsky5Video), ("kandinsky5_image", Kandinsky5Image)):
        model = cls(
            TrainingConfig(
                {"model_family": family, "model_type": "lora", "lora_rank": 0,
                 "model_arch_preset": "tiny"}
            )
        )
        variables = load_transformer_params(model, str(path))
        batch = model.example_batch(batch_size=1)
        prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
        pred = model.model_predict(variables, prepared)
        assert pred.shape == batch["latents"].shape
        assert np.isfinite(np.asarray(pred)).all()
