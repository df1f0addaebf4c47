"""ACE-Step weight import validated against a torch oracle of the reference
math (vendored ACEStepTransformer2DModel; reference helpers/models/ace_step):
conv PatchEmbed + GroupNorm, Lite-LA relu linear self-attention, sdpa
cross-attention with Qwen2 RoPE (theta 1e6, full-dim cos/sin, rotate-half),
GLUMBConv FFN, adaLN-single with per-block scale_shift_table, conformer lyric
encoder (ESPnet rel-pos attention), speaker/genre conditioning, and the
T2IFinalLayer."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.ace_step.transformer import ACEStepConfig, ACEStepTransformer
from simpletuner_tpu.models.weight_import import acestep_params_from_diffusers

pytestmark = pytest.mark.slow

ARCH = ACEStepConfig.tiny()
D = ARCH.inner_dim


def _fixture(rng):
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.05, (out_f,)).astype(np.float32)

    c_in = ARCH.in_channels
    mid = c_in * ARCH.patch_mult
    w["proj_in.early_conv_layers.0.weight"] = rng.normal(
        0, 0.05, (mid, c_in, ARCH.latent_height, 1)
    ).astype(np.float32)
    w["proj_in.early_conv_layers.0.bias"] = rng.normal(0, 0.05, (mid,)).astype(np.float32)
    w["proj_in.early_conv_layers.1.weight"] = rng.normal(1, 0.05, (mid,)).astype(np.float32)
    w["proj_in.early_conv_layers.1.bias"] = rng.normal(0, 0.05, (mid,)).astype(np.float32)
    w["proj_in.early_conv_layers.2.weight"] = rng.normal(0, 0.05, (D, mid, 1, 1)).astype(np.float32)
    w["proj_in.early_conv_layers.2.bias"] = rng.normal(0, 0.05, (D,)).astype(np.float32)

    lin("timestep_embedder.linear_1", D, 256)
    lin("timestep_embedder.linear_2", D, D)
    lin("t_block.1", 6 * D, D)
    lin("speaker_embedder", D, ARCH.speaker_dim)
    lin("genre_embedder", D, ARCH.text_dim)
    lin("lyric_proj", D, ARCH.lyric_hidden)
    w["lyric_embs.weight"] = rng.normal(0, 0.05, (ARCH.lyric_vocab, ARCH.lyric_hidden)).astype(np.float32)
    lh = ARCH.lyric_hidden
    lin("lyric_encoder.embed.out.0", lh, lh)
    w["lyric_encoder.embed.out.1.weight"] = rng.normal(1, 0.05, (lh,)).astype(np.float32)
    w["lyric_encoder.embed.out.1.bias"] = rng.normal(0, 0.05, (lh,)).astype(np.float32)
    w["lyric_encoder.after_norm.weight"] = rng.normal(1, 0.05, (lh,)).astype(np.float32)
    w["lyric_encoder.after_norm.bias"] = rng.normal(0, 0.05, (lh,)).astype(np.float32)
    dk = lh // ARCH.lyric_heads
    for i in range(ARCH.lyric_depth):
        src = f"lyric_encoder.encoders.{i}"
        for n in ("linear_q", "linear_k", "linear_v", "linear_out"):
            lin(f"{src}.self_attn.{n}", lh, lh)
        lin(f"{src}.self_attn.linear_pos", lh, lh, bias=False)
        w[f"{src}.self_attn.pos_bias_u"] = rng.normal(0, 0.05, (ARCH.lyric_heads, dk)).astype(np.float32)
        w[f"{src}.self_attn.pos_bias_v"] = rng.normal(0, 0.05, (ARCH.lyric_heads, dk)).astype(np.float32)
        for n in ("norm_mha", "norm_ff"):
            w[f"{src}.{n}.weight"] = rng.normal(1, 0.05, (lh,)).astype(np.float32)
            w[f"{src}.{n}.bias"] = rng.normal(0, 0.05, (lh,)).astype(np.float32)
        lin(f"{src}.feed_forward.w_1", ARCH.lyric_ffn, lh)
        lin(f"{src}.feed_forward.w_2", lh, ARCH.lyric_ffn)

    hidden = int(D * ARCH.mlp_ratio)
    for i in range(ARCH.num_layers):
        src = f"transformer_blocks.{i}"
        w[f"{src}.scale_shift_table"] = rng.normal(0, 0.2, (6, D)).astype(np.float32)
        for p in ("attn", "cross_attn"):
            for n in ("to_q", "to_k", "to_v"):
                lin(f"{src}.{p}.{n}", D, D)
            lin(f"{src}.{p}.to_out.0", D, D)
        w[f"{src}.ff.inverted_conv.conv.weight"] = rng.normal(0, 0.05, (2 * hidden, D, 1)).astype(np.float32)
        w[f"{src}.ff.inverted_conv.conv.bias"] = rng.normal(0, 0.05, (2 * hidden,)).astype(np.float32)
        w[f"{src}.ff.depth_conv.conv.weight"] = rng.normal(0, 0.05, (2 * hidden, 1, 3)).astype(np.float32)
        w[f"{src}.ff.depth_conv.conv.bias"] = rng.normal(0, 0.05, (2 * hidden,)).astype(np.float32)
        w[f"{src}.ff.point_conv.conv.weight"] = rng.normal(0, 0.05, (D, hidden, 1)).astype(np.float32)

    lin("final_layer.linear", ARCH.latent_height * ARCH.in_channels, D)
    w["final_layer.scale_shift_table"] = rng.normal(0, 0.2, (2, D)).astype(np.float32)
    proj_dim = 2 * D
    for head, ssl_dim in enumerate(ARCH.ssl_dims):
        lin(f"projectors.{head}.0", proj_dim, D)
        lin(f"projectors.{head}.2", proj_dim, proj_dim)
        lin(f"projectors.{head}.4", ssl_dim, proj_dim)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _torchify(w):
    """numpy weight dict -> torch tensor dict (the oracle consumes tensors so a
    trainable ParameterDict view can drive the same forward; see
    test_acestep_loss_curve_parity.py)."""
    return {k: _t(v) for k, v in w.items()}


def _lin(w, name, x):
    bias = w[f"{name}.bias"] if f"{name}.bias" in w else None
    return F.linear(x, w[f"{name}.weight"], bias)


def _qwen_rope(seq_len, dim, theta):
    inv = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    freqs = np.outer(np.arange(seq_len, dtype=np.float64), inv)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return _t(np.cos(emb)), _t(np.sin(emb))


def _apply_rope(x, cos, sin):
    # x (B, H, S, Dh)
    c = cos[None, None]
    s = sin[None, None]
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    rotated = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return x.float() * c + rotated.float() * s


def _lite_la(q, k, v, heads):
    # reference CustomLiteLAProcessor2_0 (q/k/v: (B, S, D_total))
    b, s, dt = q.shape
    hd = dt // heads
    q = q.transpose(-1, -2).reshape(b, heads, hd, -1)
    k = k.transpose(-1, -2).reshape(b, heads, hd, -1).transpose(-1, -2)
    v = v.transpose(-1, -2).reshape(b, heads, hd, -1)
    q = F.relu(q)
    k = F.relu(k)
    q, k, v = q.float(), k.float(), v.float()
    v = F.pad(v, (0, 0, 0, 1), mode="constant", value=1.0)
    vk = torch.matmul(v, k)
    hs = torch.matmul(vk, q)
    hs = hs[:, :, :-1] / (hs[:, :, -1:] + 1e-15)
    return hs.view(b, heads * hd, -1).permute(0, 2, 1)


def _oracle(w, latents, sigmas, text, speaker, lyric_tokens, lyric_mask):
    b = latents.shape[0]
    heads = ARCH.num_heads

    # ---- encode ----------------------------------------------------------------------
    spk = _lin(w, "speaker_embedder", _t(speaker)).unsqueeze(1)
    genre = _lin(w, "genre_embedder", _t(text))
    # lyric conformer
    lh = ARCH.lyric_hidden
    emb = w["lyric_embs.weight"][torch.from_numpy(lyric_tokens)]
    x = _lin(w, "lyric_encoder.embed.out.0", emb)
    x = F.layer_norm(x, (lh,), w["lyric_encoder.embed.out.1.weight"],
                     w["lyric_encoder.embed.out.1.bias"], eps=1e-5)
    x = x * math.sqrt(lh)
    T = x.shape[1]
    position = np.arange(T, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, lh, 2, dtype=np.float64) * -(math.log(10000.0) / lh))
    pos = np.zeros((T, lh)); neg = np.zeros((T, lh))
    pos[:, 0::2] = np.sin(position * div); pos[:, 1::2] = np.cos(position * div)
    neg[:, 0::2] = np.sin(-position * div); neg[:, 1::2] = np.cos(-position * div)
    pos_emb = _t(np.concatenate([pos[::-1], neg[1:]], axis=0))[None]
    mask = torch.from_numpy(lyric_mask).bool()[:, None]  # (B, 1, T)
    n_h = ARCH.lyric_heads
    dk = lh // n_h
    for i in range(ARCH.lyric_depth):
        src = f"lyric_encoder.encoders.{i}"
        res = x
        h = F.layer_norm(x, (lh,), w[f"{src}.norm_mha.weight"], w[f"{src}.norm_mha.bias"], eps=1e-5)
        q = _lin(w, f"{src}.self_attn.linear_q", h).view(b, -1, n_h, dk)
        k = _lin(w, f"{src}.self_attn.linear_k", h).view(b, -1, n_h, dk).transpose(1, 2)
        v = _lin(w, f"{src}.self_attn.linear_v", h).view(b, -1, n_h, dk).transpose(1, 2)
        p = _lin(w, f"{src}.self_attn.linear_pos", pos_emb).view(1, -1, n_h, dk).transpose(1, 2)
        u = w[f"{src}.self_attn.pos_bias_u"]
        vb = w[f"{src}.self_attn.pos_bias_v"]
        q_u = (q + u).transpose(1, 2)
        q_v = (q + vb).transpose(1, 2)
        ac = torch.matmul(q_u, k.transpose(-2, -1))
        bd = torch.matmul(q_v, p.transpose(-2, -1))
        zero_pad = torch.zeros((*bd.shape[:3], 1))
        bd_p = torch.cat([zero_pad, bd], dim=-1)
        bd_p = bd_p.view(*bd.shape[:2], bd.shape[3] + 1, bd.shape[2])
        bd = bd_p[:, :, 1:].view_as(bd)[:, :, :, : bd.shape[-1] // 2 + 1]
        scores = (ac + bd) / math.sqrt(dk)
        m = mask.unsqueeze(1).eq(0)
        scores = scores.masked_fill(m, -float("inf"))
        attn = torch.softmax(scores, dim=-1).masked_fill(m, 0.0)
        out = torch.matmul(attn, v).transpose(1, 2).reshape(b, -1, lh)
        x = res + _lin(w, f"{src}.self_attn.linear_out", out)
        res = x
        h = F.layer_norm(x, (lh,), w[f"{src}.norm_ff.weight"], w[f"{src}.norm_ff.bias"], eps=1e-5)
        x = res + _lin(w, f"{src}.feed_forward.w_2", F.silu(_lin(w, f"{src}.feed_forward.w_1", h)))
    x = F.layer_norm(x, (lh,), w["lyric_encoder.after_norm.weight"], w["lyric_encoder.after_norm.bias"], eps=1e-5)
    lyric = _lin(w, "lyric_proj", x)

    context = torch.cat([spk, genre, lyric], dim=1)
    context_mask = torch.cat(
        [torch.ones(b, 1), torch.ones(b, text.shape[1]), torch.from_numpy(lyric_mask).float()], dim=1
    )

    # ---- decode ----------------------------------------------------------------------
    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = (sigmas * 1000.0)[:, None].astype(np.float64) * freqs[None]
    tp = _t(np.concatenate([np.cos(args), np.sin(args)], -1))
    embedded_t = _lin(w, "timestep_embedder.linear_2", F.silu(_lin(w, "timestep_embedder.linear_1", tp)))
    temb = _lin(w, "t_block.1", F.silu(embedded_t))

    lat = torch.from_numpy(latents).permute(0, 3, 1, 2)  # NHWC → NCHW
    h = F.conv2d(lat, w["proj_in.early_conv_layers.0.weight"],
                 w["proj_in.early_conv_layers.0.bias"],
                 stride=(ARCH.latent_height, 1))
    h = F.group_norm(h, min(32, h.shape[1]), w["proj_in.early_conv_layers.1.weight"],
                     w["proj_in.early_conv_layers.1.bias"], eps=1e-6)
    h = F.conv2d(h, w["proj_in.early_conv_layers.2.weight"], w["proj_in.early_conv_layers.2.bias"])
    x = h.flatten(2).transpose(1, 2)  # (B, T, D)
    seq = x.shape[1]

    cos_s, sin_s = _qwen_rope(seq, ARCH.head_dim, ARCH.rope_theta)
    cos_c, sin_c = _qwen_rope(context.shape[1], ARCH.head_dim, ARCH.rope_theta)

    def rms6(t, eps=1e-6):
        return t * torch.rsqrt(t.float().pow(2).mean(-1, keepdim=True) + eps)

    hidden = int(D * ARCH.mlp_ratio)
    for i in range(ARCH.num_layers):
        src = f"transformer_blocks.{i}"
        table = w[f"{src}.scale_shift_table"]
        mods = (table[None] + temb.reshape(b, 6, -1)).chunk(6, dim=1)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = mods

        x_n = rms6(x) * (1 + sc_msa) + sh_msa
        q = _lin(w, f"{src}.attn.to_q", x_n)
        k = _lin(w, f"{src}.attn.to_k", x_n)
        v = _lin(w, f"{src}.attn.to_v", x_n)
        # rope applied in (B, H, S, Dh) layout inside the LiteLA processor
        hd = ARCH.head_dim
        q_h = q.view(b, -1, heads, hd).transpose(1, 2)
        k_h = k.view(b, -1, heads, hd).transpose(1, 2)
        q_h = _apply_rope(q_h, cos_s, sin_s)
        k_h = _apply_rope(k_h, cos_s, sin_s)
        q = q_h.transpose(1, 2).reshape(b, -1, D)
        k = k_h.transpose(1, 2).reshape(b, -1, D)
        attn = _lite_la(q, k, v, heads)
        x = x + g_msa * _lin(w, f"{src}.attn.to_out.0", attn)

        qc = _lin(w, f"{src}.cross_attn.to_q", x).view(b, -1, heads, hd).transpose(1, 2)
        kc = _lin(w, f"{src}.cross_attn.to_k", context).view(b, -1, heads, hd).transpose(1, 2)
        vc = _lin(w, f"{src}.cross_attn.to_v", context).view(b, -1, heads, hd).transpose(1, 2)
        qc = _apply_rope(qc, cos_s, sin_s)
        kc = _apply_rope(kc, cos_c, sin_c)
        qm = torch.ones(b, seq)
        combined = qm[:, :, None] * context_mask[:, None, :]
        am = torch.where(combined == 1, torch.tensor(0.0), torch.tensor(-float("inf")))
        cross = F.scaled_dot_product_attention(qc, kc, vc, attn_mask=am[:, None])
        cross = cross.transpose(1, 2).reshape(b, -1, D)
        x = x + _lin(w, f"{src}.cross_attn.to_out.0", cross)

        x_f = (rms6(x) * (1 + sc_mlp) + sh_mlp).transpose(1, 2)  # (B, D, S)
        h = F.conv1d(x_f, w[f"{src}.ff.inverted_conv.conv.weight"], w[f"{src}.ff.inverted_conv.conv.bias"])
        h = F.silu(h)
        h = F.conv1d(h, w[f"{src}.ff.depth_conv.conv.weight"], w[f"{src}.ff.depth_conv.conv.bias"],
                     padding=1, groups=2 * hidden)
        value, gate = h.chunk(2, dim=1)
        h = value * F.silu(gate)
        h = F.conv1d(h, w[f"{src}.ff.point_conv.conv.weight"])
        x = x + g_mlp * h.transpose(1, 2)

    table = w["final_layer.scale_shift_table"]
    shift, scale = (table[None] + embedded_t[:, None]).chunk(2, dim=1)
    x = rms6(x) * (1 + scale) + shift
    out = _lin(w, "final_layer.linear", x)  # (B, T, 16*C)
    out = out.view(b, seq, ARCH.latent_height, ARCH.in_channels).permute(0, 2, 1, 3)
    return out


def test_acestep_import_matches_oracle():
    w = _fixture(np.random.default_rng(111))
    params = acestep_params_from_diffusers(w, ARCH)

    module = ACEStepTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(31)
    latents = rng.normal(0, 1, (2, ARCH.latent_height, 12, ARCH.in_channels)).astype(np.float32)
    text = rng.normal(0, 1, (2, 5, ARCH.text_dim)).astype(np.float32)
    speaker = rng.normal(0, 1, (2, ARCH.speaker_dim)).astype(np.float32)
    lyric_tokens = rng.integers(0, ARCH.lyric_vocab, (2, 7))
    lyric_mask = np.asarray([[1] * 7, [1] * 4 + [0] * 3], np.float32)
    sigmas = np.asarray([0.25, 0.8], np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(sigmas),
        text_embeds=jnp.asarray(text),
        speaker_embeds=jnp.asarray(speaker),
        lyric_tokens=jnp.asarray(lyric_tokens, dtype=jnp.int32),
        lyric_mask=jnp.asarray(lyric_mask),
    )
    ref = _oracle(_torchify(w), latents, sigmas, text, speaker, lyric_tokens, lyric_mask).detach().numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=7e-4, atol=7e-4)


def test_acestep_family_end_to_end(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.ace_step.model import ACEStep
    from simpletuner_tpu.models.registry import ModelRegistry
    from simpletuner_tpu.models.weight_import import load_transformer_params

    assert ModelRegistry.get("ace_step") is ACEStep
    w = _fixture(np.random.default_rng(113))
    path = tmp_path / "ace.safetensors"
    save_file(w, str(path))
    model = ACEStep(
        TrainingConfig(
            {"model_family": "ace_step", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny"}
        )
    )
    variables = load_transformer_params(model, str(path))
    batch = model.example_batch(batch_size=1)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
