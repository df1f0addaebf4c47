"""LTX-2 text connector import validated against a torch oracle of the
reference math (LTX2TextConnectors; reference helpers/models/ltxvideo2/
connectors.py): per-layer masked mean/range normalization, learnable-register
padding replacement, 1-D fractional RoPE, affine-free RMS blocks."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.models.ltxvideo2.connectors import (
    LTX2ConnectorConfig,
    LTX2TextConnectors,
    load_ltx2_connectors,
)

pytestmark = pytest.mark.slow

CFG = LTX2ConnectorConfig.tiny()
DIM = CFG.inner_dim


def _fixture(rng):
    w = {}

    def lin(key, out_c, in_c, bias=True):
        w[f"{key}.weight"] = rng.normal(0, 0.05, (out_c, in_c)).astype(np.float32)
        if bias:
            w[f"{key}.bias"] = rng.normal(0, 0.05, (out_c,)).astype(np.float32)

    lin("text_proj_in", CFG.caption_channels, CFG.caption_channels * CFG.text_proj_in_factor, bias=False)
    for prefix in ("video_connector", "audio_connector"):
        w[f"{prefix}.learnable_registers"] = rng.normal(0, 0.3, (CFG.num_registers, DIM)).astype(np.float32)
        for i in range(CFG.num_layers):
            src = f"{prefix}.transformer_blocks.{i}"
            for n in ("to_q", "to_k", "to_v"):
                lin(f"{src}.attn1.{n}", DIM, DIM)
            w[f"{src}.attn1.norm_q.weight"] = rng.normal(1, 0.05, (DIM,)).astype(np.float32)
            w[f"{src}.attn1.norm_k.weight"] = rng.normal(1, 0.05, (DIM,)).astype(np.float32)
            lin(f"{src}.attn1.to_out.0", DIM, DIM)
            lin(f"{src}.ff.net.0.proj", 4 * DIM, DIM)
            lin(f"{src}.ff.net.2", DIM, 4 * DIM)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(w, key, x):
    bias = _t(w[f"{key}.bias"]) if f"{key}.bias" in w else None
    return F.linear(x, _t(w[f"{key}.weight"]), bias)


def _rms(x, g=None, eps=1e-6):
    y = x * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps)
    return y * _t(g) if g is not None else y


def _rope1d(seq):
    grid = np.arange(seq, dtype=np.float32) / CFG.rope_base_seq_len
    n_freq = DIM // 2
    pow_indices = CFG.rope_theta ** np.linspace(0.0, 1.0, n_freq, dtype=np.float64)
    freqs = pow_indices * math.pi / 2.0
    ang = (grid[:, None] * 2 - 1) * freqs[None]
    cos = np.repeat(np.cos(ang), 2, axis=-1)
    sin = np.repeat(np.sin(ang), 2, axis=-1)
    return _t(cos), _t(sin)


def _apply_rope(x, rope):
    cos, sin = rope
    x0, x1 = x.unflatten(-1, (-1, 2)).unbind(-1)
    rotated = torch.stack([-x1, x0], dim=-1).flatten(2)
    return x.float() * cos[None] + rotated.float() * sin[None]


def _connector(w, prefix, x, mask):
    b, seq, _ = x.shape
    registers = _t(w[f"{prefix}.learnable_registers"])
    tiled = registers.repeat(seq // CFG.num_registers, 1)
    # reference: gather non-padded tokens to the front, registers fill the rest
    rows = []
    for i in range(b):
        valid = x[i, mask[i].astype(bool)]
        pad = seq - valid.shape[0]
        rows.append(torch.cat([valid, torch.zeros(pad, x.shape[-1])], dim=0))
    fronted = torch.stack(rows)
    front_mask = torch.from_numpy(
        (np.arange(seq)[None] < mask.sum(axis=1)[:, None]).astype(np.float32)
    )[..., None]
    h = front_mask * fronted + (1 - front_mask) * tiled[None]

    rope = _rope1d(seq)
    heads, hd = CFG.num_heads, CFG.head_dim
    for i in range(CFG.num_layers):
        src = f"{prefix}.transformer_blocks.{i}"
        h_n = _rms(h)
        q = _rms(_lin(w, f"{src}.attn1.to_q", h_n), w[f"{src}.attn1.norm_q.weight"])
        k = _rms(_lin(w, f"{src}.attn1.to_k", h_n), w[f"{src}.attn1.norm_k.weight"])
        v = _lin(w, f"{src}.attn1.to_v", h_n)
        q = _apply_rope(q, rope).view(b, seq, heads, hd).transpose(1, 2)
        k = _apply_rope(k, rope).view(b, seq, heads, hd).transpose(1, 2)
        v = v.view(b, seq, heads, hd).transpose(1, 2)
        attn = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, seq, DIM)
        h = h + _lin(w, f"{src}.attn1.to_out.0", attn)
        h_n = _rms(h)
        h = h + _lin(w, f"{src}.ff.net.2", F.gelu(_lin(w, f"{src}.ff.net.0.proj", h_n), approximate="tanh"))
    return _rms(h)


def _oracle(w, text, mask):
    b, seq, _ = text.shape
    stacked = _t(text).unflatten(2, (CFG.caption_channels, -1))
    m = torch.from_numpy(mask.astype(bool))[:, :, None, None]
    h = stacked.float()
    lengths = torch.from_numpy(mask.sum(axis=1).astype(np.float32))
    valid = (lengths * CFG.caption_channels).view(b, 1, 1, 1)
    masked = h.masked_fill(~m, 0.0)
    mean = masked.sum(dim=(1, 2), keepdim=True) / (valid + 1e-6)
    x_min = h.masked_fill(~m, float("inf")).amin(dim=(1, 2), keepdim=True)
    x_max = h.masked_fill(~m, float("-inf")).amax(dim=(1, 2), keepdim=True)
    normalized = (h - mean) / (x_max - x_min + 1e-6) * CFG.scale_factor
    normalized = normalized.flatten(2)
    normalized = normalized.masked_fill(~torch.from_numpy(mask.astype(bool))[:, :, None], 0.0)

    proj = _lin(w, "text_proj_in", normalized)
    video = _connector(w, "video_connector", proj, mask)
    audio = _connector(w, "audio_connector", proj, mask)
    return video.numpy(), audio.numpy()


def test_ltx2_connectors_match_oracle(tmp_path):
    from safetensors.numpy import save_file

    w = _fixture(np.random.default_rng(161))
    path = tmp_path / "connectors.safetensors"
    save_file(w, str(path))

    variables = load_ltx2_connectors(CFG, str(path))
    module = LTX2TextConnectors(CFG, dtype=jnp.float32)
    rng = np.random.default_rng(53)
    seq = 2 * CFG.num_registers
    text = rng.normal(0, 1, (2, seq, CFG.caption_channels * CFG.text_proj_in_factor)).astype(np.float32)
    # left-padded masks
    mask = np.zeros((2, seq), np.int64)
    mask[0, 3:] = 1
    mask[1, :] = 1

    video, audio = module.apply(variables, jnp.asarray(text), jnp.asarray(mask))
    ref_v, ref_a = _oracle(w, text, mask)
    np.testing.assert_allclose(np.asarray(video), ref_v, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(audio), ref_a, rtol=5e-4, atol=5e-4)
