"""PixArt weight import: tiny torch-layout fixture -> flax params, with a

numpy oracle of the reference block math (diffusers BasicTransformerBlock
ada_norm_single semantics; reference helpers/models/pixart/transformer.py) so
the import is validated *numerically*, not just by keys/shapes (VERDICT r1
Next #2)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simpletuner_tpu.models.pixart.transformer import (
    PixartConfig,
    PixartTransformer,
    sincos_pos_embed_2d,
)
from simpletuner_tpu.models.weight_import import pixart_params_from_diffusers

pytestmark = pytest.mark.slow

ARCH = PixartConfig(
    in_channels=4, out_channels=8, patch_size=2, hidden_size=64, depth=2,
    num_heads=2, head_dim=32, text_dim=48, base_size=8, interpolation_scale=1,
)

def _torch_fixture(rng):
    """Synthetic diffusers-layout state dict at ARCH dims (torch (out,in))."""
    d = ARCH.hidden_size
    inner = ARCH.num_heads * ARCH.head_dim
    ff = int(d * ARCH.ffn_ratio)
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.02, (out_f,)).astype(np.float32)

    w["pos_embed.proj.weight"] = rng.normal(
        0, 0.02, (d, ARCH.in_channels, ARCH.patch_size, ARCH.patch_size)
    ).astype(np.float32)
    w["pos_embed.proj.bias"] = rng.normal(0, 0.02, (d,)).astype(np.float32)
    lin("caption_projection.linear_1", d, ARCH.text_dim)
    lin("caption_projection.linear_2", d, d)
    lin("adaln_single.emb.timestep_embedder.linear_1", d, 256)
    lin("adaln_single.emb.timestep_embedder.linear_2", d, d)
    lin("adaln_single.linear", 6 * d, d)
    w["scale_shift_table"] = rng.normal(0, 0.1, (2, d)).astype(np.float32)
    lin("proj_out", ARCH.patch_size ** 2 * ARCH.out_channels, d)
    for i in range(ARCH.depth):
        src = f"transformer_blocks.{i}"
        w[f"{src}.scale_shift_table"] = rng.normal(0, 0.1, (6, d)).astype(np.float32)
        for attn in ("attn1", "attn2"):
            in_f = d
            lin(f"{src}.{attn}.to_q", inner, d)
            lin(f"{src}.{attn}.to_k", inner, d)
            lin(f"{src}.{attn}.to_v", inner, d)
            lin(f"{src}.{attn}.to_out.0", d, inner)
        lin(f"{src}.ff.net.0.proj", ff, d)
        lin(f"{src}.ff.net.2", d, ff)
    return w

def _t_linear(w, name, x):
    return x @ w[f"{name}.weight"].T + w[f"{name}.bias"]

def _silu(x):
    return x / (1.0 + np.exp(-x))

def _gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))

def _ln(x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps)

def _attention(q, k, v, heads):
    b, s, inner = q.shape
    d = inner // heads
    t = k.shape[1]
    q = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    out = p @ v
    return out.transpose(0, 2, 1, 3).reshape(b, s, inner)

def _oracle(w, latents, timesteps, context):
    """Reference PixArt forward in numpy (float32)."""
    d = ARCH.hidden_size
    p = ARCH.patch_size
    b, h, wdt, c = latents.shape
    hh, ww = h // p, wdt // p
    patches = latents.reshape(b, hh, p, ww, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = np.einsum("bHWijc,dcij->bHWd", patches, w["pos_embed.proj.weight"])
    x = (x + w["pos_embed.proj.bias"]).reshape(b, hh * ww, d)
    x = x + sincos_pos_embed_2d(d, hh, ww, ARCH.base_size, ARCH.interpolation_scale)[None]

    txt = _t_linear(w, "caption_projection.linear_2",
                    _gelu_tanh(_t_linear(w, "caption_projection.linear_1", context)))

    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = timesteps[:, None].astype(np.float64) * freqs[None]
    t_proj = np.concatenate([np.cos(args), np.sin(args)], axis=-1).astype(np.float32)
    t_emb = _t_linear(w, "adaln_single.emb.timestep_embedder.linear_2",
                      _silu(_t_linear(w, "adaln_single.emb.timestep_embedder.linear_1", t_proj)))
    t6 = _t_linear(w, "adaln_single.linear", _silu(t_emb)).reshape(b, 6, d)

    for i in range(ARCH.depth):
        src = f"transformer_blocks.{i}"
        mods = w[f"{src}.scale_shift_table"][None] + t6  # (b, 6, d)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [mods[:, j][:, None, :] for j in range(6)]
        xn = _ln(x) * (1 + sc_msa) + sh_msa
        attn = _attention(
            _t_linear(w, f"{src}.attn1.to_q", xn),
            _t_linear(w, f"{src}.attn1.to_k", xn),
            _t_linear(w, f"{src}.attn1.to_v", xn),
            ARCH.num_heads,
        )
        x = x + g_msa * _t_linear(w, f"{src}.attn1.to_out.0", attn)
        attn = _attention(
            _t_linear(w, f"{src}.attn2.to_q", x),
            _t_linear(w, f"{src}.attn2.to_k", txt),
            _t_linear(w, f"{src}.attn2.to_v", txt),
            ARCH.num_heads,
        )
        x = x + _t_linear(w, f"{src}.attn2.to_out.0", attn)
        xn = _ln(x) * (1 + sc_mlp) + sh_mlp
        x = x + g_mlp * _t_linear(w, f"{src}.ff.net.2",
                                  _gelu_tanh(_t_linear(w, f"{src}.ff.net.0.proj", xn)))

    final = w["scale_shift_table"][None] + t_emb[:, None, :]
    shift, scale = final[:, 0][:, None, :], final[:, 1][:, None, :]
    x = _ln(x) * (1 + scale) + shift
    x = _t_linear(w, "proj_out", x)
    x = x.reshape(b, hh, ww, p, p, ARCH.out_channels).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, h, wdt, ARCH.out_channels)
    return x[..., : ARCH.in_channels]

@pytest.fixture(scope="module")
def fixture_weights():
    return _torch_fixture(np.random.default_rng(7))

def test_pixart_import_matches_oracle(fixture_weights):
    w = fixture_weights
    params = pixart_params_from_diffusers(w, ARCH)

    module = PixartTransformer(config=ARCH, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    latents = rng.normal(0, 1, (2, 16, 16, ARCH.in_channels)).astype(np.float32)
    timesteps = np.asarray([7.0, 420.0], np.float32)
    context = rng.normal(0, 1, (2, 12, ARCH.text_dim)).astype(np.float32)

    out = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        latents=jnp.asarray(latents),
        timesteps=jnp.asarray(timesteps),
        context=jnp.asarray(context),
    )
    ref = _oracle(w, latents, timesteps, context)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

def test_pixart_import_keys_match_template(fixture_weights, tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.pixart.model import PixartSigma
    from simpletuner_tpu.models.weight_import import load_transformer_params

    path = tmp_path / "pixart.safetensors"
    save_file(fixture_weights, str(path))
    model = PixartSigma(
        TrainingConfig({"model_family": "pixart_sigma", "model_type": "lora", "lora_rank": 0}),
        arch=ARCH,
    )
    variables = load_transformer_params(model, str(path))
    assert "params" in variables
    out = model.module.apply(
        variables,
        **model.get_model_inputs(
            {
                "noisy_latents": jnp.zeros((1, 16, 16, ARCH.in_channels)),
                "timesteps": jnp.asarray([3.0]),
                "text_embeds": jnp.zeros((1, 8, ARCH.text_dim)),
            }
        ),
    )
    assert bool(jnp.all(jnp.isfinite(out)))