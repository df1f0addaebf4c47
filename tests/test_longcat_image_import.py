"""LongCat-Image import validated against a torch oracle of the reference
math (LongCatImageTransformer2DModel; reference
helpers/models/longcat_image/transformer.py): the Flux MMDiT body with
timestep-only modulation (no pooled/guidance embedders), sliding positional
ids (text (0,i,i), image (1,L+y,L+x), edit ref (2,L+y,L+x)), and the edit
flavour's tokenwise t=0 modulation of reference tokens with mean-temb text
modulation."""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.transformer import FluxConfig, FluxTransformer, pack_latents
from simpletuner_tpu.models.longcat_image.model import LongcatImage

pytestmark = pytest.mark.slow

ARCH = dataclasses.replace(FluxConfig.tiny(), vector_embed=False, guidance_embed=False)
D = ARCH.hidden_size
HEADS = ARCH.num_heads
HD = ARCH.head_dim


def _fixture(rng):
    """Diffusers-layout LongCatImageTransformer2DModel weights (bare
    time_embed.timestep_embedder; no text/guidance embedder)."""
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.05, (out_f,)).astype(np.float32)

    def rms(name):
        w[name] = rng.normal(1, 0.05, (HD,)).astype(np.float32)

    lin("x_embedder", D, ARCH.in_channels)
    lin("context_embedder", D, ARCH.txt_in_features)
    lin("time_embed.timestep_embedder.linear_1", D, 256)
    lin("time_embed.timestep_embedder.linear_2", D, D)
    lin("norm_out.linear", 2 * D, D)
    lin("proj_out", ARCH.in_channels, D)
    mlp = int(D * ARCH.mlp_ratio)
    for i in range(ARCH.depth_double):
        p = f"transformer_blocks.{i}"
        lin(f"{p}.norm1.linear", 6 * D, D)
        lin(f"{p}.norm1_context.linear", 6 * D, D)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{p}.attn.{n}", D, D)
        lin(f"{p}.attn.to_out.0", D, D)
        lin(f"{p}.attn.to_add_out", D, D)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            rms(f"{p}.attn.{n}.weight")
        lin(f"{p}.ff.net.0.proj", mlp, D)
        lin(f"{p}.ff.net.2", D, mlp)
        lin(f"{p}.ff_context.net.0.proj", mlp, D)
        lin(f"{p}.ff_context.net.2", D, mlp)
    for i in range(ARCH.depth_single):
        p = f"single_transformer_blocks.{i}"
        lin(f"{p}.norm.linear", 3 * D, D)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{p}.attn.{n}", D, D)
        rms(f"{p}.attn.norm_q.weight")
        rms(f"{p}.attn.norm_k.weight")
        lin(f"{p}.proj_mlp", mlp, D)
        lin(f"{p}.proj_out", D, D + mlp)
    return w


class TorchLongCat(torch.nn.Module):
    """Torch mirror of the LongCat forward (reference transformer.py:380-551):
    timestep-only temb, optionally tokenwise with mean-temb text modulation."""

    def __init__(self, w):
        super().__init__()
        self.w = {k: torch.from_numpy(np.asarray(v)) for k, v in w.items()}

    def lin(self, name, x):
        return F.linear(x, self.w[f"{name}.weight"], self.w[f"{name}.bias"])

    def rms(self, name, x, eps=1e-6):
        g = self.w[f"{name}.weight"]
        x_f = x.float()
        return x_f * torch.rsqrt(x_f.pow(2).mean(-1, keepdim=True) + eps) * g

    @staticmethod
    def sinusoid(values):
        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
        args = values.float()[..., None] * 1000.0 * freqs
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    @staticmethod
    def rope_tables(ids, axes_dim, theta):
        parts_c, parts_s = [], []
        for i, dax in enumerate(axes_dim):
            freqs = 1.0 / theta ** (torch.arange(0, dax, 2, dtype=torch.float64) / dax)
            ang = ids[:, i : i + 1].double() * freqs[None]
            parts_c.append(torch.cos(ang))
            parts_s.append(torch.sin(ang))
        return torch.cat(parts_c, -1).float(), torch.cat(parts_s, -1).float()

    @staticmethod
    def apply_rope(x, cos, sin):
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        x0, x1 = x[..., 0::2], x[..., 1::2]
        return torch.stack([x0 * c - x1 * s, x0 * s + x1 * c], dim=-1).flatten(-2)

    @staticmethod
    def attention(q, k, v):
        b, s, h, d = q.shape
        q, k, v = (a.transpose(1, 2) for a in (q, k, v))
        out = F.scaled_dot_product_attention(q, k, v)
        return out.transpose(1, 2).reshape(b, s, h * d)

    @staticmethod
    def _mod(m):
        return m[:, None, :] if m.ndim == 2 else m

    def forward(self, img_tokens, txt, timesteps, img_ids, txt_ids):
        b = img_tokens.shape[0]
        x = self.lin("x_embedder", img_tokens)
        t = self.lin("context_embedder", txt)
        temb = self.lin("time_embed.timestep_embedder.linear_2",
                        F.silu(self.lin("time_embed.timestep_embedder.linear_1",
                                        self.sinusoid(timesteps))))
        tokenwise = timesteps.ndim == 2
        temb_txt = temb.mean(dim=1) if tokenwise else temb
        txt_len = txt.shape[1]
        temb_single = (
            torch.cat([temb_txt[:, None].expand(-1, txt_len, -1), temb], dim=1)
            if tokenwise else temb
        )

        ids = torch.cat([txt_ids, img_ids], dim=0)
        cos, sin = self.rope_tables(ids, ARCH.axes_dim, ARCH.theta)

        def ln(a):
            return F.layer_norm(a, (D,), eps=1e-6)

        for i in range(ARCH.depth_double):
            p = f"transformer_blocks.{i}"
            im = self.lin(f"{p}.norm1.linear", F.silu(temb))
            tm = self.lin(f"{p}.norm1_context.linear", F.silu(temb_txt))
            i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = (self._mod(c) for c in im.chunk(6, dim=-1))
            t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = (self._mod(c) for c in tm.chunk(6, dim=-1))
            x_n = ln(x) * (1 + i_sc1) + i_sh1
            t_n = ln(t) * (1 + t_sc1) + t_sh1

            def heads(a):
                return a.view(b, -1, HEADS, HD)

            qi = self.rms(f"{p}.attn.norm_q", heads(self.lin(f"{p}.attn.to_q", x_n)))
            ki = self.rms(f"{p}.attn.norm_k", heads(self.lin(f"{p}.attn.to_k", x_n)))
            vi = heads(self.lin(f"{p}.attn.to_v", x_n))
            qt = self.rms(f"{p}.attn.norm_added_q", heads(self.lin(f"{p}.attn.add_q_proj", t_n)))
            kt = self.rms(f"{p}.attn.norm_added_k", heads(self.lin(f"{p}.attn.add_k_proj", t_n)))
            vt = heads(self.lin(f"{p}.attn.add_v_proj", t_n))
            q = self.apply_rope(torch.cat([qt, qi], 1), cos, sin)
            k = self.apply_rope(torch.cat([kt, ki], 1), cos, sin)
            v = torch.cat([vt, vi], 1)
            attn = self.attention(q, k, v)
            a_t, a_i = attn[:, :txt_len], attn[:, txt_len:]
            x = x + i_g1 * self.lin(f"{p}.attn.to_out.0", a_i)
            t = t + t_g1 * self.lin(f"{p}.attn.to_add_out", a_t)
            x_m = ln(x) * (1 + i_sc2) + i_sh2
            x = x + i_g2 * self.lin(
                f"{p}.ff.net.2", F.gelu(self.lin(f"{p}.ff.net.0.proj", x_m), approximate="tanh"))
            t_m = ln(t) * (1 + t_sc2) + t_sh2
            t = t + t_g2 * self.lin(
                f"{p}.ff_context.net.2",
                F.gelu(self.lin(f"{p}.ff_context.net.0.proj", t_m), approximate="tanh"))

        stream = torch.cat([t, x], dim=1)
        for i in range(ARCH.depth_single):
            p = f"single_transformer_blocks.{i}"
            mod = self.lin(f"{p}.norm.linear", F.silu(temb_single))
            sh, sc, g = (self._mod(c) for c in mod.chunk(3, dim=-1))
            s_n = ln(stream) * (1 + sc) + sh
            q = self.rms(f"{p}.attn.norm_q", self.lin(f"{p}.attn.to_q", s_n).view(b, -1, HEADS, HD))
            k = self.rms(f"{p}.attn.norm_k", self.lin(f"{p}.attn.to_k", s_n).view(b, -1, HEADS, HD))
            v = self.lin(f"{p}.attn.to_v", s_n).view(b, -1, HEADS, HD)
            q = self.apply_rope(q, cos, sin)
            k = self.apply_rope(k, cos, sin)
            attn = self.attention(q, k, v)
            mlp = F.gelu(self.lin(f"{p}.proj_mlp", s_n), approximate="tanh")
            stream = stream + g * self.lin(f"{p}.proj_out", torch.cat([attn, mlp], dim=-1))

        x = stream[:, txt_len:]
        emb = self.lin("norm_out.linear", F.silu(temb))
        scale, shift = (self._mod(c) for c in emb.chunk(2, dim=-1))
        x = ln(x) * (1 + scale) + shift
        return self.lin("proj_out", x)


def _pos_ids(txt_len, hh, ww, modality):
    """reference longcat_image/__init__.py:69-87 prepare_pos_ids."""
    ids = torch.zeros(hh, ww, 3)
    ids[..., 0] = modality
    ids[..., 1] = torch.arange(hh)[:, None] + txt_len
    ids[..., 2] = torch.arange(ww)[None, :] + txt_len
    return ids.reshape(-1, 3)


def _txt_ids(txt_len):
    ids = torch.zeros(txt_len, 3)
    ids[:, 1] = torch.arange(txt_len)
    ids[:, 2] = torch.arange(txt_len)
    return ids


def _torch_pack(latents_nhwc):
    """diffusers pack order (c, ph, pw) from NHWC input."""
    x = torch.from_numpy(latents_nhwc).permute(0, 3, 1, 2)
    b, c, h, w_ = x.shape
    x = x.view(b, c, h // 2, 2, w_ // 2, 2)
    return x.permute(0, 2, 4, 1, 3, 5).reshape(b, (h // 2) * (w_ // 2), c * 4)


def _torch_unpack(tokens, h, w_):
    """inverse diffusers pack → NHWC numpy."""
    b, s, cp = tokens.shape
    c = cp // 4
    x = tokens.view(b, h // 2, w_ // 2, c, 2, 2)
    x = x.permute(0, 3, 1, 4, 2, 5).reshape(b, c, h, w_)
    return x.permute(0, 2, 3, 1).numpy()


def _import_params(w, tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.weight_import import load_longcat_image_params

    path = tmp_path / "longcat.safetensors"
    save_file(w, str(path))

    class _Stub:
        arch = ARCH

    return load_longcat_image_params(_Stub(), str(path))


def test_longcat_image_base_matches_oracle(tmp_path):
    w = _fixture(np.random.default_rng(1401))
    params = _import_params(w, tmp_path)
    module = FluxTransformer(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(1402)
    lat_c = ARCH.in_channels // 4
    latents = rng.normal(0, 1, (2, 8, 8, lat_c)).astype(np.float32)
    txt = rng.normal(0, 1, (2, 6, ARCH.txt_in_features)).astype(np.float32)
    sigmas = np.array([0.3, 0.8], np.float32)

    txt_len, hh, ww = 6, 4, 4
    t_ids = _txt_ids(txt_len)
    i_ids = _pos_ids(txt_len, hh, ww, modality=1)

    from simpletuner_tpu.models.flux.transformer import unpack_latents

    img_tokens = pack_latents(jnp.asarray(latents))
    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        img=img_tokens,
        img_ids=jnp.broadcast_to(jnp.asarray(i_ids.numpy())[None], (2, hh * ww, 3)),
        txt=jnp.asarray(txt),
        txt_ids=jnp.broadcast_to(jnp.asarray(t_ids.numpy())[None], (2, txt_len, 3)),
        timesteps=jnp.asarray(sigmas),
        vec=None,
    )
    ours = np.asarray(unpack_latents(ours, 8, 8))

    oracle = TorchLongCat(w)
    with torch.no_grad():
        ref = _torch_unpack(
            oracle(_torch_pack(latents), torch.from_numpy(txt),
                   torch.from_numpy(sigmas), i_ids, t_ids),
            8, 8)
    np.testing.assert_allclose(ours, ref, rtol=6e-4, atol=6e-4)


def test_longcat_image_edit_tokenwise_matches_oracle(tmp_path):
    """Edit flavour: ref tokens appended with modality 2 ids and t=0
    tokenwise modulation (reference model.py:684-712)."""
    w = _fixture(np.random.default_rng(1403))
    params = _import_params(w, tmp_path)
    module = FluxTransformer(config=ARCH, dtype=jnp.float32)

    rng = np.random.default_rng(1404)
    lat_c = ARCH.in_channels // 4
    latents = rng.normal(0, 1, (2, 8, 8, lat_c)).astype(np.float32)
    ref_lat = rng.normal(0, 1, (2, 8, 8, lat_c)).astype(np.float32)
    txt = rng.normal(0, 1, (2, 5, ARCH.txt_in_features)).astype(np.float32)
    sigmas = np.array([0.25, 0.7], np.float32)

    txt_len, hh, ww = 5, 4, 4
    t_ids = _txt_ids(txt_len)
    scene_ids = _pos_ids(txt_len, hh, ww, modality=1)
    ref_ids = _pos_ids(txt_len, hh, ww, modality=2)
    i_ids = torch.cat([scene_ids, ref_ids], dim=0)

    scene = pack_latents(jnp.asarray(latents))
    ref = pack_latents(jnp.asarray(ref_lat))
    img_tokens = jnp.concatenate([scene, ref], axis=1)
    scene_len = scene.shape[1]
    timesteps_tok = np.concatenate(
        [np.broadcast_to(sigmas[:, None], (2, scene_len)),
         np.zeros((2, ref.shape[1]), np.float32)], axis=1)

    from simpletuner_tpu.models.flux.transformer import unpack_latents

    ours = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        img=img_tokens,
        img_ids=jnp.broadcast_to(jnp.asarray(i_ids.numpy())[None], (2, 2 * hh * ww, 3)),
        txt=jnp.asarray(txt),
        txt_ids=jnp.broadcast_to(jnp.asarray(t_ids.numpy())[None], (2, txt_len, 3)),
        timesteps=jnp.asarray(timesteps_tok),
        vec=None,
    )
    ours_scene = np.asarray(unpack_latents(ours[:, :scene_len], 8, 8))

    oracle = TorchLongCat(w)
    with torch.no_grad():
        torch_tokens = torch.cat([_torch_pack(latents), _torch_pack(ref_lat)], dim=1)
        ref_out = oracle(
            torch_tokens, torch.from_numpy(txt),
            torch.from_numpy(timesteps_tok), i_ids, t_ids,
        )
        ref_scene = _torch_unpack(ref_out[:, :scene_len], 8, 8)
    np.testing.assert_allclose(ours_scene, ref_scene, rtol=8e-4, atol=8e-4)


def test_longcat_image_family_end_to_end(tmp_path):
    from simpletuner_tpu.models.registry import ModelRegistry

    assert ModelRegistry.get("longcat_image") is LongcatImage
    model = LongcatImage(
        TrainingConfig(
            {"model_family": "longcat_image", "model_type": "lora", "lora_rank": 2,
             "model_arch_preset": "tiny"}
        )
    )
    batch = model.example_batch(batch_size=1)
    assert "pooled_embeds" not in batch
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    # sliding ids: image ids offset by the prompt length on y/x, modality 1
    txt_len = batch["t5_embeds"].shape[1]
    assert float(prepared["img_ids"][0, 0, 0]) == 1.0
    assert float(prepared["img_ids"][0, 0, 1]) == float(txt_len)
    assert float(prepared["txt_ids"][0, 2, 1]) == 2.0
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()
