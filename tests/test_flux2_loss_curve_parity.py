"""Loss-curve parity for FLUX.2 (VERDICT r4 Next #6).  The torch mirror
reproduces the vendored ``Flux2Transformer2DModel`` math (reference
helpers/models/flux2/transformer.py): GLOBAL shared modulation (one
img/txt/single modulation set for every block — unlike Flux.1's per-block
adaLN), [text, image] joint attention with per-head RMS q/k norms, 4-axis
theta-2000 RoPE, SwiGLU FFNs, ViT-22B-style parallel single blocks with one
fused qkv+mlp projection, x1000 sinusoids for timestep AND guidance.  Both
sides start from the same diffusers-layout fixture, share per-step
noise/sigma draws, and run the same AdamW on the flow objective."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux2.model import Flux2

from test_flux2_import import ARCH, _fixture, _rope_table

pytestmark = pytest.mark.slow

STEPS = 30
BS = 2
H = W = 8  # latent pixels
GUIDANCE = 1.0
LR = 1e-3
WD = 0.01


class TorchFlux2(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(torch.from_numpy(np.asarray(v)))
             for k, v in w.items()}
        )

    def w(self, name):
        return self.p[name.replace(".", "__")]

    def lin(self, name, x):
        return x @ self.w(f"{name}.weight").T

    @staticmethod
    def ln(x, eps=1e-6):
        return F.layer_norm(x, x.shape[-1:], eps=eps)

    def rms(self, x, gname, eps=1e-6):
        g = self.w(gname)
        return x * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps) * g

    def swiglu(self, src, x):
        h = self.lin(f"{src}.linear_in", x)
        gate, up = torch.chunk(h, 2, dim=-1)
        return self.lin(f"{src}.linear_out", F.silu(gate) * up)

    @staticmethod
    def rope(x, ang):
        cos = torch.cos(ang)[None, :, None, :]
        sin = torch.sin(ang)[None, :, None, :]
        x0, x1 = x[..., 0::2], x[..., 1::2]
        return torch.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], dim=-1).reshape(x.shape)

    @staticmethod
    def attention(q, k, v):
        b, s, h, d = q.shape
        q, k, v = (a.transpose(1, 2) for a in (q, k, v))
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        return out.transpose(1, 2).reshape(b, s, h * d)

    def forward(self, latents, txt_raw, sigmas, guidance, ang):
        import math

        p = ARCH.patch_size
        b, Hh, Ww, c = latents.shape
        hh, ww = Hh // p, Ww // p
        heads, hd = ARCH.num_heads, ARCH.head_dim
        inner = heads * hd
        mlp = ARCH.mlp_hidden

        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)

        def embed(values, prefix):
            args = (values * 1000.0).float()[:, None] * freqs[None]
            tp = torch.cat([torch.cos(args), torch.sin(args)], -1)
            return self.lin(f"{prefix}.linear_2", F.silu(self.lin(f"{prefix}.linear_1", tp)))

        temb = embed(sigmas, "time_guidance_embed.timestep_embedder")
        temb = temb + embed(guidance, "time_guidance_embed.guidance_embedder")

        def modulation(name, sets):
            mod = self.lin(name, F.silu(temb))[:, None, :]
            parts = torch.chunk(mod, 3 * sets, dim=-1)
            return [parts[3 * i: 3 * (i + 1)] for i in range(sets)]

        mod_img = modulation("double_stream_modulation_img.linear", 2)
        mod_txt = modulation("double_stream_modulation_txt.linear", 2)
        (mod_single,) = modulation("single_stream_modulation.linear", 1)

        x = latents.reshape(b, hh, p, ww, p, c).permute(0, 1, 3, 2, 4, 5).reshape(b, hh * ww, p * p * c)
        x = self.lin("x_embedder", x)
        txt = self.lin("context_embedder", txt_raw)
        txt_len = txt.shape[1]

        for i in range(ARCH.depth_double):
            src = f"transformer_blocks.{i}"
            (i_sh1, i_sc1, i_g1), (i_sh2, i_sc2, i_g2) = mod_img
            (t_sh1, t_sc1, t_g1), (t_sh2, t_sc2, t_g2) = mod_txt
            x_n = (1 + i_sc1) * self.ln(x) + i_sh1
            t_n = (1 + t_sc1) * self.ln(txt) + t_sh1

            def heads_of(a):
                return a.reshape(b, -1, heads, hd)

            qi = self.rms(heads_of(self.lin(f"{src}.attn.to_q", x_n)), f"{src}.attn.norm_q.weight")
            ki = self.rms(heads_of(self.lin(f"{src}.attn.to_k", x_n)), f"{src}.attn.norm_k.weight")
            vi = heads_of(self.lin(f"{src}.attn.to_v", x_n))
            qt = self.rms(heads_of(self.lin(f"{src}.attn.add_q_proj", t_n)), f"{src}.attn.norm_added_q.weight")
            kt = self.rms(heads_of(self.lin(f"{src}.attn.add_k_proj", t_n)), f"{src}.attn.norm_added_k.weight")
            vt = heads_of(self.lin(f"{src}.attn.add_v_proj", t_n))
            q = self.rope(torch.cat([qt, qi], 1), ang)
            k = self.rope(torch.cat([kt, ki], 1), ang)
            v = torch.cat([vt, vi], 1)
            attn = self.attention(q, k, v)
            a_t, a_i = attn[:, :txt_len], attn[:, txt_len:]
            x = x + i_g1 * self.lin(f"{src}.attn.to_out.0", a_i)
            txt = txt + t_g1 * self.lin(f"{src}.attn.to_add_out", a_t)
            x = x + i_g2 * self.swiglu(f"{src}.ff", self.ln(x) * (1 + i_sc2) + i_sh2)
            txt = txt + t_g2 * self.swiglu(f"{src}.ff_context", self.ln(txt) * (1 + t_sc2) + t_sh2)

        stream = torch.cat([txt, x], dim=1)
        for i in range(ARCH.depth_single):
            src = f"single_transformer_blocks.{i}"
            sh, sc, g = mod_single
            s_n = (1 + sc) * self.ln(stream) + sh
            fused = self.lin(f"{src}.attn.to_qkv_mlp_proj", s_n)
            q, k, v, mg, mu = torch.split(fused, [inner, inner, inner, mlp, mlp], dim=-1)

            def heads_of(a):
                return a.reshape(b, -1, heads, hd)

            q = self.rope(self.rms(heads_of(q), f"{src}.attn.norm_q.weight"), ang)
            k = self.rope(self.rms(heads_of(k), f"{src}.attn.norm_k.weight"), ang)
            attn = self.attention(q, k, heads_of(v))
            merged = torch.cat([attn, F.silu(mg) * mu], dim=-1)
            stream = stream + g * self.lin(f"{src}.attn.to_out", merged)

        x = stream[:, txt_len:]
        ada = self.lin("norm_out.linear", F.silu(temb))
        scale, shift = torch.chunk(ada, 2, dim=-1)
        x = self.ln(x) * (1 + scale[:, None]) + shift[:, None]
        out = self.lin("proj_out", x)
        return out.reshape(b, hh, ww, p, p, c).permute(0, 1, 3, 2, 4, 5).reshape(b, Hh, Ww, c)


def test_flux2_loss_curve_parity():
    from simpletuner_tpu.models.weight_import import flux2_params_from_diffusers
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(613)
    w = _fixture(rng)

    c = ARCH.in_channels
    latents = rng.normal(0, 1, (BS, H, W, c)).astype(np.float32)
    txt = rng.normal(0, 1, (BS, 6, ARCH.txt_in_features)).astype(np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, H, W, c)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    # ---- our framework ---------------------------------------------------------------
    cfg = TrainingConfig(
        {
            "model_family": "flux2", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
            "flux_guidance_value": GUIDANCE,
        }
    )
    model = Flux2(cfg)
    params = flux2_params_from_diffusers(w, model.arch)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    schedule = get_lr_schedule(cfg, STEPS)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step_fn = jax.jit(build_train_step(model, tx, schedule))

    ours = []
    for step in range(STEPS):
        batch = {
            "latents": jnp.asarray(latents),
            "text_embeds": jnp.asarray(txt),
            "override_noise": jnp.asarray(noises[step]),
            "override_sigmas": jnp.asarray(sigmas[step]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))

    # ---- torch mirror ----------------------------------------------------------------
    p = ARCH.patch_size
    hh, ww = H // p, W // p
    rows = np.repeat(np.arange(hh), ww)
    cols = np.tile(np.arange(ww), hh)
    img_ids = np.stack([np.zeros_like(rows), rows, cols, np.zeros_like(rows)], -1).astype(np.float64)
    ell = np.arange(txt.shape[1])
    txt_ids = np.stack([np.zeros_like(ell)] * 3 + [ell], -1).astype(np.float64)
    ang = torch.from_numpy(_rope_table(np.concatenate([txt_ids, img_ids], axis=0)).astype(np.float32))

    torch.manual_seed(0)
    mirror = TorchFlux2(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    lat_t = torch.from_numpy(latents)
    txt_t = torch.from_numpy(txt)
    guidance_t = torch.full((BS,), GUIDANCE)

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step])
        sig = torch.from_numpy(sigmas[step])
        sb = sig.view(BS, 1, 1, 1)
        noisy = (1.0 - sb) * lat_t + sb * noise
        out = mirror(noisy, txt_t, sig, guidance_t, ang)
        loss = F.mse_loss(out, noise - lat_t)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
