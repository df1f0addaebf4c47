"""Loss-curve parity harness (SURVEY §7's primary check; VERDICT r1 Next #10).

A trainable torch mirror of the diffusers ``FluxTransformer2DModel`` math runs
the SAME tiny fine-tune as our framework: identical diffusers-layout starting
weights (imported through ``load_flux_params``), identical per-step noise and
flow sigmas (injected via the ``override_noise``/``override_sigmas`` batch
hooks), identical AdamW hyperparameters.  The two fp32 loss curves must track
each other step for step — this pins forward math, flow-matching loss
semantics, gradients, and optimizer updates in one test.  It also closes the
flux forward-parity gap (VERDICT r1 Weak #7): step-0 losses match only if the
imported weights reproduce the reference forward numerically.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig

pytestmark = pytest.mark.slow

ARCH = FluxConfig.tiny()
D = ARCH.hidden_size
HEADS = ARCH.num_heads
HD = ARCH.head_dim
PATCH_C = ARCH.in_channels  # packed 2x2 patches of 4-channel latents
LAT_C = PATCH_C // 4


def _fixture(rng):
    """Diffusers-layout FluxTransformer2DModel weights for the tiny arch."""
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.05, (out_f,)).astype(np.float32)

    def rms(name):
        w[name] = rng.normal(1, 0.05, (HD,)).astype(np.float32)

    lin("x_embedder", D, PATCH_C)
    lin("context_embedder", D, ARCH.txt_in_features)
    lin("time_text_embed.timestep_embedder.linear_1", D, 256)
    lin("time_text_embed.timestep_embedder.linear_2", D, D)
    lin("time_text_embed.text_embedder.linear_1", D, ARCH.vec_in_features)
    lin("time_text_embed.text_embedder.linear_2", D, D)
    lin("time_text_embed.guidance_embedder.linear_1", D, 256)
    lin("time_text_embed.guidance_embedder.linear_2", D, D)
    lin("norm_out.linear", 2 * D, D)
    lin("proj_out", PATCH_C, D)
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


class TorchFlux(torch.nn.Module):
    """Trainable torch mirror of the diffusers FluxTransformer2DModel math."""

    def __init__(self, w):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(torch.from_numpy(np.asarray(v))) for k, v in w.items()}
        )

    def lin(self, name, x):
        return F.linear(x, self.p[f"{name}__weight".replace(".", "__")],
                        self.p[f"{name}__bias".replace(".", "__")])

    def rms(self, name, x, eps=1e-6):
        g = self.p[f"{name}__weight".replace(".", "__")]
        x_f = x.float()
        y = x_f * torch.rsqrt(x_f.pow(2).mean(-1, keepdim=True) + eps)
        return y * g

    @staticmethod
    def sinusoid(values, factor=1000.0):
        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
        args = values.float()[:, None] * factor * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    @staticmethod
    def rope_tables(ids, axes_dim, theta):
        # ids (S, 3) → cos/sin (S, sum(axes)/2)
        parts_c, parts_s = [], []
        for i, dax in enumerate(axes_dim):
            freqs = 1.0 / theta ** (torch.arange(0, dax, 2, dtype=torch.float64) / dax)
            ang = ids[:, i : i + 1].double() * freqs[None]
            parts_c.append(torch.cos(ang))
            parts_s.append(torch.sin(ang))
        return torch.cat(parts_c, -1).float(), torch.cat(parts_s, -1).float()

    @staticmethod
    def apply_rope(x, cos, sin):
        # x (B, S, H, Dh); interleaved pairs
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        x0, x1 = x[..., 0::2], x[..., 1::2]
        o0 = x0 * c - x1 * s
        o1 = x0 * s + x1 * c
        return torch.stack([o0, o1], dim=-1).flatten(-2)

    @staticmethod
    def attention(q, k, v):
        b, s, h, d = q.shape
        q, k, v = (a.transpose(1, 2) for a in (q, k, v))
        out = F.scaled_dot_product_attention(q, k, v)
        return out.transpose(1, 2).reshape(b, s, h * d)

    def forward(self, img_tokens, txt, sigmas, vec, guidance, img_ids, txt_ids):
        b = img_tokens.shape[0]
        x = self.lin("x_embedder", img_tokens)
        t = self.lin("context_embedder", txt)
        temb = self.lin("time_text_embed.timestep_embedder.linear_2",
                        F.silu(self.lin("time_text_embed.timestep_embedder.linear_1", self.sinusoid(sigmas))))
        temb = temb + self.lin("time_text_embed.text_embedder.linear_2",
                               F.silu(self.lin("time_text_embed.text_embedder.linear_1", vec)))
        temb = temb + self.lin("time_text_embed.guidance_embedder.linear_2",
                               F.silu(self.lin("time_text_embed.guidance_embedder.linear_1", self.sinusoid(guidance))))

        ids = torch.cat([txt_ids, img_ids], dim=0)
        cos, sin = self.rope_tables(ids, ARCH.axes_dim, ARCH.theta)
        txt_len = txt.shape[1]

        def ln(a):
            return F.layer_norm(a, (D,), eps=1e-6)

        for i in range(ARCH.depth_double):
            p = f"transformer_blocks.{i}"
            im = self.lin(f"{p}.norm1.linear", F.silu(temb))
            tm = self.lin(f"{p}.norm1_context.linear", F.silu(temb))
            i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = im.chunk(6, dim=-1)
            t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = tm.chunk(6, dim=-1)
            x_n = ln(x) * (1 + i_sc1[:, None]) + i_sh1[:, None]
            t_n = ln(t) * (1 + t_sc1[:, None]) + t_sh1[:, None]

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
            x = x + i_g1[:, None] * self.lin(f"{p}.attn.to_out.0", a_i)
            t = t + t_g1[:, None] * self.lin(f"{p}.attn.to_add_out", a_t)
            x_m = ln(x) * (1 + i_sc2[:, None]) + i_sh2[:, None]
            x = x + i_g2[:, None] * self.lin(
                f"{p}.ff.net.2", F.gelu(self.lin(f"{p}.ff.net.0.proj", x_m), approximate="tanh"))
            t_m = ln(t) * (1 + t_sc2[:, None]) + t_sh2[:, None]
            t = t + t_g2[:, None] * self.lin(
                f"{p}.ff_context.net.2", F.gelu(self.lin(f"{p}.ff_context.net.0.proj", t_m), approximate="tanh"))

        stream = torch.cat([t, x], dim=1)
        for i in range(ARCH.depth_single):
            p = f"single_transformer_blocks.{i}"
            mod = self.lin(f"{p}.norm.linear", F.silu(temb))
            sh, sc, g = mod.chunk(3, dim=-1)
            s_n = ln(stream) * (1 + sc[:, None]) + sh[:, None]
            q = self.rms(f"{p}.attn.norm_q", self.lin(f"{p}.attn.to_q", s_n).view(b, -1, HEADS, HD))
            k = self.rms(f"{p}.attn.norm_k", self.lin(f"{p}.attn.to_k", s_n).view(b, -1, HEADS, HD))
            v = self.lin(f"{p}.attn.to_v", s_n).view(b, -1, HEADS, HD)
            q = self.apply_rope(q, cos, sin)
            k = self.apply_rope(k, cos, sin)
            attn = self.attention(q, k, v)
            mlp = F.gelu(self.lin(f"{p}.proj_mlp", s_n), approximate="tanh")
            stream = stream + g[:, None] * self.lin(f"{p}.proj_out", torch.cat([attn, mlp], dim=-1))

        x = stream[:, txt_len:]
        # diffusers AdaLayerNormContinuous: scale-first chunk
        emb = self.lin("norm_out.linear", F.silu(temb))
        scale, shift = emb.chunk(2, dim=-1)
        x = ln(x) * (1 + scale[:, None]) + shift[:, None]
        return self.lin("proj_out", x)


def _torch_pack(latents):
    """diffusers flux packing: (B, C, H, W) → (B, H/2*W/2, C*4), (c ph pw) order."""
    b, c, h, w_ = latents.shape
    x = latents.view(b, c, h // 2, 2, w_ // 2, 2)
    x = x.permute(0, 2, 4, 1, 3, 5).reshape(b, (h // 2) * (w_ // 2), c * 4)
    return x


def _img_ids(h, w_):
    hh, ww = h // 2, w_ // 2
    ids = torch.zeros(hh, ww, 3)
    ids[..., 1] = torch.arange(hh)[:, None]
    ids[..., 2] = torch.arange(ww)[None, :]
    return ids.reshape(-1, 3)


STEPS = 30
BS = 2
H = W = 8  # latent dims
LR = 1e-3
WD = 0.01


def test_flux_loss_curve_parity(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.weight_import import load_transformer_params
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(121)
    w = _fixture(rng)
    path = tmp_path / "flux.safetensors"
    save_file(w, str(path))

    # shared data + per-step noise/sigmas
    latents = rng.normal(0, 1, (BS, H, W, LAT_C)).astype(np.float32)  # NHWC
    t5 = rng.normal(0, 1, (BS, 6, ARCH.txt_in_features)).astype(np.float32)
    pooled = rng.normal(0, 1, (BS, ARCH.vec_in_features)).astype(np.float32)
    guidance = np.full((BS,), 1.0, np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, H, W, LAT_C)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    # ---- our framework ---------------------------------------------------------------
    cfg = TrainingConfig(
        {
            "model_family": "flux", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32", "flux_guidance_value": 1.0,
        }
    )
    model = Flux(cfg)
    variables = load_transformer_params(model, str(path))
    schedule = get_lr_schedule(cfg, STEPS)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step_fn = jax.jit(build_train_step(model, tx, schedule))

    ours = []
    base_batch = {
        "latents": jnp.asarray(latents),
        "t5_embeds": jnp.asarray(t5),
        "pooled_embeds": jnp.asarray(pooled),
        "guidance": jnp.asarray(guidance),
    }
    for step in range(STEPS):
        batch = dict(base_batch)
        batch["override_noise"] = jnp.asarray(noises[step])
        batch["override_sigmas"] = jnp.asarray(sigmas[step])
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))

    # ---- torch mirror ----------------------------------------------------------------
    torch.manual_seed(0)
    mirror = TorchFlux(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    lat_t = torch.from_numpy(latents).permute(0, 3, 1, 2)  # NCHW
    txt_t = torch.from_numpy(t5)
    vec_t = torch.from_numpy(pooled)
    gd_t = torch.from_numpy(guidance)
    img_ids = _img_ids(H, W)
    txt_ids = torch.zeros(t5.shape[1], 3)

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step]).permute(0, 3, 1, 2)
        sig = torch.from_numpy(sigmas[step])
        sig_b = sig.view(BS, 1, 1, 1)
        noisy = (1.0 - sig_b) * lat_t + sig_b * noise
        target = noise - lat_t
        pred_tokens = mirror(_torch_pack(noisy), txt_t, sig, vec_t, gd_t, img_ids, txt_ids)
        target_tokens = _torch_pack(target)
        loss = F.mse_loss(pred_tokens, target_tokens)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    # step-0 parity = forward-output parity of the imported weights
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    # full-curve parity: identical data, noise, optimizer → curves track within
    # accumulated fp32 rounding
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]  # it actually learns
