"""Loss-curve parity for the SD3 MMDiT path (joint attention, learned
pos-embed crop, AdaLayerNormContinuous context block).

Companion to ``test_loss_curve_parity.py`` (flux): a trainable torch mirror of
the diffusers ``SD3Transformer2DModel`` math runs the same tiny fine-tune —
identical diffusers-layout starting weights (through
``sd3_params_from_diffusers``), identical per-step noise/sigmas (the
``override_noise``/``override_sigmas`` batch hooks), identical AdamW.  The
mirror keeps diffusers' token order (image first, context appended — reference
vendored sd3 attention processor), the scale-first chunk of
AdaLayerNormContinuous in ``norm1_context`` (last block) and ``norm_out``, and
the learned pos-embed center crop, so curve parity pins exactly the places our
flax decomposition differs syntactically from the reference."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.sd3.model import SD3
from simpletuner_tpu.models.sd3.transformer import SD3Config

pytestmark = pytest.mark.slow

ARCH = SD3Config(hidden_size=64, depth=2, num_heads=2, context_dim=96,
                 pooled_dim=96, pos_embed_max_size=8)
D = ARCH.hidden_size
HEADS = ARCH.num_heads
HD = ARCH.head_dim
LAT_C = ARCH.in_channels  # 16
P = ARCH.patch_size
MLP = int(D * ARCH.mlp_ratio)
SIDE = ARCH.pos_embed_max_size

STEPS = 30
BS = 2
H = W = 8  # latent dims -> 4x4 = 16 tokens
TXT = 6
LR = 1e-3
WD = 0.01


def _fixture(rng):
    """Diffusers-layout SD3Transformer2DModel weights for the tiny arch."""
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.05, (out_f,)).astype(np.float32)

    w["pos_embed.proj.weight"] = rng.normal(0, 0.05, (D, LAT_C, P, P)).astype(np.float32)
    w["pos_embed.proj.bias"] = rng.normal(0, 0.05, (D,)).astype(np.float32)
    w["pos_embed.pos_embed"] = rng.normal(0, 0.02, (1, SIDE * SIDE, D)).astype(np.float32)
    lin("context_embedder", D, ARCH.context_dim)
    lin("time_text_embed.timestep_embedder.linear_1", D, 256)
    lin("time_text_embed.timestep_embedder.linear_2", D, D)
    lin("time_text_embed.text_embedder.linear_1", D, ARCH.pooled_dim)
    lin("time_text_embed.text_embedder.linear_2", D, D)
    lin("norm_out.linear", 2 * D, D)
    lin("proj_out", P * P * LAT_C, D)
    for i in range(ARCH.depth):
        p = f"transformer_blocks.{i}"
        last = i == ARCH.depth - 1
        lin(f"{p}.norm1.linear", 6 * D, D)
        lin(f"{p}.norm1_context.linear", (2 if last else 6) * D, D)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{p}.attn.{n}", D, D)
        lin(f"{p}.attn.to_out.0", D, D)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            w[f"{p}.attn.{n}.weight"] = rng.normal(1, 0.05, (HD,)).astype(np.float32)
        lin(f"{p}.ff.net.0.proj", MLP, D)
        lin(f"{p}.ff.net.2", D, MLP)
        if not last:
            lin(f"{p}.attn.to_add_out", D, D)
            lin(f"{p}.ff_context.net.0.proj", MLP, D)
            lin(f"{p}.ff_context.net.2", D, MLP)
    return w


class TorchSD3(torch.nn.Module):
    """Trainable torch mirror of the diffusers SD3Transformer2DModel math."""

    def __init__(self, w):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(torch.from_numpy(np.asarray(v)))
             for k, v in w.items()}
        )

    def g(self, name):
        return self.p[name.replace(".", "__")]

    def lin(self, name, x):
        return F.linear(x, self.g(f"{name}.weight"), self.g(f"{name}.bias"))

    def rms(self, name, x, eps=1e-6):
        x_f = x.float()
        y = x_f * torch.rsqrt(x_f.pow(2).mean(-1, keepdim=True) + eps)
        return y * self.g(f"{name}.weight")

    @staticmethod
    def sinusoid(values, dim=256, factor=1000.0):
        half = dim // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
        args = values.float()[:, None] * factor * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)  # flip_sin_to_cos

    @staticmethod
    def ln(a):
        return F.layer_norm(a, (D,), eps=1e-6)

    def forward(self, noisy, context, pooled, sigmas):
        b = noisy.shape[0]
        # PatchEmbed: conv patchify + learned pos-embed center crop
        x = F.conv2d(noisy, self.g("pos_embed.proj.weight"),
                     self.g("pos_embed.proj.bias"), stride=P)
        hh, ww = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)  # (B, hh*ww, D)
        table = self.g("pos_embed.pos_embed").view(SIDE, SIDE, D)
        top, left = (SIDE - hh) // 2, (SIDE - ww) // 2
        x = x + table[top: top + hh, left: left + ww].reshape(1, hh * ww, D)

        ctx = self.lin("context_embedder", context)
        temb = self.lin("time_text_embed.timestep_embedder.linear_2",
                        F.silu(self.lin("time_text_embed.timestep_embedder.linear_1",
                                        self.sinusoid(sigmas))))
        temb = temb + self.lin("time_text_embed.text_embedder.linear_2",
                               F.silu(self.lin("time_text_embed.text_embedder.linear_1", pooled)))

        img_len = x.shape[1]
        for i in range(ARCH.depth):
            p = f"transformer_blocks.{i}"
            last = i == ARCH.depth - 1
            im = self.lin(f"{p}.norm1.linear", F.silu(temb))
            i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = im.chunk(6, dim=-1)
            x_n = self.ln(x) * (1 + i_sc1[:, None]) + i_sh1[:, None]
            if last:
                # AdaLayerNormContinuous: scale-first chunk
                cm = self.lin(f"{p}.norm1_context.linear", F.silu(temb))
                c_sc, c_sh = cm.chunk(2, dim=-1)
                c_n = self.ln(ctx) * (1 + c_sc[:, None]) + c_sh[:, None]
            else:
                tm = self.lin(f"{p}.norm1_context.linear", F.silu(temb))
                t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = tm.chunk(6, dim=-1)
                c_n = self.ln(ctx) * (1 + t_sc1[:, None]) + t_sh1[:, None]

            def heads(a):
                return a.view(b, -1, HEADS, HD)

            # diffusers joint attention: image tokens first, context appended
            qi = self.rms(f"{p}.attn.norm_q", heads(self.lin(f"{p}.attn.to_q", x_n)))
            ki = self.rms(f"{p}.attn.norm_k", heads(self.lin(f"{p}.attn.to_k", x_n)))
            vi = heads(self.lin(f"{p}.attn.to_v", x_n))
            qt = self.rms(f"{p}.attn.norm_added_q", heads(self.lin(f"{p}.attn.add_q_proj", c_n)))
            kt = self.rms(f"{p}.attn.norm_added_k", heads(self.lin(f"{p}.attn.add_k_proj", c_n)))
            vt = heads(self.lin(f"{p}.attn.add_v_proj", c_n))
            q = torch.cat([qi, qt], 1).transpose(1, 2)
            k = torch.cat([ki, kt], 1).transpose(1, 2)
            v = torch.cat([vi, vt], 1).transpose(1, 2)
            attn = F.scaled_dot_product_attention(q, k, v)
            attn = attn.transpose(1, 2).reshape(b, -1, D)
            a_i, a_t = attn[:, :img_len], attn[:, img_len:]

            x = x + i_g1[:, None] * self.lin(f"{p}.attn.to_out.0", a_i)
            x_m = self.ln(x) * (1 + i_sc2[:, None]) + i_sh2[:, None]
            x = x + i_g2[:, None] * self.lin(
                f"{p}.ff.net.2",
                F.gelu(self.lin(f"{p}.ff.net.0.proj", x_m), approximate="tanh"))
            if not last:
                ctx = ctx + t_g1[:, None] * self.lin(f"{p}.attn.to_add_out", a_t)
                c_m = self.ln(ctx) * (1 + t_sc2[:, None]) + t_sh2[:, None]
                ctx = ctx + t_g2[:, None] * self.lin(
                    f"{p}.ff_context.net.2",
                    F.gelu(self.lin(f"{p}.ff_context.net.0.proj", c_m), approximate="tanh"))

        emb = self.lin("norm_out.linear", F.silu(temb))
        scale, shift = emb.chunk(2, dim=-1)  # scale-first (AdaLayerNormContinuous)
        x = self.ln(x) * (1 + scale[:, None]) + shift[:, None]
        x = self.lin("proj_out", x)  # (B, hh*ww, p*p*C)
        hh = H // P
        x = x.view(b, hh, hh, P, P, LAT_C)
        return x.permute(0, 5, 1, 3, 2, 4).reshape(b, LAT_C, H, W)


def test_sd3_loss_curve_parity(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.weight_import import load_transformer_params
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(733)
    w = _fixture(rng)
    path = tmp_path / "sd3.safetensors"
    save_file(w, str(path))

    latents = rng.normal(0, 1, (BS, H, W, LAT_C)).astype(np.float32)  # NHWC
    context = rng.normal(0, 1, (BS, TXT, ARCH.context_dim)).astype(np.float32)
    pooled = rng.normal(0, 1, (BS, ARCH.pooled_dim)).astype(np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, H, W, LAT_C)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    # ---- our framework ---------------------------------------------------------------
    cfg = TrainingConfig(
        {
            "model_family": "sd3", "model_type": "full",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
        }
    )
    model = SD3(cfg, arch=ARCH)
    variables = load_transformer_params(model, str(path))
    schedule = get_lr_schedule(cfg, STEPS)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step_fn = jax.jit(build_train_step(model, tx, schedule))

    ours = []
    base_batch = {
        "latents": jnp.asarray(latents),
        "text_embeds": jnp.asarray(context),
        "pooled_embeds": jnp.asarray(pooled),
    }
    for step in range(STEPS):
        batch = dict(base_batch)
        batch["override_noise"] = jnp.asarray(noises[step])
        batch["override_sigmas"] = jnp.asarray(sigmas[step])
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))

    # ---- torch mirror ----------------------------------------------------------------
    torch.manual_seed(0)
    mirror = TorchSD3(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    lat_t = torch.from_numpy(latents).permute(0, 3, 1, 2)  # NCHW
    ctx_t = torch.from_numpy(context)
    pool_t = torch.from_numpy(pooled)

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step]).permute(0, 3, 1, 2)
        sig = torch.from_numpy(sigmas[step])
        sig_b = sig.view(BS, 1, 1, 1)
        noisy = (1.0 - sig_b) * lat_t + sig_b * noise
        target = noise - lat_t
        pred = mirror(noisy, ctx_t, pool_t, sig)
        loss = F.mse_loss(pred, target)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    # step-0 parity = forward parity of the imported weights incl. timestep
    # sinusoid convention, pos-embed crop, and chunk orders
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
