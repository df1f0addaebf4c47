"""Loss-curve parity for AuraFlow (VERDICT r4 Next #6).  The torch mirror
reproduces the vendored ``AuraFlowTransformer2DModel`` math (reference
helpers/models/auraflow/transformer.py): center-cropped learned pos-embed
grid, register tokens prepended to the context, per-head LayerNorm q/k
(no affine), sandwich modulation (attn out re-normed into the FF), SwiGLU-ish
``silu(l1(x)) * l2(x)`` FFN, x1000 sinusoids.  Same fixture weights, same
per-step noise/sigma draws, same AdamW on the flow objective."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.auraflow.model import AuraFlow

from test_auraflow_import import ARCH, _fixture

pytestmark = pytest.mark.slow

STEPS = 30
BS = 2
H = W = 8
LR = 1e-3
WD = 0.01


class TorchAuraFlow(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(torch.from_numpy(np.asarray(v)))
             for k, v in w.items()}
        )

    def w(self, name):
        return self.p[name.replace(".", "__")]

    def lin(self, name, x):
        y = x @ self.w(f"{name}.weight").T
        bias = f"{name}.bias".replace(".", "__")
        if bias in self.p:
            y = y + self.p[bias]
        return y

    @staticmethod
    def ln(x, eps=1e-5):
        return F.layer_norm(x, x.shape[-1:], eps=eps)

    def attn(self, q, k, v, heads):
        b, s, inner = q.shape
        dh = inner // heads
        t = k.shape[1]
        q = self.ln(q.reshape(b, s, heads, dh)).transpose(1, 2)
        k = self.ln(k.reshape(b, t, heads, dh)).transpose(1, 2)
        v = v.reshape(b, t, heads, dh).transpose(1, 2)
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        return out.transpose(1, 2).reshape(b, s, inner)

    def ff(self, src, x):
        return self.lin(f"{src}.out_projection",
                        F.silu(self.lin(f"{src}.linear_1", x)) * self.lin(f"{src}.linear_2", x))

    def mods(self, name, temb):
        return torch.chunk(F.silu(temb) @ self.w(f"{name}.weight").T, 6, dim=-1)

    def forward(self, latents, timesteps, context):
        p = ARCH.patch_size
        b, h, wd, c = latents.shape
        hh, ww = h // p, wd // p
        patches = latents.reshape(b, hh, p, ww, p, c).permute(0, 1, 3, 5, 2, 4).reshape(b, hh * ww, c * p * p)
        x = self.lin("pos_embed.proj", patches)
        gm = int(ARCH.pos_embed_max_size ** 0.5)
        sh_, sw_ = gm // 2 - hh // 2, gm // 2 - ww // 2
        idx = (torch.arange(sh_, sh_ + hh)[:, None] * gm + torch.arange(sw_, sw_ + ww)[None, :]).reshape(-1)
        x = x + self.w("pos_embed.pos_embed")[0][idx][None]

        ctx = context @ self.w("context_embedder.weight").T
        ctx = torch.cat([self.w("register_tokens").expand(b, -1, -1), ctx], dim=1)

        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
        args = (timesteps * 1000.0).float()[:, None] * freqs[None]
        tp = torch.cat([torch.cos(args), torch.sin(args)], -1)
        temb = self.lin("time_step_proj.linear_2", F.silu(self.lin("time_step_proj.linear_1", tp)))

        for i in range(ARCH.depth_double):
            src = f"joint_transformer_blocks.{i}"
            sh, sc, gm_, shm, scm, gmlp = self.mods(f"{src}.norm1.linear", temb)
            csh, csc, cgm, cshm, cscm, cgmlp = self.mods(f"{src}.norm1_context.linear", temb)
            xn = self.ln(x) * (1 + sc[:, None]) + sh[:, None]
            cn = self.ln(ctx) * (1 + csc[:, None]) + csh[:, None]
            q = torch.cat([self.lin(f"{src}.attn.add_q_proj", cn), self.lin(f"{src}.attn.to_q", xn)], dim=1)
            k = torch.cat([self.lin(f"{src}.attn.add_k_proj", cn), self.lin(f"{src}.attn.to_k", xn)], dim=1)
            v = torch.cat([self.lin(f"{src}.attn.add_v_proj", cn), self.lin(f"{src}.attn.to_v", xn)], dim=1)
            a = self.attn(q, k, v, ARCH.num_heads)
            cl = ctx.shape[1]
            a_c = self.lin(f"{src}.attn.to_add_out", a[:, :cl])
            a_i = self.lin(f"{src}.attn.to_out.0", a[:, cl:])
            mid = self.ln(x + gm_[:, None] * a_i) * (1 + scm[:, None]) + shm[:, None]
            x = x + gmlp[:, None] * self.ff(f"{src}.ff", mid)
            cmid = self.ln(ctx + cgm[:, None] * a_c) * (1 + cscm[:, None]) + cshm[:, None]
            ctx = ctx + cgmlp[:, None] * self.ff(f"{src}.ff_context", cmid)

        stream = torch.cat([ctx, x], dim=1)
        cl = ctx.shape[1]
        for i in range(ARCH.depth_single):
            src = f"single_transformer_blocks.{i}"
            sh, sc, gm_, shm, scm, gmlp = self.mods(f"{src}.norm1.linear", temb)
            sn = self.ln(stream) * (1 + sc[:, None]) + sh[:, None]
            a = self.lin(
                f"{src}.attn.to_out.0",
                self.attn(self.lin(f"{src}.attn.to_q", sn),
                          self.lin(f"{src}.attn.to_k", sn),
                          self.lin(f"{src}.attn.to_v", sn), ARCH.num_heads))
            mid = self.ln(stream + gm_[:, None] * a) * (1 + scm[:, None]) + shm[:, None]
            stream = stream + gmlp[:, None] * self.ff(f"{src}.ff", mid)
        x = stream[:, cl:]

        fm = F.silu(temb) @ self.w("norm_out.linear.weight").T
        scale, shift = torch.chunk(fm, 2, dim=-1)
        x = x * (1 + scale[:, None]) + shift[:, None]
        x = x @ self.w("proj_out.weight").T
        return x.reshape(b, hh, ww, p, p, c).permute(0, 1, 3, 2, 4, 5).reshape(b, h, wd, c)


def test_auraflow_loss_curve_parity():
    from simpletuner_tpu.models.weight_import import auraflow_params_from_diffusers
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(811)
    w = _fixture(rng)

    c = ARCH.in_channels
    latents = rng.normal(0, 1, (BS, H, W, c)).astype(np.float32)
    txt = rng.normal(0, 1, (BS, 7, ARCH.text_dim)).astype(np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, H, W, c)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    cfg = TrainingConfig(
        {
            "model_family": "auraflow", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
        }
    )
    model = AuraFlow(cfg, arch=ARCH)
    params = auraflow_params_from_diffusers(w, model.arch)
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

    torch.manual_seed(0)
    mirror = TorchAuraFlow(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    lat_t = torch.from_numpy(latents)
    txt_t = torch.from_numpy(txt)

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step])
        sig = torch.from_numpy(sigmas[step])
        sb = sig.view(BS, 1, 1, 1)
        noisy = (1.0 - sb) * lat_t + sb * noise
        out = mirror(noisy, sig, txt_t)
        loss = F.mse_loss(out, noise - lat_t)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
