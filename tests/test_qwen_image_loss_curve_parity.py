"""Loss-curve parity for Qwen-Image (VERDICT r4 Next #6).  The torch mirror
reproduces the vendored ``QwenImageTransformer2DModel`` math (reference
helpers/models/qwen_image/transformer.py): RMS-normed text input, joint
[text, image] attention with per-head RMS q/k norms, centered scale_rope
coordinates with interleaved complex rotary applied separately per stream,
adaLN double blocks with gelu-tanh MLPs.  Same fixture weights, same per-step
noise/sigma draws, same AdamW on the flow objective."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.qwen_image.model import QwenImage
from simpletuner_tpu.models.qwen_image.transformer import qwen_rope_angles

from test_qwen_image_import import ARCH, _fixture

pytestmark = pytest.mark.slow

STEPS = 30
BS = 2
H = W = 8  # latent pixels -> 4x4 packed tokens
LR = 1e-3
WD = 0.01
HEADS, HD = ARCH.num_heads, ARCH.head_dim


class TorchQwenImage(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(torch.from_numpy(np.asarray(v)))
             for k, v in w.items()}
        )

    def w(self, name):
        return self.p[name.replace(".", "__")]

    def lin(self, name, x):
        return x @ self.w(f"{name}.weight").T + self.w(f"{name}.bias")

    @staticmethod
    def ln(x, eps=1e-6):
        return F.layer_norm(x, x.shape[-1:], eps=eps)

    @staticmethod
    def rms(x, g, eps=1e-6):
        return x * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps) * g

    @staticmethod
    def rope(x, ang):
        cos = torch.cos(ang)[None, :, None, :]
        sin = torch.sin(ang)[None, :, None, :]
        x1, x2 = x[..., 0::2], x[..., 1::2]
        return torch.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1).reshape(x.shape)

    @staticmethod
    def attention(q, k, v):
        b, s, h, d = q.shape
        q, k, v = (a.transpose(1, 2) for a in (q, k, v))
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        return out.transpose(1, 2).reshape(b, s, h * d)

    def forward(self, img_tokens, txt, sigmas, ang_img, ang_txt):
        b = img_tokens.shape[0]
        x = self.lin("img_in", img_tokens)
        t = self.lin("txt_in", self.rms(txt, self.w("txt_norm.weight")))

        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
        args = (sigmas * 1000.0).float()[:, None] * freqs[None]
        tp = torch.cat([torch.cos(args), torch.sin(args)], -1)
        temb = self.lin("time_text_embed.timestep_embedder.linear_2",
                        F.silu(self.lin("time_text_embed.timestep_embedder.linear_1", tp)))

        tl = txt.shape[1]
        for i in range(ARCH.depth):
            p = f"transformer_blocks.{i}"
            im = self.lin(f"{p}.img_mod.1", F.silu(temb))
            tm = self.lin(f"{p}.txt_mod.1", F.silu(temb))
            i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = torch.chunk(im, 6, dim=-1)
            t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = torch.chunk(tm, 6, dim=-1)

            xn = self.ln(x) * (1 + i_sc1[:, None]) + i_sh1[:, None]
            tn = self.ln(t) * (1 + t_sc1[:, None]) + t_sh1[:, None]

            def heads_of(a, s):
                return a.reshape(b, s, HEADS, HD)

            si, st = xn.shape[1], tn.shape[1]
            iq = self.rms(heads_of(self.lin(f"{p}.attn.to_q", xn), si), self.w(f"{p}.attn.norm_q.weight"))
            ik = self.rms(heads_of(self.lin(f"{p}.attn.to_k", xn), si), self.w(f"{p}.attn.norm_k.weight"))
            iv = heads_of(self.lin(f"{p}.attn.to_v", xn), si)
            tq = self.rms(heads_of(self.lin(f"{p}.attn.add_q_proj", tn), st), self.w(f"{p}.attn.norm_added_q.weight"))
            tk = self.rms(heads_of(self.lin(f"{p}.attn.add_k_proj", tn), st), self.w(f"{p}.attn.norm_added_k.weight"))
            tv = heads_of(self.lin(f"{p}.attn.add_v_proj", tn), st)
            iq, ik = self.rope(iq, ang_img), self.rope(ik, ang_img)
            tq, tk = self.rope(tq, ang_txt), self.rope(tk, ang_txt)

            q = torch.cat([tq, iq], dim=1)
            k = torch.cat([tk, ik], dim=1)
            v = torch.cat([tv, iv], dim=1)
            attn = self.attention(q, k, v)
            t_attn, i_attn = attn[:, :tl], attn[:, tl:]

            x = x + i_g1[:, None] * self.lin(f"{p}.attn.to_out.0", i_attn)
            t = t + t_g1[:, None] * self.lin(f"{p}.attn.to_add_out", t_attn)

            xm = self.ln(x) * (1 + i_sc2[:, None]) + i_sh2[:, None]
            x = x + i_g2[:, None] * self.lin(
                f"{p}.img_mlp.net.2",
                F.gelu(self.lin(f"{p}.img_mlp.net.0.proj", xm), approximate="tanh"))
            tm2 = self.ln(t) * (1 + t_sc2[:, None]) + t_sh2[:, None]
            t = t + t_g2[:, None] * self.lin(
                f"{p}.txt_mlp.net.2",
                F.gelu(self.lin(f"{p}.txt_mlp.net.0.proj", tm2), approximate="tanh"))

        final = self.lin("norm_out.linear", F.silu(temb))
        scale, shift = torch.chunk(final, 2, dim=-1)
        x = self.ln(x) * (1 + scale[:, None]) + shift[:, None]
        return self.lin("proj_out", x)


def test_qwen_image_loss_curve_parity():
    from simpletuner_tpu.models.weight_import import qwen_image_params_from_diffusers
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(907)
    w = _fixture(rng)

    c = ARCH.in_channels // 4  # unpacked latent channels
    latents = rng.normal(0, 1, (BS, H, W, c)).astype(np.float32)
    txt = rng.normal(0, 1, (BS, 7, ARCH.txt_in_features)).astype(np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, H, W, c)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    cfg = TrainingConfig(
        {
            "model_family": "qwen_image", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
        }
    )
    model = QwenImage(cfg)
    params = qwen_image_params_from_diffusers(w, model.arch)
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
    mirror = TorchQwenImage(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    hh, ww = H // 2, W // 2
    ang_img_np, ang_txt_np = qwen_rope_angles(ARCH, hh, ww, txt.shape[1])
    ang_img = torch.from_numpy(np.asarray(ang_img_np, np.float32))
    ang_txt = torch.from_numpy(np.asarray(ang_txt_np, np.float32))
    lat_t = torch.from_numpy(latents)
    txt_t = torch.from_numpy(txt)

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step])
        sig = torch.from_numpy(sigmas[step])
        sb = sig.view(BS, 1, 1, 1)
        noisy = (1.0 - sb) * lat_t + sb * noise
        # flux pack_latents: 2x2 patches -> tokens
        packed = noisy.reshape(BS, hh, 2, ww, 2, c).permute(0, 1, 3, 2, 4, 5).reshape(BS, hh * ww, 4 * c)
        out_tok = mirror(packed, txt_t, sig, ang_img, ang_txt)
        out = out_tok.reshape(BS, hh, ww, 2, 2, c).permute(0, 1, 3, 2, 4, 5).reshape(BS, H, W, c)
        loss = F.mse_loss(out, noise - lat_t)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
