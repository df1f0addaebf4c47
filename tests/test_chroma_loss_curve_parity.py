"""Loss-curve parity for Chroma (VERDICT r4 Next #6).  The torch mirror
reproduces the vendored ``ChromaTransformer2DModel`` math (reference
helpers/models/chroma/transformer.py): Flux double/single topology with the
per-block modulation MLPs pruned — one "distilled guidance" approximator
(in_proj + residual silu-MLP layers with pre-RMSNorms + out_proj) maps
[t sincos16 ++ guidance-0 sincos16 ++ slot-index sincos32] to every
modulation slot; slot layout singles-first then doubles img/txt then the
final (shift, scale) pair.  Same fixture weights, same per-step noise/sigma
draws, same AdamW on the flow objective."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.chroma.model import Chroma

from test_chroma_import import ARCH, _fixture

pytestmark = pytest.mark.slow

STEPS = 30
BS = 2
H = W = 8  # latent pixels (4x4 packed tokens)
LR = 1e-3
WD = 0.01
D = ARCH.hidden_size
HEADS, HD = ARCH.num_heads, ARCH.head_dim
MLP = int(D * ARCH.mlp_ratio)


def _axial_angles(txt_len, hh, ww):
    """(S, HD/2) rope angles, flux axes (t, h, w) with txt ids all-zero."""
    rows = np.repeat(np.arange(hh), ww)
    cols = np.tile(np.arange(ww), hh)
    img_ids = np.stack([np.zeros_like(rows), rows, cols], -1).astype(np.float64)
    txt_ids = np.zeros((txt_len, 3), np.float64)
    ids = np.concatenate([txt_ids, img_ids], axis=0)
    parts = []
    for axis, dax in enumerate(ARCH.axes_dim):
        freqs = 1.0 / ARCH.theta ** (np.arange(0, dax, 2, dtype=np.float64) / dax)
        parts.append(ids[:, axis: axis + 1] * freqs[None])
    return torch.from_numpy(np.concatenate(parts, axis=-1).astype(np.float32))


def _sincos(values, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
    args = values.float()[:, None] * 1000.0 * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], -1)


class TorchChroma(torch.nn.Module):
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
        bias_key = f"{name}.bias".replace(".", "__")
        if bias_key in self.p:
            y = y + self.p[bias_key]
        return y

    @staticmethod
    def ln(x, eps=1e-6):
        return F.layer_norm(x, x.shape[-1:], eps=eps)

    @staticmethod
    def rms(x, g=None, eps=1e-6):
        y = x * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps)
        return y * g if g is not None else y

    @staticmethod
    def rope(x, ang):
        # interleaved even/odd pair rotation (ops/rope.apply_rope)
        cos = torch.cos(ang)[None, :, None, :]
        sin = torch.sin(ang)[None, :, None, :]
        pairs = x.unflatten(-1, (-1, 2))
        e, o = pairs[..., 0], pairs[..., 1]
        return torch.stack([e * cos - o * sin, e * sin + o * cos], dim=-1).reshape(x.shape)

    @staticmethod
    def attention(q, k, v):
        b, s, h, d = q.shape
        q, k, v = (a.transpose(1, 2) for a in (q, k, v))
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        return out.transpose(1, 2).reshape(b, s, h * d)

    def approximator(self, timesteps):
        nc = ARCH.approximator_channels // 4
        tg = torch.cat([_sincos(timesteps, nc),
                        _sincos(torch.zeros_like(timesteps), nc)], -1)
        idx = torch.arange(ARCH.mod_len).float() * 1000.0
        freqs = torch.exp(-math.log(10000.0) * torch.arange(nc) / nc)
        args = idx[:, None] * freqs[None]
        mod = torch.cat([torch.cos(args), torch.sin(args)], -1)
        b = timesteps.shape[0]
        vec = torch.cat(
            [tg[:, None, :].expand(b, ARCH.mod_len, 2 * nc),
             mod[None].expand(b, ARCH.mod_len, 2 * nc)], -1)
        h = self.lin("distilled_guidance_layer.in_proj", vec)
        for i in range(ARCH.approximator_layers):
            n = self.rms(h, self.w(f"distilled_guidance_layer.norms.{i}.weight"))
            m = self.lin(f"distilled_guidance_layer.layers.{i}.linear_1", n)
            m = self.lin(f"distilled_guidance_layer.layers.{i}.linear_2", F.silu(m))
            h = h + m
        return self.lin("distilled_guidance_layer.out_proj", h)  # (B, mod_len, D)

    def forward(self, latents, txt_raw, sigmas, ang):
        b = latents.shape[0]
        hh, ww = H // 2, W // 2
        # pack 2x2 latent patches into tokens (flux pack_latents)
        x = latents.reshape(b, hh, 2, ww, 2, ARCH.in_channels // 4)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hh * ww, ARCH.in_channels)
        x = self.lin("x_embedder", x)
        txt = self.lin("context_embedder", txt_raw)
        txt_len = txt.shape[1]

        pooled = self.approximator(sigmas)
        img_off = 3 * ARCH.depth_single
        txt_off = img_off + 6 * ARCH.depth_double

        def modv(i):
            return pooled[:, i][:, None, :]

        for layer in range(ARCH.depth_double):
            io = img_off + 6 * layer
            to = txt_off + 6 * layer
            src = f"transformer_blocks.{layer}"
            x_n = self.ln(x) * (1 + modv(io + 1)) + modv(io)
            t_n = self.ln(txt) * (1 + modv(to + 1)) + modv(to)

            def heads_of(a):
                return a.reshape(b, -1, HEADS, HD)

            qi = self.rms(heads_of(self.lin(f"{src}.attn.to_q", x_n)),
                          self.w(f"{src}.attn.norm_q.weight"))
            ki = self.rms(heads_of(self.lin(f"{src}.attn.to_k", x_n)),
                          self.w(f"{src}.attn.norm_k.weight"))
            vi = heads_of(self.lin(f"{src}.attn.to_v", x_n))
            qt = self.rms(heads_of(self.lin(f"{src}.attn.add_q_proj", t_n)),
                          self.w(f"{src}.attn.norm_added_q.weight"))
            kt = self.rms(heads_of(self.lin(f"{src}.attn.add_k_proj", t_n)),
                          self.w(f"{src}.attn.norm_added_k.weight"))
            vt = heads_of(self.lin(f"{src}.attn.add_v_proj", t_n))
            q = self.rope(torch.cat([qt, qi], 1), ang)
            k = self.rope(torch.cat([kt, ki], 1), ang)
            v = torch.cat([vt, vi], 1)
            attn = self.attention(q, k, v)
            a_t, a_i = attn[:, :txt_len], attn[:, txt_len:]
            x = x + modv(io + 2) * self.lin(f"{src}.attn.to_out.0", a_i)
            txt = txt + modv(to + 2) * self.lin(f"{src}.attn.to_add_out", a_t)
            x_m = self.ln(x) * (1 + modv(io + 4)) + modv(io + 3)
            x = x + modv(io + 5) * self.lin(
                f"{src}.ff.net.2",
                F.gelu(self.lin(f"{src}.ff.net.0.proj", x_m), approximate="tanh"))
            t_m = self.ln(txt) * (1 + modv(to + 4)) + modv(to + 3)
            txt = txt + modv(to + 5) * self.lin(
                f"{src}.ff_context.net.2",
                F.gelu(self.lin(f"{src}.ff_context.net.0.proj", t_m), approximate="tanh"))

        stream = torch.cat([txt, x], dim=1)
        for layer in range(ARCH.depth_single):
            src = f"single_transformer_blocks.{layer}"
            mo = 3 * layer
            s_n = self.ln(stream) * (1 + modv(mo + 1)) + modv(mo)

            def heads_of(a):
                return a.reshape(b, -1, HEADS, HD)

            q = self.rope(self.rms(heads_of(self.lin(f"{src}.attn.to_q", s_n)),
                                   self.w(f"{src}.attn.norm_q.weight")), ang)
            k = self.rope(self.rms(heads_of(self.lin(f"{src}.attn.to_k", s_n)),
                                   self.w(f"{src}.attn.norm_k.weight")), ang)
            v = heads_of(self.lin(f"{src}.attn.to_v", s_n))
            attn = self.attention(q, k, v)
            mlp = F.gelu(self.lin(f"{src}.proj_mlp", s_n), approximate="tanh")
            out = self.lin(f"{src}.proj_out", torch.cat([attn, mlp], -1))
            stream = stream + modv(mo + 2) * out

        x = stream[:, txt_len:]
        shift = pooled[:, -2][:, None, :]
        scale = pooled[:, -1][:, None, :]
        x = self.ln(x) * (1 + scale) + shift
        out = self.lin("proj_out", x)
        out = out.reshape(b, H // 2, W // 2, 2, 2, ARCH.in_channels // 4)
        return out.permute(0, 1, 3, 2, 4, 5).reshape(b, H, W, ARCH.in_channels // 4)


def test_chroma_loss_curve_parity():
    from simpletuner_tpu.models.weight_import import chroma_params_from_diffusers
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(719)
    w = _fixture(rng)

    c = ARCH.in_channels // 4  # unpacked latent channels
    latents = rng.normal(0, 1, (BS, H, W, c)).astype(np.float32)
    txt = rng.normal(0, 1, (BS, 6, ARCH.txt_in_features)).astype(np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, H, W, c)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    cfg = TrainingConfig(
        {
            "model_family": "chroma", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
        }
    )
    model = Chroma(cfg)
    params = chroma_params_from_diffusers(w, model.arch)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    schedule = get_lr_schedule(cfg, STEPS)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step_fn = jax.jit(build_train_step(model, tx, schedule))

    ours = []
    for step in range(STEPS):
        batch = {
            "latents": jnp.asarray(latents),
            "t5_embeds": jnp.asarray(txt),
            "pooled_embeds": jnp.zeros((BS, ARCH.vec_in_features), jnp.float32),
            "override_noise": jnp.asarray(noises[step]),
            "override_sigmas": jnp.asarray(sigmas[step]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))

    torch.manual_seed(0)
    mirror = TorchChroma(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    ang = _axial_angles(txt.shape[1], H // 2, W // 2)
    lat_t = torch.from_numpy(latents)
    txt_t = torch.from_numpy(txt)

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step])
        sig = torch.from_numpy(sigmas[step])
        sb = sig.view(BS, 1, 1, 1)
        noisy = (1.0 - sb) * lat_t + sb * noise
        out = mirror(noisy, txt_t, sig, ang)
        loss = F.mse_loss(out, noise - lat_t)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
