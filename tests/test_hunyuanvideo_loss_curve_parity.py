"""Loss-curve parity for HunyuanVideo 1.5 (video MMDiT; VERDICT r3 Next #10).

The torch mirror reproduces the vendored ``HunyuanVideo15Transformer3DModel``
math at the tiny arch (reference helpers/models/hunyuanvideo/transformer.py):
Conv3d(1,1,1) patch embed, Timesteps(flip_sin_to_cos, shift=0) + 2-layer
TimestepEmbedding, the Qwen token refiner (affine LNs, plain self-attention,
SiLU-gated AdaNorm residuals, pooled-text + time conditioning,
:376-470/:472-537), the ByT5 glyph projection (exact GELU, :572-589),
cond-type embeddings, dual-stream blocks (AdaLayerNormZero on both streams,
per-head RMS qk norms eps 1e-6, rope on video tokens only with theta 256 and
repeat-interleaved cos/sin, gelu-tanh FFNs, :609-726), and the
AdaLayerNormContinuous scale-first output head.

This is the first NUMERIC check of the hunyuanvideo family beyond
import-shape/finiteness: same diffusers-layout starting weights
(``hunyuanvideo_params_from_diffusers``), same per-step noise/sigmas, same
AdamW — fp32 flow-matching loss curves must track."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.hunyuanvideo.model import HunyuanVideo
from simpletuner_tpu.models.hunyuanvideo.transformer import HunyuanVideo15Config

from test_hunyuanvideo_import import _fixture  # diffusers-layout tiny fixture

pytestmark = pytest.mark.slow

ARCH = HunyuanVideo15Config.tiny()
D = ARCH.hidden_size
HEADS, HD = ARCH.num_heads, ARCH.head_dim
MLP = int(D * ARCH.mlp_ratio)

STEPS = 30
BS = 2
T, H, W = 2, 4, 4
L1, L2 = 6, 4  # qwen / byt5 token counts
LR = 1e-3
WD = 0.01


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _timesteps_proj(t_flat):
    """diffusers Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = 128
    freqs = torch.exp(-torch.log(torch.tensor(10000.0)) * torch.arange(half) / half)
    args = t_flat[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _rope_tables():
    cos_parts, sin_parts = [], []
    grids = np.meshgrid(
        np.arange(T, dtype=np.float64),
        np.arange(H, dtype=np.float64),
        np.arange(W, dtype=np.float64),
        indexing="ij",
    )
    for axis, dim in enumerate(ARCH.axes_dim):
        pos = grids[axis].reshape(-1)
        inv = 1.0 / (ARCH.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        freqs = np.outer(pos, inv)
        cos_parts.append(np.repeat(np.cos(freqs), 2, axis=1))
        sin_parts.append(np.repeat(np.sin(freqs), 2, axis=1))
    return _t(np.concatenate(cos_parts, 1)), _t(np.concatenate(sin_parts, 1))


def _rope(x, cos, sin):
    """x (B, S, HEADS, HD); interleaved-pair rotation (diffusers
    apply_rotary_emb default)."""
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    rotated = torch.stack([-x2, x1], dim=-1).reshape(x.shape)
    return x * c + rotated * s


class TorchHunyuan(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(torch.from_numpy(np.asarray(v)))
             for k, v in w.items()}
        )

    def g(self, name):
        return self.p[name.replace(".", "__")]

    def lin(self, name, x):
        return F.linear(x, self.g(f"{name}.weight"),
                        self.p.get(f"{name}.bias".replace(".", "__")))

    def ln_affine(self, name, x, feats):
        return F.layer_norm(x.float(), (feats,), self.g(f"{name}.weight"),
                            self.g(f"{name}.bias"), eps=1e-6)

    def mlp_embed(self, prefix, x):
        return self.lin(f"{prefix}.linear_2", F.silu(self.lin(f"{prefix}.linear_1", x)))

    def rms_head(self, name, x):
        """Per-head RMS over HD with trainable scale (qk_norm='rms_norm')."""
        y = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + 1e-6)
        return y * self.g(f"{name}.weight")

    def refiner(self, text, t1000):
        b, seq, _ = text.shape
        pooled = text.mean(dim=1)
        temb = self.mlp_embed("context_embedder.time_text_embed.timestep_embedder",
                              _timesteps_proj(t1000))
        temb = temb + self.mlp_embed("context_embedder.time_text_embed.text_embedder", pooled)
        x = self.lin("context_embedder.proj_in", text)
        for i in range(ARCH.refiner_depth):
            src = f"context_embedder.token_refiner.refiner_blocks.{i}"
            gates = self.lin(f"{src}.norm_out.linear", F.silu(temb))
            gate_msa, gate_mlp = torch.chunk(gates, 2, dim=-1)
            x_n = self.ln_affine(f"{src}.norm1", x, D)
            q = self.lin(f"{src}.attn.to_q", x_n).view(b, seq, HEADS, HD).transpose(1, 2)
            k = self.lin(f"{src}.attn.to_k", x_n).view(b, seq, HEADS, HD).transpose(1, 2)
            v = self.lin(f"{src}.attn.to_v", x_n).view(b, seq, HEADS, HD).transpose(1, 2)
            attn = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, seq, D)
            x = x + gate_msa[:, None] * self.lin(f"{src}.attn.to_out.0", attn)
            h = self.lin(f"{src}.ff.net.0.proj", self.ln_affine(f"{src}.norm2", x, D))
            x = x + gate_mlp[:, None] * self.lin(f"{src}.ff.net.2", F.silu(h))
        return x

    def forward(self, latents, sigmas, text, text_2, rope):
        b = latents.shape[0]
        t1000 = sigmas * 1000.0
        seq_v = T * H * W

        x = F.linear(
            latents.reshape(b, seq_v, ARCH.in_channels),
            self.g("x_embedder.proj.weight").view(D, ARCH.in_channels),
            self.g("x_embedder.proj.bias"),
        )
        temb = self.mlp_embed("time_embed.timestep_embedder", _timesteps_proj(t1000))

        cond_type = self.g("cond_type_embed.weight")
        txt = self.refiner(text, t1000) + cond_type[0]
        t2 = self.ln_affine("context_embedder_2.norm", text_2, ARCH.text2_dim)
        t2 = F.gelu(self.lin("context_embedder_2.linear_1", t2))
        t2 = F.gelu(self.lin("context_embedder_2.linear_2", t2))
        t2 = self.lin("context_embedder_2.linear_3", t2) + cond_type[1]
        txt_all = torch.cat([txt, t2], dim=1)
        seq_t = txt_all.shape[1]

        cos, sin = rope
        ln = lambda x: F.layer_norm(x.float(), (D,), eps=1e-6)
        for i in range(ARCH.depth):
            src = f"transformer_blocks.{i}"
            i_mods = torch.chunk(self.lin(f"{src}.norm1.linear", F.silu(temb)), 6, dim=-1)
            t_mods = torch.chunk(self.lin(f"{src}.norm1_context.linear", F.silu(temb)), 6, dim=-1)
            img_n = ln(x) * (1 + i_mods[1][:, None]) + i_mods[0][:, None]
            txt_n = ln(txt_all) * (1 + t_mods[1][:, None]) + t_mods[0][:, None]

            iq = self.rms_head(f"{src}.attn.norm_q",
                               self.lin(f"{src}.attn.to_q", img_n).view(b, seq_v, HEADS, HD))
            ik = self.rms_head(f"{src}.attn.norm_k",
                               self.lin(f"{src}.attn.to_k", img_n).view(b, seq_v, HEADS, HD))
            iv = self.lin(f"{src}.attn.to_v", img_n).view(b, seq_v, HEADS, HD)
            iq, ik = _rope(iq, cos, sin), _rope(ik, cos, sin)
            tq = self.rms_head(f"{src}.attn.norm_added_q",
                               self.lin(f"{src}.attn.add_q_proj", txt_n).view(b, seq_t, HEADS, HD))
            tk = self.rms_head(f"{src}.attn.norm_added_k",
                               self.lin(f"{src}.attn.add_k_proj", txt_n).view(b, seq_t, HEADS, HD))
            tv = self.lin(f"{src}.attn.add_v_proj", txt_n).view(b, seq_t, HEADS, HD)

            q = torch.cat([iq, tq], dim=1).transpose(1, 2)
            k = torch.cat([ik, tk], dim=1).transpose(1, 2)
            v = torch.cat([iv, tv], dim=1).transpose(1, 2)
            attn = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, -1, D)
            img_a, txt_a = attn[:, :seq_v], attn[:, seq_v:]

            x = x + i_mods[2][:, None] * self.lin(f"{src}.attn.to_out.0", img_a)
            txt_all = txt_all + t_mods[2][:, None] * self.lin(f"{src}.attn.to_add_out", txt_a)

            img_m = ln(x) * (1 + i_mods[4][:, None]) + i_mods[3][:, None]
            h = self.lin(f"{src}.ff.net.0.proj", img_m)
            x = x + i_mods[5][:, None] * self.lin(f"{src}.ff.net.2",
                                                  F.gelu(h, approximate="tanh"))
            txt_m = ln(txt_all) * (1 + t_mods[4][:, None]) + t_mods[3][:, None]
            h = self.lin(f"{src}.ff_context.net.0.proj", txt_m)
            txt_all = txt_all + t_mods[5][:, None] * self.lin(f"{src}.ff_context.net.2",
                                                              F.gelu(h, approximate="tanh"))

        final = self.lin("norm_out.linear", F.silu(temb))
        scale, shift = torch.chunk(final, 2, dim=-1)  # scale FIRST (AdaLNContinuous)
        x = ln(x) * (1 + scale[:, None]) + shift[:, None]
        x = self.lin("proj_out", x)
        return x.reshape(b, T, H, W, ARCH.out_channels)


def test_hunyuanvideo_loss_curve_parity():
    from simpletuner_tpu.models.weight_import import hunyuanvideo_params_from_diffusers
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(733)
    w = _fixture(rng)

    latents = rng.normal(0, 1, (BS, T, H, W, ARCH.out_channels)).astype(np.float32)
    text = rng.normal(0, 1, (BS, L1, ARCH.text_dim)).astype(np.float32)
    text_2 = rng.normal(0, 1, (BS, L2, ARCH.text2_dim)).astype(np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, T, H, W, ARCH.out_channels)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    # ---- our framework ---------------------------------------------------------------
    cfg = TrainingConfig(
        {
            "model_family": "hunyuanvideo", "model_type": "full",
            "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
        }
    )
    model = HunyuanVideo(cfg)
    params = hunyuanvideo_params_from_diffusers(w, model.arch)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    schedule = get_lr_schedule(cfg, STEPS)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step_fn = jax.jit(build_train_step(model, tx, schedule))

    ours = []
    for step in range(STEPS):
        batch = {
            "latents": jnp.asarray(latents),
            "text_embeds": jnp.asarray(text),
            "text_embeds_2": jnp.asarray(text_2),
            "override_noise": jnp.asarray(noises[step]),
            "override_sigmas": jnp.asarray(sigmas[step]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))

    # ---- torch mirror ----------------------------------------------------------------
    torch.manual_seed(0)
    mirror = TorchHunyuan(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    lat_t = torch.from_numpy(latents)
    rope = _rope_tables()

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step])
        sig = torch.from_numpy(sigmas[step])
        sig_b = sig.view(BS, 1, 1, 1, 1)
        noisy = (1.0 - sig_b) * lat_t + sig_b * noise
        target = noise - lat_t
        pred = mirror(noisy, sig, torch.from_numpy(text), torch.from_numpy(text_2), rope)
        loss = F.mse_loss(pred, target)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    # learning check on the SAME (noise, sigma) as step 0: per-step losses are
    # not monotone because each step draws a fresh sigma
    batch0 = {
        "latents": jnp.asarray(latents),
        "text_embeds": jnp.asarray(text),
        "text_embeds_2": jnp.asarray(text_2),
        "override_noise": jnp.asarray(noises[0]),
        "override_sigmas": jnp.asarray(sigmas[0]),
    }
    _, metrics0 = step_fn(state, batch0, jax.random.PRNGKey(0))
    assert float(metrics0["loss"]) < ours[0]
