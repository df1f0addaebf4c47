"""Loss-curve parity for the Wan video path (flow-matching video DiT).

The torch mirror reproduces the diffusers ``WanTransformer3DModel`` math at
the tiny arch: Conv3d (1,2,2) patch embed, gelu-tanh text projection, shared
6-way time modulation (``condition_embedder.time_proj``) added to per-block
``scale_shift_table``, qk RMS-norm over the full inner dim (eps 1e-6),
interleaved-pair 3-D RoPE over (t, h, w) with per-axis dims, ungated
cross-attention with an affine LayerNorm, gelu-tanh FFN, and the final
(2, dim) scale_shift_table head.  Same diffusers-layout starting weights (via
``wan_params_from_diffusers``), same per-step noise and flow sigmas
(``override_noise``/``override_sigmas``), same AdamW — the fp32 loss curves
must track (VERDICT r2 Next #8, video family)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.wan.model import Wan
from simpletuner_tpu.models.wan.transformer import WanConfig

pytestmark = pytest.mark.slow

ARCH = WanConfig.tiny()
D = ARCH.hidden_size
HEADS = ARCH.num_heads
HD = ARCH.head_dim
INNER = HEADS * HD
FFN = int(D * ARCH.ffn_ratio)
PT, PH, PW = ARCH.patch

STEPS = 30
BS = 2
T, H, W = 2, 8, 8  # latent video shape
LR = 1e-3
WD = 0.01


def _fixture(rng):
    """Diffusers-layout WanTransformer3DModel weights for the tiny arch."""
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.05, (out_f,)).astype(np.float32)

    w["patch_embedding.weight"] = rng.normal(
        0, 0.05, (D, ARCH.in_channels, PT, PH, PW)
    ).astype(np.float32)
    w["patch_embedding.bias"] = rng.normal(0, 0.05, (D,)).astype(np.float32)
    lin("condition_embedder.text_embedder.linear_1", D, ARCH.text_dim)
    lin("condition_embedder.text_embedder.linear_2", D, D)
    lin("condition_embedder.time_embedder.linear_1", D, 256)
    lin("condition_embedder.time_embedder.linear_2", D, D)
    lin("condition_embedder.time_proj", 6 * D, D)
    w["scale_shift_table"] = rng.normal(0, 0.2, (1, 2, D)).astype(np.float32)
    lin("proj_out", PT * PH * PW * ARCH.in_channels, D)
    for i in range(ARCH.depth):
        src = f"blocks.{i}"
        w[f"{src}.scale_shift_table"] = rng.normal(0, 0.2, (1, 6, D)).astype(np.float32)
        for p, kv in (("attn1", D), ("attn2", D)):
            lin(f"{src}.{p}.to_q", INNER, D)
            lin(f"{src}.{p}.to_k", INNER, kv if p == "attn1" else D)
            lin(f"{src}.{p}.to_v", INNER, kv if p == "attn1" else D)
            lin(f"{src}.{p}.to_out.0", D, INNER)
            w[f"{src}.{p}.norm_q.weight"] = rng.normal(1, 0.05, (INNER,)).astype(np.float32)
            w[f"{src}.{p}.norm_k.weight"] = rng.normal(1, 0.05, (INNER,)).astype(np.float32)
        w[f"{src}.norm2.weight"] = rng.normal(1, 0.05, (D,)).astype(np.float32)
        w[f"{src}.norm2.bias"] = rng.normal(0, 0.05, (D,)).astype(np.float32)
        lin(f"{src}.ffn.net.0.proj", FFN, D)
        lin(f"{src}.ffn.net.2", D, FFN)
    return w


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _rope_tables(tt, hh, ww):
    """Interleaved-pair axial rope tables (theta 1e4) over (t, h, w) ids:
    cos/sin (S, HD//2), per-axis dims ARCH.axes_dim."""
    ids = np.stack(
        np.meshgrid(np.arange(tt), np.arange(hh), np.arange(ww), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(ARCH.axes_dim):
        freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        angles = ids[:, axis : axis + 1].astype(np.float64) * freqs[None]
        cos_parts.append(np.cos(angles))
        sin_parts.append(np.sin(angles))
    return (_t(np.concatenate(cos_parts, -1)), _t(np.concatenate(sin_parts, -1)))


def _apply_rope(x, cos, sin):
    """x (B, S, HEADS, HD); cos/sin (S, HD//2); rotate interleaved pairs."""
    pairs = x.reshape(*x.shape[:-1], -1, 2)
    even, odd = pairs[..., 0], pairs[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    r_even = even * c - odd * s
    r_odd = even * s + odd * c
    return torch.stack([r_even, r_odd], dim=-1).reshape(x.shape)


class TorchWan(torch.nn.Module):
    """Trainable torch mirror of the diffusers WanTransformer3DModel math."""

    def __init__(self, w):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(torch.from_numpy(np.asarray(v)))
             for k, v in w.items()}
        )

    def g(self, name):
        return self.p[name.replace(".", "__")]

    def lin(self, name, x):
        key = f"{name}.bias".replace(".", "__")
        return F.linear(x, self.g(f"{name}.weight"), self.p.get(key))

    def rms(self, name, x):
        y = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + 1e-6)
        return y * self.g(f"{name}.weight")

    def forward(self, latents, sigmas, context, rope):
        b = latents.shape[0]
        # Conv3d patch embed on (B, C, T, H, W), flatten to (B, S, D)
        x = F.conv3d(latents, self.g("patch_embedding.weight"),
                     self.g("patch_embedding.bias"), stride=(PT, PH, PW))
        x = x.flatten(2).transpose(1, 2)
        seq = x.shape[1]

        txt = self.lin("condition_embedder.text_embedder.linear_1", context)
        txt = self.lin("condition_embedder.text_embedder.linear_2",
                       F.gelu(txt, approximate="tanh"))

        half = 128
        freqs = torch.exp(-torch.log(torch.tensor(10000.0)) * torch.arange(half) / half)
        args = (sigmas * 1000.0)[:, None] * freqs[None]
        tp = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        vec = self.lin("condition_embedder.time_embedder.linear_2",
                       F.silu(self.lin("condition_embedder.time_embedder.linear_1", tp)))
        e6 = self.lin("condition_embedder.time_proj", F.silu(vec)).view(b, 6, D)

        cos, sin = rope
        for i in range(ARCH.depth):
            src = f"blocks.{i}"
            mods = self.g(f"{src}.scale_shift_table") + e6  # (B, 6, D)
            m = [mods[:, j][:, None, :] for j in range(6)]

            x_n = F.layer_norm(x.float(), (D,), eps=1e-6) * (1 + m[1]) + m[0]
            q = self.rms(f"{src}.attn1.norm_q", self.lin(f"{src}.attn1.to_q", x_n))
            k = self.rms(f"{src}.attn1.norm_k", self.lin(f"{src}.attn1.to_k", x_n))
            v = self.lin(f"{src}.attn1.to_v", x_n)
            q = _apply_rope(q.view(b, seq, HEADS, HD), cos, sin).transpose(1, 2)
            k = _apply_rope(k.view(b, seq, HEADS, HD), cos, sin).transpose(1, 2)
            v = v.view(b, seq, HEADS, HD).transpose(1, 2)
            attn = F.scaled_dot_product_attention(q, k, v)
            attn = attn.transpose(1, 2).reshape(b, seq, INNER)
            x = x + m[2] * self.lin(f"{src}.attn1.to_out.0", attn)

            x_c = F.layer_norm(x.float(), (D,), self.g(f"{src}.norm2.weight"),
                               self.g(f"{src}.norm2.bias"), eps=1e-6)
            q = self.rms(f"{src}.attn2.norm_q", self.lin(f"{src}.attn2.to_q", x_c))
            k = self.rms(f"{src}.attn2.norm_k", self.lin(f"{src}.attn2.to_k", txt))
            v = self.lin(f"{src}.attn2.to_v", txt)
            lc = txt.shape[1]
            q = q.view(b, seq, HEADS, HD).transpose(1, 2)
            k = k.view(b, lc, HEADS, HD).transpose(1, 2)
            v = v.view(b, lc, HEADS, HD).transpose(1, 2)
            cross = F.scaled_dot_product_attention(q, k, v)
            cross = cross.transpose(1, 2).reshape(b, seq, INNER)
            x = x + self.lin(f"{src}.attn2.to_out.0", cross)

            x_f = F.layer_norm(x.float(), (D,), eps=1e-6) * (1 + m[4]) + m[3]
            h = self.lin(f"{src}.ffn.net.0.proj", x_f)
            x = x + m[5] * self.lin(f"{src}.ffn.net.2", F.gelu(h, approximate="tanh"))

        final = self.g("scale_shift_table") + vec[:, None]  # (B, 2, D)
        shift, scale = final[:, 0][:, None], final[:, 1][:, None]
        x = F.layer_norm(x.float(), (D,), eps=1e-6) * (1 + scale) + shift
        x = self.lin("proj_out", x)

        # unpatchify back to (B, C, T, H, W)
        tt, hh, ww = T // PT, H // PH, W // PW
        x = x.view(b, tt, hh, ww, PT, PH, PW, ARCH.in_channels)
        x = x.permute(0, 7, 1, 4, 2, 5, 3, 6).reshape(b, ARCH.in_channels, T, H, W)
        return x


def test_wan_loss_curve_parity():
    from simpletuner_tpu.models.weight_import import wan_params_from_diffusers
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(557)
    w = _fixture(rng)

    latents = rng.normal(0, 1, (BS, T, H, W, ARCH.in_channels)).astype(np.float32)
    text = rng.normal(0, 1, (BS, 9, ARCH.text_dim)).astype(np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, T, H, W, ARCH.in_channels)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    # ---- our framework ---------------------------------------------------------------
    cfg = TrainingConfig(
        {
            "model_family": "wan", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
        }
    )
    model = Wan(cfg)
    params = wan_params_from_diffusers(w, model.arch)
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
            "override_noise": jnp.asarray(noises[step]),
            "override_sigmas": jnp.asarray(sigmas[step]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))

    # ---- torch mirror ----------------------------------------------------------------
    torch.manual_seed(0)
    mirror = TorchWan(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    lat_t = torch.from_numpy(latents).permute(0, 4, 1, 2, 3)  # NCTHW
    txt_t = torch.from_numpy(text)
    rope = _rope_tables(T // PT, H // PH, W // PW)

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step]).permute(0, 4, 1, 2, 3)
        sig = torch.from_numpy(sigmas[step])
        sig_b = sig.view(BS, 1, 1, 1, 1)
        noisy = (1.0 - sig_b) * lat_t + sig_b * noise
        target = noise - lat_t
        pred = mirror(noisy, sig, txt_t, rope)
        loss = F.mse_loss(pred, target)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
