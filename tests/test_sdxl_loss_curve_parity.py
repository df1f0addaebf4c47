"""Loss-curve parity for the SDXL path (epsilon UNet + text_time micro-conditioning).

Companion to ``test_sd1x_loss_curve_parity.py`` on the ``tiny_xl`` arch: the
torch mirror reproduces the diffusers ``UNet2DConditionModel`` math INCLUDING
the SDXL ``add_embedding`` branch — ``add_embeds = concat(pooled_text,
fourier(time_ids))`` in diffusers ``get_aug_embed`` order (text first), which
the pretrained ``add_embedding.linear_1`` column layout depends on.  Same
starting weights (via ``unet_params_from_diffusers``), same per-step noise and
DDPM timesteps, same AdamW.  This is the north-star-config family's curve
check (VERDICT r2 Next #8)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.sdxl.model import SDXL
from simpletuner_tpu.models.unet import UNetConfig

pytestmark = pytest.mark.slow

ARCH = UNetConfig.tiny_xl()
C0, C1 = ARCH.block_out_channels  # 32, 64
TIME_DIM = C0 * 4
HD = ARCH.attention_head_dim
CTX = ARCH.cross_attention_dim  # 96
GROUPS = ARCH.norm_groups
ADD_TIME_DIM = ARCH.addition_time_embed_dim  # 8
POOLED = ARCH.addition_embed_dim - 6 * ADD_TIME_DIM  # 64

STEPS = 30
BS = 2
H = W = 8
LR = 1e-3
WD = 0.01


def _fixture(rng):
    """Diffusers-layout SDXL-style UNet weights for the tiny_xl arch."""
    w = {}

    def lin(name, out_f, in_f, bias=True):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)
        if bias:
            w[f"{name}.bias"] = rng.normal(0, 0.05, (out_f,)).astype(np.float32)

    def conv(name, out_c, in_c, k=3):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_c, in_c, k, k)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.05, (out_c,)).astype(np.float32)

    def norm(name, c):
        w[f"{name}.weight"] = rng.normal(1, 0.05, (c,)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.05, (c,)).astype(np.float32)

    def resnet(name, in_c, out_c):
        norm(f"{name}.norm1", in_c)
        conv(f"{name}.conv1", out_c, in_c)
        lin(f"{name}.time_emb_proj", out_c, TIME_DIM)
        norm(f"{name}.norm2", out_c)
        conv(f"{name}.conv2", out_c, out_c)
        if in_c != out_c:
            conv(f"{name}.conv_shortcut", out_c, in_c, k=1)

    def spatial(name, c):
        norm(f"{name}.norm", c)
        lin(f"{name}.proj_in", c, c)
        lin(f"{name}.proj_out", c, c)
        p = f"{name}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{p}.{n}", c)
        for attn, kv in (("attn1", c), ("attn2", CTX)):
            lin(f"{p}.{attn}.to_q", c, c, bias=False)
            lin(f"{p}.{attn}.to_k", c, kv, bias=False)
            lin(f"{p}.{attn}.to_v", c, kv, bias=False)
            lin(f"{p}.{attn}.to_out.0", c, c)
        lin(f"{p}.ff.net.0.proj", c * 8, c)
        lin(f"{p}.ff.net.2", c, c * 4)

    conv("conv_in", C0, ARCH.in_channels)
    lin("time_embedding.linear_1", TIME_DIM, C0)
    lin("time_embedding.linear_2", TIME_DIM, TIME_DIM)
    lin("add_embedding.linear_1", TIME_DIM, ARCH.addition_embed_dim)
    lin("add_embedding.linear_2", TIME_DIM, TIME_DIM)
    resnet("down_blocks.0.resnets.0", C0, C0)
    spatial("down_blocks.0.attentions.0", C0)
    conv("down_blocks.0.downsamplers.0.conv", C0, C0)
    resnet("down_blocks.1.resnets.0", C0, C1)
    spatial("down_blocks.1.attentions.0", C1)
    resnet("mid_block.resnets.0", C1, C1)
    spatial("mid_block.attentions.0", C1)
    resnet("mid_block.resnets.1", C1, C1)
    resnet("up_blocks.0.resnets.0", C1 + C1, C1)
    spatial("up_blocks.0.attentions.0", C1)
    resnet("up_blocks.0.resnets.1", C1 + C0, C1)
    spatial("up_blocks.0.attentions.1", C1)
    conv("up_blocks.0.upsamplers.0.conv", C1, C1)
    resnet("up_blocks.1.resnets.0", C1 + C0, C0)
    spatial("up_blocks.1.attentions.0", C0)
    resnet("up_blocks.1.resnets.1", C0 + C0, C0)
    spatial("up_blocks.1.attentions.1", C0)
    norm("conv_norm_out", C0)
    conv("conv_out", ARCH.out_channels, C0)
    return w


def _fourier(timesteps, dim):
    """diffusers Timesteps(flip_sin_to_cos=True, freq_shift=0): cat(cos, sin)."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = timesteps.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TorchSDXLUNet(torch.nn.Module):
    """Trainable torch mirror of the diffusers SDXL UNet2DConditionModel math
    at the tiny_xl config (attention at both levels, 1 transformer layer)."""

    def __init__(self, w):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(torch.from_numpy(np.asarray(v)))
             for k, v in w.items()}
        )

    def _g(self, name, suffix):
        return self.p[f"{name}.{suffix}".replace(".", "__")]

    def lin(self, name, x):
        key = f"{name}.bias".replace(".", "__")
        return F.linear(x, self._g(name, "weight"), self.p[key] if key in self.p else None)

    def conv(self, name, x, stride=1, padding=1):
        return F.conv2d(x, self._g(name, "weight"), self._g(name, "bias"),
                        stride=stride, padding=padding)

    def gn(self, name, x, eps):
        groups = GROUPS if x.shape[1] % GROUPS == 0 else 1
        return F.group_norm(x, groups, self._g(name, "weight"), self._g(name, "bias"), eps)

    def ln(self, name, x):
        return F.layer_norm(x, (x.shape[-1],), self._g(name, "weight"),
                            self._g(name, "bias"), eps=1e-5)

    def resnet(self, name, x, temb):
        h = self.conv(f"{name}.conv1", F.silu(self.gn(f"{name}.norm1", x, 1e-5)))
        h = h + self.lin(f"{name}.time_emb_proj", F.silu(temb))[:, :, None, None]
        h = self.conv(f"{name}.conv2", F.silu(self.gn(f"{name}.norm2", h, 1e-5)))
        key = f"{name}.conv_shortcut.weight".replace(".", "__")
        if key in self.p:
            x = self.conv(f"{name}.conv_shortcut", x, padding=0)
        return x + h

    def attn(self, name, x, ctx):
        c = x.shape[-1]
        heads = c // HD
        b, s = x.shape[:2]
        q = self.lin(f"{name}.to_q", x).view(b, s, heads, HD).transpose(1, 2)
        k = self.lin(f"{name}.to_k", ctx).view(b, ctx.shape[1], heads, HD).transpose(1, 2)
        v = self.lin(f"{name}.to_v", ctx).view(b, ctx.shape[1], heads, HD).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, s, c)
        return self.lin(f"{name}.to_out.0", out)

    def spatial(self, name, x, context):
        b, c, hh, ww = x.shape
        residual = x
        h = self.gn(f"{name}.norm", x, 1e-6)
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = self.lin(f"{name}.proj_in", h)
        p = f"{name}.transformer_blocks.0"
        h = h + self.attn(f"{p}.attn1", self.ln(f"{p}.norm1", h), self.ln(f"{p}.norm1", h))
        h = h + self.attn(f"{p}.attn2", self.ln(f"{p}.norm2", h), context)
        g = self.lin(f"{p}.ff.net.0.proj", self.ln(f"{p}.norm3", h))
        a, bgate = g.chunk(2, dim=-1)
        h = h + self.lin(f"{p}.ff.net.2", a * F.gelu(bgate))
        h = self.lin(f"{name}.proj_out", h)
        return residual + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)

    def forward(self, sample, timesteps, context, pooled, time_ids):
        temb = _fourier(timesteps, C0)
        temb = self.lin("time_embedding.linear_2",
                        F.silu(self.lin("time_embedding.linear_1", temb)))
        # SDXL text_time micro-conditioning: diffusers get_aug_embed order —
        # pooled text FIRST, then the flattened time-id fourier embeddings
        time_embeds = _fourier(time_ids.reshape(-1), ADD_TIME_DIM).reshape(pooled.shape[0], -1)
        add_embeds = torch.cat([pooled, time_embeds], dim=-1)
        aug = self.lin("add_embedding.linear_2",
                       F.silu(self.lin("add_embedding.linear_1", add_embeds)))
        temb = temb + aug

        x = self.conv("conv_in", sample)
        skips = [x]
        x = self.resnet("down_blocks.0.resnets.0", x, temb)
        x = self.spatial("down_blocks.0.attentions.0", x, context)
        skips.append(x)
        x = self.conv("down_blocks.0.downsamplers.0.conv", x, stride=2)
        skips.append(x)
        x = self.resnet("down_blocks.1.resnets.0", x, temb)
        x = self.spatial("down_blocks.1.attentions.0", x, context)
        skips.append(x)

        x = self.resnet("mid_block.resnets.0", x, temb)
        x = self.spatial("mid_block.attentions.0", x, context)
        x = self.resnet("mid_block.resnets.1", x, temb)

        for u, resnets in (("up_blocks.0", 2), ("up_blocks.1", 2)):
            for j in range(resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = self.resnet(f"{u}.resnets.{j}", x, temb)
                x = self.spatial(f"{u}.attentions.{j}", x, context)
            if u == "up_blocks.0":
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                x = self.conv(f"{u}.upsamplers.0.conv", x)

        x = F.silu(self.gn("conv_norm_out", x, 1e-5))
        return self.conv("conv_out", x)


def _alphas_cumprod():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas).astype(np.float32)


def test_sdxl_loss_curve_parity():
    from simpletuner_tpu.models.weight_import import unet_params_from_diffusers
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(733)
    w = _fixture(rng)

    latents = rng.normal(0, 1, (BS, H, W, ARCH.in_channels)).astype(np.float32)  # NHWC
    text = rng.normal(0, 1, (BS, 7, CTX)).astype(np.float32)
    pooled = rng.normal(0, 1, (BS, POOLED)).astype(np.float32)
    time_ids = np.tile(
        np.asarray([[64.0, 64.0, 0.0, 0.0, 64.0, 64.0]], np.float32), (BS, 1)
    )
    noises = rng.normal(0, 1, (STEPS, BS, H, W, ARCH.in_channels)).astype(np.float32)
    timesteps = rng.integers(0, 1000, (STEPS, BS)).astype(np.int32)

    # ---- our framework ---------------------------------------------------------------
    cfg = TrainingConfig(
        {
            "model_family": "sdxl", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
        }
    )
    model = SDXL(cfg)
    params = unet_params_from_diffusers(w, model.arch)
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
            "pooled_embeds": jnp.asarray(pooled),
            "time_ids": jnp.asarray(time_ids),
            "override_noise": jnp.asarray(noises[step]),
            "override_timesteps": jnp.asarray(timesteps[step]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))

    # ---- torch mirror ----------------------------------------------------------------
    torch.manual_seed(0)
    mirror = TorchSDXLUNet(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    ac = _alphas_cumprod()
    lat_t = torch.from_numpy(latents).permute(0, 3, 1, 2)
    txt_t = torch.from_numpy(text)
    pool_t = torch.from_numpy(pooled)
    ids_t = torch.from_numpy(time_ids)

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step]).permute(0, 3, 1, 2)
        t = torch.from_numpy(timesteps[step]).long()
        a = torch.from_numpy(ac[timesteps[step]]).view(BS, 1, 1, 1)
        noisy = a.sqrt() * lat_t + (1 - a).sqrt() * noise
        pred = mirror(noisy, t, txt_t, pool_t, ids_t)
        loss = F.mse_loss(pred, noise)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    # step-0 parity = forward parity of imported weights incl. add_embedding order
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
