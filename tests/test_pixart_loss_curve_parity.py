"""Loss-curve parity for the PixArt path (adaLN-single + cross-attention DiT,
epsilon prediction on the IDDPM linear beta schedule).

Companion to the flux/sd3/sd1x/sdxl harnesses: a trainable torch mirror of the
diffusers ``PixArtTransformer2DModel`` math (BasicTransformerBlock with
``ada_norm_single``) runs the same tiny fine-tune — identical diffusers-layout
starting weights (through ``pixart_params_from_diffusers``), identical
per-step noise and DDPM timesteps, identical AdamW.  The mirror independently
re-implements diffusers' ``get_2d_sincos_pos_embed`` (base_size /
interpolation_scale semantics), the shared 6·dim modulation + per-block
``scale_shift_table``, ungated cross-attention on the raw stream, the
shift-first final table, and the learned-range epsilon slice — so curve parity
pins each of those conventions, plus the family's linear 1e-4→0.02 betas
(reference loads the hub scheduler config, common.py:4270)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.pixart.model import PixartSigma
from simpletuner_tpu.models.pixart.transformer import PixartConfig

pytestmark = pytest.mark.slow

ARCH = PixartConfig(
    hidden_size=64, depth=2, num_heads=2, head_dim=32, text_dim=32,
    base_size=8, interpolation_scale=1, out_channels=8,  # learned-range head
)
D = ARCH.hidden_size
HEADS = ARCH.num_heads
HD = ARCH.head_dim
INNER = HEADS * HD
LAT_C = ARCH.in_channels  # 4
OUT_C = ARCH.effective_out_channels  # 8
P = ARCH.patch_size
MLP = int(D * ARCH.ffn_ratio)

STEPS = 30
BS = 2
H = W = 8  # latent dims -> 4x4 = 16 tokens
TXT = 5
LR = 1e-3
WD = 0.01


def _fixture(rng):
    """Diffusers-layout PixArtTransformer2DModel weights for the tiny arch."""
    w = {}

    def lin(name, out_f, in_f):
        w[f"{name}.weight"] = rng.normal(0, 0.05, (out_f, in_f)).astype(np.float32)
        w[f"{name}.bias"] = rng.normal(0, 0.05, (out_f,)).astype(np.float32)

    w["pos_embed.proj.weight"] = rng.normal(0, 0.05, (D, LAT_C, P, P)).astype(np.float32)
    w["pos_embed.proj.bias"] = rng.normal(0, 0.05, (D,)).astype(np.float32)
    lin("caption_projection.linear_1", D, ARCH.text_dim)
    lin("caption_projection.linear_2", D, D)
    lin("adaln_single.emb.timestep_embedder.linear_1", D, 256)
    lin("adaln_single.emb.timestep_embedder.linear_2", D, D)
    lin("adaln_single.linear", 6 * D, D)
    w["scale_shift_table"] = rng.normal(0, 0.1, (2, D)).astype(np.float32)
    lin("proj_out", P * P * OUT_C, D)
    for i in range(ARCH.depth):
        p = f"transformer_blocks.{i}"
        w[f"{p}.scale_shift_table"] = rng.normal(0, 0.1, (6, D)).astype(np.float32)
        # cross-attn k/v read the projected caption stream (dim D), not raw text
        for attn in ("attn1", "attn2"):
            lin(f"{p}.{attn}.to_q", INNER, D)
            lin(f"{p}.{attn}.to_k", INNER, D)
            lin(f"{p}.{attn}.to_v", INNER, D)
            lin(f"{p}.{attn}.to_out.0", D, INNER)
        lin(f"{p}.ff.net.0.proj", MLP, D)
        lin(f"{p}.ff.net.2", D, MLP)
    return w


def _diffusers_sincos(dim, hh, ww, base_size, interpolation_scale):
    """Independent re-implementation of diffusers get_2d_sincos_pos_embed."""
    grid_h = np.arange(hh, dtype=np.float64) / (hh / base_size) / interpolation_scale
    grid_w = np.arange(ww, dtype=np.float64) / (ww / base_size) / interpolation_scale
    mesh = np.meshgrid(grid_w, grid_h)  # 'xy': mesh[0] = w coords, (hh, ww)
    grid = np.stack(mesh, axis=0).reshape(2, -1)

    def one_d(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([one_d(dim // 2, grid[0]), one_d(dim // 2, grid[1])], axis=1)
    return emb.astype(np.float32)  # (hh*ww, dim)


class TorchPixart(torch.nn.Module):
    """Trainable torch mirror of the diffusers PixArtTransformer2DModel math."""

    def __init__(self, w):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(torch.from_numpy(np.asarray(v)))
             for k, v in w.items()}
        )
        self.register_buffer(
            "pos", torch.from_numpy(
                _diffusers_sincos(D, H // P, W // P, ARCH.base_size,
                                  ARCH.interpolation_scale)))

    def g(self, name):
        return self.p[name.replace(".", "__")]

    def lin(self, name, x):
        return F.linear(x, self.g(f"{name}.weight"), self.g(f"{name}.bias"))

    @staticmethod
    def sinusoid(values, dim=256):
        import math

        half = dim // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
        args = values.float()[:, None] * freqs[None]  # factor 1.0: integer timesteps
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    @staticmethod
    def ln(a):
        return F.layer_norm(a, (D,), eps=1e-6)

    def attn(self, p, name, q_in, kv_in):
        b = q_in.shape[0]
        q = self.lin(f"{p}.{name}.to_q", q_in).view(b, -1, HEADS, HD).transpose(1, 2)
        k = self.lin(f"{p}.{name}.to_k", kv_in).view(b, -1, HEADS, HD).transpose(1, 2)
        v = self.lin(f"{p}.{name}.to_v", kv_in).view(b, -1, HEADS, HD).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, -1, INNER)
        return self.lin(f"{p}.{name}.to_out.0", out)

    def forward(self, noisy, context, timesteps):
        b = noisy.shape[0]
        x = F.conv2d(noisy, self.g("pos_embed.proj.weight"),
                     self.g("pos_embed.proj.bias"), stride=P)
        x = x.flatten(2).transpose(1, 2) + self.pos[None]

        txt = self.lin("caption_projection.linear_2",
                       F.gelu(self.lin("caption_projection.linear_1", context),
                              approximate="tanh"))

        emb = self.lin("adaln_single.emb.timestep_embedder.linear_2",
                       F.silu(self.lin("adaln_single.emb.timestep_embedder.linear_1",
                                       self.sinusoid(timesteps))))
        t6 = self.lin("adaln_single.linear", F.silu(emb)).view(b, 6, D)

        for i in range(ARCH.depth):
            p = f"transformer_blocks.{i}"
            mods = self.g(f"{p}.scale_shift_table")[None] + t6  # (B, 6, D)
            sh1, sc1, g1, sh2, sc2, g2 = (mods[:, j][:, None] for j in range(6))
            x_n = self.ln(x) * (1 + sc1) + sh1
            x = x + g1 * self.attn(p, "attn1", x_n, x_n)
            # cross-attention on the raw stream, ungated (ada_norm_single)
            x = x + self.attn(p, "attn2", x, txt)
            x_n = self.ln(x) * (1 + sc2) + sh2
            x = x + g2 * self.lin(
                f"{p}.ff.net.2", F.gelu(self.lin(f"{p}.ff.net.0.proj", x_n),
                                        approximate="tanh"))

        final = self.g("scale_shift_table")[None] + emb[:, None]  # (B, 2, D)
        shift, scale = final[:, 0][:, None], final[:, 1][:, None]  # shift-first
        x = self.ln(x) * (1 + scale) + shift
        x = self.lin("proj_out", x)
        hh = H // P
        x = x.view(b, hh, hh, P, P, OUT_C)
        x = x.permute(0, 5, 1, 3, 2, 4).reshape(b, OUT_C, H, W)
        return x[:, :LAT_C]  # epsilon half of the learned-range head


def _alphas_cumprod_linear():
    betas = np.linspace(0.0001, 0.02, 1000, dtype=np.float64)
    return np.cumprod(1.0 - betas).astype(np.float32)


def test_pixart_loss_curve_parity(tmp_path):
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.weight_import import load_transformer_params
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(947)
    w = _fixture(rng)
    path = tmp_path / "pixart.safetensors"
    save_file(w, str(path))

    latents = rng.normal(0, 1, (BS, H, W, LAT_C)).astype(np.float32)  # NHWC
    context = rng.normal(0, 1, (BS, TXT, ARCH.text_dim)).astype(np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, H, W, LAT_C)).astype(np.float32)
    timesteps = rng.integers(0, 1000, (STEPS, BS)).astype(np.int32)

    # ---- our framework ---------------------------------------------------------------
    cfg = TrainingConfig(
        {
            "model_family": "pixart_sigma", "model_type": "full",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
        }
    )
    model = PixartSigma(cfg, arch=ARCH)
    variables = load_transformer_params(model, str(path))
    schedule = get_lr_schedule(cfg, STEPS)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step_fn = jax.jit(build_train_step(model, tx, schedule))

    ours = []
    base_batch = {
        "latents": jnp.asarray(latents),
        "text_embeds": jnp.asarray(context),
    }
    for step in range(STEPS):
        batch = dict(base_batch)
        batch["override_noise"] = jnp.asarray(noises[step])
        batch["override_timesteps"] = jnp.asarray(timesteps[step])
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))

    # ---- torch mirror ----------------------------------------------------------------
    torch.manual_seed(0)
    mirror = TorchPixart(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    lat_t = torch.from_numpy(latents).permute(0, 3, 1, 2)  # NCHW
    ctx_t = torch.from_numpy(context)
    ac = _alphas_cumprod_linear()

    theirs = []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step]).permute(0, 3, 1, 2)
        t = torch.from_numpy(timesteps[step])
        a = torch.from_numpy(ac[timesteps[step]]).view(BS, 1, 1, 1)
        noisy = a.sqrt() * lat_t + (1 - a).sqrt() * noise
        pred = mirror(noisy, ctx_t, t)
        loss = F.mse_loss(pred, noise)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
