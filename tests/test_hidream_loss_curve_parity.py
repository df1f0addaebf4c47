"""Loss-curve parity for HiDream-I1 (MoE MMDiT; VERDICT r3 Next #10).

The torch mirror reproduces the vendored ``HiDreamImageTransformer2DModel``
math at the tiny arch (reference helpers/models/hidream/transformer.py):
[image, text] joint attention with full-width RMS q/k norms and flux-style
axial RoPE, per-block llama text segments, DeepSeek MoE with un-normalized
top-k gate scores + shared expert, 12/6-way adaLN, final shift/scale head,
inverted-velocity prediction (reference model.py:631).

The novel bit vs the other six parity harnesses is the **MoE gate
load-balancing aux loss** (reference MoEGate:606-624 ``aux_loss``, joined via
--hidream_use_load_balancing_loss × --hidream_load_balancing_loss_weight):
aux = Σ_e mean_tokens(score_e) · E·count_e/(B·S·k), averaged over MoE blocks.
Same diffusers-layout starting weights (``hidream_params_from_diffusers``),
same per-step noise/sigmas, same AdamW — fp32 total-loss curves must track,
including the aux term's gradient through the gate softmax."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.hidream.model import HiDream
from simpletuner_tpu.models.hidream.transformer import HiDreamConfig

from test_hidream_import import _fixture  # diffusers-layout tiny fixture

pytestmark = pytest.mark.slow

ARCH = HiDreamConfig.tiny()
N_BLOCKS = ARCH.depth_double + ARCH.depth_single
N_SEL = 2
D = ARCH.hidden_size
HEADS, HD = ARCH.num_heads, ARCH.head_dim
INNER = HEADS * HD
P = ARCH.patch_size

STEPS = 30
BS = 2
H = W = 8  # latent pixels
AUX_W = 0.02
LR = 1e-3
WD = 0.01


def _rope_angles(hh, ww, txt_len):
    rows = np.repeat(np.arange(hh), ww)
    cols = np.tile(np.arange(ww), hh)
    img_ids = np.stack([np.zeros_like(rows), rows, cols], axis=-1).astype(np.float64)
    ids = np.concatenate([img_ids, np.zeros((txt_len, 3))], axis=0)
    parts = []
    for i, dax in enumerate(ARCH.axes_dim):
        freqs = 1.0 / ARCH.rope_theta ** (np.arange(0, dax, 2, dtype=np.float64) / dax)
        parts.append(ids[:, i : i + 1] * freqs[None])
    ang = np.concatenate(parts, axis=-1)  # (S, HD/2)
    return torch.from_numpy(np.cos(ang).astype(np.float32)), torch.from_numpy(
        np.sin(ang).astype(np.float32)
    )


def _rope(x, cos, sin):
    # consecutive-pair rotation (flux convention), x (B, S, HEADS, HD)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    x0, x1 = x[..., 0::2], x[..., 1::2]
    return torch.stack([x0 * c - x1 * s, x0 * s + x1 * c], dim=-1).reshape(x.shape)


class TorchHiDream(torch.nn.Module):
    """Trainable torch mirror of the HiDream tiny arch (same math as the
    numpy oracle in test_hidream_import, plus the gate aux loss)."""

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

    def rms_full(self, name, x):
        y = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + 1e-5)
        return y * self.g(f"{name}.weight")

    def ffn(self, src, x):
        return F.linear(F.silu(self.lin(f"{src}.w1", x)) * self.lin(f"{src}.w3", x),
                        self.g(f"{src}.w2.weight"))

    def moe(self, src, x):
        b, s, d = x.shape
        flat = x.reshape(-1, d)
        scores = F.softmax(flat.float() @ self.g(f"{src}.gate.weight").T, dim=-1)
        top_vals, _ = torch.topk(scores, ARCH.top_k, dim=-1)
        mask = (scores >= top_vals[..., -1:]).float()  # comparison: no grad path
        routed = scores * mask  # raw scores, no renorm (norm_topk_prob=False)
        # gate aux (reference MoEGate:606-624)
        E = ARCH.num_experts
        scores_mean = scores.mean(dim=0)
        ce = mask.sum(dim=0) / (b * s * ARCH.top_k)
        aux = torch.sum(scores_mean * ce * E)

        out = torch.zeros_like(flat)
        for e in range(E):
            out = out + self.ffn(f"{src}.experts.{e}", flat) * routed[:, e : e + 1]
        out = out + self.ffn(f"{src}.shared_experts", flat)
        return out.reshape(b, s, d), aux

    def attn(self, src, img_n, txt_n, cos, sin):
        b = img_n.shape[0]

        def proj(x, suffix=""):
            q = self.rms_full(f"{src}.q_rms_norm{suffix}",
                              self.lin(f"{src}.to_q{suffix}", x))
            k = self.rms_full(f"{src}.k_rms_norm{suffix}",
                              self.lin(f"{src}.to_k{suffix}", x))
            v = self.lin(f"{src}.to_v{suffix}", x)
            to_h = lambda a: a.view(b, -1, HEADS, HD)
            return to_h(q), to_h(k), to_h(v)

        if txt_n is not None:
            qi, ki, vi = proj(img_n)
            qt, kt, vt = proj(txt_n, "_t")
            q = torch.cat([qi, qt], dim=1)
            k = torch.cat([ki, kt], dim=1)
            v = torch.cat([vi, vt], dim=1)
        else:
            q, k, v = proj(img_n)
        q, k = _rope(q, cos, sin), _rope(k, cos, sin)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        ).transpose(1, 2).reshape(b, -1, INNER)
        if txt_n is not None:
            il = img_n.shape[1]
            return self.lin(f"{src}.to_out", out[:, :il]), self.lin(f"{src}.to_out_t", out[:, il:])
        return self.lin(f"{src}.to_out", out)

    def forward(self, latents, sigmas, t5, llama, pooled):
        b = latents.shape[0]
        hh, ww = H // P, W // P
        ln = lambda x: F.layer_norm(x.float(), (D,), eps=1e-6)

        half = 128
        freqs = torch.exp(-torch.log(torch.tensor(10000.0)) * torch.arange(half) / half)
        args = (sigmas * 1000.0)[:, None] * freqs[None]
        tp = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        adaln = self.lin("t_embedder.timestep_embedder.linear_2",
                         F.silu(self.lin("t_embedder.timestep_embedder.linear_1", tp)))
        adaln = adaln + self.lin("p_embedder.pooled_embedder.linear_2",
                                 F.silu(self.lin("p_embedder.pooled_embedder.linear_1", pooled)))

        x = latents.view(b, hh, P, ww, P, ARCH.in_channels)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hh * ww, P * P * ARCH.in_channels)
        x = self.lin("x_embedder.proj", x)

        t5_p = self.lin(f"caption_projection.{N_BLOCKS}.linear", t5)
        llama_p = [
            self.lin(f"caption_projection.{i}.linear", llama[:, i % N_SEL])
            for i in range(N_BLOCKS)
        ]
        txt = torch.cat([t5_p, llama_p[N_BLOCKS - 1]], dim=1)
        txt_base = txt.shape[1]
        ll_len = llama_p[0].shape[1]
        cos, sin = _rope_angles(hh, ww, txt_base + ll_len)

        auxes = []
        for i in range(ARCH.depth_double):
            src = f"double_stream_blocks.{i}.block"
            ada = self.lin(f"{src}.adaLN_modulation.1", F.silu(adaln))
            m = [v[:, None, :] for v in torch.chunk(ada, 12, dim=-1)]
            cur_txt = torch.cat([txt, llama_p[i]], dim=1)
            img_n = ln(x) * (1 + m[1]) + m[0]
            txt_n = ln(cur_txt) * (1 + m[7]) + m[6]
            a_i, a_t = self.attn(f"{src}.attn1", img_n, txt_n, cos, sin)
            x = x + m[2] * a_i
            cur_txt = cur_txt + m[8] * a_t
            moe_out, aux = self.moe(f"{src}.ff_i", ln(x) * (1 + m[4]) + m[3])
            auxes.append(aux)
            x = x + m[5] * moe_out
            txt_f = ln(cur_txt) * (1 + m[10]) + m[9]
            cur_txt = cur_txt + m[11] * self.ffn(f"{src}.ff_t", txt_f)
            txt = cur_txt[:, :txt_base]

        stream = torch.cat([x, txt], dim=1)
        s_len = stream.shape[1]
        for i in range(ARCH.depth_single):
            src = f"single_stream_blocks.{i}.block"
            ada = self.lin(f"{src}.adaLN_modulation.1", F.silu(adaln))
            m = [v[:, None, :] for v in torch.chunk(ada, 6, dim=-1)]
            merged = torch.cat([stream, llama_p[ARCH.depth_double + i]], dim=1)
            x_n = ln(merged) * (1 + m[1]) + m[0]
            merged = merged + m[2] * self.attn(f"{src}.attn1", x_n, None, cos, sin)
            moe_out, aux = self.moe(f"{src}.ff_i", ln(merged) * (1 + m[4]) + m[3])
            auxes.append(aux)
            merged = merged + m[5] * moe_out
            stream = merged[:, :s_len]

        x = stream[:, : hh * ww]
        ada = self.lin("final_layer.adaLN_modulation.1", F.silu(adaln))
        shift, scale = torch.chunk(ada, 2, dim=-1)
        x = ln(x) * (1 + scale[:, None]) + shift[:, None]
        out = self.lin("final_layer.linear", x)
        out = out.view(b, hh, ww, P, P, ARCH.in_channels)
        out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, H, W, ARCH.in_channels)
        return out, torch.stack(auxes).mean()


def test_hidream_loss_curve_parity():
    from simpletuner_tpu.models.weight_import import hidream_params_from_diffusers
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(412)
    w = _fixture(rng)

    latents = rng.normal(0, 1, (BS, H, W, ARCH.in_channels)).astype(np.float32)
    t5 = rng.normal(0, 1, (BS, 5, ARCH.t5_dim)).astype(np.float32)
    llama = rng.normal(0, 1, (BS, N_SEL, 4, ARCH.llama_dim)).astype(np.float32)
    pooled = rng.normal(0, 1, (BS, ARCH.pooled_dim)).astype(np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, H, W, ARCH.in_channels)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    # ---- our framework ---------------------------------------------------------------
    cfg = TrainingConfig(
        {
            "model_family": "hidream", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
            "hidream_use_load_balancing_loss": True,
            "hidream_load_balancing_loss_weight": AUX_W,
        }
    )
    model = HiDream(cfg)
    params = hidream_params_from_diffusers(w, model.arch)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    schedule = get_lr_schedule(cfg, STEPS)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step_fn = jax.jit(build_train_step(model, tx, schedule))

    ours, ours_aux = [], []
    for step in range(STEPS):
        batch = {
            "latents": jnp.asarray(latents),
            "t5_embeds": jnp.asarray(t5),
            "llama_embeds": jnp.asarray(llama),
            "pooled_embeds": jnp.asarray(pooled),
            "override_noise": jnp.asarray(noises[step]),
            "override_sigmas": jnp.asarray(sigmas[step]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))
        ours_aux.append(float(metrics.get("moe_gate_loss", 0.0)))

    # ---- torch mirror ----------------------------------------------------------------
    torch.manual_seed(0)
    mirror = TorchHiDream(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    lat_t = torch.from_numpy(latents)

    theirs, theirs_aux = [], []
    for step in range(STEPS):
        noise = torch.from_numpy(noises[step])
        sig = torch.from_numpy(sigmas[step])
        sig_b = sig.view(BS, 1, 1, 1)
        noisy = (1.0 - sig_b) * lat_t + sig_b * noise
        target = noise - lat_t
        out, aux = mirror(noisy, sig, torch.from_numpy(t5),
                          torch.from_numpy(llama), torch.from_numpy(pooled))
        # inverted velocity (reference model.py:631): prediction = -module(x)
        loss = F.mse_loss(-out, target) + AUX_W * aux
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))
        theirs_aux.append(float(aux.detach()))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    # step-0 aux parity pins the gate formula exactly
    np.testing.assert_allclose(ours_aux[0], theirs_aux[0], rtol=2e-4)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
