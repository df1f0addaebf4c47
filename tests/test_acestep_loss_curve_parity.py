"""Loss-curve parity for the ACE-Step path (audio flow-matching DiT).

Drives the SAME torch oracle forward as ``test_ace_step_import.py`` — conv
PatchEmbed, Lite-LA linear self-attention with Qwen2 RoPE, masked sdpa
cross-attention, GLUMBConv FFN, adaLN-single, conformer lyric encoder,
speaker/genre conditioning — but with the weights wrapped in trainable
``torch.nn.Parameter``s, so 30 AdamW steps of flow-matching fine-tune must
track our framework's curve step for step (VERDICT r2 Next #8, audio
family).  Full conditioning (speaker + genre + ragged-masked lyrics) rides
every step, so the conformer and masking gradients are pinned too."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from test_ace_step_import import ARCH, _fixture, _oracle, _t

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.ace_step.model import ACEStep

pytestmark = pytest.mark.slow

STEPS = 30
BS = 2
SEQ = 12  # audio latent frames
LR = 1e-3
WD = 0.01


class _ParamView:
    """Dot-keyed dict view over a ParameterDict with mangled keys — lets the
    oracle's ``w[f"{name}.weight"]`` lookups hit trainable Parameters."""

    def __init__(self, pd):
        self.pd = pd

    def __getitem__(self, key):
        return self.pd[key.replace(".", "__")]

    def __contains__(self, key):
        return key.replace(".", "__") in self.pd


class TorchAce(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.pd = torch.nn.ParameterDict(
            {k.replace(".", "__"): torch.nn.Parameter(_t(v)) for k, v in w.items()}
        )
        self.view = _ParamView(self.pd)

    def forward(self, latents, sigmas, text, speaker, lyric_tokens, lyric_mask):
        return _oracle(self.view, latents, sigmas, text, speaker, lyric_tokens, lyric_mask)


def test_acestep_loss_curve_parity():
    from simpletuner_tpu.models.weight_import import acestep_params_from_diffusers
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    rng = np.random.default_rng(919)
    w = _fixture(rng)

    latents = rng.normal(0, 1, (BS, SEQ, ARCH.in_channels)).astype(np.float32)
    text = rng.normal(0, 1, (BS, 5, ARCH.text_dim)).astype(np.float32)
    speaker = rng.normal(0, 1, (BS, ARCH.speaker_dim)).astype(np.float32)
    lyric_tokens = rng.integers(0, ARCH.lyric_vocab, (BS, 7)).astype(np.int32)
    lyric_mask = np.asarray([[1] * 7, [1] * 4 + [0] * 3], np.float32)
    noises = rng.normal(0, 1, (STEPS, BS, SEQ, ARCH.in_channels)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.95, (STEPS, BS)).astype(np.float32)

    # ---- our framework ---------------------------------------------------------------
    cfg = TrainingConfig(
        {
            "model_family": "ace_step", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": LR, "adam_weight_decay": WD,
            "max_train_steps": STEPS, "lr_scheduler": "constant", "lr_warmup_steps": 0,
            "max_grad_norm": 0.0, "mixed_precision": "fp32",
        }
    )
    model = ACEStep(cfg)
    params = acestep_params_from_diffusers(w, model.arch)
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
            "speaker_embeds": jnp.asarray(speaker),
            "lyrics_tokens": jnp.asarray(lyric_tokens),
            "lyrics_mask": jnp.asarray(lyric_mask),
            "override_noise": jnp.asarray(noises[step]),
            "override_sigmas": jnp.asarray(sigmas[step]),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        ours.append(float(metrics["loss"]))

    # ---- torch mirror ----------------------------------------------------------------
    torch.manual_seed(0)
    mirror = TorchAce(w).float()
    opt = torch.optim.AdamW(mirror.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)

    theirs = []
    for step in range(STEPS):
        sig = sigmas[step]
        sig_b = sig[:, None, None]
        noisy = (1.0 - sig_b) * latents + sig_b * noises[step]  # (B, S, C)
        target = torch.from_numpy(noises[step] - latents)
        # oracle expects the mel layout (B, H, S', C); tiny has latent_height=1
        noisy_mel = noisy[:, None]  # (B, 1, S, C)
        pred = mirror(noisy_mel, sig, text, speaker, lyric_tokens, lyric_mask)
        loss = F.mse_loss(pred.reshape(BS, SEQ, ARCH.in_channels), target)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.detach()))

    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
    assert ours[-1] < ours[0]
