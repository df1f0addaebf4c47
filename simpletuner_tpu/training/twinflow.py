"""TwinFlow RCGM auxiliary losses for few-step flow models.

Reference: helpers/models/common.py:4717-6100 (_validate_twinflow_config,
_twinflow_sample_tt:4952, _twinflow_reconstruct_states:5283,
_twinflow_rcgm_target:5294, _compute_twinflow_losses:5941) — a secondary time
tt < σ is sampled per example; the teacher integrates the flow from σ down to
tt in ``estimate_order`` sub-steps, and the student's prediction is pulled
toward the clamped recursive-consistency target
rcgm = F_sg − clamp(F_sg − Σ F_c·Δt − v_target), plus a plain real-velocity
MSE.  This trains u(x_σ, σ, tt) for few-step sampling.

TPU notes: the teacher is the stop-gradient student (the reference's
``twinflow_allow_no_ema_teacher`` path — EMA weights live in the optimizer
state, outside the loss closure); the sub-step schedule is static so the
integration unrolls under jit; tt rides the FlowMap interval input on models
that have one (flux ``flowmap_gate``), and is ignored by the rest.  The
negative-time adversarial/rectify stage is not ported and fails loudly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TwinFlowSettings:
    enabled: bool = False
    estimate_order: int = 2
    delta_t: float = 0.01
    clamp_target: float = 1.0
    realvel_weight: float = 1.0

    @classmethod
    def from_config(cls, config: Any) -> "TwinFlowSettings":
        enabled = bool(config.get("twinflow_enabled", False))
        if enabled and bool(config.get("twinflow_adversarial_enabled", False)):
            raise NotImplementedError(
                "twinflow_adversarial_enabled (negative-time twin) is not ported; "
                "disable it or use the dmd/self_forcing distillers for "
                "distribution matching"
            )
        return cls(
            enabled=enabled,
            estimate_order=max(1, int(config.get("twinflow_estimate_order", 2) or 2)),
            delta_t=float(config.get("twinflow_delta_t", 0.01) or 0.01),
            clamp_target=float(config.get("twinflow_target_clamp", 1.0) or 1.0),
            realvel_weight=float(config.get("twinflow_realvel_weight", 1.0) or 1.0),
        )


def sample_tt(rng: jax.Array, sigmas: jax.Array) -> jax.Array:
    """Secondary time tt ∈ [0, σ) (reference _twinflow_sample_tt)."""
    tt = sigmas - jax.random.uniform(rng, sigmas.shape) * sigmas
    return jnp.clip(tt, 0.0, sigmas - 1e-6)


def twinflow_losses(
    model,
    variables: Dict[str, Any],
    prepared: Dict[str, jax.Array],
    base_pred: jax.Array,
    rng: jax.Array,
    settings: TwinFlowSettings,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    if not model.is_flow:
        raise ValueError(
            "twinflow requires a flow-matching family (the diff2flow-bridged "
            "epsilon path is not ported)"
        )
    sigmas = prepared["sigmas"]
    noisy = prepared["noisy_latents"].astype(jnp.float32)
    latents = prepared["latents"].astype(jnp.float32)
    noise = prepared["noise"]
    batch = sigmas.shape[0]
    shape = (batch,) + (1,) * (noisy.ndim - 1)
    tt = prepared.get("twinflow_tt")
    if tt is None:
        tt = sample_tt(jax.random.fold_in(rng, 0x72), sigmas)
    target = noise - latents  # noiseward flow

    def teacher(x, t, tt_next):
        p = dict(prepared)
        p["noisy_latents"] = x
        p["sigmas"] = t
        p["timesteps"] = t
        p["flowmap_r_timesteps"] = tt_next  # interval input where supported
        return jax.lax.stop_gradient(model.model_predict(variables, p))

    # static sub-step schedule σ → tt (reference _twinflow_rcgm_target)
    steps = settings.estimate_order
    t_anchor = jnp.maximum(tt, sigmas - settings.delta_t)
    schedule = []
    if steps == 1:
        schedule.append(tt)
    else:
        for i in range(steps - 1):
            frac = float(i + 1) / float(steps)
            schedule.append(t_anchor * frac + sigmas * (1.0 - frac))
        schedule.append(tt)

    x_t = noisy
    pred_accum = jnp.zeros_like(base_pred)
    t_prev = sigmas
    for t_next in schedule:
        flow = teacher(x_t, t_prev, t_next)
        x_hat = x_t - t_prev.reshape(shape) * flow  # clean estimate
        z_hat = x_t + (1.0 - t_prev.reshape(shape)) * flow  # noise estimate
        x_t = t_next.reshape(shape) * z_hat + (1.0 - t_next.reshape(shape)) * x_hat
        pred_accum = pred_accum + flow * (t_prev - t_next).reshape(shape)
        t_prev = t_next

    base_sg = jax.lax.stop_gradient(base_pred.astype(jnp.float32))
    rcgm_raw = base_sg - pred_accum - target
    rcgm = base_sg - jnp.clip(rcgm_raw, -settings.clamp_target, settings.clamp_target)

    loss_base = jnp.mean((base_pred.astype(jnp.float32) - rcgm) ** 2)
    loss_real = jnp.mean((base_pred.astype(jnp.float32) - target) ** 2)
    total = loss_base + settings.realvel_weight * loss_real
    return total, {"twinflow_base": loss_base, "twinflow_realvel": loss_real}
