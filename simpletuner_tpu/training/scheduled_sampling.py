"""Scheduled sampling: train on the model's own rollout states.

Reference: helpers/scheduled_sampling/{plan,rollout,skrample_adapter}.py applied
at trainer.py:5642-5648 / common.py:5493-5516 — with some probability the
training point x_σ is produced by rolling the model's own (stop-gradient)
predictions down from a higher noise level instead of the analytic
interpolation, mitigating exposure bias.

jit shape: a fixed-K ``lax.fori_loop`` of Euler steps where each step is
active only while ``i < k`` (k sampled per call), so one compiled program
covers every rollout length.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ScheduledSamplingConfig:
    max_steps: int = 0  # 0 = disabled
    probability: float = 0.5  # chance a batch uses rollout at all
    step_size: float = 0.05  # σ distance covered by each rollout step
    # ReflexFlow (reference rollout.py:98 + common.py:5753-5785): weight the
    # loss toward components that vanish under rollout, plus an angular
    # direction-regression (ADR) term.  Default on for flow models with
    # scheduled sampling (reference _maybe_enable_reflexflow_default).
    reflexflow: bool = True
    reflexflow_alpha: float = 1.0
    reflexflow_beta1: float = 10.0  # ADR scale
    reflexflow_beta2: float = 1.0  # global loss scale
    # probability ramp (reference plan.py scheduled_sampling_prob_start/_end,
    # _ramp_steps, _ramp_shape, _start_step): rollout probability grows from
    # prob_start to prob_end over ramp_steps after start_step
    prob_start: Optional[float] = None
    prob_end: Optional[float] = None
    ramp_steps: int = 0
    ramp_shape: str = "linear"  # linear | cosine
    start_step: int = 0

    @classmethod
    def from_config(cls, config: Any) -> "ScheduledSamplingConfig":
        reflex = config.get("scheduled_sampling_reflexflow", None)
        prob_start = config.get("scheduled_sampling_prob_start")
        prob_end = config.get("scheduled_sampling_prob_end")
        return cls(
            max_steps=int(config.get("scheduled_sampling_max_steps", 0) or 0),
            probability=float(config.get("scheduled_sampling_probability", 0.5) or 0.5),
            step_size=float(config.get("scheduled_sampling_step_size", 0.05) or 0.05),
            reflexflow=True if reflex is None else bool(reflex),
            reflexflow_alpha=float(config.get("scheduled_sampling_reflexflow_alpha", 1.0) or 0.0),
            reflexflow_beta1=float(config.get("scheduled_sampling_reflexflow_beta1", 10.0) or 0.0),
            reflexflow_beta2=float(config.get("scheduled_sampling_reflexflow_beta2", 1.0) or 1.0),
            prob_start=None if prob_start is None else float(prob_start),
            prob_end=None if prob_end is None else float(prob_end),
            ramp_steps=int(config.get("scheduled_sampling_ramp_steps", 0) or 0),
            ramp_shape=str(config.get("scheduled_sampling_ramp_shape", "linear") or "linear"),
            start_step=int(config.get("scheduled_sampling_start_step", 0) or 0),
        )

    def probability_at(self, global_step) -> jax.Array:
        """Rollout probability at a (traced) global step.  The ramp engages
        only when ramp_steps or start_step is configured — otherwise the flat
        ``scheduled_sampling_probability`` applies (the registry always
        supplies prob_start/prob_end defaults, so their presence alone cannot
        be the trigger)."""
        if self.ramp_steps <= 0 and self.start_step <= 0:
            return jnp.float32(self.probability)
        start = self.probability if self.prob_start is None else self.prob_start
        end = self.probability if self.prob_end is None else self.prob_end
        step = jnp.asarray(global_step, jnp.float32) - float(self.start_step)
        if self.ramp_steps > 0:
            frac = jnp.clip(step / float(self.ramp_steps), 0.0, 1.0)
        else:
            frac = (step >= 0).astype(jnp.float32)
        if self.ramp_shape == "cosine":
            frac = 0.5 * (1.0 - jnp.cos(jnp.pi * frac))
        prob = start + (end - start) * frac
        # before start_step: no rollouts at all
        return jnp.where(step < 0, 0.0, prob)


def apply_scheduled_sampling(
    model,
    variables: Dict[str, Any],
    prepared: Dict[str, jax.Array],
    rng: jax.Array,
    ss_config: ScheduledSamplingConfig,
) -> Dict[str, jax.Array]:
    """Replace ``noisy_latents`` with a K-step self-rollout state (flow only)."""
    if ss_config.max_steps <= 0 or not model.is_flow:
        return prepared
    sigmas = prepared["sigmas"]
    latents = prepared["noisy_latents"]
    batch = sigmas.shape[0]
    shape = (batch,) + (1,) * (latents.ndim - 1)

    rng_k, rng_p, rng_noise = jax.random.split(rng, 3)
    k = jax.random.randint(rng_k, (batch,), 0, ss_config.max_steps + 1)
    probability = ss_config.probability_at(prepared.get("global_step", 0))
    use = jax.random.uniform(rng_p, (batch,)) < probability
    k = jnp.where(use, k, 0)

    # start higher: σ_start = min(σ + k·Δ, 1); x_start re-noised to σ_start
    sigma_start = jnp.minimum(sigmas + k.astype(jnp.float32) * ss_config.step_size, 1.0)
    noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
    x0 = prepared.get("latents")  # clean latents ride through prepare_batch
    if x0 is None:
        # recover x0 from the analytic interpolation: x_σ = (1−σ)x0 + σε
        x0 = (latents - sigmas.reshape(shape) * prepared["noise"]) / jnp.clip(
            1.0 - sigmas.reshape(shape), 1e-3
        )
    x0 = x0.astype(jnp.float32)
    x = (1.0 - sigma_start.reshape(shape)) * x0 + sigma_start.reshape(shape) * noise

    delta = (sigma_start - sigmas) / jnp.maximum(k.astype(jnp.float32), 1.0)

    def body(i, carry):
        x_cur, sigma_cur = carry
        roll_prepared = dict(prepared)
        roll_prepared["noisy_latents"] = x_cur
        roll_prepared["timesteps"] = sigma_cur
        roll_prepared["sigmas"] = sigma_cur
        velocity = jax.lax.stop_gradient(model.model_predict(variables, roll_prepared))
        active = (i < k).astype(jnp.float32).reshape(shape)
        x_next = x_cur - active * delta.reshape(shape) * velocity
        sigma_next = sigma_cur - (i < k).astype(jnp.float32) * delta
        return x_next, sigma_next

    x_final, _ = jax.lax.fori_loop(0, ss_config.max_steps, body, (x, sigma_start))
    out = dict(prepared)
    out["noisy_latents"] = jnp.where(use.reshape(shape), x_final, latents)
    # target stays v = ε' − x0 for the re-noised trajectory where used
    new_target = noise - x0
    out["target"] = jnp.where(use.reshape(shape), new_target, prepared["target"])
    if ss_config.reflexflow:
        # exposure-bias probes: prediction at the analytic state vs the
        # rolled-out state, both stop-grad (reference rollout.py:117-196)
        clean = jax.lax.stop_gradient(model.model_predict(variables, prepared))
        biased_prepared = dict(prepared)
        biased_prepared["noisy_latents"] = out["noisy_latents"]
        biased = jax.lax.stop_gradient(model.model_predict(variables, biased_prepared))
        out["_reflexflow_clean_pred"] = clean
        out["_reflexflow_biased_pred"] = biased
    return out
