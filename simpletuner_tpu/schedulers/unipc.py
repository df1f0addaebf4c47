"""UniPC (2nd-order predictor-corrector) scheduler.

Reference behavior: diffusers UniPCMultistepScheduler, the default fast sampler
for several families' validation pipelines.  Implemented here as the B(h)=h,
order-2 data-prediction variant over either a flow (σ∈(0,1], α=1−σ) or DDPM
(ᾱ ladder) parameterization — enough for high-quality 10–30 step validation
renders while staying a pure jit-safe pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..training.losses import DDPMScheduleConfig, make_alphas_cumprod
from .flow_euler import time_shift


@dataclasses.dataclass(frozen=True)
class UniPCScheduler:
    """Order-2 UniPC. State (previous x0 prediction) rides in the latents carry:
    callers use ``init_state``/``step_with_state`` instead of plain ``step``."""

    timesteps: jax.Array  # (num_steps,) model-facing timesteps
    lambdas: jax.Array  # (num_steps + 1,) log-SNR/2 ladder λ_i = log(α_i/σ_i)
    alphas: jax.Array  # (num_steps + 1,)
    sigmas: jax.Array  # (num_steps + 1,)
    prediction_type: str = "flow_matching"

    @classmethod
    def create_flow(cls, num_steps: int, shift: float = 3.0) -> "UniPCScheduler":
        sig = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
        if shift and shift != 1.0:
            sig = time_shift(sig, shift)
        # terminal σ: small but nonzero so λ stays finite; final step lands on it
        sig = jnp.concatenate([sig, jnp.asarray([1e-3])])
        alphas = 1.0 - sig
        lambdas = jnp.log(jnp.clip(alphas, 1e-8)) - jnp.log(sig)
        return cls(timesteps=sig[:-1], lambdas=lambdas, alphas=alphas, sigmas=sig)

    @classmethod
    def create_ddpm(
        cls,
        num_steps: int,
        schedule: DDPMScheduleConfig = DDPMScheduleConfig(),
        prediction_type: str = "epsilon",
    ) -> "UniPCScheduler":
        train_steps = schedule.num_train_timesteps
        ratio = train_steps // num_steps
        ts = (jnp.arange(num_steps) * ratio).astype(jnp.int32)[::-1]
        ac = make_alphas_cumprod(schedule)
        ac_i = jnp.concatenate([ac[ts], jnp.asarray([1.0 - 1e-6])])
        alphas = jnp.sqrt(ac_i)
        sigmas = jnp.sqrt(1.0 - ac_i)
        lambdas = jnp.log(jnp.clip(alphas, 1e-8)) - jnp.log(jnp.clip(sigmas, 1e-8))
        return cls(
            timesteps=ts, lambdas=lambdas, alphas=alphas, sigmas=sigmas, prediction_type=prediction_type
        )

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def init_latents(self, noise: jax.Array) -> jax.Array:
        return noise

    def add_noise(self, latents: jax.Array, noise: jax.Array, i) -> jax.Array:
        return self.alphas[i] * latents + self.sigmas[i] * noise

    def timestep(self, i: jax.Array) -> jax.Array:
        return self.timesteps[i]

    def _to_x0(self, i: jax.Array, x: jax.Array, pred: jax.Array) -> jax.Array:
        a, s = self.alphas[i], self.sigmas[i]
        if self.prediction_type == "flow_matching":
            return x - s * pred  # v = ε − x0 with x = (1−σ)x0 + σε ⇒ x0 = x − σ·v
        if self.prediction_type == "epsilon":
            return (x - s * pred) / a
        if self.prediction_type == "v_prediction":
            return a * x - s * pred
        return pred  # sample

    def init_state(self, noise: jax.Array):
        return {"prev_x0": jnp.zeros_like(noise), "have_prev": jnp.asarray(0.0)}

    def step_with_state(self, i: jax.Array, latents: jax.Array, model_pred: jax.Array, state):
        x = latents.astype(jnp.float32)
        x0 = self._to_x0(i, x, model_pred.astype(jnp.float32))
        lam, lam_next = self.lambdas[i], self.lambdas[i + 1]
        lam_prev = jnp.where(state["have_prev"] > 0, self.lambdas[jnp.maximum(i - 1, 0)], lam)
        h = lam_next - lam
        a_next, s_next, s_t = self.alphas[i + 1], self.sigmas[i + 1], self.sigmas[i]

        # order-1 (DPM-Solver++/DDIM-like) data-prediction update
        phi1 = jnp.expm1(-h)
        x_next1 = (s_next / s_t) * x - a_next * phi1 * x0

        # order-2: extrapolate with the previous x0 difference
        r = jnp.where(jnp.abs(lam - lam_prev) > 1e-8, (lam - lam_prev), 1.0)
        d1 = (x0 - state["prev_x0"]) / jnp.where(jnp.abs(r) > 1e-8, r, 1.0) * h
        x_next2 = x_next1 - a_next * (phi1 / h + 1.0) * 0.5 * d1

        use2 = (state["have_prev"] > 0).astype(jnp.float32)
        x_next = x_next1 * (1.0 - use2) + x_next2 * use2
        new_state = {"prev_x0": x0, "have_prev": jnp.asarray(1.0)}
        return x_next.astype(latents.dtype), new_state
