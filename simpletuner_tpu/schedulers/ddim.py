"""DDIM scheduler for epsilon / v-prediction families (SD1.x, SDXL, DeepFloyd).

Reference behavior: diffusers DDIMScheduler as wired by UNet families'
validation pipelines.  Deterministic (η=0) DDIM update expressed over a
precomputed ᾱ ladder; supports prediction_type ∈ {epsilon, v_prediction,
sample} like the reference's scheduler config.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..training.losses import DDPMScheduleConfig, make_alphas_cumprod


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    timesteps: jax.Array  # (num_steps,) descending integer timesteps
    alphas_cumprod: jax.Array  # (train_steps,)
    final_alpha_cumprod: jax.Array  # scalar, ᾱ for the "-1" step
    prediction_type: str = "epsilon"

    @classmethod
    def create(
        cls,
        num_steps: int,
        schedule: DDPMScheduleConfig = DDPMScheduleConfig(),
        prediction_type: str = "epsilon",
        set_alpha_to_one: bool = True,
        timestep_spacing: str = "leading",
    ) -> "DDIMScheduler":
        train_steps = schedule.num_train_timesteps
        if timestep_spacing == "trailing":
            step = train_steps / num_steps
            ts = (jnp.round(jnp.arange(train_steps, 0, -step)) - 1).astype(jnp.int32)
        else:  # leading
            ratio = train_steps // num_steps
            ts = (jnp.arange(num_steps) * ratio).astype(jnp.int32)[::-1]
        ac = make_alphas_cumprod(schedule)
        final = jnp.asarray(1.0) if set_alpha_to_one else ac[0]
        return cls(timesteps=ts, alphas_cumprod=ac, final_alpha_cumprod=final, prediction_type=prediction_type)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def init_latents(self, noise: jax.Array) -> jax.Array:
        return noise

    def add_noise(self, latents: jax.Array, noise: jax.Array, i) -> jax.Array:
        """Noise clean latents to step ``i``'s ᾱ (img2img entry point)."""
        a = self.alphas_cumprod[self.timesteps[i]]
        return jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise

    def timestep(self, i: jax.Array) -> jax.Array:
        return self.timesteps[i]

    def step(self, i: jax.Array, latents: jax.Array, model_pred: jax.Array) -> jax.Array:
        t = self.timesteps[i]
        n = self.num_steps
        ratio = self.alphas_cumprod.shape[0] // n
        prev_t = t - ratio
        alpha = self.alphas_cumprod[t]
        alpha_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], self.final_alpha_cumprod)
        beta = 1.0 - alpha

        pred = model_pred.astype(jnp.float32)
        x = latents.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            x0 = (x - jnp.sqrt(beta) * pred) / jnp.sqrt(alpha)
            eps = pred
        elif self.prediction_type == "v_prediction":
            x0 = jnp.sqrt(alpha) * x - jnp.sqrt(beta) * pred
            eps = jnp.sqrt(alpha) * pred + jnp.sqrt(beta) * x
        elif self.prediction_type == "sample":
            x0 = pred
            eps = (x - jnp.sqrt(alpha) * x0) / jnp.sqrt(beta)
        else:
            raise ValueError(f"unknown prediction_type {self.prediction_type}")
        out = jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1.0 - alpha_prev) * eps
        return out.astype(latents.dtype)
