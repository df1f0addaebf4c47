"""EDM Euler scheduler (Karras σ ladder) for x0-("sample")-prediction
families.

Reference behavior: the Cosmos-Predict2 T2I family trains with additive EDM
noise x_t = x0 + σ·ε (helpers/models/cosmos/model.py:433-441) and samples with
a Karras ρ-scheduled Euler loop (``sigma_schedule_order = 7.0``, σ ∈
[0.002, 80], ``final_sigmas_type="sigma_min"`` — model.py:80-84).  The model's
``model_predict`` already applies the EDM preconditioning and returns an x0
estimate, so one Euler step is

    d = (x_i − x0_pred) / σ_i            (the probability-flow derivative)
    x_{i+1} = x_i + (σ_{i+1} − σ_i) · d
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EDMEulerScheduler:
    """Precomputed Karras σ ladder; ``step`` is pure and jit-safe."""

    sigmas: jax.Array  # (num_steps + 1,): σ_max … σ_min, 0
    timesteps: jax.Array  # (num_steps,): the σ the model consumes

    @classmethod
    def create(
        cls,
        num_steps: int,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
    ) -> "EDMEulerScheduler":
        ramp = np.linspace(0.0, 1.0, num_steps)
        min_inv = sigma_min ** (1.0 / rho)
        max_inv = sigma_max ** (1.0 / rho)
        sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho
        sigmas = jnp.asarray(np.concatenate([sigmas, [0.0]]), jnp.float32)
        return cls(sigmas=sigmas, timesteps=sigmas[:-1])

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def init_latents(self, noise: jax.Array) -> jax.Array:
        return noise * self.sigmas[0]

    def add_noise(self, latents: jax.Array, noise: jax.Array, i) -> jax.Array:
        """Noise clean latents to step ``i``'s σ (img2img entry point)."""
        return latents + self.sigmas[i] * noise

    def timestep(self, i) -> jax.Array:
        return self.timesteps[i]

    def step(self, i, latents: jax.Array, model_pred: jax.Array) -> jax.Array:
        """``model_pred`` is the x0 estimate (EDM-preconditioned output)."""
        sigma = self.sigmas[i]
        sigma_next = self.sigmas[i + 1]
        d = (latents - model_pred.astype(jnp.float32)) / jnp.maximum(sigma, 1e-8)
        return latents + (sigma_next - sigma) * d
