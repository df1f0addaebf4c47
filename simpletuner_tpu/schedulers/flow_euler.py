"""Flow-matching Euler scheduler.

Reference behavior: diffusers FlowMatchEulerDiscreteScheduler as configured by
flow families (shift / dynamic μ-shift by sequence length, as in
helpers/models/common.py:4476 ``calculate_dynamic_shift_mu``).  The model
predicts velocity v = ε − x0; one Euler step is
x_{t_next} = x_t + (σ_next − σ) · v.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


def time_shift(sigmas: jax.Array, shift: float) -> jax.Array:
    """Static shift: σ' = s·σ / (1 + (s−1)·σ)."""
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def dynamic_shift_mu(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """Resolution-dependent μ for exp-shift (reference common.py:4476)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def time_shift_exp(sigmas: jax.Array, mu: float) -> jax.Array:
    """exp-μ shift: σ' = e^μ / (e^μ + (1/σ − 1))."""
    emu = math.exp(mu)
    return emu / (emu + (1.0 / jnp.clip(sigmas, 1e-6) - 1.0))


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerScheduler:
    """Precomputed σ ladder; ``step`` is pure and jit-safe."""

    sigmas: jax.Array  # (num_steps + 1,), σ_0 = 1 … σ_N = 0
    timesteps: jax.Array  # (num_steps,), what the model consumes (σ itself)

    @classmethod
    def create(
        cls,
        num_steps: int,
        shift: Optional[float] = 3.0,
        use_dynamic_shifting: bool = False,
        image_seq_len: Optional[int] = None,
        base_shift: float = 0.5,
        max_shift: float = 1.15,
    ) -> "FlowMatchEulerScheduler":
        sigmas = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
        if use_dynamic_shifting and image_seq_len is not None:
            mu = dynamic_shift_mu(image_seq_len, base_shift=base_shift, max_shift=max_shift)
            sigmas = time_shift_exp(sigmas, mu)
        elif shift and shift != 1.0:
            sigmas = time_shift(sigmas, shift)
        sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))])
        return cls(sigmas=sigmas, timesteps=sigmas[:-1])

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def init_latents(self, noise: jax.Array) -> jax.Array:
        return noise  # flow starts at pure noise (σ=1)

    def add_noise(self, latents: jax.Array, noise: jax.Array, i) -> jax.Array:
        """Noise clean latents to step ``i``'s σ (img2img entry point)."""
        sigma = self.sigmas[i]
        return (1.0 - sigma) * latents + sigma * noise

    def timestep(self, i: jax.Array) -> jax.Array:
        return self.sigmas[i]

    def step(self, i: jax.Array, latents: jax.Array, model_pred: jax.Array) -> jax.Array:
        sigma = self.sigmas[i]
        sigma_next = self.sigmas[i + 1]
        return latents + (sigma_next - sigma) * model_pred.astype(latents.dtype)


def flow_sigmas_for_training(num_steps: int, shift: float = 3.0) -> jax.Array:
    """Discrete σ ladder for 'fast' discrete flow sampling during training."""
    return FlowMatchEulerScheduler.create(num_steps, shift=shift).sigmas[:-1]
