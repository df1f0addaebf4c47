"""diff2flow: train epsilon/v-prediction models with flow-matching targets.

Reference: simpletuner/diff2flow/bridge.py (DiffusionToFlowBridge) — the UNet
still sees its native DDPM noising x_t = √ᾱ·x0 + √(1−ᾱ)·ε and timesteps, but
its prediction is converted into a flow vector field and regressed against the
flow target ε − x0 (used at helpers/models/common.py:5436,5697).

All pure functions of (alphas_cumprod, timesteps); jit-safe gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _extract(arr: jax.Array, timesteps: jax.Array, ndim: int) -> jax.Array:
    vals = arr[timesteps.astype(jnp.int32)]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def flow_sigma_from_timesteps(alphas_cumprod: jax.Array, timesteps: jax.Array) -> jax.Array:
    """Flow-equivalent noise fraction σ = √(1−ᾱ) / (√ᾱ + √(1−ᾱ))."""
    a = alphas_cumprod[timesteps.astype(jnp.int32)]
    sqrt_a = jnp.sqrt(a)
    sqrt_1ma = jnp.sqrt(1.0 - a)
    return sqrt_1ma / (sqrt_a + sqrt_1ma)


def prediction_to_flow(
    prediction: jax.Array,
    noisy_latents: jax.Array,
    timesteps: jax.Array,
    alphas_cumprod: jax.Array,
    prediction_type: str,
) -> jax.Array:
    """Convert an ε- or v-prediction into the flow field ε̂ − x̂0."""
    ndim = noisy_latents.ndim
    if prediction_type in ("v_prediction", "vpred", "v"):
        sqrt_a = _extract(jnp.sqrt(alphas_cumprod), timesteps, ndim)
        sqrt_1ma = _extract(jnp.sqrt(1.0 - alphas_cumprod), timesteps, ndim)
        x0_pred = sqrt_a * noisy_latents - sqrt_1ma * prediction
        eps_pred = sqrt_a * prediction + sqrt_1ma * noisy_latents
        return eps_pred - x0_pred
    if prediction_type in ("epsilon", "eps"):
        sqrt_recip = _extract(jnp.sqrt(1.0 / alphas_cumprod), timesteps, ndim)
        sqrt_recipm1 = _extract(jnp.sqrt(1.0 / alphas_cumprod - 1.0), timesteps, ndim)
        x0_pred = sqrt_recip * noisy_latents - sqrt_recipm1 * prediction
        return prediction - x0_pred
    raise ValueError(f"diff2flow does not support prediction_type {prediction_type!r}")
