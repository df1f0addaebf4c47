"""Loss math: flow-matching sigma sampling, epsilon/v-prediction timesteps,
SNR weighting, Huber schedules, masked loss.

Functional JAX ports of the reference's training math (reference:
helpers/models/common.py:4630 ``sample_flow_sigmas``, :4476
``calculate_dynamic_shift_mu``, :5683 ``ModelFoundation.loss``;
helpers/training/min_snr_gamma.py).  Everything here is jit-safe (no python
control flow on traced values) and operates on batched arrays.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------------
# Flow matching sigma sampling
# ---------------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FlowScheduleConfig:
    sigmoid_scale: float = 1.0
    schedule_shift: Optional[float] = None
    auto_shift: bool = False
    use_uniform_schedule: bool = False
    use_beta_schedule: bool = False
    beta_alpha: float = 2.0
    beta_beta: float = 2.0
    # reference --flow_custom_timesteps/--flow_timesteps_mode
    # (common.py:4525,4637): an explicit sigma list; values > 1 are parsed as
    # timesteps/1000.  fixed-list samples randomly from the list; round-robin
    # cycles deterministically by (global step, batch index, process)
    custom_sigmas: Optional[Tuple[float, ...]] = None
    custom_mode: str = "fixed-list"  # fixed-list | round-robin
    # reference --flux_fast_schedule (flux/__init__.py:11-20): the schnell
    # 4-step schedule from the SD3-Turbo paper — the 1000-step sigma table is
    # quantized to [1.0, 0.3, 0.2, 0.1] by quartile, so training sigmas are
    # drawn uniformly from those four levels
    fast_schedule: bool = False


def parse_flow_custom_timesteps(raw) -> Optional[Tuple[float, ...]]:
    """Comma/semicolon string, JSON list, or sequence -> sigma tuple in (0,1]."""
    if raw in (None, "", "None"):
        return None
    value = raw
    if isinstance(value, str):
        import json as _json

        stripped = value.strip()
        try:
            value = _json.loads(stripped)
        except Exception:
            value = [seg for seg in stripped.replace(";", ",").split(",") if seg.strip()]
    try:
        floats = [float(v) for v in value]
    except (TypeError, ValueError) as exc:
        raise ValueError(f"unparseable flow_custom_timesteps {raw!r}") from exc
    floats = [v for v in floats if math.isfinite(v)]
    if not floats:
        return None
    if max(floats) > 1.0:  # timesteps in [0, 1000] -> sigmas
        floats = [min(max(v, 0.0), 1000.0) / 1000.0 for v in floats]
    return tuple(min(max(v, 0.0), 1.0) for v in floats)


def calculate_dynamic_shift_mu(
    seq_len: jax.Array,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> jax.Array:
    """Resolution-dependent schedule shift μ (the reference's dynamic shifting for
    higher-resolution flow training; reference common.py:4476)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return seq_len * m + b


def apply_schedule_shift(sigmas: jax.Array, shift: jax.Array) -> jax.Array:
    """Static shift: σ ← s·σ / (1 + (s-1)·σ)."""
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def apply_schedule_shift_mu(sigmas: jax.Array, mu: jax.Array) -> jax.Array:
    """Dynamic (exp-μ) shift used with resolution-dependent μ."""
    shift = jnp.exp(mu)
    return apply_schedule_shift(sigmas, shift)


def sample_flow_sigmas(
    rng: jax.Array,
    batch_size: int,
    config: FlowScheduleConfig = FlowScheduleConfig(),
    seq_len: Optional[jax.Array] = None,
    global_step: Optional[jax.Array] = None,
) -> jax.Array:
    """Sample per-example flow-matching sigmas in (0, 1).

    Default is the logit-normal ("sigmoid") density; alternatives: uniform,
    beta, and an explicit custom sigma list.  Optional static or
    resolution-dynamic schedule shift (not applied to custom lists — they are
    already the final sigmas, reference common.py:4637).
    """
    if config.fast_schedule:
        # uniform draw over the quantized 4-level schnell schedule; shifts do
        # not apply (the table already IS the final sigma set)
        table = jnp.asarray([1.0, 0.3, 0.2, 0.1], jnp.float32)
        return jax.random.choice(rng, table, (batch_size,))
    if config.custom_sigmas:
        table = jnp.asarray(config.custom_sigmas, jnp.float32)
        if config.custom_mode == "round-robin":
            step = jnp.asarray(0 if global_step is None else global_step, jnp.int32)
            base = step * batch_size + jax.process_index() * batch_size
            idx = (base + jnp.arange(batch_size)) % table.shape[0]
            return table[idx]
        if config.custom_mode != "fixed-list":
            raise ValueError(
                "flow_timesteps_mode must be 'fixed-list' or 'round-robin', "
                f"got {config.custom_mode!r}"
            )
        return jax.random.choice(rng, table, (batch_size,))
    if config.use_uniform_schedule:
        sigmas = jax.random.uniform(rng, (batch_size,), minval=1e-5, maxval=1.0 - 1e-5)
    elif config.use_beta_schedule:
        sigmas = jax.random.beta(rng, config.beta_alpha, config.beta_beta, (batch_size,))
        sigmas = jnp.clip(sigmas, 1e-5, 1.0 - 1e-5)
    else:
        normal = jax.random.normal(rng, (batch_size,)) * config.sigmoid_scale
        sigmas = jax.nn.sigmoid(normal)
    if config.auto_shift and seq_len is not None:
        mu = calculate_dynamic_shift_mu(jnp.asarray(seq_len, jnp.float32))
        sigmas = apply_schedule_shift_mu(sigmas, mu)
    elif config.schedule_shift is not None and config.schedule_shift != 1.0:
        sigmas = apply_schedule_shift(sigmas, jnp.asarray(config.schedule_shift, jnp.float32))
    return sigmas


def flow_interpolate(latents: jax.Array, noise: jax.Array, sigmas: jax.Array) -> jax.Array:
    """x_σ = (1-σ)·x₀ + σ·ε  (rectified flow forward process)."""
    sigmas = sigmas.reshape(sigmas.shape[0], *([1] * (latents.ndim - 1)))
    return (1.0 - sigmas) * latents + sigmas * noise


def flow_target(latents: jax.Array, noise: jax.Array) -> jax.Array:
    """Velocity target for rectified flow: ε − x₀."""
    return noise - latents


# ---------------------------------------------------------------------------------
# DDPM-style (epsilon / v-prediction) schedules
# ---------------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DDPMScheduleConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # linear | scaled_linear | squaredcos_cap_v2
    rescale_betas_zero_snr: bool = False


def make_alphas_cumprod(config: DDPMScheduleConfig) -> jnp.ndarray:
    steps = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = jnp.linspace(config.beta_start, config.beta_end, steps)
    elif config.beta_schedule == "scaled_linear":
        betas = jnp.linspace(config.beta_start ** 0.5, config.beta_end ** 0.5, steps) ** 2
    elif config.beta_schedule == "squaredcos_cap_v2":
        t = jnp.arange(steps + 1) / steps
        f = jnp.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = jnp.clip(1.0 - f[1:] / f[:-1], 0.0, 0.999)
    else:
        raise ValueError(f"unknown beta schedule {config.beta_schedule}")
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    if config.rescale_betas_zero_snr:
        # Shift sqrt(ᾱ) so the final step has zero SNR (Lin et al. 2023).
        sqrt_ac = jnp.sqrt(alphas_cumprod)
        sqrt_ac = (sqrt_ac - sqrt_ac[-1]) * (sqrt_ac[0] / (sqrt_ac[0] - sqrt_ac[-1]))
        alphas_cumprod = sqrt_ac ** 2
    return alphas_cumprod


def add_noise(
    latents: jax.Array, noise: jax.Array, timesteps: jax.Array, alphas_cumprod: jax.Array
) -> jax.Array:
    ac = alphas_cumprod[timesteps].reshape(timesteps.shape[0], *([1] * (latents.ndim - 1)))
    return jnp.sqrt(ac) * latents + jnp.sqrt(1.0 - ac) * noise


def velocity_target(
    latents: jax.Array, noise: jax.Array, timesteps: jax.Array, alphas_cumprod: jax.Array
) -> jax.Array:
    ac = alphas_cumprod[timesteps].reshape(timesteps.shape[0], *([1] * (latents.ndim - 1)))
    return jnp.sqrt(ac) * noise - jnp.sqrt(1.0 - ac) * latents


def compute_snr(timesteps: jax.Array, alphas_cumprod: jax.Array) -> jax.Array:
    ac = alphas_cumprod[timesteps]
    return ac / jnp.maximum(1.0 - ac, 1e-12)


def compute_soft_min_snr(
    timesteps: jax.Array, alphas_cumprod: jax.Array, sigma_data: float = 1.0
) -> jax.Array:
    """Soft-min SNR (reference min_snr_gamma.py:35 use_soft_min):
    snr = (σ·σ_d)² / (σ² + σ_d²)² with σ = sqrt(1 - ᾱ_t)."""
    ac = alphas_cumprod[timesteps]
    sigma_sq = jnp.maximum(1.0 - ac, 1e-12)
    sd_sq = float(sigma_data) ** 2
    return (sigma_sq * sd_sq) / jnp.square(sigma_sq + sd_sq)


@dataclasses.dataclass(frozen=True)
class TimestepSamplingConfig:
    num_train_timesteps: int = 1000
    bias_strategy: str = "none"  # none | earlier | later | range
    bias_multiplier: float = 1.0
    bias_begin: int = 0
    bias_end: int = 1000
    bias_portion: float = 0.25
    # HARD sampling window (reference segmented_timestep_selection refiner
    # range, custom_schedule.py:18-31): timesteps outside [begin, end) are
    # never drawn — refiner training restricts to the low-noise segment,
    # inverted schedules (PixArt stage-2) to the high-noise segment
    range_begin: int = 0
    range_end: int = 0  # 0 = no restriction


def timestep_weights(config: TimestepSamplingConfig) -> jnp.ndarray:
    """Per-timestep sampling weights (the reference's weighted timestep selection;
    reference helpers/training/min_snr_gamma.py / segmented_timestep_selection)."""
    steps = config.num_train_timesteps
    weights = jnp.ones((steps,))
    if config.range_end > config.range_begin:
        idx = jnp.arange(steps)
        weights = jnp.where(
            (idx >= config.range_begin) & (idx < config.range_end), weights, 0.0
        )
    if config.bias_strategy == "none" or config.bias_multiplier == 1.0:
        return weights / jnp.sum(weights)
    num_biased = int(config.bias_portion * steps)
    if config.bias_strategy == "earlier":
        mask = jnp.arange(steps) < num_biased
    elif config.bias_strategy == "later":
        mask = jnp.arange(steps) >= steps - num_biased
    elif config.bias_strategy == "range":
        idx = jnp.arange(steps)
        mask = (idx >= config.bias_begin) & (idx < config.bias_end)
    else:
        raise ValueError(f"unknown bias strategy {config.bias_strategy}")
    weights = jnp.where(mask, weights * config.bias_multiplier, weights)
    return weights / jnp.sum(weights)


def sample_timesteps(
    rng: jax.Array, batch_size: int, config: TimestepSamplingConfig
) -> jax.Array:
    weights = timestep_weights(config)
    return jax.random.choice(rng, config.num_train_timesteps, (batch_size,), p=weights)


# ---------------------------------------------------------------------------------
# Loss assembly
# ---------------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LossConfig:
    loss_type: str = "l2"  # l2 | huber | smooth_l1
    huber_schedule: str = "snr"  # snr | exponential | constant
    huber_c: float = 0.1
    snr_gamma: Optional[float] = None
    soft_min_snr_gamma: Optional[float] = None
    # reference --use_soft_min_snr/--soft_min_snr_sigma_data: substitute the
    # soft-min SNR curve into the min-SNR-gamma weighting
    use_soft_min_snr: bool = False
    soft_min_snr_sigma_data: float = 1.0
    prediction_type: str = "flow_matching"  # epsilon | v_prediction | flow_matching | sample


def _pointwise_loss(pred: jax.Array, target: jax.Array, config: LossConfig, huber_c: jax.Array) -> jax.Array:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if config.loss_type == "l2":
        return jnp.square(diff)
    if config.loss_type == "huber":
        abs_diff = jnp.abs(diff)
        return 2.0 * huber_c * (jnp.sqrt(jnp.square(diff) + huber_c ** 2) - huber_c)
    if config.loss_type == "smooth_l1":
        abs_diff = jnp.abs(diff)
        return jnp.where(
            abs_diff < huber_c, 0.5 * jnp.square(diff) / huber_c, abs_diff - 0.5 * huber_c
        )
    raise ValueError(f"unknown loss type {config.loss_type}")


def _huber_c_for(
    config: LossConfig, timesteps: Optional[jax.Array], num_train_timesteps: int
) -> jax.Array:
    if config.loss_type == "l2" or config.huber_schedule == "constant" or timesteps is None:
        return jnp.asarray(config.huber_c, jnp.float32)
    t_frac = timesteps.astype(jnp.float32) / max(num_train_timesteps - 1, 1)
    if config.huber_schedule == "exponential":
        return config.huber_c * jnp.exp(-t_frac * 10.0)
    # "snr": interpolate between huber_c at t=0 and ~0 at t=max
    return config.huber_c * (1.0 - t_frac) + 1e-4



def diffusion_loss(
    model_pred: jax.Array,
    target: jax.Array,
    config: LossConfig,
    timesteps: Optional[jax.Array] = None,
    alphas_cumprod: Optional[jax.Array] = None,
    sigmas: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    loss_weight: Optional[jax.Array] = None,
    num_train_timesteps: int = 1000,
    elementwise_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Scalar training loss with SNR weighting and optional pixel mask.

    ``mask``: broadcastable to pred (1 = keep); ``loss_weight``: per-sample
    weight; ``elementwise_weight``: per-element multiplier applied before
    reduction (ReflexFlow exposure weighting).
    """
    batch = model_pred.shape[0]
    huber_c = _huber_c_for(config, timesteps, num_train_timesteps)
    if huber_c.ndim:  # per-timestep schedule → broadcast over spatial dims
        huber_c = huber_c.reshape(batch, *([1] * (model_pred.ndim - 1)))
    loss = _pointwise_loss(model_pred, target, config, huber_c)
    if elementwise_weight is not None:
        loss = loss * elementwise_weight.astype(jnp.float32)

    if mask is not None:
        mask = mask.astype(jnp.float32)
        loss = loss * mask
        denom = jnp.sum(mask.reshape(batch, -1), axis=-1) * (loss[0].size / mask[0].size)
        per_example = jnp.sum(loss.reshape(batch, -1), axis=-1) / jnp.maximum(denom, 1.0)
    else:
        per_example = jnp.mean(loss.reshape(batch, -1), axis=-1)

    if config.snr_gamma is not None and config.prediction_type in ("epsilon", "v_prediction"):
        if timesteps is None or alphas_cumprod is None:
            raise ValueError("snr weighting requires timesteps and alphas_cumprod")
        if config.use_soft_min_snr:
            snr = compute_soft_min_snr(
                timesteps, alphas_cumprod, config.soft_min_snr_sigma_data
            )
        else:
            snr = compute_snr(timesteps, alphas_cumprod)
        if config.prediction_type == "v_prediction":
            snr_weight = jnp.minimum(snr, config.snr_gamma) / jnp.maximum(snr + 1.0, 1e-8)
        else:
            snr_weight = jnp.minimum(snr, config.snr_gamma) / jnp.maximum(snr, 1e-8)
        per_example = per_example * snr_weight
    elif config.soft_min_snr_gamma is not None and timesteps is not None and alphas_cumprod is not None:
        snr = compute_snr(timesteps, alphas_cumprod)
        gamma = config.soft_min_snr_gamma
        per_example = per_example * (gamma / (snr + gamma))

    if loss_weight is not None:
        per_example = per_example * loss_weight.astype(jnp.float32)
    return jnp.mean(per_example)
