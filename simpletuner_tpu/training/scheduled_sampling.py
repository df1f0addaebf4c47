"""Scheduled sampling: train on the model's own rollout states.

Reference: helpers/scheduled_sampling/{plan,rollout,skrample_adapter}.py applied
at trainer.py:5642-5648 / common.py:5493-5516 — with some probability the
training point x_σ is produced by rolling the model's own (stop-gradient)
predictions down from a higher noise level instead of the analytic
interpolation, mitigating exposure bias.

Reference surface covered here:

* ``scheduled_sampling_max_step_offset`` — the master gate (common.py:5493):
  offsets are sampled in integer train-timestep units and the source state is
  recreated at ``base_t + offset`` then rolled back down to ``base_t``
  (plan.py:59, rollout.py:140-166 flow / :253-318 eps-v).
* ``scheduled_sampling_strategy`` — offset distribution (plan.py:49-56):
  uniform | biased_early (u²·K, favours small offsets) | biased_late
  ((1−u²)·K); unknown names raise, as the reference does.
* ``scheduled_sampling_sampler`` / ``scheduled_sampling_order`` — the solver
  for eps/v rollouts (rollout.py:229-231 + skrample_adapter.py:133-159):
  euler (order 1), dpm (DPM-Solver++ multistep, order ≤ 2), unipc (UniPC-bh2
  predictor, order ≤ 3).  The math is re-derived from the DPM-Solver++ /
  UniPC papers in data-prediction (x₀) space — see ``ddpm_rollout_step``.
  Orders above each solver's cap clamp (skrample caps DPM the same way);
  unknown sampler names raise (skrample_adapter.py:159).

jit shape: the reference loops Python-level per sample per timestep
(rollout.py:107/253) — fine for torch eager, hostile to XLA.  Here every
rollout is a fixed-K ``lax.fori_loop`` over the *whole batch* where each lane
is active only while its own ``t > base_t``; one compiled program covers every
(offset, probability) draw, and the multistep solver state (previous x₀
predictions + their log-SNRs) rides the loop carry.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_STRATEGIES = ("uniform", "biased_early", "biased_late")
_SAMPLERS = {"euler": 1, "dpm": 2, "unipc": 3}  # name -> max supported order


@dataclasses.dataclass(frozen=True)
class ScheduledSamplingConfig:
    max_steps: int = 0  # flow rollout steps (repo-native σ-space knob)
    max_step_offset: int = 0  # reference master knob: offset in timestep units
    probability: float = 0.5  # chance a batch uses rollout at all
    step_size: float = 0.05  # σ distance covered by each flow rollout step
    strategy: str = "uniform"  # offset distribution (plan.py:49-56)
    sampler: str = "unipc"  # eps/v solver (skrample_adapter.py:133-159)
    order: int = 2  # solver order (euler caps 1, dpm 2, unipc 3)
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
        strategy = str(config.get("scheduled_sampling_strategy", "uniform") or "uniform")
        if strategy not in _STRATEGIES:
            # reference plan.py:56 raises on unknown strategies
            raise ValueError(
                f"Unknown scheduled sampling strategy: {strategy!r} (choose from {_STRATEGIES})"
            )
        sampler = str(config.get("scheduled_sampling_sampler", "unipc") or "unipc").strip().lower()
        if sampler not in _SAMPLERS:
            # reference skrample_adapter.py:159 raises on unknown samplers
            raise ValueError(
                f"Unsupported scheduled sampling sampler: {sampler!r} (choose from {tuple(_SAMPLERS)})"
            )
        order = int(config.get("scheduled_sampling_order", 2) or 2)
        probability = config.get("scheduled_sampling_probability")
        return cls(
            max_steps=int(config.get("scheduled_sampling_max_steps", 0) or 0),
            max_step_offset=int(config.get("scheduled_sampling_max_step_offset", 0) or 0),
            # an explicit 0.0 must survive ("or" would swallow it to 0.5)
            probability=0.5 if probability is None else float(probability),
            step_size=float(config.get("scheduled_sampling_step_size", 0.05) or 0.05),
            strategy=strategy,
            sampler=sampler,
            order=max(1, min(order, _SAMPLERS[sampler])),
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

    @property
    def enabled(self) -> bool:
        return self.max_steps > 0 or self.max_step_offset > 0

    def flow_rollout_params(self, num_train_timesteps: int = 1000) -> Tuple[int, float]:
        """(K, Δσ) for the flow rollout.  With the repo-native ``max_steps``
        knob, Δσ is ``step_size``; with the reference ``max_step_offset``
        knob, offsets are in integer timestep units so Δσ = 1/(T−1) — exactly
        the per-step fraction the reference Euler loop covers
        (rollout.py:144-166: t steps by 1, frac = t/denom)."""
        if self.max_steps > 0:
            return self.max_steps, self.step_size
        denom = max(float(num_train_timesteps - 1), 1.0)
        return self.max_step_offset, 1.0 / denom

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


def sample_rollout_offsets(
    rng: jax.Array, batch_size: int, max_offset: int, strategy: str
) -> jax.Array:
    """Per-sample rollout offsets ∈ [0, max_offset] (reference plan.py:49-56).

    uniform       randint(0, K+1)
    biased_early  round(u²·K)   — mass near 0 (short rollouts)
    biased_late   round((1−u²)·K) — mass near K (long rollouts)
    """
    if strategy == "uniform":
        return jax.random.randint(rng, (batch_size,), 0, max_offset + 1)
    u = jax.random.uniform(rng, (batch_size,))
    if strategy == "biased_early":
        return jnp.round(u**2 * max_offset).astype(jnp.int32)
    if strategy == "biased_late":
        return jnp.round((1.0 - u**2) * max_offset).astype(jnp.int32)
    raise ValueError(f"Unknown scheduled sampling strategy: {strategy}")


# ---------------------------------------------------------------------------------
# eps/v rollout solvers (data-prediction exponential integrators)
# ---------------------------------------------------------------------------------
#
# All three solvers share the exponential-integrator form in x₀-prediction
# space.  With ᾱ_t the cumulative alpha table, α_t = √ᾱ_t, σ_t = √(1−ᾱ_t),
# λ_t = log(α_t/σ_t) (log-SNR/2), and m_i the model's x₀ predictions:
#
#   order 1 (euler == DDIM η=0 == DPM-Solver++(1)):
#       x_s = (σ_s/σ_t)·x − α_s·(e^{−h} − 1)·m0,          h = λ_s − λ_t
#   order 2 (DPM-Solver++(2M), == UniPC-bh2 p2 — the B_h=expm1(−h) terms
#   coincide, verified algebraically in tests):
#       r  = (λ_t − λ_p)/h      (previous interval ratio)
#       D  = m0 + (m0 − m1)/(2r)
#       x_s = (σ_s/σ_t)·x − α_s·(e^{−h} − 1)·D
#   order 3 (UniPC-bh2 predictor with two history points): the R·ρ = b
#   Vandermonde system of the UniPC paper, solved in closed form for the
#   2×2 case inside the loop (no jnp.linalg in the hot path).
#
# The torch reference reaches the same math through skrample's UniPC/DPM
# classes (skrample_adapter.py:147-155); re-derived here, not translated.


def _lambda_tables(alphas_cumprod: jax.Array):
    ac = jnp.clip(alphas_cumprod.astype(jnp.float32), 1e-8, 1.0 - 1e-8)
    alpha = jnp.sqrt(ac)
    sigma = jnp.sqrt(1.0 - ac)
    lam = jnp.log(alpha / sigma)
    return alpha, sigma, lam


def ddpm_rollout_step(
    x: jax.Array,
    m0: jax.Array,
    t_cur: jax.Array,
    t_next: jax.Array,
    tables,
    history,
    order: int,
):
    """One batched solver step t_cur → t_next in x₀-prediction space.

    ``history`` = (m1, lam1, m2, lam2, n_prev): previous x₀ predictions,
    their λ values and a per-lane count of how many are valid.  Effective
    order degrades gracefully on the first step(s) of each rollout, exactly
    like torch multistep schedulers warm up.
    """
    alpha, sigma, lam = tables
    m1, lam1, m2, lam2, n_prev = history
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)

    lam_t = lam[t_cur].reshape(shape)
    lam_s = lam[t_next].reshape(shape)
    a_s = alpha[t_next].reshape(shape)
    s_s = sigma[t_next].reshape(shape)
    s_t = sigma[t_cur].reshape(shape)

    h = lam_s - lam_t
    h_safe = jnp.where(jnp.abs(h) < 1e-8, 1e-8, h)
    phi = jnp.expm1(-h)  # e^{−h} − 1  (negative for h>0)
    base = (s_s / s_t) * x

    # order 1: DDIM
    x1 = base - a_s * phi * m0

    # order 2: DPM-Solver++(2M)
    have1 = (n_prev >= 1).reshape(shape).astype(jnp.float32)
    r1 = (lam_t - lam1.reshape(shape)) / h_safe
    r1 = jnp.where(jnp.abs(r1) < 1e-8, 1e-8, r1)
    d2 = m0 + have1 * (m0 - m1) / (2.0 * r1)
    x2 = base - a_s * phi * d2

    if order >= 3:
        # UniPC-bh2 predictor, p=3: two history points at λ_p1, λ_p2.
        # rks (in the paper's convention, relative to the CURRENT λ_t and
        # normalised by h): rk_i = (λ_pi − λ_t)/h  (negative).
        have2 = (n_prev >= 2).reshape(shape).astype(jnp.float32)
        rk1 = (lam1.reshape(shape) - lam_t) / h_safe
        rk2 = (lam2.reshape(shape) - lam_t) / h_safe
        rk1 = jnp.where(jnp.abs(rk1) < 1e-8, -1e-8, rk1)
        rk2 = jnp.where(jnp.abs(rk2 - rk1) < 1e-8, rk1 - 1e-8, rk2)
        d1 = (m1 - m0) / rk1
        d2u = (m2 - m0) / rk2
        hh = -h_safe
        h_phi_1 = jnp.expm1(hh)
        b_h = h_phi_1  # bh2 variant: B(h) = expm1(hh)
        # b_k = h_phi_k · k! / B_h with h_phi_{k+1} = h_phi_k/hh − 1/(k+1)!
        h_phi_2 = h_phi_1 / hh - 1.0
        h_phi_3 = h_phi_2 / hh - 0.5
        b1 = h_phi_2 * 1.0 / b_h
        b2 = h_phi_3 * 2.0 / b_h
        # solve [[1, 1], [rk1, rk2]] · ρ = [b1, b2]
        rho2 = (b2 - rk1 * b1) / (rk2 - rk1)
        rho1 = b1 - rho2
        x3 = base - a_s * h_phi_1 * m0 - a_s * b_h * (rho1 * d1 + rho2 * d2u)
        eff3 = have2  # only once two history points exist
    else:
        x3 = x2
        eff3 = jnp.zeros(shape, jnp.float32)

    if order == 1:
        return x1
    x_out = jnp.where(have1 > 0, x2, x1)
    if order >= 3:
        x_out = jnp.where(eff3 > 0, x3, x_out)
    return x_out


def ddpm_rollout(
    predict_x0: Callable[[jax.Array, jax.Array], jax.Array],
    latents: jax.Array,
    noise: jax.Array,
    base_t: jax.Array,
    offsets: jax.Array,
    alphas_cumprod: jax.Array,
    sampler: str = "unipc",
    order: int = 2,
    max_offset: int = 0,
) -> jax.Array:
    """Roll the model's own x₀ predictions from ``base_t + offset`` down to
    ``base_t`` (reference rollout.py:253-318, vectorised).

    Returns the rolled-out noisy latents; lanes with offset 0 return their
    analytic state at base_t unchanged.
    """
    order = max(1, min(int(order), _SAMPLERS[sampler]))
    steps = int(max_offset)
    tables = _lambda_tables(alphas_cumprod)
    alpha, sigma, _ = tables
    n_train = alphas_cumprod.shape[0]
    shape = (latents.shape[0],) + (1,) * (latents.ndim - 1)

    source_t = jnp.clip(base_t + offsets, 0, n_train - 1)  # plan.py:59
    x0f = latents.astype(jnp.float32)
    x_src = (
        alpha[source_t].reshape(shape) * x0f
        + sigma[source_t].reshape(shape) * noise.astype(jnp.float32)
    )

    zeros = jnp.zeros_like(x_src)
    zlam = jnp.zeros(x_src.shape[0], jnp.float32)
    init = (x_src, zeros, zlam, zeros, zlam, jnp.zeros(x_src.shape[0], jnp.int32))

    def body(i, carry):
        x, m1, lam1, m2, lam2, n_prev = carry
        t_cur = source_t - i
        active = t_cur > base_t
        t_cur_c = jnp.clip(t_cur, 0, n_train - 1)
        t_next_c = jnp.clip(t_cur - 1, 0, n_train - 1)
        m0 = predict_x0(x, t_cur_c).astype(jnp.float32)
        x_new = ddpm_rollout_step(
            x, m0, t_cur_c, t_next_c, tables, (m1, lam1, m2, lam2, n_prev), order
        )
        act = active.reshape(shape).astype(jnp.float32)
        x = act * x_new + (1.0 - act) * x
        lam_t = tables[2][t_cur_c]
        m2 = jnp.where(active.reshape(shape), m1, m2)
        lam2 = jnp.where(active, lam1, lam2)
        m1 = jnp.where(active.reshape(shape), m0, m1)
        lam1 = jnp.where(active, lam_t, lam1)
        n_prev = jnp.where(active, jnp.minimum(n_prev + 1, 2), n_prev)
        return x, m1, lam1, m2, lam2, n_prev

    if steps > 0:
        x_final = jax.lax.fori_loop(0, steps, body, init)[0]
    else:
        x_final = x_src
    return x_final


def _apply_ddpm_scheduled_sampling(
    model,
    variables: Dict[str, Any],
    prepared: Dict[str, jax.Array],
    rng: jax.Array,
    ss_config: ScheduledSamplingConfig,
) -> Dict[str, jax.Array]:
    """eps/v/sample-prediction scheduled sampling (reference rollout.py:202-322).

    Replaces ``noisy_latents`` with a solver rollout from a noisier source
    timestep; ``timesteps`` and ``target`` stay at the base draw (the
    reference's plan.target_timesteps ARE the base timesteps, rollout.py:318),
    so the model is trained to pull the off-manifold rolled state back toward
    the original target — the exposure-bias correction itself.
    """
    base_t = prepared["timesteps"]
    batch = base_t.shape[0]
    shape = (batch,) + (1,) * (prepared["noisy_latents"].ndim - 1)
    ac = model.alphas_cumprod
    alpha_tab, sigma_tab, _ = _lambda_tables(ac)

    rng_k, rng_p = jax.random.split(rng)
    offsets = sample_rollout_offsets(
        rng_k, batch, ss_config.max_step_offset, ss_config.strategy
    )
    probability = ss_config.probability_at(prepared.get("global_step", 0))
    use = jax.random.uniform(rng_p, (batch,)) < probability
    offsets = jnp.where(use, offsets, 0)

    def predict_x0(x, t):
        roll = dict(prepared)
        roll["noisy_latents"] = x
        roll["timesteps"] = t
        pred = jax.lax.stop_gradient(model.model_predict(variables, roll)).astype(jnp.float32)
        a = alpha_tab[t].reshape(shape)
        s = sigma_tab[t].reshape(shape)
        if model.prediction_type == "v_prediction":
            return a * x - s * pred  # rollout.py:49-50
        if model.prediction_type == "epsilon":
            return (x - s * pred) / a  # rollout.py:47-48
        return pred  # sample prediction is already x₀

    x_rolled = ddpm_rollout(
        predict_x0,
        prepared["latents"],
        prepared["noise"],
        base_t,
        offsets,
        ac,
        sampler=ss_config.sampler,
        order=ss_config.order,
        max_offset=ss_config.max_step_offset,
    )
    out = dict(prepared)
    # rollout.py:131-135: offset-0 lanes keep the ORIGINAL noisy latents
    # (which may include input perturbation the recreation lacks)
    n_train = ac.shape[0]
    did_roll = (jnp.clip(base_t + offsets, 0, n_train - 1) > base_t).reshape(shape)
    out["noisy_latents"] = jnp.where(did_roll, x_rolled, prepared["noisy_latents"])
    return out


def apply_scheduled_sampling(
    model,
    variables: Dict[str, Any],
    prepared: Dict[str, jax.Array],
    rng: jax.Array,
    ss_config: ScheduledSamplingConfig,
) -> Dict[str, jax.Array]:
    """Replace ``noisy_latents`` with a K-step self-rollout state."""
    if not ss_config.enabled:
        return prepared
    if not model.is_flow:
        if ss_config.max_step_offset <= 0:
            return prepared  # σ-space max_steps has no eps/v meaning
        return _apply_ddpm_scheduled_sampling(model, variables, prepared, rng, ss_config)
    max_steps, step_size = ss_config.flow_rollout_params()
    if max_steps <= 0:
        return prepared
    sigmas = prepared["sigmas"]
    latents = prepared["noisy_latents"]
    batch = sigmas.shape[0]
    shape = (batch,) + (1,) * (latents.ndim - 1)

    rng_k, rng_p, rng_noise = jax.random.split(rng, 3)
    k = sample_rollout_offsets(rng_k, batch, max_steps, ss_config.strategy)
    probability = ss_config.probability_at(prepared.get("global_step", 0))
    use = jax.random.uniform(rng_p, (batch,)) < probability
    k = jnp.where(use, k, 0)

    # start higher: σ_start = min(σ + k·Δ, 1); x_start re-noised to σ_start
    sigma_start = jnp.minimum(sigmas + k.astype(jnp.float32) * step_size, 1.0)
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

    x_final, _ = jax.lax.fori_loop(0, max_steps, body, (x, sigma_start))
    out = dict(prepared)
    use = use & (k > 0)
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
