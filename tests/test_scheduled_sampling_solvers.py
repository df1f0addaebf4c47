"""Scheduled-sampling strategy/sampler/order knobs (reference
helpers/scheduled_sampling/plan.py:49-56 strategies, rollout.py:202-322 eps/v
solver rollout, skrample_adapter.py:133-159 sampler factory; pinned behaviors
mirror tests/test_scheduled_sampling_rollout.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpletuner_tpu.training.losses import DDPMScheduleConfig, make_alphas_cumprod, add_noise
from simpletuner_tpu.training.scheduled_sampling import (
    ScheduledSamplingConfig,
    _lambda_tables,
    apply_scheduled_sampling,
    ddpm_rollout,
    ddpm_rollout_step,
    sample_rollout_offsets,
)


def _cfg(**kw):
    class _C(dict):
        def __getattr__(self, k):
            return self.get(k)

    base = dict(
        scheduled_sampling_max_step_offset=4,
        scheduled_sampling_probability=1.0,
    )
    base.update(kw)
    return _C(base)


# ---------------------------------------------------------------------------------
# offset strategies (plan.py:49-56)
# ---------------------------------------------------------------------------------


def test_strategy_distributions_ordered():
    rng = jax.random.PRNGKey(0)
    K = 10
    means = {}
    for strategy in ("biased_early", "uniform", "biased_late"):
        k = sample_rollout_offsets(rng, 4096, K, strategy)
        k = np.asarray(k)
        assert k.min() >= 0 and k.max() <= K
        means[strategy] = k.mean()
    # uniform mean = K/2; u^2 biases early (mean K/3), 1-u^2 late (mean 2K/3)
    assert means["biased_early"] < means["uniform"] < means["biased_late"]
    assert abs(means["uniform"] - K / 2) < 0.5


def test_unknown_strategy_and_sampler_raise():
    with pytest.raises(ValueError, match="strategy"):
        ScheduledSamplingConfig.from_config(_cfg(scheduled_sampling_strategy="spiral"))
    with pytest.raises(ValueError, match="sampler"):
        ScheduledSamplingConfig.from_config(_cfg(scheduled_sampling_sampler="rk4"))


def test_order_clamps_per_sampler():
    assert ScheduledSamplingConfig.from_config(
        _cfg(scheduled_sampling_sampler="euler", scheduled_sampling_order=5)
    ).order == 1
    assert ScheduledSamplingConfig.from_config(
        _cfg(scheduled_sampling_sampler="dpm", scheduled_sampling_order=5)
    ).order == 2
    assert ScheduledSamplingConfig.from_config(
        _cfg(scheduled_sampling_sampler="unipc", scheduled_sampling_order=9)
    ).order == 3


def test_flow_rollout_params_from_offset():
    ss = ScheduledSamplingConfig.from_config(_cfg(scheduled_sampling_max_step_offset=5))
    k, step = ss.flow_rollout_params(1000)
    assert k == 5 and abs(step - 1.0 / 999.0) < 1e-9
    ss = ScheduledSamplingConfig.from_config(
        _cfg(scheduled_sampling_max_steps=3, scheduled_sampling_step_size=0.07)
    )
    assert ss.flow_rollout_params(1000) == (3, pytest.approx(0.07))


# ---------------------------------------------------------------------------------
# solver math
# ---------------------------------------------------------------------------------


def _tables():
    return make_alphas_cumprod(DDPMScheduleConfig())


def test_exact_data_prediction_reaches_analytic_state():
    """If the model's x0 prediction is exact and constant, every solver's
    rollout lands exactly on the analytic interpolation at base_t (the
    exponential integrators are exact for constant data prediction)."""
    ac = _tables()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, 4, 4, 2)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    base_t = jnp.asarray([100, 500, 900], jnp.int32)
    offsets = jnp.asarray([6, 0, 3], jnp.int32)

    analytic = add_noise(x0, noise, base_t, ac)
    for sampler, order in (("euler", 1), ("dpm", 2), ("unipc", 3)):
        rolled = ddpm_rollout(
            lambda x, t: x0, x0, noise, base_t, offsets, ac,
            sampler=sampler, order=order, max_offset=6,
        )
        np.testing.assert_allclose(np.asarray(rolled), np.asarray(analytic),
                                   rtol=2e-4, atol=2e-4)


def test_unipc_p2_identity_with_dpm2m():
    """UniPC-bh2 predictor at order 2 (rhos_p = [1/2], B_h = expm1(-h)) is
    algebraically DPM-Solver++(2M); pin the identity on random states so the
    shared order-2 code path is justified."""
    ac = _tables()
    tables = _lambda_tables(ac)
    alpha, sigma, lam = tables
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    m0 = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    m1 = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    t_cur = jnp.asarray([700, 300], jnp.int32)
    t_next = t_cur - 1
    t_prev = t_cur + 2
    lam1 = lam[t_prev]
    hist = (m1, lam1, jnp.zeros_like(m1), jnp.zeros_like(lam1),
            jnp.ones(2, jnp.int32))

    x_dpm = ddpm_rollout_step(x, m0, t_cur, t_next, tables, hist, order=2)

    # UniPC-bh2 p2 written independently from the paper's R*rho=b system
    shape = (2, 1)
    lam_t = lam[t_cur].reshape(shape); lam_s = lam[t_next].reshape(shape)
    a_s = alpha[t_next].reshape(shape); s_s = sigma[t_next].reshape(shape)
    s_t = sigma[t_cur].reshape(shape)
    h = lam_s - lam_t
    rk1 = (lam1.reshape(shape) - lam_t) / h
    d1 = (m1 - m0) / rk1
    h_phi_1 = jnp.expm1(-h)
    b_h = h_phi_1
    x_unipc = (s_s / s_t) * x - a_s * h_phi_1 * m0 - a_s * b_h * 0.5 * d1

    np.testing.assert_allclose(np.asarray(x_dpm), np.asarray(x_unipc), rtol=1e-5)


def test_higher_order_solvers_reduce_integration_error():
    """Against a time-varying data prediction m(λ), the exact update is the
    variation-of-constants integral x_s = (σ_s/σ_t)x + σ_s ∫ e^λ m(λ) dλ;
    order 2 must beat order 1 and order 3 must not be worse than order 2."""
    ac = _tables()
    alpha, sigma, lam = map(np.asarray, _lambda_tables(ac))

    def m_of_lam(l):
        return np.sin(1.7 * l) + 0.3 * l  # smooth, non-polynomial

    lam_j = jnp.asarray(lam, jnp.float32)

    def predict_fn(x, t):
        l = lam_j[t].reshape(x.shape[0], 1)
        return jnp.sin(1.7 * l) + 0.3 * l

    base_t = 640
    offset = 8
    source_t = base_t + offset

    errs = {}
    for sampler, order in (("euler", 1), ("dpm", 2), ("unipc", 3)):
        rolled = ddpm_rollout(
            predict_fn,
            jnp.zeros((1, 1), jnp.float32),  # zero latents/noise -> start = 0
            jnp.zeros((1, 1), jnp.float32),
            jnp.asarray([base_t], jnp.int32),
            jnp.asarray([offset], jnp.int32),
            ac, sampler=sampler, order=order, max_offset=offset,
        )
        errs[(sampler, order)] = rolled

    # dense quadrature ground truth from the same zero start
    x_exact = 0.0
    for t in range(source_t, base_t, -1):
        lt, ls = lam[t], lam[t - 1]
        grid = np.linspace(lt, ls, 4001)
        integral = np.trapezoid(np.exp(grid) * m_of_lam(grid), grid)
        x_exact = (sigma[t - 1] / sigma[t]) * x_exact + sigma[t - 1] * integral

    e1 = abs(float(errs[("euler", 1)][0, 0]) - x_exact)
    e2 = abs(float(errs[("dpm", 2)][0, 0]) - x_exact)
    e3 = abs(float(errs[("unipc", 3)][0, 0]) - x_exact)
    assert e2 < e1 * 0.5, (e1, e2, e3)
    assert e3 <= e2 * 1.1, (e1, e2, e3)


# ---------------------------------------------------------------------------------
# eps/v apply path (rollout.py:202-322 semantics)
# ---------------------------------------------------------------------------------


class _EpsModel:
    """Minimal eps-prediction family: model output is a fixed linear map of
    the state so rollouts are deterministic and state-dependent."""

    is_flow = False
    prediction_type = "epsilon"

    def __init__(self):
        self.alphas_cumprod = _tables()

    def model_predict(self, variables, prepared):
        return 0.9 * prepared["noisy_latents"] + 0.05


def test_ddpm_apply_updates_only_rolled_lanes():
    model = _EpsModel()
    rng = np.random.default_rng(3)
    latents = jnp.asarray(rng.normal(size=(4, 4, 4, 2)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=latents.shape), jnp.float32)
    base_t = jnp.asarray([100, 400, 700, 980], jnp.int32)
    prepared = {
        "latents": latents,
        "noise": noise,
        "timesteps": base_t,
        "noisy_latents": add_noise(latents, noise, base_t, model.alphas_cumprod),
        "target": noise,
    }
    ss = ScheduledSamplingConfig.from_config(
        _cfg(scheduled_sampling_max_step_offset=5, scheduled_sampling_sampler="unipc")
    )
    out = apply_scheduled_sampling(model, {}, prepared, jax.random.PRNGKey(0), ss)
    # timesteps and target stay at the base draw (rollout.py:318: target
    # timesteps ARE the base timesteps)
    np.testing.assert_array_equal(np.asarray(out["timesteps"]), np.asarray(base_t))
    np.testing.assert_array_equal(np.asarray(out["target"]), np.asarray(noise))
    delta = np.abs(np.asarray(out["noisy_latents"]) - np.asarray(prepared["noisy_latents"]))
    per_lane = delta.reshape(4, -1).max(axis=1)
    assert (per_lane > 1e-6).sum() >= 2  # prob=1, K=5: most lanes roll

    # probability 0: untouched
    ss0 = ScheduledSamplingConfig.from_config(
        _cfg(scheduled_sampling_max_step_offset=5, scheduled_sampling_probability=0.0)
    )
    out0 = apply_scheduled_sampling(model, {}, prepared, jax.random.PRNGKey(0), ss0)
    np.testing.assert_array_equal(
        np.asarray(out0["noisy_latents"]), np.asarray(prepared["noisy_latents"])
    )


def test_ddpm_apply_is_jittable():
    model = _EpsModel()
    latents = jnp.ones((2, 4, 4, 2), jnp.float32)
    noise = jnp.zeros_like(latents) + 0.3
    base_t = jnp.asarray([200, 800], jnp.int32)
    prepared = {
        "latents": latents,
        "noise": noise,
        "timesteps": base_t,
        "noisy_latents": add_noise(latents, noise, base_t, model.alphas_cumprod),
        "target": noise,
    }
    ss = ScheduledSamplingConfig.from_config(_cfg(scheduled_sampling_max_step_offset=3))

    @jax.jit
    def run(rng):
        return apply_scheduled_sampling(model, {}, prepared, rng, ss)["noisy_latents"]

    out = run(jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()
