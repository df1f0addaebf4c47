"""Scheduler correctness via exact-oracle denoisers: if the model prediction is
the analytically exact target, the sampler must land on x0 (up to terminal-σ
truncation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.schedulers import (
    DDIMScheduler,
    FlowMatchEulerScheduler,
    UniPCScheduler,
    sample_loop,
)
from simpletuner_tpu.training.losses import DDPMScheduleConfig


def _x0_noise(shape=(2, 8, 8, 4), seed=0):
    k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
    return jax.random.normal(k0, shape), jax.random.normal(k1, shape)


class TestFlowEuler:
    def test_exact_velocity_recovers_x0(self):
        x0, noise = _x0_noise()
        sched = FlowMatchEulerScheduler.create(num_steps=8, shift=3.0)

        def denoise(latents, sigma):
            # exact velocity along the straight path through x0: v = (x−x0)/σ
            return (latents - x0) / jnp.maximum(sigma, 1e-8)

        out = jax.jit(lambda n: sample_loop(sched, denoise, n))(noise)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)

    def test_sigma_ladder_monotone(self):
        sched = FlowMatchEulerScheduler.create(num_steps=20, shift=3.0)
        s = np.asarray(sched.sigmas)
        assert s[0] == pytest.approx(1.0, abs=1e-6)
        assert s[-1] == 0.0
        assert np.all(np.diff(s) < 0)

    def test_dynamic_shift_pushes_sigmas_up(self):
        lo = FlowMatchEulerScheduler.create(8, use_dynamic_shifting=True, image_seq_len=256)
        hi = FlowMatchEulerScheduler.create(8, use_dynamic_shifting=True, image_seq_len=4096)
        assert np.asarray(hi.sigmas[:-1]).mean() > np.asarray(lo.sigmas[:-1]).mean()


class TestDDIM:
    @pytest.mark.parametrize("pred_type", ["epsilon", "v_prediction"])
    def test_exact_oracle_recovers_x0(self, pred_type):
        x0, noise = _x0_noise()
        sched = DDIMScheduler.create(
            num_steps=10, schedule=DDPMScheduleConfig(), prediction_type=pred_type
        )

        def denoise(latents, t):
            ac = sched.alphas_cumprod[t]
            a, s = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
            eps = (latents - a * x0) / s
            if pred_type == "epsilon":
                return eps
            return a * eps - s * x0  # v = √ᾱ·ε − √(1−ᾱ)·x0

        out = jax.jit(lambda n: sample_loop(sched, denoise, n))(noise)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


class TestUniPC:
    def test_flow_oracle_recovers_x0(self):
        x0, noise = _x0_noise()
        sched = UniPCScheduler.create_flow(num_steps=12, shift=3.0)

        def denoise(latents, sigma):
            return (latents - x0) / jnp.maximum(sigma, 1e-8)

        out = jax.jit(lambda n: sample_loop(sched, denoise, n))(noise)
        # terminal σ = 1e-3 leaves that much residual noise
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=2e-2)

    def test_ddpm_eps_oracle_recovers_x0(self):
        x0, noise = _x0_noise()
        sched = UniPCScheduler.create_ddpm(num_steps=12, prediction_type="epsilon")

        def denoise(latents, t):
            # recover the step index from the integer timestep to look up (α,σ)
            ratio = 1000 // sched.num_steps
            idx = (sched.num_steps - 1) - t // ratio
            a, s = sched.alphas[idx], sched.sigmas[idx]
            return (latents - a * x0) / s

        out = jax.jit(lambda n: sample_loop(sched, denoise, n))(noise)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-2)


class TestImg2Img:
    def test_strength_skips_steps_and_preserves_structure(self):
        """Low strength keeps the result close to the init latents; strength=1
        ignores them entirely."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from simpletuner_tpu.schedulers import FlowMatchEulerScheduler, sample_loop

        sched = FlowMatchEulerScheduler.create(num_steps=8, shift=1.0)
        init = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        noise = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        denoise = lambda latents, t: jnp.zeros_like(latents)  # identity flow

        weak = sample_loop(sched, denoise, noise, init_latents=init, strength=0.25)
        # v==0 leaves latents unchanged, so the output equals init noised at
        # the entry sigma (sigma at step 6 of 8 = 0.25)
        sigma = float(sched.sigmas[6])
        expected = (1 - sigma) * np.asarray(init) + sigma * np.asarray(noise)
        np.testing.assert_allclose(np.asarray(weak), expected, atol=1e-5)

        full = sample_loop(sched, denoise, noise, init_latents=init, strength=1.0)
        np.testing.assert_allclose(np.asarray(full), np.asarray(noise), atol=1e-5)

    def test_ddim_add_noise_endpoint(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from simpletuner_tpu.schedulers import DDIMScheduler

        sched = DDIMScheduler.create(num_steps=10)
        init = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
        noise = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
        noised = sched.add_noise(init, noise, 9)  # lowest-noise step
        # at the final step alpha_bar is close to 1 -> mostly the init image
        err_init = float(jnp.mean((noised - init) ** 2))
        err_noise = float(jnp.mean((noised - noise) ** 2))
        assert err_init < err_noise


class TestPerFamilyDDPMBetas:
    """Reference loads each model's hub scheduler config (common.py:4270);
    families must pin their published beta schedules, not inherit SD's."""

    def _schedule(self, family):
        from simpletuner_tpu.configuration import TrainingConfig
        from simpletuner_tpu.models.registry import ModelRegistry

        cls = ModelRegistry.get(family)
        cfg = TrainingConfig({"model_family": family, "model_type": "lora",
                              "lora_rank": 2, "optimizer": "adamw",
                              "learning_rate": 1e-4, "max_train_steps": 1})
        return cls(cfg).ddpm_schedule_config()

    def test_sd_family_scaled_linear(self):
        for family in ("sd1x", "sdxl", "kolors"):
            sched = self._schedule(family)
            assert sched.beta_schedule == "scaled_linear"
            assert sched.beta_start == 0.00085 and sched.beta_end == 0.012

    def test_pixart_iddpm_linear(self):
        sched = self._schedule("pixart_sigma")
        assert sched.beta_schedule == "linear"
        assert sched.beta_start == 0.0001 and sched.beta_end == 0.02

    def test_deepfloyd_squaredcos(self):
        assert self._schedule("deepfloyd").beta_schedule == "squaredcos_cap_v2"

    def test_stable_cascade_matches_wuerstchen_cosine(self):
        """squaredcos_cap_v2 must track the DDPMWuerstchenScheduler continuous
        alpha_cumprod (s=0.008) it discretizes."""
        import math

        from simpletuner_tpu.training.losses import make_alphas_cumprod

        sched = self._schedule("stable_cascade")
        assert sched.beta_schedule == "squaredcos_cap_v2"
        ac = np.asarray(make_alphas_cumprod(sched))
        s = 0.008
        init = math.cos(s / (1 + s) * math.pi / 2) ** 2
        t = (np.arange(1000) + 1) / 1000.0
        want = np.cos((t + s) / (1 + s) * math.pi / 2) ** 2 / init
        np.testing.assert_allclose(ac[:-5], want[:-5], atol=2e-3)
