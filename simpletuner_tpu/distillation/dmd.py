"""Distribution Matching Distillation (DMD2-style, flow-matching variant).

Reference: helpers/distillation/dmd (DMD method with generator_loss_step +
fake-score discriminator_step hooks).  Roles here:

* **real score** — the frozen base model (adapters zeroed), fixed;
* **fake score (critic)** — base + a second adapter set (``critic_lora``),
  trained to denoise the *student's* outputs (so it tracks the student
  distribution);
* **generator (student)** — base + ``lora``, updated along the distribution
  matching direction ∇ ≈ s_fake − s_real evaluated at re-noised student
  samples.

Both adapter sets live in one trainable pytree and update in the same step;
stop-gradients keep the two objectives from leaking into each other
(functionally the reference's alternating generator/discriminator steps).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .common import DistillationBase


class DMDDistillation(DistillationBase):
    name = "dmd"
    requires_teacher = False  # the frozen base itself is the real score
    requires_critic = True

    def __init__(self, config: Any, method_config=None):
        super().__init__(config, method_config)
        self.dm_weight = float(self.method_config.get("dm_weight", 1.0))
        self.critic_weight = float(self.method_config.get("critic_weight", 1.0))
        self.guidance_eta = float(self.method_config.get("guidance_eta", 1.0))

    @staticmethod
    def _with_adapter(variables: Dict[str, Any], adapter) -> Dict[str, Any]:
        out = {k: v for k, v in variables.items() if k not in ("lora", "critic_lora", "teacher")}
        out["lora"] = adapter
        return out

    def distill_loss(
        self,
        model,
        variables: Dict[str, Any],
        prepared: Dict[str, jax.Array],
        model_pred: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if not model.is_flow:
            raise NotImplementedError("DMD here targets flow-matching families")
        # student x0 (keeps gradients to the generator adapters)
        x0_student = self.flow_x0(prepared["noisy_latents"], model_pred, prepared["sigmas"])
        return self._dmd_losses(model, variables, x0_student, prepared, rng)

    def _dmd_losses(
        self,
        model,
        variables: Dict[str, Any],
        x0_student: jax.Array,
        prepared: Dict[str, jax.Array],
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Distribution-matching generator loss + fake-score critic loss for a
        student sample ``x0_student`` (gradients flow into the generator)."""
        if "critic_lora" not in variables:
            raise KeyError("DMD requires critic adapters (state.trainable['critic_lora'])")

        sigmas = prepared["sigmas"]
        noisy = x0_student
        shape = (sigmas.shape[0],) + (1,) * (noisy.ndim - 1)

        # re-noise the student sample at a fresh sigma
        rng_s, rng_n = jax.random.split(rng)
        sigma_p = jax.random.uniform(rng_s, sigmas.shape, minval=0.05, maxval=0.95)
        eps = jax.random.normal(rng_n, noisy.shape, jnp.float32)
        x0_sg = jax.lax.stop_gradient(x0_student)
        x_renoised = (1.0 - sigma_p.reshape(shape)) * x0_sg + sigma_p.reshape(shape) * eps

        renoised_prepared = dict(prepared)
        renoised_prepared["noisy_latents"] = x_renoised
        renoised_prepared["sigmas"] = sigma_p
        renoised_prepared["timesteps"] = sigma_p

        zero_lora = jax.tree_util.tree_map(jnp.zeros_like, variables["lora"])
        real_vars = self._with_adapter(variables, zero_lora)
        critic_vars = self._with_adapter(variables, variables["critic_lora"])

        v_real = jax.lax.stop_gradient(model.model_predict(real_vars, renoised_prepared))
        v_fake_sg = jax.lax.stop_gradient(model.model_predict(critic_vars, renoised_prepared))

        # ---- generator (distribution matching) -------------------------------------------
        # pull x0 toward where the real score exceeds the fake score: the DMD
        # surrogate loss whose gradient w.r.t. x0 is (s_fake − s_real)
        x0_real = self.flow_x0(x_renoised, v_real, sigma_p)
        x0_fake = self.flow_x0(x_renoised, v_fake_sg, sigma_p)
        grad_dir = x0_fake - x0_real
        normalizer = jnp.mean(jnp.abs(grad_dir), axis=tuple(range(1, grad_dir.ndim)), keepdims=True)
        grad_dir = grad_dir / jnp.maximum(normalizer, 1e-4)
        target = jax.lax.stop_gradient(x0_student - self.guidance_eta * grad_dir)
        gen_loss = 0.5 * jnp.mean((x0_student - target) ** 2)

        # ---- critic (fake score): denoise the student distribution -----------------------
        v_fake = model.model_predict(critic_vars, renoised_prepared)  # grads -> critic_lora
        critic_target = eps - x0_sg  # flow velocity toward the student sample
        critic_loss = jnp.mean((v_fake - critic_target) ** 2)

        loss = self.dm_weight * gen_loss + self.critic_weight * critic_loss
        return loss, {"dmd_generator_loss": gen_loss, "dmd_critic_loss": critic_loss}
