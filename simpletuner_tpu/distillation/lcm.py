"""Latent Consistency Model distillation (flow-matching variant).

Reference: helpers/distillation/lcm (LCM method in the distillation registry).
Consistency objective: the student's x0 prediction at (x_t, σ) must match the
(stop-gradient) x0 prediction at the point (x_s, σ_s) reached by one teacher
Euler step along the probability-flow ODE — so the student collapses the whole
sampling trajectory into few steps.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .common import DistillationBase


class LCMDistillation(DistillationBase):
    name = "lcm"
    requires_teacher = True

    def __init__(self, config: Any, method_config=None):
        super().__init__(config, method_config)
        self.num_ddim_steps = int(self.method_config.get("num_ddim_timesteps", 50))
        self.huber_c = float(self.method_config.get("huber_c", 0.001))
        self.base_loss_weight = float(self.method_config.get("base_loss_weight", 0.0))

    def distill_loss(
        self,
        model,
        variables: Dict[str, Any],
        prepared: Dict[str, jax.Array],
        model_pred: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if not model.is_flow:
            raise NotImplementedError("LCM distillation currently targets flow-matching families")
        sigmas = prepared["sigmas"]
        noisy = prepared["noisy_latents"]
        shape = (sigmas.shape[0],) + (1,) * (noisy.ndim - 1)

        teacher_vars = self.teacher_variables(variables)
        # one teacher Euler step toward data: σ -> σ_s = max(σ − 1/N, 0)
        step = 1.0 / self.num_ddim_steps
        sigmas_s = jnp.maximum(sigmas - step, 0.0)
        v_teacher = jax.lax.stop_gradient(model.model_predict(teacher_vars, prepared))
        x_s = noisy + (sigmas_s - sigmas).reshape(shape) * v_teacher

        # target: x0 from the teacher at the stepped point (stop-grad)
        prepared_s = dict(prepared)
        prepared_s["noisy_latents"] = x_s
        prepared_s["sigmas"] = sigmas_s
        prepared_s["timesteps"] = sigmas_s
        v_target = jax.lax.stop_gradient(model.model_predict(teacher_vars, prepared_s))
        x0_target = self.flow_x0(x_s, v_target, sigmas_s)

        x0_student = self.flow_x0(noisy, model_pred, sigmas)
        c = self.huber_c
        consistency = jnp.mean(jnp.sqrt((x0_student - x0_target) ** 2 + c * c) - c)

        logs = {"distill_consistency_loss": consistency}
        loss = consistency
        if self.base_loss_weight > 0:
            base = model.compute_loss(model_pred, prepared)
            loss = loss + self.base_loss_weight * base
            logs["base_loss"] = base
        return loss, logs
