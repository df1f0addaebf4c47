"""PerFlow distillation: piecewise rectified flows.

Reference: helpers/distillation/perflow (PeRFlow) — divide the σ∈(0,1] ladder
into K windows; inside each window the teacher's curved probability-flow
trajectory is replaced by the straight line between the window's endpoints,
which the student learns as a constant velocity.  Few-step sampling then takes
one Euler step per window.

jit shape: the window index derives from the batch's σ; the teacher endpoint
integration is a fixed-M ``fori_loop`` of Euler steps (stop-gradient).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .common import DistillationBase


class PerFlowDistillation(DistillationBase):
    name = "perflow"
    requires_teacher = True  # zero-adapter base for LoRA students

    def __init__(self, config: Any, method_config=None):
        super().__init__(config, method_config)
        self.num_windows = int(self.method_config.get("num_windows", 4))
        self.teacher_steps = int(self.method_config.get("teacher_steps_per_window", 4))

    def uses_ode_cache(self) -> bool:
        """Consume precomputed teacher ODE pairs when a distillation_cache
        dataset is configured (reference perflow/distiller.py:96
        requires_distillation_cache)."""
        return True

    def distill_loss(
        self,
        model,
        variables: Dict[str, Any],
        prepared: Dict[str, jax.Array],
        model_pred: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if not model.is_flow:
            raise NotImplementedError("PerFlow targets flow-matching families")
        if "ode_pair" in prepared:
            # cached teacher ODE pair (reference perflow/distiller.py:307
            # _compute_target fallback ``noise - latents``): the batch's
            # ``latents`` are the teacher's deterministic ODE endpoint of
            # ``noise``, so the straight-line (ReFlow) velocity is analytic —
            # no teacher forward at train time
            x0 = prepared["latents"].astype(jnp.float32)
            target_velocity = prepared["noise"] - x0
            loss = jnp.mean((model_pred - jax.lax.stop_gradient(target_velocity)) ** 2)
            return loss, {"perflow_reflow_loss": loss}
        sigmas = prepared["sigmas"]
        noisy = prepared["noisy_latents"]
        shape = (sigmas.shape[0],) + (1,) * (noisy.ndim - 1)
        teacher_vars = self.teacher_variables(variables)

        # window boundaries: k/K; sample's window from its σ
        window = jnp.clip(
            jnp.floor(sigmas * self.num_windows), 0, self.num_windows - 1
        )
        sigma_hi = (window + 1.0) / self.num_windows  # noisier end
        sigma_lo = window / self.num_windows

        # window start point x_hi via the analytic interpolation of this batch
        x0 = prepared.get("latents", noisy).astype(jnp.float32)
        eps = prepared["noise"]
        x_hi = (1.0 - sigma_hi.reshape(shape)) * x0 + sigma_hi.reshape(shape) * eps

        # teacher integrates M Euler steps hi -> lo (stop-grad)
        delta = (sigma_hi - sigma_lo) / self.teacher_steps

        def body(i, carry):
            x_cur, sigma_cur = carry
            step_prepared = dict(prepared)
            step_prepared["noisy_latents"] = x_cur
            step_prepared["sigmas"] = sigma_cur
            step_prepared["timesteps"] = sigma_cur
            velocity = jax.lax.stop_gradient(model.model_predict(teacher_vars, step_prepared))
            return x_cur - delta.reshape(shape) * velocity, sigma_cur - delta

        x_lo, _ = jax.lax.fori_loop(0, self.teacher_steps, body, (x_hi, sigma_hi))

        # the window's straight-line velocity, learned at the sample's own σ
        target_velocity = (x_hi - x_lo) / jnp.maximum((sigma_hi - sigma_lo).reshape(shape), 1e-6)
        # student must be evaluated ON the straight segment at σ
        frac = (sigmas - sigma_lo) / jnp.maximum(sigma_hi - sigma_lo, 1e-6)
        x_on_segment = x_lo + frac.reshape(shape) * (x_hi - x_lo)
        segment_prepared = dict(prepared)
        segment_prepared["noisy_latents"] = x_on_segment
        student_velocity = model.model_predict(variables, segment_prepared)

        loss = jnp.mean((student_velocity - jax.lax.stop_gradient(target_velocity)) ** 2)
        return loss, {"perflow_loss": loss}
