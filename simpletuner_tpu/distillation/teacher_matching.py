"""Direct teacher-output distillation.

Reference: the teacher-output distillation caches path
(helpers/caching/distillation.py + data_backend/config/distillation_cache.py):
the student matches the teacher's prediction at the same noisy point —
used for guidance/step distillation and as the base of several composite
methods."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .common import DistillationBase


class TeacherMatchingDistillation(DistillationBase):
    name = "teacher_matching"
    requires_teacher = True

    def __init__(self, config: Any, method_config=None):
        super().__init__(config, method_config)
        self.base_loss_weight = float(self.method_config.get("base_loss_weight", 0.0))
        # for guidance distillation: run the teacher with a different guidance value
        self.teacher_guidance = self.method_config.get("teacher_guidance")

    def distill_loss(
        self,
        model,
        variables: Dict[str, Any],
        prepared: Dict[str, jax.Array],
        model_pred: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        teacher_vars = self.teacher_variables(variables)
        teacher_prepared = prepared
        if self.teacher_guidance is not None and "guidance" in prepared:
            teacher_prepared = dict(prepared)
            teacher_prepared["guidance"] = jnp.full_like(
                prepared["guidance"], float(self.teacher_guidance)
            )
        teacher_pred = jax.lax.stop_gradient(model.model_predict(teacher_vars, teacher_prepared))
        match = jnp.mean((model_pred - teacher_pred) ** 2)
        logs = {"distill_match_loss": match}
        loss = match
        if self.base_loss_weight > 0:
            base = model.compute_loss(model_pred, prepared)
            loss = loss + self.base_loss_weight * base
            logs["base_loss"] = base
        return loss, logs
