"""Distillation framework.

Reference: helpers/distillation/common.py:22 ``DistillationBase`` — pluggable
hooks (prepare_batch / compute_distill_loss / pre+post_training_step /
generator_loss_step / discriminator_step / on_{save,load}_checkpoint) with a
registry+factory (helpers/distillation/{registry,factory}.py).

JAX split of responsibilities: everything inside the jitted step is a pure
method over explicit pytrees (teacher params ride in ``TrainState.frozen``
under the ``"teacher"`` collection so they shard and donate like base params);
host-side lifecycle hooks stay imperative.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


class DistillationBase:
    """Subclasses implement the jit-safe ``distill_loss``; other hooks optional."""

    name = "base"
    requires_teacher = True

    def __init__(self, config: Any, method_config: Optional[Dict[str, Any]] = None):
        self.config = config
        self.method_config = dict(method_config or {})

    # ---- jit-safe hooks ---------------------------------------------------------------
    def prepare_batch(self, rng: jax.Array, prepared: Dict[str, jax.Array], model) -> Dict[str, jax.Array]:
        """Adjust the prepared batch (e.g. restrict timesteps)."""
        return prepared

    def distill_loss(
        self,
        model,
        variables: Dict[str, Any],  # includes "teacher" collection when required
        prepared: Dict[str, jax.Array],
        model_pred: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Total training loss (replaces or augments the base diffusion loss)."""
        raise NotImplementedError

    # ---- host-side hooks ---------------------------------------------------------------
    def uses_ode_cache(self) -> bool:
        """True when the method can consume cached teacher ODE pairs
        (reference DistillerBase.requires_distillation_cache,
        distillation/common.py:82)."""
        return False

    def on_save_checkpoint(self, step: int, path: str) -> Optional[Dict[str, Any]]:
        return None

    def on_load_checkpoint(self, state: Dict[str, Any]) -> None:
        pass

    def post_training_step(self, step: int) -> None:
        pass

    # ---- shared helpers -----------------------------------------------------------------
    @staticmethod
    def teacher_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
        """Teacher forward variables.

        * explicit teacher: ``state.frozen["teacher"]`` (full-rank distillation)
        * LoRA student: the frozen base itself IS the teacher — run with the
          adapters zeroed (guidance-distillation recipe, e.g. flux schnell)."""
        out = {k: v for k, v in variables.items() if k not in ("params", "lora", "teacher")}
        if "teacher" in variables:
            out["params"] = variables["teacher"]
        elif "lora" in variables:
            out["params"] = variables["params"]
        else:
            raise KeyError(
                "full-rank distillation requires teacher params in state.frozen['teacher']"
            )
        if "lora" in variables:
            out["lora"] = jax.tree_util.tree_map(jnp.zeros_like, variables["lora"])
        return out

    @staticmethod
    def flow_x0(latents_t: jax.Array, velocity: jax.Array, sigmas: jax.Array) -> jax.Array:
        """x0 estimate under flow matching: x0 = x_t − σ·v."""
        shape = (sigmas.shape[0],) + (1,) * (latents_t.ndim - 1)
        return latents_t - sigmas.reshape(shape) * velocity
