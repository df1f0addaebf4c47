"""Self-Forcing: on-policy DMD over the student's own few-step rollouts.

Reference: helpers/distillation/self_forcing/{distiller,generator,pipeline}.py
— the student generates samples from pure noise with a short denoising ladder
(``dmd_denoising_steps``, default 1000,757,522), backpropagating only through
the final denoise (reference generator.py's exit-flag trick), and the sample is
then scored with the DMD machinery (real score = frozen base with CFG-less
adapters zeroed, fake score = the jointly trained critic adapters).

TPU deviations: the reference's blockwise autoregressive video rollout with KV
caching (pipeline.py) is replaced by a whole-latent rollout — causal blockwise
generation is an inference-time concern the ladder math doesn't depend on; the
stochastic re-noise between rungs follows the reference scheduler
(self_forcing/scheduler.py add-noise between steps).  The ladder is static so
the rollout unrolls under jit.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .dmd import DMDDistillation


class SelfForcingDistillation(DMDDistillation):
    name = "self_forcing"
    requires_teacher = False
    requires_critic = True

    def __init__(self, config: Any, method_config=None):
        super().__init__(config, method_config)
        steps = self.method_config.get("dmd_denoising_steps", "1000,757,522")
        if isinstance(steps, str):
            steps = [int(s) for s in steps.split(",") if s.strip()]
        num_train = float(self.method_config.get("num_train_timesteps", 1000))
        # descending sigma ladder in (0, 1]
        self.rollout_sigmas = tuple(float(t) / num_train for t in steps)
        if not self.rollout_sigmas or sorted(self.rollout_sigmas, reverse=True) != list(self.rollout_sigmas):
            raise ValueError("dmd_denoising_steps must be a descending timestep ladder")

    def distill_loss(
        self,
        model,
        variables: Dict[str, Any],
        prepared: Dict[str, jax.Array],
        model_pred: jax.Array,  # unused: the rollout replaces the data batch
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if not model.is_flow:
            raise NotImplementedError("self_forcing requires a flow-matching family")
        latents = prepared["latents"]
        batch = latents.shape[0]
        shape = (batch,) + (1,) * (latents.ndim - 1)
        rng_roll, rng_pick, rng_dmd = jax.random.split(rng, 3)

        # --- on-policy rollout from pure noise (static ladder, unrolled) -----------------
        x = jax.random.normal(jax.random.fold_in(rng_roll, 0), latents.shape, jnp.float32)
        n_steps = len(self.rollout_sigmas)
        # each sample backprops through ONE uniformly chosen rung (reference
        # generator.py:31 backprops the final denoise only; sampling the exit
        # rung trains every ladder position, same expected gradient per rung)
        exit_rung = jax.random.randint(rng_pick, (batch,), 0, n_steps)
        x0 = x
        for k, sigma_k in enumerate(self.rollout_sigmas):
            sigma_arr = jnp.full((batch,), sigma_k, jnp.float32)
            step_prepared = dict(prepared)
            step_prepared["noisy_latents"] = x
            step_prepared["sigmas"] = sigma_arr
            step_prepared["timesteps"] = sigma_arr
            v = model.model_predict(variables, step_prepared)
            x0_k = x - sigma_k * v
            grad_here = (exit_rung == k).reshape(shape).astype(jnp.float32)
            x0 = grad_here * x0_k + (1.0 - grad_here) * jax.lax.stop_gradient(x0_k)
            if k + 1 < n_steps:
                sigma_next = self.rollout_sigmas[k + 1]
                eps = jax.random.normal(jax.random.fold_in(rng_roll, k + 1), x.shape, jnp.float32)
                x = (1.0 - sigma_next) * jax.lax.stop_gradient(x0_k) + sigma_next * eps

        loss, logs = self._dmd_losses(model, variables, x0, prepared, rng_dmd)
        return loss, {
            "self_forcing_generator_loss": logs["dmd_generator_loss"],
            "self_forcing_critic_loss": logs["dmd_critic_loss"],
            **logs,
        }
