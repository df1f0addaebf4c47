"""DCM: dual-expert consistency distillation over a discrete Euler ladder.

Reference: helpers/distillation/dcm/{distiller,solver}.py — the teacher takes
one CFG-guided Euler step down a K-point sigma ladder, then predicts again at
the landing point; both student and teacher predictions are mapped through a
"multiphase" Euler step to the *phase boundary* (the ladder is split into
``multiphase`` inference windows) and matched with MSE (the PCM/DCM
consistency objective, reference solver.py:594 euler_style_multiphase_pred).

"semantic" mode is the default and fully implemented.  "fine" mode's
adversarial GAN head (reference dcm/discriminator/wan.py, a 453-line torch
feature-discriminator over intermediate transformer activations) is not ported
— configs asking for it fail loudly.

jit notes: the sigma ladder and phase boundaries are static numpy; the
per-sample ladder index is a traced gather; CFG's unconditional branch zeroes
every text-embedding tensor (reference zeroes negative embeds when absent).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import DistillationBase


def _uncond(prepared: Dict[str, Any]) -> Dict[str, Any]:
    """Zero the text conditioning for the CFG unconditional branch."""
    out = dict(prepared)
    for key, value in prepared.items():
        if hasattr(value, "ndim") and ("embeds" in key or key == "encoder_hidden_states"):
            out[key] = jnp.zeros_like(value)
    return out


class DCMDistillation(DistillationBase):
    name = "dcm"
    requires_teacher = False  # frozen base (adapters zeroed) is the teacher

    def __init__(self, config: Any, method_config=None):
        super().__init__(config, method_config)
        mc = self.method_config
        self.mode = str(mc.get("mode", "semantic"))
        if self.mode == "fine":
            raise NotImplementedError(
                "DCM 'fine' (adversarial) mode is not implemented in the TPU build; "
                "use mode='semantic'"
            )
        if self.mode != "semantic":
            raise ValueError(f"unknown DCM mode {self.mode!r}")
        self.euler_timesteps = int(mc.get("euler_timesteps", 50))
        self.multiphase = int(mc.get("multiphase", 4))
        self.distill_cfg = float(mc.get("distill_cfg", 5.0))
        num_train = int(mc.get("num_train_timesteps", 1000))
        shift = float(
            mc.get("shift", getattr(config, "flow_schedule_shift", None) or 1.0)
        )

        # ladder (reference solver.py:566 EulerSolver): ascending base sigmas,
        # K evenly spaced rungs; sigmas_prev is the next rung *down*
        s = np.linspace(1, num_train, num_train, dtype=np.float64)[::-1] / num_train
        sigmas = (shift * s / (1 + (shift - 1) * s))[::-1]  # ascending
        ratio = num_train // self.euler_timesteps
        idx = (np.arange(1, self.euler_timesteps + 1) * ratio).round().astype(np.int64) - 1
        self.sigmas = jnp.asarray(sigmas[idx], jnp.float32)
        self.sigmas_prev = jnp.asarray(
            np.concatenate([[sigmas[0]], sigmas[idx[:-1]]]), jnp.float32
        )
        # phase boundaries: first ladder index of each of the `multiphase` windows
        self.phase_starts = jnp.asarray(
            np.floor(
                np.linspace(0, self.euler_timesteps, num=self.multiphase, endpoint=False)
            ).astype(np.int64)
        )

    def prepare_batch(self, rng: jax.Array, prepared: Dict[str, jax.Array], model) -> Dict[str, jax.Array]:
        """Re-noise the batch at a random ladder rung (reference distiller.py:118)."""
        latents = prepared["latents"].astype(jnp.float32)
        noise = prepared["noise"]
        batch = latents.shape[0]
        idx = jax.random.randint(jax.random.fold_in(rng, 0xDC), (batch,), 0, self.euler_timesteps)
        sigma = self.sigmas[idx]
        shape = (batch,) + (1,) * (latents.ndim - 1)
        out = dict(prepared)
        out["dcm_idx"] = idx
        out["sigmas"] = sigma
        out["timesteps"] = sigma
        out["noisy_latents"] = sigma.reshape(shape) * noise + (1.0 - sigma.reshape(shape)) * latents
        return out

    def _phase_end(self, idx: jax.Array) -> jax.Array:
        """Largest phase boundary ≤ idx (reference solver.py:594)."""
        valid = idx[:, None] >= self.phase_starts[None, :]  # (B, multiphase)
        last = jnp.sum(valid.astype(jnp.int32), axis=1) - 1
        return self.phase_starts[jnp.maximum(last, 0)]

    def distill_loss(
        self,
        model,
        variables: Dict[str, Any],
        prepared: Dict[str, jax.Array],
        model_pred: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if not model.is_flow:
            raise NotImplementedError("DCM requires a flow-matching family")
        idx = prepared["dcm_idx"]
        noisy = prepared["noisy_latents"]
        shape = (idx.shape[0],) + (1,) * (noisy.ndim - 1)
        sigma = self.sigmas[idx].reshape(shape)
        sigma_prev = self.sigmas_prev[idx].reshape(shape)
        teacher_vars = self.teacher_variables(variables)

        # CFG-guided teacher velocity, one Euler step down the ladder
        cond = jax.lax.stop_gradient(model.model_predict(teacher_vars, prepared))
        uncond = jax.lax.stop_gradient(model.model_predict(teacher_vars, _uncond(prepared)))
        teacher_v = cond + self.distill_cfg * (cond - uncond)
        x_prev = noisy + (sigma_prev - sigma) * teacher_v

        # teacher re-predicts at the landing point
        prev_prepared = dict(prepared)
        prev_prepared["noisy_latents"] = x_prev
        prev_prepared["sigmas"] = self.sigmas_prev[idx]
        prev_prepared["timesteps"] = self.sigmas_prev[idx]
        target_v = jax.lax.stop_gradient(model.model_predict(teacher_vars, prev_prepared))

        # both sides Euler-jump to the phase boundary and must agree there
        sigma_end = self.sigmas_prev[self._phase_end(idx)].reshape(shape)
        target = x_prev + (sigma_end - sigma_prev) * target_v
        x_student = noisy + (sigma_end - sigma) * model_pred

        loss = jnp.mean((x_student - jax.lax.stop_gradient(target)) ** 2)
        return loss, {"dcm_loss": loss}
