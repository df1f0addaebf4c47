"""AnyFlow: MeanFlow pretraining + on-policy DMD (NVIDIA AnyFlow recipe).

Reference: helpers/distillation/anyflow/distiller.py:22 (AnyFlowDistiller) —
two stages sharing FlowMap interval conditioning u(x_t, t, r) (the model gets
a second "r" timestep through a gated delta embedder, see
helpers/models/flowmap.py and our flux transformer's ``flowmap_gate``):

* **forward** — the MeanFlow identity: u(x_t,t,r) should equal the average
  velocity over [r,t], whose target is v(x_t,t) − (t−r)·du/dt with du/dt
  estimated by a central finite difference at t±ε (reference distiller.py:390).
  Per-batch (t,r) pairs are split into diffusion (r=t, plain flow matching),
  consistency (r=0, full interval) and arbitrary windows by static ratios.
* **onpolicy** — roll the learned mean-velocity field from pure noise for a
  dynamically chosen step count, then apply DMD distribution matching with the
  critic adapters as the fake score (reference distiller.py:464).

jit deviations: the diffusion/consistency split uses the per-shard batch
(no cross-process gather); adaptive weighting normalises against the
batch-mean diffusion loss (stop-gradient) instead of a global gather; the
rollout step count is drawn per-microbatch from ``rollout_step_counts`` and
executed as a masked unrolled loop of max(counts) steps.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .common import DistillationBase
from .dmd import DMDDistillation


class AnyFlowDistillation(DMDDistillation):
    name = "anyflow"
    requires_teacher = False

    def __init__(self, config: Any, method_config=None):
        super().__init__(config, method_config)
        mc = self.method_config
        self.stage = str(mc.get("stage", "forward"))
        if self.stage not in ("forward", "onpolicy"):
            raise ValueError("anyflow stage must be 'forward' or 'onpolicy'")
        self.loss_weight = float(mc.get("loss_weight", 1.0))
        self.diffusion_ratio = float(mc.get("diffusion_ratio", 0.5))
        self.consistency_ratio = float(mc.get("consistency_ratio", 0.25))
        self.epsilon = float(mc.get("central_difference_epsilon", 0.005))
        self.weight_type = str(mc.get("meanflow_weight_type", "beta08"))
        self.adaptive_weighting = bool(mc.get("meanflow_adaptive_weighting", True))
        counts = mc.get("rollout_step_counts", (2, 4, 8))
        if isinstance(counts, str):
            counts = [int(c) for c in counts.split(",") if c.strip()]
        self.rollout_step_counts = tuple(int(c) for c in counts)
        if not self.rollout_step_counts or min(self.rollout_step_counts) < 1:
            raise ValueError("rollout_step_counts must be positive ints")

    @property
    def requires_critic(self) -> bool:  # type: ignore[override]
        return self.stage == "onpolicy"

    # ---- (t, r) sampling ---------------------------------------------------------------
    def prepare_batch(self, rng: jax.Array, prepared: Dict[str, jax.Array], model) -> Dict[str, jax.Array]:
        if self.stage != "forward":
            return prepared
        latents = prepared["latents"].astype(jnp.float32)
        noise = prepared["noise"]
        batch = latents.shape[0]
        shape = (batch,) + (1,) * (latents.ndim - 1)
        rng_a, rng_b = jax.random.split(jax.random.fold_in(rng, 0xAF))
        first = jax.random.uniform(rng_a, (batch,))
        second = jax.random.uniform(rng_b, (batch,))
        t = jnp.maximum(first, second)
        r = jnp.minimum(first, second)

        # static per-shard split (reference distiller.py:358 global masks)
        n_diff = round(self.diffusion_ratio * batch)
        n_cons = round(self.consistency_ratio * batch)
        index = jnp.arange(batch)
        diffusion_mask = index < n_diff
        consistency_mask = (index >= n_diff) & (index < n_diff + n_cons)
        r = jnp.where(diffusion_mask, t, r)
        r = jnp.where(consistency_mask, jnp.zeros_like(r), r)

        shift = float(getattr(model.config, "flow_schedule_shift", None) or 1.0)
        t_s = shift * t / (1.0 + (shift - 1.0) * t)
        r_s = shift * r / (1.0 + (shift - 1.0) * r)

        out = dict(prepared)
        out["sigmas"] = t_s
        out["timesteps"] = t_s
        out["noisy_latents"] = (1.0 - t_s.reshape(shape)) * latents + t_s.reshape(shape) * noise
        out["flowmap_r_timesteps"] = r_s
        out["anyflow_diffusion_mask"] = diffusion_mask
        return out

    # ---- MeanFlow (forward stage) --------------------------------------------------------
    def _timestep_weight(self, t: jax.Array) -> jax.Array:
        if self.weight_type == "uniform":
            return jnp.ones_like(t)
        # beta08-style w(t) = t·sqrt(1−t), normalised to unit mean over the grid
        w = t * jnp.sqrt(jnp.maximum(1.0 - t, 0.0))
        grid = jnp.linspace(1.0, 0.0, 1001)[:-1]
        gw = grid * jnp.sqrt(jnp.maximum(1.0 - grid, 0.0))
        return w * (gw.size / jnp.maximum(jnp.sum(gw), 1e-12))

    def _meanflow_loss(self, model, variables, prepared, model_pred):
        latents = prepared["latents"].astype(jnp.float32)
        noise = prepared["noise"]
        t_s = prepared["sigmas"]
        r_s = prepared["flowmap_r_timesteps"]
        shape = (t_s.shape[0],) + (1,) * (latents.ndim - 1)
        base_target = noise - latents

        # du/dt by central difference; x re-noised along the same path at t±ε,
        # r held fixed (reference distiller.py:399-415)
        def predict_at(tt):
            tt = jnp.clip(tt, 0.0, 1.0)
            p = dict(prepared)
            p["sigmas"] = tt
            p["timesteps"] = tt
            p["noisy_latents"] = (1.0 - tt.reshape(shape)) * latents + tt.reshape(shape) * noise
            return jax.lax.stop_gradient(model.model_predict(variables, p))

        plus = predict_at(t_s + self.epsilon)
        minus = predict_at(t_s - self.epsilon)
        denom = jnp.reshape(
            jnp.clip(t_s + self.epsilon, 0.0, 1.0) - jnp.clip(t_s - self.epsilon, 0.0, 1.0),
            shape,
        )
        total_derivative = (plus - minus) / jnp.maximum(denom, 1e-8)
        target = base_target - (t_s - r_s).reshape(shape) * total_derivative

        per_sample = jnp.mean(
            (model_pred.astype(jnp.float32) - jax.lax.stop_gradient(target)) ** 2,
            axis=tuple(range(1, model_pred.ndim)),
        )
        per_sample = per_sample * self._timestep_weight(t_s)

        diffusion_mask = prepared.get("anyflow_diffusion_mask")
        if self.adaptive_weighting and diffusion_mask is not None:
            # scale non-diffusion samples toward the diffusion branch magnitude;
            # no-op when the shard has no diffusion samples (reference guards
            # with global_diffusion_mask.any())
            d = diffusion_mask.astype(jnp.float32)
            n_diff = jnp.sum(d)
            diffusion_mean = jax.lax.stop_gradient(
                jnp.sum(per_sample * d) / jnp.maximum(n_diff, 1.0)
            )
            scale = jnp.where(
                n_diff > 0, diffusion_mean / (jax.lax.stop_gradient(per_sample) + 1e-5), 1.0
            )
            per_sample = jnp.where(diffusion_mask, per_sample, per_sample * scale)
        loss = jnp.mean(per_sample) * self.loss_weight
        return loss, {
            "anyflow_forward_loss": loss,
            "anyflow_timestep": jnp.mean(t_s),
            "anyflow_r_timestep": jnp.mean(r_s),
            "anyflow_interval": jnp.mean(t_s - r_s),
        }

    # ---- on-policy DMD (onpolicy stage) ---------------------------------------------------
    def _rollout(self, model, variables, prepared, rng):
        """Mean-velocity rollout from pure noise with a traced step count,
        executed as a masked loop of max(rollout_step_counts) steps."""
        latents = prepared["latents"]
        batch = latents.shape[0]
        shape = (batch,) + (1,) * (latents.ndim - 1)
        rng_k, rng_x = jax.random.split(rng)
        counts = jnp.asarray(self.rollout_step_counts, jnp.int32)
        k = counts[jax.random.randint(rng_k, (), 0, len(self.rollout_step_counts))]
        k_f = k.astype(jnp.float32)
        max_k = max(self.rollout_step_counts)

        x = jax.random.normal(rng_x, latents.shape, jnp.float32)
        for i in range(max_k):
            i_f = jnp.float32(i)
            active = (i < k).astype(jnp.float32)
            t_i = 1.0 - i_f / k_f
            t_next = 1.0 - (i_f + 1.0) / k_f
            step_prepared = dict(prepared)
            step_prepared["noisy_latents"] = x
            step_prepared["sigmas"] = jnp.full((batch,), 1.0, jnp.float32) * t_i
            step_prepared["timesteps"] = step_prepared["sigmas"]
            step_prepared["flowmap_r_timesteps"] = jnp.full((batch,), 1.0, jnp.float32) * t_next
            u = model.model_predict(variables, step_prepared)
            x_new = x - (t_i - t_next) * u
            # gradient flows through the final active step only (reference
            # self-forcing-style last-step backprop); earlier steps detach
            is_last = ((i + 1) == k).astype(jnp.float32)
            x_new = is_last * x_new + (1.0 - is_last) * jax.lax.stop_gradient(x_new)
            x = active * x_new + (1.0 - active) * x
        return x

    def distill_loss(
        self,
        model,
        variables: Dict[str, Any],
        prepared: Dict[str, jax.Array],
        model_pred: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if not model.is_flow:
            raise NotImplementedError("anyflow requires a flow-matching family")
        if self.stage == "forward":
            return self._meanflow_loss(model, variables, prepared, model_pred)
        rng_roll, rng_dmd = jax.random.split(rng)
        x0 = self._rollout(model, variables, prepared, rng_roll)
        loss, logs = self._dmd_losses(model, variables, x0, prepared, rng_dmd)
        return loss, {"anyflow_onpolicy_loss": loss, **logs}
