"""Flow-DPO: direct preference optimisation for flow-matching models.

Reference: helpers/distillation/flow_dpo/distiller.py:13 (FlowDPODistiller) —
paired preferred ("win", the batch latents) / rejected ("lose", the paired
conditioning latents) samples.  The policy (base+LoRA) and the reference
(base with adapters zeroed) each predict velocities for both branches sharing
one (noise, sigma) draw; the DPO logits are built from the per-sample
flow-matching error advantages and pushed through -logsigmoid.

jit differences from the reference (torch, host-side margin EMA):
* auto-beta uses the *current batch's* |margin| mean (stop-gradient) instead of
  a host-side EMA across steps — same fixed-point, no host state;
* the rejected latents arrive as ``control_latents`` (the TPU collate's name
  for paired conditioning latents, conditioning_type=reference_strict).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .common import DistillationBase


class FlowDPODistillation(DistillationBase):
    name = "flow_dpo"
    requires_teacher = False  # zero-adapter base is the reference policy

    def __init__(self, config: Any, method_config=None):
        super().__init__(config, method_config)
        mc = self.method_config
        self.beta = float(mc.get("beta", 1.0))
        self.loss_weight = float(mc.get("loss_weight", 1.0))
        self.sft_loss_weight = float(mc.get("sft_loss_weight", 0.0))
        self.anchor_alpha = float(mc.get("anchor_alpha", 0.0))
        self.norm_type = str(mc.get("norm_type", "sum")).lower()
        if self.norm_type not in ("sum", "mean"):
            raise ValueError("flow_dpo norm_type must be 'sum' or 'mean'")
        self.auto_beta = bool(mc.get("auto_beta", True))
        self.auto_beta_target_gf = float(mc.get("auto_beta_target_gf", 0.2))
        self.auto_beta_min = float(mc.get("auto_beta_min", 1e-3))
        self.auto_beta_max = float(mc.get("auto_beta_max", 1.0))
        if self.auto_beta and self.auto_beta_target_gf >= 0.5:
            raise ValueError("flow_dpo auto_beta_target_gf must be < 0.5")
        if getattr(config, "model_type", "lora") != "lora":
            raise ValueError("flow_dpo only supports LoRA students (reference parity)")

    def _per_sample_error(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        axes = tuple(range(1, err.ndim))
        return jnp.sum(err, axis=axes) if self.norm_type == "sum" else jnp.mean(err, axis=axes)

    def distill_loss(
        self,
        model,
        variables: Dict[str, Any],
        prepared: Dict[str, jax.Array],
        model_pred: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if not model.is_flow:
            raise NotImplementedError("flow_dpo requires a flow-matching family")
        lose_latents = prepared.get("control_latents")
        if lose_latents is None:
            raise KeyError(
                "flow_dpo needs rejected samples: pair a conditioning dataset "
                "(conditioning_type=reference_strict) so batches carry control_latents"
            )
        win_latents = prepared["latents"].astype(jnp.float32)
        lose_latents = lose_latents.astype(jnp.float32)
        sigmas = prepared["sigmas"]
        shape = (sigmas.shape[0],) + (1,) * (win_latents.ndim - 1)
        noise = prepared["noise"]

        # rejected branch shares the preferred branch's (noise, sigma) draw
        lose_prepared = dict(prepared)
        lose_prepared["latents"] = lose_latents
        lose_prepared["noisy_latents"] = (
            (1.0 - sigmas.reshape(shape)) * lose_latents + sigmas.reshape(shape) * noise
        )

        policy_win = model_pred
        policy_lose = model.model_predict(variables, lose_prepared)
        ref_vars = self.teacher_variables(variables)
        ref_win = jax.lax.stop_gradient(model.model_predict(ref_vars, prepared))
        ref_lose = jax.lax.stop_gradient(model.model_predict(ref_vars, lose_prepared))

        win_target = noise - win_latents
        lose_target = noise - lose_latents
        policy_win_err = self._per_sample_error(policy_win, win_target)
        policy_lose_err = self._per_sample_error(policy_lose, lose_target)
        ref_win_err = self._per_sample_error(ref_win, win_target)
        ref_lose_err = self._per_sample_error(ref_lose, lose_target)

        win_adv = ref_win_err - policy_win_err
        lose_adv = policy_lose_err - ref_lose_err
        margin = win_adv + lose_adv

        if self.auto_beta and self.auto_beta_target_gf > 0.0:
            # β chosen so mean gradient-factor σ(-logits) ≈ target (batch estimate)
            target = jnp.clip(self.auto_beta_target_gf, 1e-6, 1.0 - 1e-6)
            logit_t = jnp.log(target / (1.0 - target))
            margin_scale = jax.lax.stop_gradient(jnp.mean(jnp.abs(margin)))
            beta = jnp.clip(
                -2.0 * logit_t / jnp.maximum(margin_scale, 1e-6),
                self.auto_beta_min,
                self.auto_beta_max,
            )
        else:
            beta = jnp.asarray(self.beta, jnp.float32)

        logits = 0.5 * beta * margin
        dpo_loss = -jnp.mean(jax.nn.log_sigmoid(logits))

        loss = dpo_loss * self.loss_weight
        logs = {
            "flow_dpo_loss": dpo_loss,
            "flow_dpo_beta": beta,
            "flow_dpo_margin": jnp.mean(margin),
            "flow_dpo_win_adv": jnp.mean(win_adv),
            "flow_dpo_lose_adv": jnp.mean(lose_adv),
            "flow_dpo_negative_margin_pct": jnp.mean((margin < 0).astype(jnp.float32)) * 100.0,
            "flow_dpo_gradient_factor": jnp.mean(
                jax.nn.sigmoid(-jax.lax.stop_gradient(logits))
            ),
        }
        if self.anchor_alpha != 0.0:
            anchor = 0.5 * self.anchor_alpha * (
                jnp.mean((policy_win - ref_win) ** 2) + jnp.mean((policy_lose - ref_lose) ** 2)
            )
            loss = loss + anchor
            logs["flow_dpo_anchor_loss"] = anchor
        if self.sft_loss_weight != 0.0:
            sft = jnp.mean((policy_win - win_target) ** 2)
            loss = loss + self.sft_loss_weight * sft
            logs["flow_dpo_sft_loss"] = sft
        return loss, logs
