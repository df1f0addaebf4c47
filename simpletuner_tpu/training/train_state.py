"""TrainState and the sharded train-step builder.

This is the functional core the reference's Trainer god-object loop wraps around
(reference: helpers/training/trainer.py:6355-7320): one donated, jitted step that
does prepare→forward→loss→grad→clip→optimizer→EMA on-device, sharded over the
mesh.  Everything host-side (dataloading, checkpoints, logging) lives in
``training/trainer.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..parallel.mesh import batch_sharding, params_shardings, replicated
from .ema import EMAConfig, ema_init, ema_update
from .quantization import dequantize_params, has_quantized, quantize_params


class TrainState(struct.PyTreeNode):
    step: jax.Array
    frozen: Dict[str, Any]  # non-trainable variable collections (e.g. base params in lora mode)
    trainable: Dict[str, Any]  # collections being optimized
    opt_state: optax.OptState
    ema: Optional[Dict[str, Any]] = None

    def variables(self, use_ema: bool = False) -> Dict[str, Any]:
        trainable = dict(self.trainable)
        if use_ema and self.ema is not None:
            # ema may cover a subset of trainable (e.g. it excludes the DMD
            # critic adapter); overlay shadowed collections, keep the rest
            trainable.update(self.ema)
        return merge_variables(dequantize_params(self.frozen), trainable)


def merge_variables(frozen: Dict[str, Any], trainable: Dict[str, Any]) -> Dict[str, Any]:
    """Flat-merge collections; sidecar param subtrees (``lyrics_params`` —
    full-rank modules trained alongside a frozen base, reference
    trainer.py:3292 init_lyrics_embedder_training) fold back into ``params``.
    Text-encoder LoRA adapters (``te_lora``) merge into apply-ready
    ``te_params`` here so gradients flow through the fold (reference
    trainer.py:4307 PEFT-wrapped text encoders)."""
    variables = {**frozen, **trainable}
    sidecar = variables.pop("lyrics_params", None)
    if sidecar is not None:
        variables["params"] = {**variables.get("params", {}), **sidecar}
    te_lora = variables.pop("te_lora", None)
    te_base = variables.pop("te_base", None)
    if te_lora is not None:
        from .te_lora import merge_te_collections

        if te_base is None:
            raise ValueError("te_lora trainable collection requires frozen te_base")
        variables["te_params"] = merge_te_collections(te_base, te_lora)
    return variables


def create_train_state(
    model,
    variables: Dict[str, Any],
    tx: optax.GradientTransformation,
    ema_config: Optional[EMAConfig] = None,
    quantize_mode: Optional[str] = None,
    teacher_params: Optional[Dict[str, Any]] = None,
    critic_params: Optional[Dict[str, Any]] = None,
    text_encoder_params: Optional[Dict[str, Any]] = None,
    text_encoder_lora: Optional[Dict[str, Any]] = None,
    crepa_projector: Optional[Dict[str, Any]] = None,
    crepa_frozen: Optional[Dict[str, Any]] = None,
) -> TrainState:
    """Split variables into frozen/trainable by model_type and initialize optimizer.

    ``quantize_mode`` ("int8"/"fp8", reference --base_model_precision) stores the
    frozen base weights quantized; LoRA/trainable collections stay full precision.
    ``teacher_params`` rides in frozen["teacher"] for full-rank distillation.
    ``crepa_projector`` joins trainable["crepa_params"] (reference CREPA attaches
    a LayerNorm+Linear projector to the model, crepa.py:214 attach_to_model);
    ``crepa_frozen`` collections (vision teacher / decode VAE) merge into frozen
    AFTER quantization — their plain flax modules have no dequant sites.
    """
    model_type = getattr(model.config, "model_type", "lora")
    train_lora = model.lora_rank > 0
    if model_type == "controlnet":
        if "controlnet" not in variables:
            raise ValueError("model_type=controlnet but no controlnet params were initialized")
        trainable = {"controlnet": variables["controlnet"]}
        frozen = {k: v for k, v in variables.items() if k != "controlnet"}
    elif train_lora:
        if "lora" not in variables:
            raise ValueError("model_type=lora but module has no lora collection")
        trainable = {"lora": variables["lora"]}
        frozen = {k: v for k, v in variables.items() if k != "lora"}
    else:
        trainable = {"params": variables["params"]}
        frozen = {k: v for k, v in variables.items() if k != "params"}
    if teacher_params is not None:
        frozen["teacher"] = teacher_params
    if critic_params is not None:
        # second adapter set trained jointly (DMD fake-score critic)
        trainable["critic_lora"] = critic_params
    if text_encoder_params is not None and text_encoder_lora is None:
        # --train_text_encoder (full): the TEs join the optimizer (reference
        # trainer.py:3394); captions encode in-step via model.apply_text_encoder
        trainable["te_params"] = text_encoder_params
    sidecar_keys = tuple(getattr(model, "sidecar_param_keys", lambda: ())())
    if sidecar_keys and "params" in frozen:
        # sidecar full-rank modules train next to a frozen base (reference
        # init_lyrics_embedder_training, trainer.py:3292): their subtrees move
        # from frozen params into trainable["lyrics_params"] and fold back at
        # apply time (merge_variables)
        params = dict(frozen["params"])
        sidecar = {}
        for key in sidecar_keys:
            if key not in params:
                raise ValueError(
                    f"sidecar module {key!r} not found in {model.NAME} params"
                )
            sidecar[key] = params.pop(key)
        frozen = {**frozen, "params": params}
        trainable["lyrics_params"] = sidecar
    if quantize_mode:
        if not train_lora:
            raise ValueError("base_model_precision quantization requires model_type=lora (frozen base)")
        # quantize on the HOST when weights are host-resident (fresh import):
        # a 12B f32 base must never touch the chip pre-quantization — int8
        # leaves transfer at 1/4 the bytes and actually fit 16G HBM
        import numpy as _np

        host_leaves = [
            leaf for leaf in jax.tree_util.tree_leaves(frozen)
            if isinstance(leaf, _np.ndarray)
        ]
        if host_leaves and jax.default_backend() != "cpu":
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                frozen = quantize_params(frozen, quantize_mode)
        else:
            frozen = quantize_params(frozen, quantize_mode)
    if text_encoder_lora is not None:
        # TE LoRA (reference trainer.py:4307): frozen full encoders + adapter
        # pytrees; merge happens in merge_variables.  te_base joins frozen
        # AFTER quantization — the HF flax module applies these weights
        # directly (no qscales dequant site), so they must stay full precision
        frozen["te_base"] = text_encoder_params
        trainable["te_lora"] = text_encoder_lora
    if crepa_frozen:
        # post-quantization for the same reason as te_base above
        frozen.update(crepa_frozen)
    if crepa_projector is not None:
        trainable["crepa_params"] = crepa_projector
    # EMA shadows only the deliverable adapters — the DMD critic is a throwaway
    # adversary (reference keeps EMA on the generator only); text-encoder and
    # lyric-sidecar params follow the reference's EMA scope (main model only)
    ema_target = {
        k: v for k, v in trainable.items()
        if k not in ("critic_lora", "te_params", "te_lora", "lyrics_params")
    }
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        frozen=frozen,
        trainable=trainable,
        opt_state=tx.init(trainable),
        ema=ema_init(ema_target) if ema_config is not None else None,
    )


def build_train_step(
    model,
    tx: optax.GradientTransformation,
    lr_schedule: Optional[Callable] = None,
    ema_config: Optional[EMAConfig] = None,
    grad_accum_steps: int = 1,
    distiller=None,
) -> Callable:
    """Returns step_fn(state, batch, rng) -> (state, metrics). Pure; jit outside.

    With ``grad_accum_steps`` > 1, batch leaves carry a leading micro-batch axis
    (A, B, ...) and gradients are averaged over a ``lax.scan`` of micro-steps
    (reference: accelerator.accumulate, trainer.py:6511) — one optimizer update
    per call either way.  ``distiller`` (DistillationBase) replaces the base
    diffusion loss with its distillation objective.
    """

    # CREPA self-flow needs the EMA weights as its teacher inside the loss
    # (reference crepa self_flow: the EMA model forward supplies the target
    # features); resolved once at build time — static for the whole jit
    from .crepa import CrepaSettings

    _crepa = CrepaSettings.from_config(model.config)
    crepa_wants_ema = _crepa.enabled and _crepa.feature_source == "self_flow"

    # SingLoRA ramp is active only for the singlora adapter algo (reference
    # heartmula/ace_step/common pass ramp_up_steps, default 100)
    _singlora_ramp_steps = 0.0
    if "singlora" in (
        str(getattr(model.config, "peft_lora_mode", "") or "").lower(),
        str(getattr(model.config, "lora_type", "") or "").lower(),
    ):
        _singlora_ramp_steps = float(
            getattr(model.config, "singlora_ramp_up_steps", None) or 100
        )

    def step_fn(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        def loss_fn(trainable, micro_batch, micro_rng):
            # step-dependent schedules inside the loss (scheduled-sampling
            # probability ramps) read the optimizer step from the batch
            micro_batch = {**micro_batch, "global_step": state.step}
            if crepa_wants_ema:
                if state.ema is None:
                    raise ValueError("crepa_self_flow requires use_ema")
                micro_batch["crepa_ema_trainable"] = state.ema
            # slider LoRA: ± adapter polarity per batch (reference
            # trainer.py:6584-6603 slider strength alternation); LoRA output is
            # linear in B, so scaling lora_B flips/scales the whole adapter
            if "slider_scale" in micro_batch and "lora" in trainable:
                scale = micro_batch["slider_scale"]
                trainable = dict(trainable)
                trainable["lora"] = jax.tree_util.tree_map_with_path(
                    lambda p, leaf: leaf * scale
                    if any("lora_B" in str(k) or "lokr_w2" in str(k) for k in p)
                    else leaf,
                    trainable["lora"],
                )
            if _singlora_ramp_steps and "lora" in trainable:
                # SingLoRA u(t) warm-up (reference common.py:1016
                # ramp_up_steps -> peft-singlora u(t)=min(t/T, 1) scaling of
                # ΔW = A Aᵀ): pre-scaling A by √u is exactly u·ΔW with the
                # gradients picking up the same u factor, and stays jit-pure
                # (u is a traced function of the optimizer step)
                u = jnp.clip(
                    (state.step.astype(jnp.float32) + 1.0) / _singlora_ramp_steps,
                    0.0, 1.0,
                )
                root_u = jnp.sqrt(u)
                trainable = dict(trainable)
                trainable["lora"] = jax.tree_util.tree_map_with_path(
                    lambda p, leaf: leaf * root_u
                    if any("singlora_A" in str(k) for k in p)
                    else leaf,
                    trainable["lora"],
                )
            # frozen is apply-ready: quantized kernels dequantize at their use
            # site inside each block (LoRADense + qscales collection)
            variables = merge_variables(state.frozen, trainable)
            if distiller is None:
                loss, aux = model.loss_fn(variables, micro_rng, micro_batch)
            else:
                prepared = model.prepare_batch(micro_rng, micro_batch)
                prepared = distiller.prepare_batch(micro_rng, prepared, model)
                pred = model.model_predict(variables, prepared)
                loss, aux = distiller.distill_loss(model, variables, prepared, pred, micro_rng)
            return loss, aux

        value_and_grad = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum_steps <= 1:
            (loss, aux), grads = value_and_grad(state.trainable, batch, rng)
        else:
            rngs = jax.random.split(rng, grad_accum_steps)

            def micro_step(carry, inputs):
                grad_sum, loss_sum = carry
                micro_batch, micro_rng = inputs
                (micro_loss, micro_aux), micro_grads = value_and_grad(
                    state.trainable, micro_batch, micro_rng
                )
                new_carry = (
                    jax.tree_util.tree_map(jnp.add, grad_sum, micro_grads),
                    loss_sum + micro_loss,
                )
                return new_carry, micro_aux

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.trainable)
            (grads, loss), aux_stack = jax.lax.scan(
                micro_step, (zero_grads, jnp.zeros([])), (batch, rngs)
            )
            scale = 1.0 / grad_accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            loss = loss * scale
            # aux metrics (MoE gate loss, REPA, distill components) averaged over
            # micro-steps so they keep flowing to logs under accumulation;
            # attention-logit maxima (MuonClip) take the max instead
            aux = {
                key: (jnp.max(value, axis=0) if str(key).startswith("qk_clip/") else jnp.mean(value, axis=0))
                for key, value in (aux_stack or {}).items()
            }
        grad_norm = optax.global_norm(grads)
        # Non-finite guard (reference trainer.py:6614): skip the update, keep state.
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = tx.update(safe_grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        qk_maxima = {
            str(key).split("/", 1)[1]: value
            for key, value in (aux or {}).items()
            if str(key).startswith("qk_clip/")
        }
        if qk_maxima and hasattr(model, "apply_qk_clip"):
            # MuonClip QK-clip (reference trainer.py:6743-6751): rescale q/k
            # heads whose attention logits exceeded tau this step; non-finite
            # maxima fall through to the finite guard below
            new_trainable = model.apply_qk_clip(new_trainable, qk_maxima)
        new_trainable = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_trainable, state.trainable
        )
        new_step = state.step + 1

        new_ema = state.ema
        if state.ema is not None and ema_config is not None:
            ema_target = {k: new_trainable[k] for k in state.ema}
            new_ema = ema_update(ema_config, state.ema, ema_target, new_step)

        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "skipped_nonfinite": 1.0 - finite.astype(jnp.float32),
        }
        for key, value in (aux or {}).items():
            if hasattr(value, "ndim") and value.ndim == 0:
                metrics[key] = value
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        new_state = state.replace(
            step=new_step,
            trainable=new_trainable,
            opt_state=new_opt_state,
            ema=new_ema,
        )
        return new_state, metrics

    return step_fn


def state_shardings(mesh, state: TrainState):
    """NamedShardings for every leaf: params/opt-state over fsdp, scalars replicated."""
    return jax.tree_util.tree_map(
        lambda leaf: params_shardings(mesh, leaf)
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 1
        else replicated(mesh),
        state,
    )


def jit_train_step(step_fn: Callable, mesh, state: TrainState, grad_accum_steps: int = 1):
    """jit with explicit shardings: state sharded per FSDP rule, batch over
    data×fsdp (axis 1 when a leading grad-accum axis is present), donated state."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    s_shard = state_shardings(mesh, state)
    r_shard = replicated(mesh)
    # batch shardings are committed by the caller's device_put (batch dim over
    # data×fsdp, scalars replicated) — None lets jit adopt them per-leaf
    return jax.jit(
        step_fn,
        in_shardings=(s_shard, None, r_shard),
        out_shardings=(s_shard, r_shard),
        donate_argnums=(0,),
    )
