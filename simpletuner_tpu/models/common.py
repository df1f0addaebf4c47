"""ModelFoundation — the per-family contract for the model zoo.

Mirrors the reference's foundation surface (reference: helpers/models/common.py:414
``ModelFoundation``; per-family contract documented in SURVEY.md §2.3: NAME,
PREDICTION_TYPE, MODEL_TYPE, LATENT_CHANNEL_COUNT, HUGGINGFACE_PATHS,
TEXT_ENCODER_CONFIGURATION, DEFAULT_LORA_TARGET, ``model_predict``,
``_encode_prompts``, flavour choices) — but re-shaped for JAX: a family object
carries static metadata plus *pure* functions over explicit param pytrees, so the
whole train step jits and shards under pjit.

Split of responsibilities:
* ``prepare_batch``  — jit-safe: sample noise/timesteps, build model inputs;
* ``model_predict``  — jit-safe: run the network;
* ``compute_loss``   — jit-safe: target + weighting;
* ``encode_text`` / ``encode_image`` — host-side (cache-filling) encoders;
* ``load_pretrained`` / export — host-side IO.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..training.losses import (
    DDPMScheduleConfig,
    FlowScheduleConfig,
    LossConfig,
    TimestepSamplingConfig,
    add_noise,
    diffusion_loss,
    flow_interpolate,
    flow_target,
    make_alphas_cumprod,
    sample_flow_sigmas,
    sample_timesteps,
    velocity_target,
)

PredictionType = str  # "epsilon" | "v_prediction" | "flow_matching" | "sample"


@dataclasses.dataclass
class TextEncoderSpec:
    name: str
    family: str  # clip-l | clip-g | t5-xxl | llama | glm | mistral ...
    subfolder: Optional[str] = None
    tokenizer_subfolder: Optional[str] = None
    max_length: int = 77
    output: str = "last_hidden_state"  # or "pooled" / "penultimate"


class ModelFoundation:
    """Base class. Subclasses define the static contract and the pure fns."""

    NAME: str = "base"
    PREDICTION_TYPE: PredictionType = "flow_matching"
    MODEL_TYPE: str = "transformer"  # transformer | unet
    MODALITY: str = "image"  # image | video | audio
    REQUIRES_VAE: bool = True  # False = pixel-space family (e.g. DeepFloyd)
    LATENT_CHANNEL_COUNT: int = 4
    DEFAULT_RESOLUTION: int = 1024
    HUGGINGFACE_PATHS: Dict[str, str] = {}
    DEFAULT_FLAVOUR: Optional[str] = None
    TEXT_ENCODER_CONFIGURATION: Sequence[TextEncoderSpec] = ()
    # key-path prefixes (regexes over flattened param paths) targeted by LoRA
    DEFAULT_LORA_TARGET: Sequence[str] = ("to_q", "to_k", "to_v", "to_out")
    # --slider_lora_target: attention-only adapter for concept-slider training
    # (reference helpers/models/common.py:470 DEFAULT_SLIDER_LORA_TARGET and
    # per-family SLIDER_LORA_TARGET overrides, e.g. flux/model.py:65)
    SLIDER_LORA_TARGET: Sequence[str] = (
        "to_q", "to_k", "to_v", "to_out.0",
        "add_q_proj", "add_k_proj", "add_v_proj", "to_add_out",
    )
    VAE_SCALING_FACTOR: float = 1.0
    VAE_SHIFT_FACTOR: float = 0.0
    # --train_text_encoder (reference field_registry sections/training.py:723,
    # trainer.py:2711): families that wire per-step text encoding opt in;
    # LoRA-mode TE training (reference trainer.py:4307) covers the CLIP
    # encoders; full-rank TE training additionally needs SUPPORTS_FULL below
    SUPPORTS_TEXT_ENCODER_TRAINING: bool = False
    SUPPORTS_FULL_TEXT_ENCODER_TRAINING: bool = False

    def __init__(self, config: Any):
        self.config = config
        self.flavour = getattr(config, "model_flavour", None) or self.DEFAULT_FLAVOUR
        self._module: Optional[nn.Module] = None
        self._alphas_cumprod: Optional[jax.Array] = None
        self.apply_trace_globals()

    def apply_trace_globals(self) -> None:
        """Install this model's trace-time globals (int8 matmul mode, LoRA
        dropout/target/init).  Called at construction; call again after
        building a SECOND model (e.g. a fixed validation stage) whose config
        would otherwise leave ITS globals active for the trained model's next
        trace."""
        # int8 MXU matmul mode is static at trace time; every surface that
        # builds a model (trainer, bench, inference) routes its config here
        from ..training.quantization import resolve_quantized_matmul
        from .layers import set_lora_dropout, set_quantized_matmul

        set_quantized_matmul(resolve_quantized_matmul(self.config))
        set_lora_dropout(float(getattr(self.config, "lora_dropout", 0.0) or 0.0))
        from .layers import set_lora_init_style, set_lora_target

        set_lora_target(self._build_lora_target_predicate())
        set_lora_init_style(getattr(self.config, "lora_init_type", None) or "default")
        from .layers import set_lokr_init_norm

        raw_lokr_norm = getattr(self.config, "init_lokr_norm", None)
        set_lokr_init_norm(float(raw_lokr_norm) if raw_lokr_norm is not None else None)

    # ---- per-module LoRA target selection ---------------------------------------------
    def family_lora_targets(self) -> Optional[Sequence[str]]:
        """Family preset hook (reference get_lora_target_layers,
        helpers/models/common.py:918): return a list of diffusers module-name
        patterns (PEFT suffix-match semantics) or None to adapt every
        LoRADense.  Overridden by flux (--flux_lora_target presets) and
        ace_step (--acestep_lora_target)."""
        return None

    def lora_target_modules(self) -> Optional[Sequence[str]]:
        """Resolve the target-module surface in reference priority order:
        manual --lora_target_modules / --peft_lora_target_modules >
        --slider_lora_target > family preset > None (adapt everything)."""
        cfg = self.config
        manual = (
            getattr(cfg, "lora_target_modules", None)
            or getattr(cfg, "peft_lora_target_modules", None)
        )
        if manual:
            if isinstance(manual, str):
                import json
                import os

                text = manual.strip()
                if os.path.isfile(text):  # JSON-file form of the reference field
                    with open(text) as handle:
                        manual = json.load(handle)
                elif text.startswith("["):
                    manual = json.loads(text)
                else:
                    manual = [t.strip() for t in text.split(",") if t.strip()]
            if not isinstance(manual, (list, tuple)) or not all(
                isinstance(t, str) for t in manual
            ):
                raise ValueError(
                    "lora_target_modules must be a list of module name strings "
                    f"(got {manual!r})"
                )
            return list(manual)
        if getattr(cfg, "slider_lora_target", False):
            return list(self.SLIDER_LORA_TARGET)
        return self.family_lora_targets()

    def _build_lora_target_predicate(self):
        """Compile the resolved target list into a path predicate for
        ``layers.set_lora_target``.  Each LoRADense's "/"-joined flax path is
        translated to its diffusers module name through the family LoRA key
        map (training/lora.py) so reference target lists work verbatim; the
        raw flax path (slashes -> dots) matches too.  PEFT semantics: a module
        matches when its name equals a target or ends with "." + target.
        Fused projections (e.g. flux single-block linear1 = q|k|v|mlp) adapt
        whole when ANY of their split names match."""
        targets = self.lora_target_modules()
        if targets is None:
            return None
        patterns = [t.replace("/", ".") for t in targets]
        cache: Dict[str, bool] = {}
        state: Dict[str, Any] = {"key_map": None}

        def _match(name: str) -> bool:
            return any(name == p or name.endswith("." + p) for p in patterns)

        def predicate(path: str) -> bool:
            hit = cache.get(path)
            if hit is not None:
                return hit
            if state["key_map"] is None:
                # lazy: the arch config may not exist until the module builds
                from ..training.lora import _key_map_for

                try:
                    state["key_map"] = _key_map_for(self)
                except Exception:
                    state["key_map"] = {}
            names = [path.replace("/", ".")]
            mapped = state["key_map"].get(path)
            if isinstance(mapped, str):
                names.append(mapped)
            elif isinstance(mapped, list):
                names.extend(entry[0] for entry in mapped)
            ok = any(_match(n) for n in names)
            cache[path] = ok
            return ok

        return predicate

    # ---- acceleration presets ---------------------------------------------------------
    @classmethod
    def get_acceleration_presets(cls) -> List[Dict[str, Any]]:
        """Declarative memory/speed presets for the UI and configure wizard
        (reference ``get_acceleration_presets`` flux/model.py:122-229 exposes
        RamTorch/block-swap/DeepSpeed/group-offload tradeoffs).  The TPU
        equivalents are rematerialization policy, int8 frozen-base weights,
        quantized optimizer states, and mesh sharding — each entry carries the
        config overrides that enact it plus a human tradeoff string."""
        return [
            {
                "name": "speed",
                "description": "No remat, bf16 base — fastest when the model fits HBM",
                "tradeoff": "highest HBM; full activation residency",
                "config": {"gradient_checkpointing": False, "base_model_precision": "no_change"},
            },
            {
                "name": "balanced",
                "description": "Full remat with attention outputs saved across the boundary",
                "tradeoff": "~2/3 of peak activations for ~5% step-time",
                "config": {
                    "gradient_checkpointing": True,
                    "gradient_checkpointing_policy": "attn",
                },
            },
            {
                "name": "memory",
                "description": "Full remat + int8 frozen base (LoRA) + int8 optimizer states",
                "tradeoff": "fits the largest models per chip; ~15-20% step-time",
                "config": {
                    "gradient_checkpointing": True,
                    "gradient_checkpointing_policy": "full",
                    "base_model_precision": "int8",
                    "optimizer": "bnb-adamw8bit",
                },
            },
            {
                "name": "multichip",
                "description": "FSDP-shard params/optimizer over the mesh (pjit)",
                "tradeoff": "near-linear HBM relief over ICI; collective overhead",
                "config": {"fsdp": True, "gradient_checkpointing": True},
            },
        ]

    @property
    def latent_channels(self) -> int:
        """Latent channel count of the *instantiated* arch (tiny presets may
        differ from the family default)."""
        return self.LATENT_CHANNEL_COUNT

    # ---- construction ----------------------------------------------------------------
    def create_module(self) -> nn.Module:
        raise NotImplementedError

    @property
    def module(self) -> nn.Module:
        if self._module is None:
            self._module = self.create_module()
        return self._module

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        """Tiny synthetic batch for init / compile checks."""
        raise NotImplementedError

    def init_params(self, rng: jax.Array, batch: Optional[Dict[str, jax.Array]] = None):
        batch = batch or self.example_batch()
        if "te_input_ids" in batch and "text_embeds" not in batch:
            # train_text_encoder batches carry tokens, not embeds; encode with
            # the host encoder's current params for shape inference
            batch = {
                **batch,
                **self.apply_text_encoder(self.host_te_params(), batch),
            }
        prepared = self.prepare_batch(jax.random.PRNGKey(0), batch)
        inputs = self.get_model_inputs(prepared)
        # jit the init: eager init dispatches thousands of tiny ops (very slow
        # over a remote-device tunnel); one compiled program instead
        init_fn = jax.jit(lambda r: self.module.init({"params": r}, **inputs))
        return self.post_init_params(init_fn(rng))

    def post_init_params(self, variables):
        """Hook for families that seed fresh submodules from existing weights
        (e.g. FlowMap delta embedders cloned from the time embedder)."""
        return variables

    def transform_latents(self, latents: jax.Array) -> jax.Array:
        """Jit-safe per-family latent transform applied before noising —
        e.g. zlab_i1 normalizes raw FLUX.2 VAE latents per-channel (reference
        zlab_i1/model.py:163-180).  Identity by default."""
        return latents

    # ---- schedules ----------------------------------------------------------------------
    @property
    def is_flow(self) -> bool:
        prediction = getattr(self.config, "prediction_type", None) or self.PREDICTION_TYPE
        return prediction == "flow_matching"

    @property
    def prediction_type(self) -> PredictionType:
        return getattr(self.config, "prediction_type", None) or self.PREDICTION_TYPE

    def flow_schedule_config(self) -> FlowScheduleConfig:
        from ..training.losses import parse_flow_custom_timesteps

        c = self.config
        fast = bool(getattr(c, "flux_fast_schedule", False))
        if fast and self.NAME not in ("flux", "chroma"):
            raise ValueError(
                "--flux_fast_schedule is a flux/chroma schnell schedule; "
                f"family {self.NAME!r} does not support it"
            )
        return FlowScheduleConfig(
            sigmoid_scale=getattr(c, "flow_sigmoid_scale", 1.0) or 1.0,
            schedule_shift=getattr(c, "flow_schedule_shift", None),
            auto_shift=bool(getattr(c, "flow_schedule_auto_shift", False)),
            use_uniform_schedule=bool(getattr(c, "flow_use_uniform_schedule", False)),
            use_beta_schedule=bool(getattr(c, "flow_use_beta_schedule", False)),
            beta_alpha=getattr(c, "flow_beta_schedule_alpha", 2.0) or 2.0,
            beta_beta=getattr(c, "flow_beta_schedule_beta", 2.0) or 2.0,
            custom_sigmas=parse_flow_custom_timesteps(
                getattr(c, "flow_custom_timesteps", None)
            ),
            custom_mode=str(
                getattr(c, "flow_timesteps_mode", "fixed-list") or "fixed-list"
            ).replace("_", "-"),
            fast_schedule=fast,
        )

    # per-family DDPM betas (reference loads each model's hub scheduler config,
    # common.py:4270 DDPMScheduler.from_pretrained — SD-arch models ship
    # scaled_linear 0.00085->0.012, PixArt the IDDPM linear 1e-4->0.02,
    # DeepFloyd IF squaredcos_cap_v2)
    DDPM_BETA_START: float = 0.00085
    DDPM_BETA_END: float = 0.012
    DDPM_BETA_SCHEDULE: str = "scaled_linear"

    def ddpm_schedule_config(self) -> DDPMScheduleConfig:
        return DDPMScheduleConfig(
            beta_start=self.DDPM_BETA_START,
            beta_end=self.DDPM_BETA_END,
            beta_schedule=self.DDPM_BETA_SCHEDULE,
            rescale_betas_zero_snr=bool(getattr(self.config, "rescale_betas_zero_snr", False)),
        )

    def timestep_sampling_config(self) -> TimestepSamplingConfig:
        c = self.config
        range_begin, range_end = 0, 0
        if getattr(c, "refiner_training", False) and not getattr(
            c, "sdxl_refiner_uses_full_range", False
        ):
            # reference custom_schedule.py:18-31 refiner window: normal =
            # the low-noise segment [0, strength·T); inverted (PixArt
            # stage-2 style) = the high-noise segment [strength·T, T)
            steps = 1000
            strength = float(getattr(c, "refiner_training_strength", 0.2) or 0.2)
            if not 0.0 < strength < 1.0:
                raise ValueError("refiner_training_strength must be in (0, 1)")
            if getattr(c, "refiner_training_invert_schedule", False):
                range_begin, range_end = int(strength * steps), steps
            else:
                range_begin, range_end = 0, int(strength * steps)
        return TimestepSamplingConfig(
            range_begin=range_begin,
            range_end=range_end,
            bias_strategy=getattr(c, "timestep_bias_strategy", "none") or "none",
            bias_multiplier=getattr(c, "timestep_bias_multiplier", 1.0) or 1.0,
            bias_begin=getattr(c, "timestep_bias_begin", 0) or 0,
            bias_end=getattr(c, "timestep_bias_end", 1000) or 1000,
            bias_portion=getattr(c, "timestep_bias_portion", 0.25) or 0.25,
        )

    def loss_config(self) -> LossConfig:
        c = self.config
        return LossConfig(
            loss_type=getattr(c, "loss_type", "l2") or "l2",
            huber_schedule=getattr(c, "huber_schedule", "snr") or "snr",
            huber_c=getattr(c, "huber_c", 0.1) or 0.1,
            snr_gamma=getattr(c, "snr_gamma", None),
            soft_min_snr_gamma=getattr(c, "soft_min_snr_gamma", None),
            use_soft_min_snr=bool(getattr(c, "use_soft_min_snr", False)),
            soft_min_snr_sigma_data=float(getattr(c, "soft_min_snr_sigma_data", 1.0) or 1.0),
            prediction_type=self.prediction_type,
        )

    @property
    def alphas_cumprod(self) -> jax.Array:
        if self._alphas_cumprod is None:
            self._alphas_cumprod = make_alphas_cumprod(self.ddpm_schedule_config())
        return self._alphas_cumprod

    # ---- jit-safe training path -------------------------------------------------------------
    def prepare_batch(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Sample noise + timesteps/sigmas and build the noisy model input.

        ``batch`` must contain ``latents`` (B, H, W, C) plus the family's
        conditioning tensors (text embeds etc.).  Returns the prepared batch with
        ``noisy_latents``, ``noise``, ``timesteps``/``sigmas`` and ``target`` added.
        """
        latents = self.transform_latents(batch["latents"])
        rng_noise, rng_t = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        prepared = dict(batch)
        prepared["latents"] = latents
        # deterministic-injection hooks (loss-curve parity harness / replay):
        # a batch may carry its own noise and flow sigmas
        override_noise = prepared.pop("override_noise", None)
        override_sigmas = prepared.pop("override_sigmas", None)
        override_timesteps = prepared.pop("override_timesteps", None)
        if override_noise is not None:
            noise = override_noise.astype(jnp.float32)
        batch_size = latents.shape[0]

        # offset noise (reference --noise_offset/--noise_offset_probability):
        # channel-wise low-frequency offsets, applied per-sample with prob p
        offset = float(getattr(self.config, "noise_offset", 0.0) or 0.0)
        if not offset and getattr(self.config, "offset_noise", False):
            offset = 0.1  # --offset_noise bool switch at the reference default strength
        if offset > 0:
            rng_off, rng_gate = jax.random.split(jax.random.fold_in(rng, 0x0F))
            off_shape = (batch_size,) + (1,) * (latents.ndim - 2) + (latents.shape[-1],)
            gate = (
                jax.random.uniform(rng_gate, (batch_size,) + (1,) * (latents.ndim - 1))
                < float(getattr(self.config, "noise_offset_probability", 0.25) or 0.25)
            ).astype(jnp.float32)
            noise = noise + gate * offset * jax.random.normal(rng_off, off_shape, jnp.float32)

        # input perturbation (reference --input_perturbation): extra noise on
        # the *input* only; the target keeps the clean ε
        perturbation = float(getattr(self.config, "input_perturbation", 0.0) or 0.0)
        input_noise = noise
        if perturbation > 0:
            rng_pert = jax.random.fold_in(rng, 0x1F)
            strength = jnp.asarray(perturbation, jnp.float32)
            # --input_perturbation_steps (reference common.py:5443-5448):
            # linear decay to zero over the first N steps, off afterwards
            pert_steps = int(getattr(self.config, "input_perturbation_steps", 0) or 0)
            if pert_steps > 0:
                step = jnp.asarray(batch.get("global_step", 0), jnp.float32)
                strength = strength * jnp.clip(1.0 - step / pert_steps, 0.0, 1.0)
            input_noise = noise + strength * jax.random.normal(
                rng_pert, latents.shape, jnp.float32
            )
        if self.is_flow:
            seq_len = (latents.shape[1] // 2) * (latents.shape[2] // 2) if latents.ndim == 4 else None
            if override_sigmas is not None:
                sigmas = override_sigmas.astype(jnp.float32)
            else:
                sigmas = sample_flow_sigmas(
                    rng_t, batch_size, self.flow_schedule_config(), seq_len,
                    global_step=batch.get("global_step"),
                )
            prepared["sigmas"] = sigmas
            prepared["timesteps"] = sigmas  # flow models take σ∈(0,1) as the timestep
            prepared["noisy_latents"] = flow_interpolate(latents.astype(jnp.float32), input_noise, sigmas)
            prepared["target"] = flow_target(latents.astype(jnp.float32), noise)
        else:
            if override_timesteps is not None:
                timesteps = override_timesteps.astype(jnp.int32)
            else:
                timesteps = sample_timesteps(rng_t, batch_size, self.timestep_sampling_config())
            prepared["timesteps"] = timesteps
            prepared["noisy_latents"] = add_noise(
                latents.astype(jnp.float32), input_noise, timesteps, self.alphas_cumprod
            )
            if self.prediction_type == "v_prediction":
                prepared["target"] = velocity_target(
                    latents.astype(jnp.float32), noise, timesteps, self.alphas_cumprod
                )
            elif self.prediction_type == "sample":
                prepared["target"] = latents.astype(jnp.float32)
            else:
                prepared["target"] = noise
        prepared["noise"] = noise
        return prepared

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Map the prepared batch onto the module's __call__ kwargs."""
        raise NotImplementedError

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        """Run the network; returns the prediction in *latent space* layout
        (same shape as ``latents``)."""
        raise NotImplementedError

    def compute_loss(
        self,
        model_pred: jax.Array,
        prepared: Dict[str, jax.Array],
    ) -> jax.Array:
        timesteps = prepared.get("timesteps")
        if (
            getattr(self.config, "diff2flow_enabled", False)
            and getattr(self.config, "diff2flow_loss", False)
            and not self.is_flow
        ):
            # diff2flow bridge (reference simpletuner/diff2flow/bridge.py,
            # loss gate at common.py:5697-5704: the flow-space loss needs BOTH
            # --diff2flow_enabled and --diff2flow_loss; enabled alone only
            # exposes the flow target to aux consumers like TwinFlow):
            # convert the ε/v prediction to a flow field and regress against
            # ε − x0 at the flow-equivalent σ
            from ..training.diff2flow import flow_sigma_from_timesteps, prediction_to_flow

            flow_pred = prediction_to_flow(
                model_pred, prepared["noisy_latents"], timesteps,
                self.alphas_cumprod, self.prediction_type,
            )
            flow_target = prepared["noise"] - prepared["latents"].astype(jnp.float32)
            return diffusion_loss(
                flow_pred,
                flow_target,
                self.loss_config(),
                timesteps=None,
                alphas_cumprod=None,
                sigmas=flow_sigma_from_timesteps(self.alphas_cumprod, timesteps),
                mask=prepared.get("loss_mask"),
                loss_weight=prepared.get("loss_weight"),
            )
        elementwise = None
        extra = 0.0
        if "_reflexflow_clean_pred" in prepared:
            # ReflexFlow (reference common.py:5753-5785): upweight components
            # that vanish under rollout + angular direction regression
            from ..training.scheduled_sampling import ScheduledSamplingConfig

            ss = ScheduledSamplingConfig.from_config(self.config)
            exposure = prepared["_reflexflow_clean_pred"] - prepared["_reflexflow_biased_pred"]
            axes = tuple(range(1, exposure.ndim))
            norm = jnp.maximum(jnp.sum(jnp.abs(exposure), axis=axes, keepdims=True), 1e-6)
            elementwise = ss.reflexflow_beta2 * (
                1.0 + ss.reflexflow_alpha * exposure / norm
            )
            if ss.reflexflow_beta1 != 0.0:
                batch = model_pred.shape[0]
                target_vec = (prepared["noisy_latents"] - prepared["latents"]).reshape(batch, -1)
                pred_flat = model_pred.reshape(batch, -1).astype(jnp.float32)
                t_dir = target_vec / jnp.maximum(jnp.linalg.norm(target_vec, axis=1, keepdims=True), 1e-6)
                p_dir = pred_flat / jnp.maximum(jnp.linalg.norm(pred_flat, axis=1, keepdims=True), 1e-6)
                extra = ss.reflexflow_beta1 * jnp.mean(jnp.sum((p_dir - t_dir) ** 2, axis=1))
        return extra + diffusion_loss(
            model_pred,
            prepared["target"],
            self.loss_config(),
            timesteps=None if self.is_flow else timesteps,
            alphas_cumprod=None if self.is_flow else self.alphas_cumprod,
            sigmas=prepared.get("sigmas"),
            mask=prepared.get("loss_mask"),
            loss_weight=prepared.get("loss_weight"),
            elementwise_weight=elementwise,
        )

    def model_predict_with_intermediates(self, variables, prepared):
        """(prediction, intermediates) using the transformers' sow taps.
        Families whose model_predict is a plain module.apply get this free."""
        out, mutated = self.module.apply(
            variables, **self.get_model_inputs(prepared), mutable=["intermediates"]
        )
        return out, mutated.get("intermediates", {})

    def loss_fn(self, variables, rng: jax.Array, batch: Dict[str, jax.Array]) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Single fused prepare→predict→loss, the body of the train step."""
        if "te_params" in variables and "te_input_ids" in batch:
            # text-encoder training: captions encode inside the step with the
            # trainable TE params so its gradients flow (reference
            # trainer.py:3394 text encoder joins the optimizer)
            batch = {**batch, **self.apply_text_encoder(variables["te_params"], batch)}
        prepared = self.prepare_batch(rng, batch)
        if self.lora_rank > 0 and self.lora_algo == "tlora":
            # T-LoRA: per-sample rank gating by noise level (reference
            # trainer calls apply_tlora_timestep_mask before the forward)
            from .layers import set_tlora_mask, tlora_rank_mask

            lyc = getattr(self.config, "lycoris_config", None) or {}
            lyc = lyc if isinstance(lyc, dict) else {}
            set_tlora_mask(
                tlora_rank_mask(
                    prepared["timesteps"],
                    max_rank=self.lora_rank,
                    min_rank=int(lyc.get("min_rank", 1)),
                    alpha=float(lyc.get("mask_alpha", 1.0)),
                    max_timestep=1.0 if self.is_flow else 1000.0,
                )
            )
            try:
                return self._loss_fn_body(variables, rng, prepared)
            finally:
                set_tlora_mask(None)
        return self._loss_fn_body(variables, rng, prepared)

    def _loss_fn_body(self, variables, rng: jax.Array, prepared: Dict[str, jax.Array]):
        if getattr(self.config, "scheduled_sampling_max_steps", 0) or getattr(
            self.config, "scheduled_sampling_max_step_offset", 0
        ):
            # reference gate is scheduled_sampling_max_step_offset
            # (common.py:5493); max_steps is the repo-native σ-space knob
            from ..training.scheduled_sampling import (
                ScheduledSamplingConfig,
                apply_scheduled_sampling,
            )

            prepared = apply_scheduled_sampling(
                self,
                variables,
                prepared,
                jax.random.fold_in(rng, 0x55),
                ScheduledSamplingConfig.from_config(self.config),
            )
        if (
            self.lora_rank > 0
            and "is_regularisation_data" in prepared
            and "target" in prepared
        ):
            # prior preservation (reference trainer.py:6565-6581): for
            # regularisation batches the target is the parent model's own
            # prediction (adapters zeroed), keeping the base distribution
            zero_lora = jax.tree_util.tree_map(jnp.zeros_like, variables["lora"])
            parent = jax.lax.stop_gradient(
                self.model_predict({**variables, "lora": zero_lora}, prepared)
            )
            flag = prepared["is_regularisation_data"].reshape((1,) * prepared["target"].ndim)
            prepared = dict(prepared)
            prepared["target"] = jnp.where(flag > 0, parent, prepared["target"])
        from ..training.repa import RepaConfig, repa_auxiliary_loss
        from ..training.twinflow import TwinFlowSettings, sample_tt, twinflow_losses

        twinflow = TwinFlowSettings.from_config(self.config)
        if twinflow.enabled:
            # student is conditioned on (σ, tt); tt rides the FlowMap input
            prepared = dict(prepared)
            tt = sample_tt(jax.random.fold_in(rng, 0x72), prepared["sigmas"])
            prepared["twinflow_tt"] = tt
            prepared["flowmap_r_timesteps"] = tt
        repa = RepaConfig.from_config(self.config)
        from ..training.crepa import CrepaSettings, crepa_loss_term

        crepa = CrepaSettings.from_config(
            self.config,
            mode="video" if self.MODALITY == "video" else "image",
            max_train_steps=int(getattr(self.config, "max_train_steps", 0) or 0),
        )
        aux: Dict[str, jax.Array] = {}
        wants_qk = bool(getattr(self, "wants_qk_clip", False))
        if repa.enabled or crepa.enabled or wants_qk:
            if repa.urepa_weight > 0 and "teacher_embeds" not in prepared:
                # in-loop U-REPA teacher (reference UrepaRegularizer encodes
                # decoded clean latents through the frozen vision encoder);
                # cached conditioning_image_embeds take precedence when present
                from ..training.crepa import encode_teacher_frames

                teacher_module = getattr(self, "_crepa_teacher_module", None)
                decode_fn = getattr(self, "_crepa_decode_fn", None)
                if (
                    teacher_module is None
                    or decode_fn is None
                    or "crepa_teacher" not in variables
                ):
                    raise ValueError(
                        "urepa_enabled needs teacher features: provide a "
                        "conditioning_image_embeds dataset OR an in-loop "
                        "encoder (crepa_encoder_path + urepa_model)"
                    )
                teacher_params = variables["crepa_teacher"]
                tokens = encode_teacher_frames(
                    lambda imgs: teacher_module.apply({"params": teacher_params}, imgs),
                    lambda z: decode_fn(variables, z),
                    prepared["latents"],
                    repa.urepa_schedule,
                )
                b, t, n, d = tokens.shape
                prepared = dict(prepared)
                prepared["teacher_embeds"] = tokens.reshape(b, t * n, d)
            pred, intermediates = self.model_predict_with_intermediates(variables, prepared)
            loss = self.compute_loss(pred, prepared)
            if repa.enabled:
                repa_loss, repa_logs = repa_auxiliary_loss(repa, intermediates, prepared)
                loss = loss + repa_loss
                aux.update(repa_logs)
            if crepa.enabled:
                # full-depth CREPA (reference crepa.py CrepaRegularizer):
                # projector + adjacency-weighted cross-frame alignment with
                # in-loop / backbone / EMA-self-flow teachers
                crepa_term, crepa_logs = crepa_loss_term(
                    self, crepa, variables, intermediates, prepared, rng
                )
                loss = loss + crepa_term
                aux.update(crepa_logs)
            if wants_qk:
                # per-head max attention logits for MuonClip's post-step QK-clip
                for mod_name, sub in intermediates.items():
                    if isinstance(sub, dict) and "qk_max" in sub:
                        value = sub["qk_max"]
                        aux[f"qk_clip/{mod_name}"] = value[0] if isinstance(value, tuple) else value
        else:
            rngs = None
            if float(getattr(self.config, "lora_dropout", 0.0) or 0.0) > 0:
                # adapter-branch dropout (PEFT lora_dropout): train-path only —
                # validation/inference predicts without a dropout rng
                rngs = {"dropout": jax.random.fold_in(rng, 0xD0)}
            pred = self.model_predict(variables, prepared, rngs=rngs)
            loss = self.compute_loss(pred, prepared)
        if twinflow.enabled:
            twin_loss, twin_logs = twinflow_losses(
                self, variables, prepared, pred, rng, twinflow
            )
            loss = loss + twin_loss
            aux.update(twin_logs)
        aux["timesteps"] = prepared["timesteps"]
        return loss, aux

    # ---- inference ----------------------------------------------------------------------------
    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Non-noise conditioning tensors for sampling (ids, guidance, embeds).

        ``batch`` holds latents-shaped noise plus text embeds; returns the dict
        that, merged with {noisy_latents, timesteps}, satisfies
        ``get_model_inputs``.  Default: everything except latents."""
        return {k: v for k, v in batch.items() if k != "latents"}

    def denoise_fn(self, variables, conditioning: Dict[str, jax.Array]):
        """Returns f(latents, t) -> model_pred for the sampling loop."""

        def fn(latents: jax.Array, t: jax.Array) -> jax.Array:
            prepared = dict(conditioning)
            prepared["noisy_latents"] = latents
            prepared["timesteps"] = jnp.broadcast_to(t, (latents.shape[0],))
            return self.model_predict(variables, prepared)

        return fn

    # ---- host-side --------------------------------------------------------------------------
    def attach_text_encoders(self, encoders: Sequence[Any]) -> None:
        self.text_encoders = list(encoders)

    def encode_text(self, prompts: Sequence[str]):
        """Encode prompts -> list of per-prompt embed dicts (cache payload format)."""
        raise NotImplementedError

    # ---- text-encoder training (reference trainer.py:2711,3394: the text
    # encoder joins the optimizer and captions encode per step instead of
    # from the cache) -----------------------------------------------------------------------
    @property
    def trains_text_encoder(self) -> bool:
        return bool(getattr(self.config, "train_text_encoder", False))

    def trainable_text_encoder_indices(self) -> Sequence[int]:
        """Positions of the encoders that join the optimizer: the CLIP-family
        ones (reference trainer.py:3394-3396 prepares text_encoder_1/2 only —
        "The third text encoder is not trained for SD3")."""
        return [
            i for i, spec in enumerate(self.TEXT_ENCODER_CONFIGURATION)
            if str(spec.family).startswith("clip")
        ]

    def host_te_params(self) -> Dict[str, Any]:
        """Current host-side params of the trainable encoders, keyed
        ``te_{position}`` (the trainable-collection layout)."""
        return {
            f"te_{i}": self.text_encoders[i].model.params
            for i in self.trainable_text_encoder_indices()
        }

    def tokenize_captions(self, captions: Sequence[str]) -> Dict[str, Any]:
        """Captions -> fixed-shape token batch for in-step encoding
        (static max_length padding keeps XLA shapes stable)."""
        import numpy as np

        encoder = self.text_encoders[0]
        tokens = encoder.tokenize(list(captions))
        return {
            "te_input_ids": np.asarray(tokens["input_ids"], np.int32),
            "te_attention_mask": np.asarray(tokens["attention_mask"], np.int32),
        }

    def apply_text_encoder(self, te_params: Any, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Run the (trainable) text encoder inside the jitted step.  The HF
        flax module is pure and differentiable — the same model object the
        caching path uses, now applied with params from the train state.
        ``te_params``: {"te_0": tree, ...} (a bare tree also accepted for the
        single-encoder legacy layout)."""
        encoder = self.text_encoders[0]
        params = te_params.get("te_0", te_params) if isinstance(te_params, dict) else te_params
        # the HF wrapper fills position_ids and routes params to module.apply
        out = encoder.model(
            input_ids=batch["te_input_ids"],
            attention_mask=batch["te_attention_mask"],
            params=params,  # HF wrapper adds its own {"params": ...} layer
        )
        return {"text_embeds": out.last_hidden_state}

    def collate_text_embeds(self, embeds: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
        """Stack per-prompt cached embed dicts into batch arrays."""
        import numpy as np

        keys = [k for k, v in embeds[0].items() if hasattr(v, "shape")]
        return {k: np.stack([np.asarray(e[k]) for e in embeds]) for k in keys}

    def check_user_config(self) -> None:
        """Family-specific config validation; raise ValueError on bad combos."""

    def sidecar_param_keys(self) -> Tuple[str, ...]:
        """Top-level param subtrees that train full-rank next to a frozen
        base (reference init_lyrics_embedder_training, trainer.py:3292).
        Families opt in (ACE-Step lyric encoder)."""
        return ()

    def uses_audio_tokens(self) -> bool:
        """True for autoregressive codec-token families (reference
        heartmula/model.py:108): the data plane then loads pre-tokenised
        .npy frame matrices instead of VAE latents."""
        return False

    def supports_multi_reference(self) -> bool:
        """True when the family can consume several reference conditioning
        images per training sample (reference flux/model.py:517
        build_kontext_inputs over a list).  The collate then emits
        control_latents as (B, N_refs, H, W, C) in combined sampling mode."""
        return False

    # ---- misc -----------------------------------------------------------------------------
    @property
    def lora_rank(self) -> int:
        if getattr(self.config, "model_type", "lora") == "lora":
            return int(getattr(self.config, "lora_rank", 16) or 16)
        return 0

    @property
    def lora_alpha(self) -> Optional[float]:
        return getattr(self.config, "lora_alpha", None)

    @property
    def lora_algo(self) -> str:
        """"lora" (PEFT-style) or "lokr" (LyCORIS; reference --lora_type=lycoris
        with lycoris_config algo, simpletuner/lycoris_defaults.py:5)."""
        lora_type = (getattr(self.config, "lora_type", None) or "standard").lower()
        if lora_type in ("lycoris", "lokr"):
            lyc = getattr(self.config, "lycoris_config", None)
            if isinstance(lyc, str):
                import json, os

                if os.path.exists(lyc):
                    with open(lyc) as handle:
                        lyc = json.load(handle)
                else:
                    lyc = {}
            algo = ((lyc or {}).get("algo") or "lokr").lower()
            if algo in ("lokr",):
                return "lokr"
            if algo in ("tlora", "t-lora"):
                return "tlora"
            if algo in ("loha",):
                return "loha"
            if algo in ("ia3", "(ia)3", "ia^3"):
                return "ia3"
            if algo in ("lora",):
                return "lora"
            raise NotImplementedError(
                f"lycoris algo {algo!r} not ported yet; available: lora, lokr, "
                "loha, ia3, tlora"
            )
        # reference --peft_lora_mode=singlora / --lora_type=singlora (peft-singlora)
        if lora_type == "singlora" or (
            (getattr(self.config, "peft_lora_mode", None) or "standard").lower() == "singlora"
        ):
            return "singlora"
        if getattr(self.config, "use_dora", False):
            # PEFT --use_dora: weight-decomposed LoRA (magnitude + direction)
            return "dora"
        return "lora"

    def huggingface_path(self) -> Optional[str]:
        explicit = getattr(self.config, "pretrained_model_name_or_path", None)
        if explicit:
            return explicit
        if self.flavour and self.flavour in self.HUGGINGFACE_PATHS:
            return self.HUGGINGFACE_PATHS[self.flavour]
        if self.HUGGINGFACE_PATHS:
            return next(iter(self.HUGGINGFACE_PATHS.values()))
        return None
