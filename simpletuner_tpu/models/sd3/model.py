"""SD3 family (reference: helpers/models/sd3/model.py — flow-matching MMDiT,
triple text encoder CLIP-L + CLIP-G + T5-XXL, 16-channel VAE, ControlNet
support; SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import SD3Config, SD3Transformer


class SD3(ModelFoundation):
    NAME = "sd3"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "medium-3.5"
    HUGGINGFACE_PATHS = {
        "medium-3.5": "stabilityai/stable-diffusion-3.5-medium",
        "large-3.5": "stabilityai/stable-diffusion-3.5-large",
        "medium-3.0": "stabilityai/stable-diffusion-3-medium-diffusers",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="clip-l", family="clip-l", subfolder="text_encoder", max_length=77),
        TextEncoderSpec(name="clip-g", family="clip-g", subfolder="text_encoder_2", max_length=77),
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder_3", max_length=256),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 1.5305
    VAE_SHIFT_FACTOR = 0.0609
    # reference trains the two CLIPs under LoRA; "The third text encoder is
    # not trained for SD3" (trainer.py:3396) — T5 encodes frozen at collate
    SUPPORTS_TEXT_ENCODER_TRAINING = True

    def __init__(self, config: Any, arch: Optional[SD3Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = SD3Config.tiny()
        elif self.flavour and "large" in self.flavour:
            self.arch = SD3Config.large()
        else:
            self.arch = SD3Config.medium()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return SD3Transformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = resolution // 8
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 77 + 32, self.arch.context_dim), jnp.float32),
            "pooled_embeds": jnp.zeros((batch_size, self.arch.pooled_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "latents": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
            "pooled": prepared["pooled_embeds"],
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        inputs = self.get_model_inputs(prepared)
        if "controlnet" in variables and "control_latents" in prepared:
            inputs["controlnet_block_residuals"] = self._controlnet_residuals(variables, prepared)
        main_vars = {k: v for k, v in variables.items() if k != "controlnet"}
        return self.module.apply(main_vars, **inputs, rngs=rngs)

    def denoise_fn_skip_layers(self, variables, conditioning: Dict[str, jax.Array],
                               skip_layers) -> Any:
        """f(latents, t) with transformer blocks dropped — the perturbed
        forward for SD3.5 skip-layer guidance (diffusers skip_guidance_layers)."""
        skip = tuple(int(i) for i in skip_layers)
        main_vars = {k: v for k, v in variables.items() if k != "controlnet"}

        def fn(latents: jax.Array, t: jax.Array) -> jax.Array:
            prepared = dict(conditioning)
            prepared["noisy_latents"] = latents
            prepared["timesteps"] = jnp.broadcast_to(t, (latents.shape[0],))
            inputs = self.get_model_inputs(prepared)
            return self.module.apply(main_vars, **inputs, skip_layers=skip)

        return fn

    # ---- controlnet (reference helpers/models/sd3 ControlNet; mirrors flux) ------------
    def controlnet_module(self):
        if not hasattr(self, "_controlnet_module"):
            from .controlnet import SD3ControlNet

            self._controlnet_module = SD3ControlNet(
                config=self.arch,
                depth=int(getattr(self.config, "controlnet_depth", 2) or 2),
                remat=bool(getattr(self.config, "gradient_checkpointing", False)),
            )
        return self._controlnet_module

    def init_controlnet_params(self, rng: jax.Array, batch: Dict[str, jax.Array]):
        prepared = self.prepare_batch(jax.random.PRNGKey(0), batch)
        inputs = self.get_model_inputs(prepared)
        module = self.controlnet_module()
        init_fn = jax.jit(
            lambda r: module.init(
                {"params": r},
                latents=inputs["latents"],
                control=batch.get("control_latents", batch["latents"]),
                timesteps=inputs["timesteps"],
                context=inputs["context"],
                pooled=inputs["pooled"],
            )
        )
        return init_fn(rng)["params"]

    def _controlnet_residuals(self, variables, prepared: Dict[str, jax.Array]):
        inputs = self.get_model_inputs(prepared)
        return self.controlnet_module().apply(
            {"params": variables["controlnet"]},
            latents=inputs["latents"],
            control=prepared["control_latents"],
            timesteps=inputs["timesteps"],
            context=inputs["context"],
            pooled=inputs["pooled"],
        )

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"], "pooled_embeds": batch["pooled_embeds"]}

    # ---- host-side text encoding -----------------------------------------------------------
    def encode_text(self, prompts):
        """CLIP-L ++ CLIP-G (channel concat, zero-padded to context_dim) stacked
        with T5 sequence (reference sd3 triple-encoder prompt embedding).

        --sd3_clip_uncond_behaviour / --sd3_t5_uncond_behaviour: empty prompts
        (the CFG negative) either encode "" normally ("empty_prompt") or zero
        their segment ("zero", the reference default for sd3)."""
        clip_l, clip_g, t5 = self.text_encoders
        out_l = clip_l.encode(prompts)
        out_g = clip_g.encode(prompts)
        out_t5 = t5.encode(prompts)
        clip_zero = (getattr(self.config, "sd3_clip_uncond_behaviour", "empty_prompt")
                     or "empty_prompt") == "zero"
        t5_zero = (getattr(self.config, "sd3_t5_uncond_behaviour", None)
                   or getattr(self.config, "sd3_clip_uncond_behaviour", "empty_prompt")
                   or "empty_prompt") == "zero"
        empty = [not str(p).strip() for p in prompts]
        if clip_zero:
            for key in ("last_hidden_state", "pooled"):
                for out in (out_l, out_g):
                    if key in out:
                        out[key] = np.array(out[key], copy=True)
                        for i, is_empty in enumerate(empty):
                            if is_empty:
                                out[key][i] = 0.0
        if t5_zero:
            out_t5["last_hidden_state"] = np.array(out_t5["last_hidden_state"], copy=True)
            for i, is_empty in enumerate(empty):
                if is_empty:
                    out_t5["last_hidden_state"][i] = 0.0
        context_dim = self.arch.context_dim
        results = []
        for i in range(len(prompts)):
            clip_seq = np.concatenate(
                [
                    np.asarray(out_l["last_hidden_state"][i], np.float32),
                    np.asarray(out_g["last_hidden_state"][i], np.float32),
                ],
                axis=-1,
            )
            clip_seq = np.pad(clip_seq, ((0, 0), (0, context_dim - clip_seq.shape[-1])))
            t5_seq = np.asarray(out_t5["last_hidden_state"][i], np.float32)
            if t5_seq.shape[-1] < context_dim:
                t5_seq = np.pad(t5_seq, ((0, 0), (0, context_dim - t5_seq.shape[-1])))
            pooled = np.concatenate(
                [
                    np.asarray(out_l.get("pooled", out_l["last_hidden_state"][:, 0])[i], np.float32),
                    np.asarray(out_g.get("pooled", out_g["last_hidden_state"][:, 0])[i], np.float32),
                ]
            )
            if pooled.shape[0] < self.arch.pooled_dim:
                pooled = np.pad(pooled, (0, self.arch.pooled_dim - pooled.shape[0]))
            results.append(
                {
                    "text_embeds": np.concatenate([clip_seq, t5_seq], axis=0),
                    "pooled_embeds": pooled,
                }
            )
        return results

    def collate_text_embeds(self, embeds):
        return {
            "text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds]),
            "pooled_embeds": np.stack([np.asarray(e["pooled_embeds"]) for e in embeds]),
        }

    # ---- in-step text-encoder training: the two CLIPs train, T5 encodes
    # frozen on the host at collate time (reference trainer.py:3396 "The third
    # text encoder is not trained for SD3") -------------------------------------------------
    def tokenize_captions(self, captions):
        out = {}
        for index, suffix in ((0, ""), (1, "_1")):
            tokens = self.text_encoders[index].tokenize(list(captions))
            out[f"te_input_ids{suffix}"] = np.asarray(tokens["input_ids"], np.int32)
            out[f"te_attention_mask{suffix}"] = np.asarray(tokens["attention_mask"], np.int32)
        context_dim = self.arch.context_dim
        out_t5 = self.text_encoders[2].encode(list(captions))
        t5_seq = np.asarray(out_t5["last_hidden_state"], np.float32)
        if t5_seq.shape[-1] < context_dim:
            t5_seq = np.pad(t5_seq, ((0, 0), (0, 0), (0, context_dim - t5_seq.shape[-1])))
        empty = np.asarray([not str(c).strip() for c in captions], np.float32)
        t5_zero = (getattr(self.config, "sd3_t5_uncond_behaviour", None)
                   or getattr(self.config, "sd3_clip_uncond_behaviour", "empty_prompt")
                   or "empty_prompt") == "zero"
        if t5_zero:
            t5_seq = t5_seq * (1.0 - empty)[:, None, None]
        out["t5_seq"] = t5_seq
        # per-sample CFG-negative zeroing mask for the in-step CLIP encode
        clip_zero = (getattr(self.config, "sd3_clip_uncond_behaviour", "empty_prompt")
                     or "empty_prompt") == "zero"
        out["te_zero_mask"] = empty if clip_zero else np.zeros_like(empty)
        return out

    def apply_text_encoder(self, te_params, batch):
        """In-step dual-CLIP encode fused with the frozen host-encoded T5
        sequence, matching the cached encode_text layout exactly."""
        clip_l, clip_g = self.text_encoders[:2]
        out_l = clip_l.model(
            input_ids=batch["te_input_ids"],
            attention_mask=batch["te_attention_mask"],
            params=te_params["te_0"],
        )
        out_g = clip_g.model(
            input_ids=batch["te_input_ids_1"],
            attention_mask=batch["te_attention_mask_1"],
            params=te_params["te_1"],
        )
        context_dim = self.arch.context_dim
        clip_seq = jnp.concatenate(
            [out_l.last_hidden_state, out_g.last_hidden_state], axis=-1
        )
        clip_seq = jnp.pad(
            clip_seq, ((0, 0), (0, 0), (0, context_dim - clip_seq.shape[-1]))
        )
        pooled_l = getattr(out_l, "pooler_output", None)
        pooled_g = getattr(out_g, "pooler_output", None)
        if pooled_l is None:
            pooled_l = out_l.last_hidden_state[:, 0]
        if pooled_g is None:
            pooled_g = out_g.last_hidden_state[:, 0]
        pooled = jnp.concatenate([pooled_l, pooled_g], axis=-1)
        if pooled.shape[-1] < self.arch.pooled_dim:
            pooled = jnp.pad(pooled, ((0, 0), (0, self.arch.pooled_dim - pooled.shape[-1])))
        keep = (1.0 - batch["te_zero_mask"]) if "te_zero_mask" in batch else 1.0
        if not isinstance(keep, float):
            clip_seq = clip_seq * keep[:, None, None]
            pooled = pooled * keep[:, None]
        text_embeds = jnp.concatenate(
            [clip_seq, batch["t5_seq"].astype(clip_seq.dtype)], axis=1
        )
        return {"text_embeds": text_embeds, "pooled_embeds": pooled}

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("sd3 is a flow-matching family")
