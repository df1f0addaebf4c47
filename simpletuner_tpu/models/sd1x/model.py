"""SD 1.x / 2.x legacy UNet families.

Reference: helpers/models/sd1x/model.py (SURVEY.md §2.3: epsilon UNet for 1.x,
v-prediction for 2.x, CLIP text encoder, 4-channel VAE latents).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..common import ModelFoundation, TextEncoderSpec
from ..unet import UNet2DCondition, UNetConfig


class SD1x(ModelFoundation):
    NAME = "sd1x"
    PREDICTION_TYPE = "epsilon"
    SUPPORTS_TEXT_ENCODER_TRAINING = True  # reference-recommended for SD 1.x/2.x
    SUPPORTS_FULL_TEXT_ENCODER_TRAINING = True
    MODEL_TYPE = "unet"
    LATENT_CHANNEL_COUNT = 4
    DEFAULT_RESOLUTION = 512
    DEFAULT_FLAVOUR = "1.5"
    HUGGINGFACE_PATHS = {
        "1.5": "stable-diffusion-v1-5/stable-diffusion-v1-5",
        "1.4": "CompVis/stable-diffusion-v1-4",
        "dreamshaper": "Lykon/dreamshaper-8",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="clip-l", family="clip-l", subfolder="text_encoder", max_length=77),
    )
    DEFAULT_LORA_TARGET = ("to_q", "to_k", "to_v", "to_out")
    VAE_SCALING_FACTOR = 0.18215

    def __init__(self, config: Any, arch: Optional[UNetConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = UNetConfig.tiny()
        else:
            self.arch = self.default_arch()

    def default_arch(self) -> UNetConfig:
        return UNetConfig.sd15()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return UNet2DCondition(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = resolution // 8
        batch = {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 77, self.arch.cross_attention_dim), jnp.float32),
        }
        entities = int(getattr(self.config, "max_grounding_entities", 0) or 0)
        if entities > 0:  # GLIGEN grounding slots (reference grounding/collate.py)
            batch["grounding_boxes"] = jnp.zeros((batch_size, entities, 4), jnp.float32)
            batch["grounding_phrases"] = jnp.zeros(
                (batch_size, entities, self.arch.cross_attention_dim), jnp.float32
            )
            batch["grounding_masks"] = jnp.zeros((batch_size, entities), jnp.float32)
        return batch

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        inputs = {
            "sample": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "encoder_hidden_states": prepared["text_embeds"],
        }
        if "grounding_boxes" in prepared:
            inputs["grounding_boxes"] = prepared["grounding_boxes"]
            inputs["grounding_phrases"] = prepared["grounding_phrases"]
            inputs["grounding_masks"] = prepared.get("grounding_masks")
        return inputs

    # ---- controlnet (reference sd1x/sdxl controlnet pipelines) --------------------------
    def controlnet_module(self):
        if not hasattr(self, "_controlnet_module"):
            from ..unet_controlnet import UNetControlNet

            self._controlnet_module = UNetControlNet(
                config=self.arch,
                remat=bool(getattr(self.config, "gradient_checkpointing", False)),
            )
        return self._controlnet_module

    def init_controlnet_params(self, rng: jax.Array, batch: Dict[str, jax.Array]):
        prepared = self.prepare_batch(jax.random.PRNGKey(0), batch)
        inputs = self.get_model_inputs(prepared)
        control = batch.get("control_latents", batch["latents"])
        module = self.controlnet_module()
        init_fn = jax.jit(
            lambda r: module.init(
                {"params": r},
                sample=inputs["sample"],
                control=control,
                timesteps=inputs["timesteps"],
                encoder_hidden_states=inputs["encoder_hidden_states"],
                added_cond=inputs.get("added_cond"),
            )
        )
        return init_fn(rng)["params"]

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        inputs = self.get_model_inputs(prepared)
        if "controlnet" in variables and "control_latents" in prepared:
            residuals, mid = self.controlnet_module().apply(
                {"params": variables["controlnet"]},
                sample=inputs["sample"],
                control=prepared["control_latents"].astype(inputs["sample"].dtype),
                timesteps=inputs["timesteps"],
                encoder_hidden_states=inputs["encoder_hidden_states"],
                added_cond=inputs.get("added_cond"),
            )
            inputs["controlnet_skip_residuals"] = residuals
            inputs["controlnet_mid_residual"] = mid
        main_vars = {k: v for k, v in variables.items() if k != "controlnet"}
        return self.module.apply(main_vars, **inputs, rngs=rngs)

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"]}

    # ---- host-side text encoding -----------------------------------------------------------
    def encode_text(self, prompts):
        import numpy as np

        (clip,) = self.text_encoders
        out = clip.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        import numpy as np

        return {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}


class SD2x(SD1x):
    NAME = "sd2x"
    PREDICTION_TYPE = "v_prediction"
    DEFAULT_FLAVOUR = "2.1"
    HUGGINGFACE_PATHS = {
        "2.1": "stabilityai/stable-diffusion-2-1",
        "2.0": "stabilityai/stable-diffusion-2",
    }

    def default_arch(self) -> UNetConfig:
        return UNetConfig.sd21()
