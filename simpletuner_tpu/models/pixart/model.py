"""PixArt-Sigma family (reference: helpers/models/pixart — epsilon-prediction
DiT with T5-XXL cross-attention, 2x2 patchify, adaLN-single conditioning,
ControlNet and two-stage eDiff support; SURVEY.md §2.3).

The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
reference's vendored ``PixArtTransformer2DModel`` (sincos position table,
gelu-tanh caption projection, per-block scale_shift_table, cross-attention on
the unnormalized stream) so real PixArt weights import key-for-key.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..staged_validation import TwoStageValidationMixin
from .transformer import PixartConfig, PixartTransformer

__all__ = ["PixartConfig", "PixartTransformer", "PixartSigma"]


class PixartSigma(TwoStageValidationMixin, ModelFoundation):
    # eDiffi v0.7 stage1/stage2 full-pipeline validation (reference
    # pixart/model.py:454-620)
    STAGED_VALIDATION_PREFIX = "pixart"
    NAME = "pixart_sigma"
    PREDICTION_TYPE = "epsilon"
    MODEL_TYPE = "transformer"
    # PixArt ships the IDDPM linear schedule (hub scheduler_config.json),
    # not SD's scaled_linear — reference reads it via DDPMScheduler.from_pretrained
    DDPM_BETA_START = 0.0001
    DDPM_BETA_END = 0.02
    DDPM_BETA_SCHEDULE = "linear"
    LATENT_CHANNEL_COUNT = 4
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "1024-ms"
    HUGGINGFACE_PATHS = {
        "1024-ms": "PixArt-alpha/PixArt-Sigma-XL-2-1024-MS",
        "512-ms": "PixArt-alpha/PixArt-Sigma-XL-2-512-MS",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder", max_length=300),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 0.13025  # SDXL VAE

    def __init__(self, config: Any, arch: Optional[PixartConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = PixartConfig.tiny()
        elif getattr(config, "model_flavour", None) == "512-ms":
            self.arch = PixartConfig.sigma_512()
        else:
            self.arch = PixartConfig.sigma_1024()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return PixartTransformer(
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
            "text_embeds": jnp.zeros((batch_size, 32, self.arch.text_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "latents": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        inputs = self.get_model_inputs(prepared)
        if "controlnet" in variables and "control_latents" in prepared:
            inputs["controlnet_block_residuals"] = self._controlnet_residuals(variables, prepared)
        main_vars = {k: v for k, v in variables.items() if k != "controlnet"}
        return self.module.apply(main_vars, **inputs, rngs=rngs)

    # ---- controlnet (reference helpers/models/pixart ControlNet; PixArt-δ) -------------
    def controlnet_module(self):
        if not hasattr(self, "_controlnet_module"):
            from .controlnet import PixartControlNet

            self._controlnet_module = PixartControlNet(
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
        )

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"]}

    def encode_text(self, prompts):
        (t5,) = self.text_encoders
        out = t5.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
