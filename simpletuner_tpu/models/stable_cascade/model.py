"""Stable Cascade Stage-C family (reference: helpers/models/stable_cascade —
the Wuerstchen prior: an epsilon-prediction conv/attention UNet over
42x-compressed EffNet latents with CLIP-G sequence + pooled conditioning;
SURVEY.md §2.3).

The UNet lives in ``transformer.py`` and is checkpoint-faithful to the
vendored ``StableCascadeUNet``.  The model consumes the timestep RATIO
t/(T−1) (reference model.py:358-363).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import StableCascadeConfig, StableCascadeUNet

__all__ = ["StableCascadeConfig", "StableCascadeUNet", "StableCascade"]


class StableCascade(ModelFoundation):
    NAME = "stable_cascade"
    PREDICTION_TYPE = "epsilon"
    MODEL_TYPE = "unet"
    # DDPMWuerstchenScheduler's continuous cosine alpha_cumprod(t) =
    # cos^2((t+s)/(1+s)*pi/2)/alpha_0 with s=0.008 (reference
    # scheduler_ddpm_wuerstchen.py:114-126) — squaredcos_cap_v2 is its
    # 1000-step discretization
    DDPM_BETA_START = 0.0001
    DDPM_BETA_END = 0.02
    DDPM_BETA_SCHEDULE = "squaredcos_cap_v2"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "stage-c"
    HUGGINGFACE_PATHS = {"stage-c": "stabilityai/stable-cascade-prior"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="clip-g", family="clip-l", subfolder="text_encoder", max_length=77),
    )
    DEFAULT_LORA_TARGET = ("to_q", "to_k", "to_v", "to_out")

    def __init__(self, config: Any, arch: Optional[StableCascadeConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = StableCascadeConfig.tiny()
        else:
            self.arch = StableCascadeConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) == "flow_matching":
            raise ValueError("stable_cascade is an epsilon-prediction family")

    def create_module(self):
        return StableCascadeUNet(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = max(resolution // 8, 8)
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros(
                (batch_size, 8, self.arch.clip_text_in_channels or 32), jnp.float32
            ),
            "pooled_embeds": jnp.zeros(
                (batch_size, self.arch.clip_text_pooled_in_channels), jnp.float32
            ),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "sample": prepared["noisy_latents"],
            # timestep RATIO t/(T-1) (reference model.py:358-363)
            "timestep_ratio": prepared["timesteps"].astype(jnp.float32) / 999.0,
            "clip_text_pooled": prepared["pooled_embeds"],
            "clip_text": prepared["text_embeds"],
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"], "pooled_embeds": batch["pooled_embeds"]}

    def encode_text(self, prompts):
        (clip,) = self.text_encoders
        out = clip.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "pooled_embeds": np.asarray(out["pooled"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {
            "text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds]),
            "pooled_embeds": np.stack([np.asarray(e["pooled_embeds"]) for e in embeds]),
        }
