"""Qwen-Image family (reference: helpers/models/qwen_image — 20B double-stream
MMDiT conditioned on Qwen2.5-VL text features, edit flavour; SURVEY.md §2.3).
Checkpoint-faithful DiT body in ``transformer.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..flux.transformer import pack_latents, unpack_latents
from .transformer import QwenImageConfig, QwenImageTransformer


class QwenImage(ModelFoundation):
    NAME = "qwen_image"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "v1"
    HUGGINGFACE_PATHS = {"v1": "Qwen/Qwen-Image", "edit": "Qwen/Qwen-Image-Edit"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen2.5-vl", family="qwen2.5-vl", subfolder="text_encoder", max_length=1024),
    )
    DEFAULT_LORA_TARGET = ("img_attn_q", "img_attn_k", "img_attn_v", "img_attn_proj")
    VAE_SCALING_FACTOR = 0.3611
    VAE_SHIFT_FACTOR = 0.1159

    def __init__(self, config: Any, arch: Optional[QwenImageConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = QwenImageConfig.tiny()
        else:
            self.arch = QwenImageConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels // 4  # 2x2 packing

    def create_module(self):
        return QwenImageTransformer(
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
            "latents": jnp.zeros((batch_size, latent, latent, self.latent_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 32, self.arch.txt_in_features), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]
        hh, ww = noisy.shape[1] // 2, noisy.shape[2] // 2
        return {
            "img": pack_latents(noisy),
            "img_hw": jnp.zeros((hh, ww), jnp.float32),
            "txt": prepared["text_embeds"],
            "timesteps": prepared["timesteps"],
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        tokens = self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)
        h, w = prepared["noisy_latents"].shape[1:3]
        return unpack_latents(tokens, h, w)

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"]}

    def encode_text(self, prompts):
        (qwen,) = self.text_encoders
        out = qwen.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("qwen_image is a flow-matching family")
