"""AuraFlow family (reference: helpers/models/auraflow — 6B flow-matching DiT
with Pile-T5 text encoder, MMDiT double blocks followed by single DiT blocks;
SURVEY.md §2.3).

The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
reference's vendored ``AuraFlowTransformer2DModel`` (learned centered-crop
position table, register tokens, fp32 qk LayerNorms, SwiGLU FFNs, bias-free
linears, attention-through-FFN residual) so real AuraFlow weights import
key-for-key.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import AuraFlowConfig, AuraFlowTransformer

__all__ = ["AuraFlowConfig", "AuraFlowTransformer", "AuraFlow"]


class AuraFlow(ModelFoundation):
    NAME = "auraflow"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 4
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "v0.3"
    HUGGINGFACE_PATHS = {"v0.3": "fal/AuraFlow-v0.3", "v0.2": "fal/AuraFlow-v0.2"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="pile-t5", family="t5-xxl", subfolder="text_encoder", max_length=256),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 0.13025

    def __init__(self, config: Any, arch: Optional[AuraFlowConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = AuraFlowConfig.tiny()
        else:
            self.arch = AuraFlowConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return AuraFlowTransformer(
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
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

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
