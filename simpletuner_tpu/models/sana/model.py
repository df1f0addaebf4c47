"""Sana family (reference: helpers/models/sana — efficient flow DiT with
ReLU **linear attention** (O(N) in sequence length), Gemma text encoder, and a
deep-compression autoencoder; SURVEY.md §2.3).

The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
reference's vendored ``SanaTransformer2DModel`` (70x32 linear self-attention,
20x112 softmax cross-attention, GLUMBConv Mix-FFN with the depthwise 3x3 conv
that carries all positional information, caption RMSNorm) so real Sana
weights import key-for-key.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import SanaConfig, SanaTransformer, relu_linear_attention

__all__ = ["SanaConfig", "SanaTransformer", "Sana", "relu_linear_attention"]


class Sana(ModelFoundation):
    NAME = "sana"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 32
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "1600m-1024"
    HUGGINGFACE_PATHS = {
        "1600m-1024": "Efficient-Large-Model/Sana_1600M_1024px_diffusers",
        "600m-1024": "Efficient-Large-Model/Sana_600M_1024px_diffusers",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="gemma-2", family="gemma", subfolder="text_encoder", max_length=300),
    )
    DEFAULT_LORA_TARGET = ("attn1_q", "attn1_k", "attn1_v", "attn1_proj")
    VAE_SCALING_FACTOR = 0.41407

    def __init__(self, config: Any, arch: Optional[SanaConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = SanaConfig.tiny()
        else:
            self.arch = SanaConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return SanaTransformer(
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

    # Sana complex-human-instruction template (reference sana pipeline CHI:
    # a fixed instruction block prepended to the user prompt before Gemma)
    CHI_TEMPLATE = (
        "Given a user prompt, generate an 'Enhanced prompt' that provides "
        "detailed visual descriptions suitable for image generation. Here are "
        "examples of how to transform or refine prompts: User Prompt: A cat "
        "sleeping -> Enhanced: A small, fluffy white cat curled up in a round "
        "shape, sleeping peacefully on a warm sunny windowsill. User Prompt: "
        "{prompt} -> Enhanced:"
    )

    def encode_text(self, prompts):
        (gemma,) = self.text_encoders
        if getattr(self.config, "sana_complex_human_instruction", False):
            prompts = [self.CHI_TEMPLATE.format(prompt=p) for p in prompts]
        out = gemma.encode(prompts)
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
            raise ValueError("sana is a flow-matching family")
