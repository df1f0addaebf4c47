"""Lumina2 family (reference: helpers/models/lumina2/model.py — Next-DiT
flow-matching image model with Gemma-2 text conditioning; SURVEY.md §2.3).

Reference conventions (model.py:174-235 ``model_predict``):
* transformer timestep = ``1 - t/num_train_timesteps`` (reverse flow), i.e.
  ``1 - σ`` for our σ-valued flow timesteps;
* the transformer output is negated (``model_pred = -model_pred``) so the
  trained target is the standard ``noise - latents`` flow velocity;
* caption padding rides an ``encoder_attention_mask`` into the transformer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import Lumina2Config, Lumina2Transformer

__all__ = ["Lumina2Config", "Lumina2Transformer", "Lumina2"]


class Lumina2(ModelFoundation):
    NAME = "lumina2"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "2.0"
    HUGGINGFACE_PATHS = {"2.0": "Alpha-VLLM/Lumina-Image-2.0"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="gemma-2", family="gemma-2", subfolder="text_encoder", max_length=256),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 0.3611  # flux VAE
    VAE_SHIFT_FACTOR = 0.1159

    def __init__(self, config: Any, arch: Optional[Lumina2Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = Lumina2Config.tiny()
        else:
            self.arch = Lumina2Config()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("lumina2 is a flow-matching family")

    def create_module(self):
        return Lumina2Transformer(
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
            "text_embeds": jnp.zeros((batch_size, 32, self.arch.cap_feat_dim), jnp.float32),
            "text_attention_mask": jnp.ones((batch_size, 32), jnp.int32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "latents": prepared["noisy_latents"],
            # reverse timestep normalization (reference model.py:278 ``1 - t/T``)
            "timesteps": 1.0 - prepared["timesteps"],
            "context": prepared["text_embeds"],
            "context_mask": prepared.get("text_attention_mask"),
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        # reverse flow: reference negates the transformer output (model.py:232)
        return -self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        pred, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        return -pred, state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        if "text_attention_mask" in batch:
            cond["text_attention_mask"] = batch["text_attention_mask"]
        return cond

    def encode_text(self, prompts):
        (gemma,) = self.text_encoders
        out = gemma.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        batch = {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
        if all("attention_mask" in e for e in embeds):
            batch["text_attention_mask"] = np.stack(
                [np.asarray(e["attention_mask"]) for e in embeds]
            )
        return batch
