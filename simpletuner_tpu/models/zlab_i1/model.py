"""Zlab i1 family (reference: helpers/models/zlab_i1/model.py ``ZlabI1`` —
a 3B timestep-free flow model on 32-channel FLUX.2-VAE latents with T5Gemma
text conditioning).

Reference conventions reproduced here:

* latents are FLUX.2 VAE outputs normalized per-channel over the
  2x-pixel-unshuffled 128-channel layout (model.py:163-180,
  ``normalize_flux2_latents``) — applied by :meth:`transform_latents` so
  cached raw VAE latents normalize on the fly;
* ``flow_matching_target_direction() == -1.0`` (model.py:352-353): the
  network predicts x0 − ε, so :meth:`model_predict` negates the transformer
  output to line up with this framework's ε − x0 target;
* the transformer ignores the timestep entirely (transformer.py:693
  ``del t``);
* text encoder: T5Gemma-2B encoder (model.py:62-72) — served here by the
  gemma-2 encoder stack, 256 tokens, last_hidden_state + attention mask.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .latent_utils import normalize_flux2_latents, unscale_flux2_latents
from .transformer import ZlabI1Config, ZlabI1Transformer

__all__ = ["ZlabI1Config", "ZlabI1Transformer", "ZlabI1"]


class ZlabI1(ModelFoundation):
    NAME = "zlab_i1"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 32
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "3b"
    HUGGINGFACE_PATHS = {"3b": "zlab-princeton/i1-3B"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5gemma", family="gemma-2", subfolder="text_encoder", max_length=256),
    )
    DEFAULT_LORA_TARGET = ("qkv_image", "qkv_text", "proj_image", "proj_text", "w12", "w3")
    VAE_SCALING_FACTOR = 1.0

    def __init__(self, config: Any, arch: Optional[ZlabI1Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = ZlabI1Config.tiny()
        else:
            self.arch = ZlabI1Config()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError(f"{self.NAME} is a flow-matching family")

    def create_module(self):
        return ZlabI1Transformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def transform_latents(self, latents: jax.Array) -> jax.Array:
        # full-size channel stats only fit the real 32-channel latent layout;
        # tiny test archs skip the normalization
        if latents.shape[-1] == 32:
            return normalize_flux2_latents(latents.astype(jnp.float32))
        return latents

    def decode_transform_latents(self, latents: jax.Array) -> jax.Array:
        if latents.shape[-1] == 32:
            return unscale_flux2_latents(latents.astype(jnp.float32))
        return latents

    def example_batch(self, batch_size: int = 1, resolution: Optional[int] = None) -> Dict[str, jax.Array]:
        # default to the arch's native grid so init creates the checkpoint's
        # pos_embed param (non-native grids recompute the table on the fly)
        resolution = resolution or self.arch.input_size * 8
        latent = resolution // 8
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros(
                (batch_size, self.arch.text_num_tokens, self.arch.text_embed_dim), jnp.float32
            ),
            "text_attention_mask": jnp.ones((batch_size, self.arch.text_num_tokens), jnp.int32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        inputs = {
            "latents": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
            "context_mask": prepared.get("text_attention_mask"),
        }
        if "caption_dropout" in prepared:
            inputs["caption_dropout"] = prepared["caption_dropout"]
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        # direction -1: the network is trained toward x0 - eps (reference
        # model.py:352), our loss target is eps - x0 -> negate
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
        (t5gemma,) = self.text_encoders
        out = t5gemma.encode(prompts)
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
