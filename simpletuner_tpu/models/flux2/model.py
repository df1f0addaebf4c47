"""Flux2 family (reference: helpers/models/flux2/model.py — FLUX.2
flow-matching image models conditioned on Mistral-3 multi-layer text features;
SURVEY.md §2.3).

Reference conventions: timesteps/guidance are σ-valued and scaled x1000 inside
the transformer (transformer.py:1162-1166); prediction is standard flow
velocity (no negation); guidance rides ``flux_guidance_value`` exactly like
Flux-1 (model.py:903-916).  The DiT body lives in ``transformer.py`` and is
checkpoint-faithful to the vendored ``Flux2Transformer2DModel``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import Flux2Config, Flux2Transformer

__all__ = ["Flux2Config", "Flux2Transformer", "Flux2"]


class Flux2(ModelFoundation):
    NAME = "flux2"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 32
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "dev"
    HUGGINGFACE_PATHS = {
        "dev": "black-forest-labs/FLUX.2-dev",
        "klein": "black-forest-labs/FLUX.2-klein",
    }
    # single Mistral-3 encoder supplies stacked multi-layer hidden states
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="mistral-3", family="mistral-3", subfolder="text_encoder", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 1.0  # FLUX.2 VAE has its own normalization
    VAE_SHIFT_FACTOR = 0.0

    def __init__(self, config: Any, arch: Optional[Flux2Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = Flux2Config.tiny()
        elif getattr(config, "model_flavour", None) == "klein":
            self.arch = Flux2Config.klein()
        else:
            self.arch = Flux2Config()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("flux2 is a flow-matching family")

    def create_module(self):
        return Flux2Transformer(
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
            "text_embeds": jnp.zeros((batch_size, 16, self.arch.txt_in_features), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        inputs = {
            "latents": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
        }
        if self.arch.guidance_embed:
            guidance_value = float(getattr(self.config, "flux_guidance_value", 1.0) or 1.0)
            inputs["guidance"] = jnp.full(
                prepared["timesteps"].shape, guidance_value, jnp.float32
            )
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        pred, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        return pred, state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"]}

    def _te_tap_layers(self):
        """Custom TE intermediary-layer taps (reference flux2/model.py:622
        _get_text_encoder_layers: --custom_text_encoder_intermediary_layers is
        a JSON list of hidden-state indices whose outputs concatenate along
        the feature dim as the prompt embeds)."""
        raw = getattr(self.config, "custom_text_encoder_intermediary_layers", None)
        if raw is None:
            return None
        if isinstance(raw, str):
            import json

            try:
                raw = json.loads(raw)
            except json.JSONDecodeError:
                raise ValueError(
                    f"custom_text_encoder_intermediary_layers is not valid JSON: {raw!r}"
                )
        layers = tuple(int(i) for i in raw)
        return layers or None

    def encode_text(self, prompts):
        (mistral,) = self.text_encoders
        layers = self._te_tap_layers()
        if layers is not None:
            out = mistral.encode_with_hidden_states(prompts)
            taps = out["hidden_states"]  # embeddings first, transformers order
            idx = [i if i >= 0 else len(taps) + i for i in layers]
            bad = [i for i in idx if i < 0 or i >= len(taps)]
            if bad:
                raise ValueError(
                    f"custom_text_encoder_intermediary_layers {layers} out of "
                    f"range for a {len(taps)}-state encoder"
                )
            stacked = np.concatenate(
                [np.asarray(taps[i], np.float32) for i in idx], axis=-1
            )
            return [
                {
                    "text_embeds": stacked[i],
                    "attention_mask": np.asarray(out["attention_mask"][i]),
                }
                for i in range(len(prompts))
            ]
        out = mistral.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
