"""ERNIE family (reference: helpers/models/ernie — Baidu ERNIE-4.5-VL
conditioned image flow DiT over cache-packed 128-channel latents;
SURVEY.md §2.3 "ernie").

The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
vendored ``ErnieImageTransformer2DModel``.  The image latents ride our
2x2 ``pack_latents`` of 32-channel features (reference caches pre-packed
128ch); timesteps feed through at scheduler scale (σ·1000).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import ErnieConfig, ErnieTransformer

__all__ = ["ErnieConfig", "ErnieTransformer", "Ernie"]


class Ernie(ModelFoundation):
    NAME = "ernie"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 32
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "v1"
    HUGGINGFACE_PATHS = {"v1": "baidu/ERNIE-4.5-VL-image"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="ernie-vl", family="qwen2.5", subfolder="text_encoder", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("to_q", "to_k", "to_v", "to_out")

    def __init__(self, config: Any, arch: Optional[ErnieConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = ErnieConfig.tiny()
        else:
            self.arch = ErnieConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels // 4  # 2x2 packing of the cache latents

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("ernie is a flow-matching family")

    def create_module(self):
        return ErnieTransformer(
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
            "latents": jnp.zeros((batch_size, latent, latent, self.latent_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 8, self.arch.text_in_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]  # (B, H, W, C)
        batch, height, width, channels = noisy.shape
        # 2x2 pack to the model's in_channels grid
        packed = noisy.reshape(batch, height // 2, 2, width // 2, 2, channels)
        packed = packed.transpose(0, 1, 3, 2, 4, 5).reshape(
            batch, height // 2, width // 2, channels * 4
        )
        text = prepared["text_embeds"]
        mask = prepared.get("text_attention_mask")
        if mask is None:
            lens = jnp.full((batch,), text.shape[1], jnp.int32)
        else:
            lens = mask.astype(jnp.int32).sum(axis=1)
        return {
            "latents": packed,
            "timesteps": prepared["timesteps"].astype(jnp.float32) * 1000.0,
            "text_embeds": text,
            "text_lens": lens,
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        out = self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)
        batch, height, width, channels = prepared["noisy_latents"].shape
        out = out.reshape(batch, height // 2, width // 2, 2, 2, channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(batch, height, width, channels)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        out, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        batch, height, width, channels = prepared["noisy_latents"].shape
        out = out.reshape(batch, height // 2, width // 2, 2, 2, channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(batch, height, width, channels)
        return out, state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        if "text_attention_mask" in batch:
            cond["text_attention_mask"] = batch["text_attention_mask"]
        return cond

    def encode_text(self, prompts):
        (encoder,) = self.text_encoders
        out = encoder.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        out = {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
        if all("attention_mask" in e for e in embeds):
            out["text_attention_mask"] = np.stack(
                [np.asarray(e["attention_mask"]) for e in embeds]
            )
        return out
