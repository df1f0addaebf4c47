"""Kandinsky 5.0 families (reference: helpers/models/kandinsky5_video +
helpers/models/kandinsky5_image — ai-forever latent flow DiTs with a 2-block
text refiner stack and 32-block visual decoder, Qwen2.5-VL sequence
conditioning + CLIP pooled conditioning; SURVEY.md §2.3).

The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
vendored ``Kandinsky5Transformer3DModel``.  Timesteps feed the sinusoid at
the σ·1000 scheduler scale (reference model.py passes
``prepared_batch["timesteps"]`` straight through).  I2V flavours
(``visual_cond=True``) concatenate [latents, first-frame cond, mask] on the
channel axis (reference kandinsky5_video/model.py:460-483).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import Kandinsky5Config, Kandinsky5Transformer

__all__ = ["Kandinsky5Config", "Kandinsky5Transformer", "Kandinsky5Video", "Kandinsky5Image"]


class Kandinsky5Video(ModelFoundation):
    NAME = "kandinsky5_video"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "video"
    LATENT_CHANNEL_COUNT = 4
    DEFAULT_RESOLUTION = 512
    DEFAULT_FLAVOUR = "lite-t2v"
    HUGGINGFACE_PATHS = {
        "lite-t2v": "ai-forever/Kandinsky-5.0-T2V-Lite-sft-5s",
        "lite-i2v": "ai-forever/Kandinsky-5.0-I2V-Lite-sft-5s",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen2.5-vl", family="qwen2.5-vl", subfolder="text_encoder", max_length=512),
        TextEncoderSpec(name="clip-l", family="clip-l", subfolder="text_encoder_2", max_length=77, output="pooled"),
    )
    DEFAULT_LORA_TARGET = ("to_query", "to_key", "to_value", "out_layer")

    def __init__(self, config: Any, arch: Optional[Kandinsky5Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = Kandinsky5Config.tiny()
        else:
            self.arch = Kandinsky5Config(
                visual_cond="i2v" in str(self.flavour or ""),
            )

    @property
    def latent_channels(self) -> int:
        return self.arch.in_visual_dim

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError(f"{self.NAME} is a flow-matching family")

    def create_module(self):
        return Kandinsky5Transformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def video_vae_config(self):
        from ..video_vae import VideoVAEConfig

        if getattr(self.config, "model_arch_preset", None) == "tiny":
            import dataclasses as _dc

            return _dc.replace(VideoVAEConfig.tiny(), latent_channels=self.arch.in_visual_dim)
        import dataclasses as _dc

        return _dc.replace(VideoVAEConfig.wan(), latent_channels=self.arch.in_visual_dim)

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        del resolution
        return {
            "latents": jnp.zeros((batch_size, 2, 8, 8, self.arch.in_visual_dim), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 10, self.arch.in_text_dim), jnp.float32),
            "pooled_embeds": jnp.zeros((batch_size, self.arch.in_text_dim2), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]  # (B, T, H, W, C)
        if self.arch.visual_cond:
            cond = prepared.get("i2v_cond_latents")
            mask = prepared.get("i2v_cond_mask")
            if cond is None:
                cond = jnp.zeros_like(noisy)
                mask = jnp.zeros(noisy.shape[:-1] + (1,), noisy.dtype)
            elif mask is None:
                mask = jnp.ones(noisy.shape[:-1] + (1,), noisy.dtype)
            noisy = jnp.concatenate([noisy, cond, mask], axis=-1)
        return {
            "latents": noisy,
            "text_embeds": prepared["text_embeds"],
            "pooled_embeds": prepared["pooled_embeds"],
            # reference feeds scheduler-scale timesteps (σ·1000)
            "timesteps": prepared["timesteps"].astype(jnp.float32) * 1000.0,
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        out, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        return out, state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"], "pooled_embeds": batch["pooled_embeds"]}

    def encode_text(self, prompts):
        qwen, clip = self.text_encoders
        seq = qwen.encode(prompts)
        pooled = clip.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(seq["last_hidden_state"][i], np.float32),
                "pooled_embeds": np.asarray(pooled["pooled"][i], np.float32),
                "attention_mask": np.asarray(seq["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {
            "text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds]),
            "pooled_embeds": np.stack([np.asarray(e["pooled_embeds"]) for e in embeds]),
        }


class Kandinsky5Image(Kandinsky5Video):
    """Image flavour: the same DiT at T=1 (reference kandinsky5_image rides
    the kandinsky5_video transformer with single-frame latents)."""

    NAME = "kandinsky5_image"
    MODALITY = "image"
    DEFAULT_FLAVOUR = "lite"
    HUGGINGFACE_PATHS = {"lite": "ai-forever/Kandinsky-5.0-T2I-Lite"}

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = max(resolution // 8, 8)
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_visual_dim), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 10, self.arch.in_text_dim), jnp.float32),
            "pooled_embeds": jnp.zeros((batch_size, self.arch.in_text_dim2), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        prepared = dict(prepared)
        prepared["noisy_latents"] = prepared["noisy_latents"][:, None]  # add T=1
        return super().get_model_inputs(prepared)

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        out = self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)
        return out[:, 0]  # drop the frame axis
