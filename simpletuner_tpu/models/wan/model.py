"""Wan video family (reference: helpers/models/wan/model.py — 1.3B/14B
flow-matching video DiT, umT5 text encoder, causal 3D VAE, T2V/I2V flavours,
TREAD; SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..video_vae import VideoVAEConfig
from .transformer import WanConfig, WanTransformer


class Wan(ModelFoundation):
    NAME = "wan"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "video"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 480
    DEFAULT_FLAVOUR = "t2v-1.3b"
    HUGGINGFACE_PATHS = {
        "t2v-1.3b": "Wan-AI/Wan2.1-T2V-1.3B-Diffusers",
        "t2v-14b": "Wan-AI/Wan2.1-T2V-14B-Diffusers",
        "i2v-14b-480p": "Wan-AI/Wan2.1-I2V-14B-480P-Diffusers",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="umt5-xxl", family="t5-xxl", subfolder="text_encoder", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj", "ffn_in", "ffn_out")
    VAE_SCALING_FACTOR = 1.0

    def __init__(self, config: Any, arch: Optional[WanConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = WanConfig.tiny()
        elif self.flavour and "14b" in self.flavour:
            self.arch = WanConfig.b14()
        else:
            self.arch = WanConfig.b1_3()
        if self.is_i2v and arch is None:
            # I2V input: noisy latents ++ first-frame condition ++ 4-ch mask
            import dataclasses as _dc

            self.arch = _dc.replace(self.arch, in_channels=self.arch.in_channels * 2 + 4)

    @property
    def is_i2v(self) -> bool:
        return bool(self.flavour and "i2v" in self.flavour)

    @property
    def latent_channels(self) -> int:
        if self.is_i2v:
            return (self.arch.in_channels - 4) // 2
        return self.arch.in_channels

    def video_vae_config(self) -> VideoVAEConfig:
        if getattr(self.config, "model_arch_preset", None) == "tiny":
            return VideoVAEConfig.tiny()
        return VideoVAEConfig.wan()

    def create_module(self):
        return WanTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        vae_cfg = self.video_vae_config()
        latent = resolution // vae_cfg.spatial_factor
        frames = 3  # latent frames (≈ 1 + 4k decoded)
        return {
            "latents": jnp.zeros(
                (batch_size, frames, latent, latent, self.latent_channels), jnp.float32
            ),
            "text_embeds": jnp.zeros((batch_size, 64, self.arch.text_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]
        if self.is_i2v:
            # first-frame conditioning: clean frame 0 broadcast over time + a
            # frame-0-indicator mask (reference wan I2V flavours)
            clean = prepared.get("latents", jnp.zeros_like(noisy))
            first = jnp.broadcast_to(clean[:, :1], clean.shape)
            mask = jnp.zeros(noisy.shape[:-1] + (4,), noisy.dtype).at[:, 0].set(1.0)
            noisy = jnp.concatenate([noisy, first.astype(noisy.dtype), mask], axis=-1)
        return {
            "latents": noisy,
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"]}

    # ---- host-side text encoding -----------------------------------------------------------
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

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("wan is a flow-matching family")
