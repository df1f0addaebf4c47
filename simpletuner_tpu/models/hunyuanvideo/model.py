"""HunyuanVideo family (reference: helpers/models/hunyuanvideo — the vendored
HunyuanVideo **1.5** stack: 8.3B dual-stream video MMDiT with a Qwen2.5-VL
token refiner, ByT5 glyph stream, SigLIP image-embed stream (i2v), cond-type
embeddings and rope theta 256; SURVEY.md §2.3).  Checkpoint-faithful DiT body
in ``transformer.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..video_vae import VideoVAEConfig
from .transformer import HunyuanVideo15Config, HunyuanVideo15Transformer


class HunyuanVideo(ModelFoundation):
    NAME = "hunyuanvideo"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "video"
    LATENT_CHANNEL_COUNT = 32
    DEFAULT_RESOLUTION = 480
    DEFAULT_FLAVOUR = "t2v-480p"
    HUGGINGFACE_PATHS = {
        "t2v-480p": "tencent/HunyuanVideo-1.5",
        "i2v-480p": "tencent/HunyuanVideo-1.5",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen2.5-vl", family="qwen2.5-vl", subfolder="text_encoder", max_length=256),
        TextEncoderSpec(name="byt5", family="t5-xxl", subfolder="text_encoder_2", max_length=77),
    )
    DEFAULT_LORA_TARGET = ("img_attn_q", "img_attn_k", "img_attn_v", "img_attn_proj")
    VAE_SCALING_FACTOR = 0.476986

    def __init__(self, config: Any, arch: Optional[HunyuanVideo15Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = HunyuanVideo15Config.tiny()
        else:
            self.arch = HunyuanVideo15Config()

    @property
    def is_i2v(self) -> bool:
        return bool(self.flavour and "i2v" in str(self.flavour))

    @property
    def latent_channels(self) -> int:
        return self.arch.out_channels

    def video_vae_config(self) -> VideoVAEConfig:
        if getattr(self.config, "model_arch_preset", None) == "tiny":
            return VideoVAEConfig.tiny()
        import dataclasses as _dc

        return _dc.replace(VideoVAEConfig.wan(), latent_channels=self.arch.out_channels)

    @staticmethod
    def load_sr_upsampler(kind: str, path: str, tiny: bool = False):
        """Checkpoint-faithful SR-stage latent upsampler → (module,
        variables); kind ∈ {"720p", "1080p"} (reference
        helpers/models/hunyuanvideo/modules/upsample.py second stage)."""
        from .sr_upsampler import load_sr_upsampler

        return load_sr_upsampler(kind, path, tiny=tiny)

    def create_module(self):
        return HunyuanVideo15Transformer(
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
        return {
            "latents": jnp.zeros(
                (batch_size, 3, latent, latent, self.latent_channels), jnp.float32
            ),
            "text_embeds": jnp.zeros((batch_size, 32, self.arch.text_dim), jnp.float32),
            "text_embeds_2": jnp.zeros((batch_size, 16, self.arch.text2_dim), jnp.float32),
            # zeros mark t2v; presence initializes the image_embedder params so
            # real checkpoints import fully even for text-to-video training
            "image_embeds": jnp.zeros((batch_size, 8, self.arch.image_embed_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]
        c = noisy.shape[-1]
        if self.arch.in_channels == 2 * c + 1:
            # i2v channel packing: [noisy, first-frame cond latents, frame mask]
            clean = prepared.get("latents", jnp.zeros_like(noisy))
            if self.is_i2v:
                cond = jnp.concatenate(
                    [clean[:, :1], jnp.zeros_like(clean[:, 1:])], axis=1
                ).astype(noisy.dtype)
                mask = jnp.zeros(noisy.shape[:-1] + (1,), noisy.dtype).at[:, 0].set(1.0)
            else:
                cond = jnp.zeros_like(noisy)
                mask = jnp.zeros(noisy.shape[:-1] + (1,), noisy.dtype)
            noisy = jnp.concatenate([noisy, cond, mask], axis=-1)
        inputs = {
            "latents": noisy,
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
        }
        if "text_mask" in prepared:
            inputs["context_mask"] = prepared["text_mask"]
        if "text_embeds_2" in prepared:
            inputs["context_2"] = prepared["text_embeds_2"]
        if "text_mask_2" in prepared:
            inputs["context_2_mask"] = prepared["text_mask_2"]
        if "image_embeds" in prepared:
            inputs["image_embeds"] = prepared["image_embeds"]
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {k: v for k, v in batch.items() if k != "latents"}

    def encode_text(self, prompts):
        qwen, byt5 = self.text_encoders
        out_q = qwen.encode(prompts)
        out_b = byt5.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out_q["last_hidden_state"][i], np.float32),
                "text_mask": np.asarray(out_q["attention_mask"][i]),
                "text_embeds_2": np.asarray(out_b["last_hidden_state"][i], np.float32),
                "text_mask_2": np.asarray(out_b["attention_mask"][i]),
                "attention_mask": np.asarray(out_q["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {
            "text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds]),
            "text_mask": np.stack([np.asarray(e["text_mask"]) for e in embeds]),
            "text_embeds_2": np.stack([np.asarray(e["text_embeds_2"]) for e in embeds]),
            "text_mask_2": np.stack([np.asarray(e["text_mask_2"]) for e in embeds]),
        }

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("hunyuanvideo is a flow-matching family")
