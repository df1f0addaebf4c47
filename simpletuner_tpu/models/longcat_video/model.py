"""LongCat-Video family (reference: helpers/models/longcat_video — meituan
13.6B single-stream video DiT with framewise adaLN and SwiGLU FFNs;
SURVEY.md §2.3).

The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
vendored ``LongCatVideoTransformer3DModel``.  Timesteps feed at scheduler
scale (σ·1000) and are broadcast framewise inside the module.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import LongCatVideoConfig, LongCatVideoTransformer

__all__ = ["LongCatVideoConfig", "LongCatVideoTransformer", "LongcatVideo"]


class LongcatVideo(ModelFoundation):
    NAME = "longcat_video"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "video"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 480
    DEFAULT_FLAVOUR = "v1"
    HUGGINGFACE_PATHS = {"v1": "meituan-longcat/LongCat-Video"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("qkv", "attn_proj", "crs_q", "crs_kv", "crs_proj")

    def __init__(self, config: Any, arch: Optional[LongCatVideoConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = LongCatVideoConfig.tiny()
        else:
            self.arch = LongCatVideoConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("longcat_video is a flow-matching family")

    def create_module(self):
        return LongCatVideoTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def video_vae_config(self):
        import dataclasses as _dc

        from ..video_vae import VideoVAEConfig

        if getattr(self.config, "model_arch_preset", None) == "tiny":
            return _dc.replace(VideoVAEConfig.tiny(), latent_channels=self.arch.in_channels)
        return _dc.replace(VideoVAEConfig.wan(), latent_channels=self.arch.in_channels)

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        del resolution
        return {
            "latents": jnp.zeros((batch_size, 2, 8, 8, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 10, self.arch.caption_channels), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        inputs = {
            "latents": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"].astype(jnp.float32) * 1000.0,
            "context": prepared["text_embeds"],
        }
        if "text_attention_mask" in prepared:
            inputs["context_mask"] = prepared["text_attention_mask"]
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        out, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        return out, state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        if "text_attention_mask" in batch:
            cond["text_attention_mask"] = batch["text_attention_mask"]
        return cond

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
        out = {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
        if all("attention_mask" in e for e in embeds):
            out["text_attention_mask"] = np.stack(
                [np.asarray(e["attention_mask"]) for e in embeds]
            )
        return out
