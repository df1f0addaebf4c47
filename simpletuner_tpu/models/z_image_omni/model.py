"""Z-Image Omni family (reference: helpers/models/z_image_omni/model.py —
flow-matching image model on the Z-Image single-stream DiT with omni/edit
conditioning: clean reference-image tokens + SigLIP features ride the unified
sequence next to the noisy target; Qwen-2.5 text conditioning).

Reference conventions: the transformer output is negated
(model.py:~"noise_pred = -noise_pred"); conditioning latents arrive via the
data plane's ``control_latents`` pairing; SigLIP features ride
``siglip_embeds`` when a conditioning image-embed dataset supplies them.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import ZImageOmniConfig, ZImageOmniTransformer

__all__ = ["ZImageOmniConfig", "ZImageOmniTransformer", "ZImageOmni"]


class ZImageOmni(ModelFoundation):
    NAME = "z_image_omni"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "omni"
    HUGGINGFACE_PATHS = {"omni": "Tongyi-MAI/Z-Image-Omni"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen", family="qwen2.5", subfolder="text_encoder", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 0.3611
    VAE_SHIFT_FACTOR = 0.1159

    def __init__(self, config: Any, arch: Optional[ZImageOmniConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = ZImageOmniConfig.tiny()
        else:
            self.arch = ZImageOmniConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError(f"{self.NAME} is a flow-matching family")

    def create_module(self):
        return ZImageOmniTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        # includes cond latents + siglip so init_params templates the FULL
        # reference param set (the torch model always constructs the siglip
        # refiner stack and embedders, transformer.py:648-676)
        latent = resolution // 8
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 32, self.arch.cap_feat_dim), jnp.float32),
            "text_attention_mask": jnp.ones((batch_size, 32), jnp.int32),
            "control_latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "siglip_embeds": jnp.zeros((batch_size, 4, 4, self.arch.siglip_feat_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        inputs = {
            "latents": prepared["noisy_latents"],
            # reference model.py:453 feeds (1000 - t)/1000 = 1 - sigma — the
            # transformer's "clean" embedding is t=1
            "timesteps": 1.0 - prepared["timesteps"],
            "context": prepared["text_embeds"],
            "context_mask": prepared.get("text_attention_mask"),
        }
        if "control_latents" in prepared:
            inputs["cond_latents"] = prepared["control_latents"]
        if "siglip_embeds" in prepared:
            inputs["siglip_embeds"] = prepared["siglip_embeds"]
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        # reference negates the transformer output (model.py noise_pred = -out)
        return -self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        pred, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        return -pred, state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        for key in ("text_attention_mask", "control_latents", "siglip_embeds"):
            if key in batch:
                cond[key] = batch[key]
        return cond

    def encode_text(self, prompts):
        (qwen,) = self.text_encoders
        out = qwen.encode(prompts)
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
