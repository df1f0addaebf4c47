"""DeepFloyd IF family (reference: helpers/models/deepfloyd — pixel-space
epsilon UNet (no VAE) with T5-XXL conditioning, 64px stage-1; SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from ..common import TextEncoderSpec
from ..sd1x.model import SD1x
from ..unet import UNetConfig


class DeepFloyd(SD1x):
    NAME = "deepfloyd"
    PREDICTION_TYPE = "epsilon"
    REQUIRES_VAE = False  # pixel space
    # IF scheduler config: squaredcos_cap_v2 betas (hub scheduler_config.json)
    DDPM_BETA_START = 0.0001
    DDPM_BETA_END = 0.02
    DDPM_BETA_SCHEDULE = "squaredcos_cap_v2"
    # T5-XXL encoder: in-step TE training untested for the T5 path; keep the
    # inherited SD1x opt-in off rather than accept-and-maybe-break
    SUPPORTS_TEXT_ENCODER_TRAINING = False
    LATENT_CHANNEL_COUNT = 3
    DEFAULT_RESOLUTION = 64
    DEFAULT_FLAVOUR = "i-m-400m"
    HUGGINGFACE_PATHS = {
        "i-m-400m": "DeepFloyd/IF-I-M-v1.0",
        "i-l-900m": "DeepFloyd/IF-I-L-v1.0",
        "i-xl-4.3b": "DeepFloyd/IF-I-XL-v1.0",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder", max_length=77),
    )
    VAE_SCALING_FACTOR = 1.0

    def __init__(self, config: Any, arch: Optional[UNetConfig] = None):
        if arch is None:
            import dataclasses as _dc

            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = _dc.replace(UNetConfig.tiny(), in_channels=3, out_channels=3)
            else:
                arch = UNetConfig(
                    in_channels=3,
                    out_channels=3,
                    block_out_channels=(64, 128, 256, 512),
                    cross_attention_dim=4096,
                )
        super().__init__(config, arch=arch)

    @property
    def latent_channels(self) -> int:
        return 3

    def example_batch(self, batch_size: int = 1, resolution: int = 64):
        import jax.numpy as jnp

        return {
            "latents": jnp.zeros((batch_size, resolution, resolution, 3), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 77, self.arch.cross_attention_dim), jnp.float32),
        }

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
