"""MageFlow / Z-Image families (reference: helpers/models/mageflow +
helpers/models/z_image — S3-DiT flow models over DC-AE latents (128ch packed),
Qwen text conditioning (2560-dim), double-stream blocks without a pooled-vec
stream (reference mageflow/transformer.py:60-90: hidden 3072, heads 24,
depth 12 double, no single blocks, guidance off); SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..common import TextEncoderSpec
from ..flux.model import Flux
from ..flux.transformer import FluxConfig


class MageFlow(Flux):
    NAME = "mageflow"
    DEFAULT_FLAVOUR = "v1"
    HUGGINGFACE_PATHS = {"v1": "MageFlow/mageflow-4b"}
    LATENT_CHANNEL_COUNT = 32  # DC-AE latents, 2x2-packed to in_channels=128
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen", family="qwen2.5", subfolder="text_encoder", max_length=1024),
    )

    def __init__(self, config: Any, arch: Optional[FluxConfig] = None):
        if arch is None:
            import dataclasses as _dc

            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = _dc.replace(FluxConfig.tiny(), guidance_embed=False)
            else:
                arch = FluxConfig(
                    in_channels=128,
                    hidden_size=3072,
                    num_heads=24,
                    head_dim=128,
                    depth_double=12,
                    depth_single=0,
                    txt_in_features=2560,  # qwen hidden
                    vec_in_features=2560,
                    guidance_embed=False,
                )
        super().__init__(config, arch=arch)

    def encode_text(self, prompts):
        (qwen,) = self.text_encoders
        out = qwen.encode(prompts)
        return [
            {
                "t5_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                # no pooled stream: zero vec (reference vec_in_dim=0)
                "pooled_embeds": np.zeros((self.arch.vec_in_features,), np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]


class ZImage(MageFlow):
    NAME = "z_image"
    DEFAULT_FLAVOUR = "turbo"
    HUGGINGFACE_PATHS = {"turbo": "Tongyi-MAI/Z-Image-Turbo"}

    def __init__(self, config: Any, arch: Optional[FluxConfig] = None):
        if arch is None and getattr(config, "model_arch_preset", None) != "tiny":
            arch = FluxConfig(
                in_channels=64,  # 16ch VAE latents 2x2-packed
                hidden_size=3072,
                num_heads=24,
                head_dim=128,
                depth_double=19,
                depth_single=0,
                txt_in_features=2560,
                vec_in_features=2560,
                guidance_embed=False,
            )
        super().__init__(config, arch=arch)
