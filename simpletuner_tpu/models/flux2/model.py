"""Flux2 family (reference: helpers/models/flux2 — 4–32B Flux-architecture
flow models conditioned on Mistral-3 text features; SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Any, Optional

from ..common import TextEncoderSpec
from ..flux.model import Flux
from ..flux.transformer import FluxConfig


class Flux2(Flux):
    NAME = "flux2"
    DEFAULT_FLAVOUR = "dev"
    HUGGINGFACE_PATHS = {
        "dev": "black-forest-labs/FLUX.2-dev",
        "klein": "black-forest-labs/FLUX.2-klein",
    }
    # Mistral-3 text encoder: one stream supplies sequence + pooled features
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="mistral-3", family="mistral-3", subfolder="text_encoder", max_length=512),
    )

    def __init__(self, config: Any, arch: Optional[FluxConfig] = None):
        if arch is None:
            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = FluxConfig.tiny()
            else:
                arch = FluxConfig(
                    hidden_size=3072,
                    num_heads=24,
                    head_dim=128,
                    depth_double=8,
                    depth_single=38,
                    txt_in_features=5120,  # mistral-3 hidden
                    vec_in_features=5120,
                    guidance_embed=True,
                )
        super().__init__(config, arch=arch)

    def encode_text(self, prompts):
        import numpy as np

        (mistral,) = self.text_encoders
        out = mistral.encode(prompts)
        return [
            {
                "t5_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "pooled_embeds": np.asarray(
                    out.get("pooled", out["last_hidden_state"].mean(axis=1))[i], np.float32
                ),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]
