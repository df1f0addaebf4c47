"""Lumina2 family (reference: helpers/models/lumina2 — Next-DiT flow-matching
image model with Gemma-2 text conditioning; SURVEY.md §2.3).  DiT body:
self-attention + text cross-attention blocks over 2-D RoPE'd tokens (the
framework's shared Wan-style block) at Lumina dimensions."""

from __future__ import annotations

from typing import Any, Optional

from ..common import TextEncoderSpec
from ..pixart.model import PixartConfig, PixartSigma


class Lumina2(PixartSigma):
    NAME = "lumina2"
    PREDICTION_TYPE = "flow_matching"
    DEFAULT_FLAVOUR = "2.0"
    HUGGINGFACE_PATHS = {"2.0": "Alpha-VLLM/Lumina-Image-2.0"}
    LATENT_CHANNEL_COUNT = 16
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="gemma-2", family="gemma-2", subfolder="text_encoder", max_length=256),
    )
    VAE_SCALING_FACTOR = 0.3611  # flux VAE
    VAE_SHIFT_FACTOR = 0.1159

    def __init__(self, config: Any, arch: Optional[PixartConfig] = None):
        if arch is None:
            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = PixartConfig(
                    in_channels=4, hidden_size=64, depth=2, num_heads=2,
                    head_dim=32, text_dim=32,
                )
            else:
                arch = PixartConfig(
                    in_channels=16,
                    hidden_size=2304,
                    depth=26,
                    num_heads=24,
                    head_dim=96,
                    text_dim=2304,  # gemma-2-2b hidden
                )
        super().__init__(config, arch=arch)

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("lumina2 is a flow-matching family")
