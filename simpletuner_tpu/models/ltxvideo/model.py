"""LTX-Video family (reference: helpers/models/ltxvideo + ltxvideo2 —
flow-matching video DiT over heavily-compressed causal-VAE latents
(32x spatial, 8x temporal, 128 latent channels), T5-XXL text conditioning;
SURVEY.md §2.3).

The DiT body reuses this framework's Wan-style block (self-attn with 3-D RoPE +
text cross-attn + FFN, scale-shift-table modulation) at LTX dimensions; the
heavy VAE compression means tokens are (1,1,1)-patchified latent cells.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..video_vae import VideoVAEConfig
from ..wan.model import Wan
from ..wan.transformer import WanConfig, WanTransformer


class LTXVideo(Wan):
    """Shares the video-family machinery with Wan; differs in arch + VAE."""

    NAME = "ltxvideo"
    DEFAULT_FLAVOUR = "2b-0.9.5"
    HUGGINGFACE_PATHS = {
        "2b-0.9.5": "Lightricks/LTX-Video-0.9.5",
        "13b-0.9.7": "Lightricks/LTX-Video-0.9.7-dev",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder", max_length=128),
    )
    LATENT_CHANNEL_COUNT = 128

    def __init__(self, config: Any, arch: Optional[WanConfig] = None):
        if arch is None:
            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = WanConfig(
                    in_channels=8, patch=(1, 1, 1), hidden_size=64, depth=2,
                    num_heads=2, head_dim=32, text_dim=32, axes_dim=(12, 10, 10),
                )
            else:
                arch = WanConfig(
                    in_channels=128,
                    patch=(1, 1, 1),  # latent cells are already 32x32x8 pixels
                    hidden_size=2048,
                    depth=28,
                    num_heads=32,
                    head_dim=64,
                    text_dim=4096,
                    axes_dim=(20, 22, 22),
                )
        super().__init__(config, arch=arch)

    def video_vae_config(self) -> VideoVAEConfig:
        if getattr(self.config, "model_arch_preset", None) == "tiny":
            return VideoVAEConfig(
                latent_channels=8, base_channels=8, channel_multipliers=(1, 2),
                temporal_downsample=(True, True), num_res_blocks=1,
            )
        # LTX causal VAE: 32x spatial, 8x temporal, 128 latent channels
        return VideoVAEConfig(
            latent_channels=128,
            base_channels=64,
            channel_multipliers=(1, 2, 4, 8, 8, 8),
            temporal_downsample=(False, True, True, True, False, False),
            num_res_blocks=2,
        )
