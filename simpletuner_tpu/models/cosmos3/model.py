"""Cosmos3 family (reference: helpers/models/cosmos3 — NVIDIA Cosmos
multi-flavour (image/video) flow world models, 16–65B video DiT with T5
conditioning; SURVEY.md §2.3).  Body: the framework's Wan-style video DiT
(self-attn 3D RoPE + cross-attn + FFN, scale-shift-table modulation); image
flavours run with a single-frame time axis."""

from __future__ import annotations

from typing import Any, Optional

from ..common import TextEncoderSpec
from ..wan.model import Wan
from ..wan.transformer import WanConfig


class Cosmos3(Wan):
    NAME = "cosmos3"
    DEFAULT_FLAVOUR = "predict2-2b-video"
    HUGGINGFACE_PATHS = {
        "predict2-2b-video": "nvidia/Cosmos-Predict2-2B-Video2World",
        "predict2-14b-video": "nvidia/Cosmos-Predict2-14B-Video2World",
        "predict2-2b-image": "nvidia/Cosmos-Predict2-2B-Text2Image",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5-11b", family="t5-xxl", subfolder="text_encoder", max_length=512),
    )

    def __init__(self, config: Any, arch: Optional[WanConfig] = None):
        if arch is None and getattr(config, "model_arch_preset", None) != "tiny":
            flavour = getattr(config, "model_flavour", None) or self.DEFAULT_FLAVOUR
            if "14b" in (flavour or ""):
                arch = WanConfig(hidden_size=5120, depth=36, num_heads=40, text_dim=1024)
            else:
                arch = WanConfig(hidden_size=2048, depth=28, num_heads=16, text_dim=1024)
        super().__init__(config, arch=arch)

    @property
    def is_i2v(self) -> bool:
        return False  # video2world conditioning lands with the importer
