"""Kolors family (reference: helpers/models/kolors — SDXL UNet architecture
conditioned on ChatGLM-6B text features (4096-dim sequence + pooled);
SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from ..common import TextEncoderSpec
from ..sdxl.model import SDXL
from ..unet import UNetConfig


class Kolors(SDXL):
    NAME = "kolors"
    DEFAULT_FLAVOUR = "1.0"
    HUGGINGFACE_PATHS = {"1.0": "Kwai-Kolors/Kolors-diffusers"}
    # ChatGLM encoder: one 4096-dim stream supplies both sequence and pooled
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="chatglm", family="chatglm", subfolder="text_encoder", max_length=256),
    )

    def __init__(self, config: Any, arch: Optional[UNetConfig] = None):
        if arch is None:
            import dataclasses as _dc

            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = _dc.replace(UNetConfig.tiny_xl(), cross_attention_dim=32,
                                   addition_embed_dim=6 * 8 + 32)
            else:
                arch = _dc.replace(
                    UNetConfig.sdxl(),
                    cross_attention_dim=4096,
                    addition_embed_dim=6 * 256 + 4096,
                )
        super().__init__(config, arch=arch)

    def encode_text(self, prompts):
        (glm,) = self.text_encoders
        out = glm.encode(prompts)
        results = []
        for i in range(len(prompts)):
            seq = np.asarray(out["last_hidden_state"][i], np.float32)
            pooled = np.asarray(
                out.get("pooled", out["last_hidden_state"][:, -1])[i], np.float32
            )
            results.append(
                {
                    "text_embeds": seq,
                    "pooled_embeds": pooled,
                    "attention_mask": np.asarray(out["attention_mask"][i]),
                }
            )
        return results
