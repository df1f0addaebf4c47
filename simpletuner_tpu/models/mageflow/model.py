"""MageFlow / Z-Image families (reference: helpers/models/mageflow +
helpers/models/z_image — S3-DiT flow models over packed latents with Qwen
text conditioning; vendor mage_layers.py ``MageFlowTransformerBlock``).

The vendored MageFlow block IS the Qwen-Image double-stream layout (img/txt
SiLU mod linears, joint attention with to_q/add_q_proj projections, per-head
RMS q/k norms, gelu-tanh FFNs, centered scale_rope, AdaLayerNormContinuous
output) with ONE difference: text tokens are never rotated
(mage_layers.py:155 "Text tokens are NOT rotated").  The family therefore
rides the checkpoint-faithful ``QwenImageTransformer`` with ``txt_rope=False``
— the Qwen-Image diffusers importer loads MageFlow/Z-Image checkpoints
verbatim (identical key layout, mage_flow.py:57-90).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

from ..common import TextEncoderSpec
from ..qwen_image.model import QwenImage
from ..qwen_image.transformer import QwenImageConfig


class MageFlow(QwenImage):
    NAME = "mageflow"
    DEFAULT_FLAVOUR = "v1"
    HUGGINGFACE_PATHS = {"v1": "MageFlow/mageflow-4b"}
    LATENT_CHANNEL_COUNT = 32  # DC-AE latents, 2x2-packed to in_channels=128
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen", family="qwen2.5", subfolder="text_encoder", max_length=4096),
    )

    def __init__(self, config: Any, arch: Optional[QwenImageConfig] = None):
        if arch is None:
            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = dataclasses.replace(QwenImageConfig.tiny(), txt_rope=False)
            else:
                arch = QwenImageConfig(
                    in_channels=128,
                    hidden_size=3072,
                    num_heads=24,
                    head_dim=128,
                    depth=12,
                    txt_in_features=2560,  # qwen hidden
                    txt_rope=False,
                )
        super().__init__(config, arch=arch)

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError(f"{self.NAME} is a flow-matching family")


class ZImage(MageFlow):
    NAME = "z_image"
    DEFAULT_FLAVOUR = "turbo"
    HUGGINGFACE_PATHS = {"turbo": "Tongyi-MAI/Z-Image-Turbo"}
    LATENT_CHANNEL_COUNT = 16

    def __init__(self, config: Any, arch: Optional[QwenImageConfig] = None):
        if arch is None and getattr(config, "model_arch_preset", None) != "tiny":
            arch = QwenImageConfig(
                in_channels=64,  # 16ch VAE latents 2x2-packed
                hidden_size=3072,
                num_heads=24,
                head_dim=128,
                depth=19,
                txt_in_features=2560,
                txt_rope=False,
            )
        super().__init__(config, arch=arch)
