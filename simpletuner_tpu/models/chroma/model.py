"""Chroma family (reference: helpers/models/chroma — an 8.9B Flux-architecture
flow model whose per-block modulation MLPs are pruned in favour of a single
"distilled guidance" approximator network, T5-only text conditioning;
SURVEY.md §2.3).  The checkpoint-faithful DiT body lives in ``transformer.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..common import TextEncoderSpec
from ..flux.model import Flux
from .transformer import ChromaConfig, ChromaTransformer


class Chroma(Flux):
    NAME = "chroma"
    DEFAULT_FLAVOUR = "base"
    HUGGINGFACE_PATHS = {"base": "lodestones/Chroma"}
    # T5-only: no CLIP pooled stream (chroma drops the vec conditioning input)
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder", max_length=512),
    )

    def __init__(self, config: Any, arch: Optional[ChromaConfig] = None):
        if arch is None:
            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = ChromaConfig.tiny()
            else:
                arch = ChromaConfig()
        super().__init__(config, arch=arch)

    def create_module(self):
        return ChromaTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, Any]:
        batch = super().example_batch(batch_size, resolution)
        # chroma has no CLIP: pooled vec is zeros of the configured width
        batch["pooled_embeds"] = jnp.zeros(
            (batch_size, self.arch.vec_in_features), jnp.float32
        )
        return batch

    def encode_text(self, prompts):
        import numpy as np

        (t5,) = self.text_encoders
        out = t5.encode(prompts)
        vec_width = self.arch.vec_in_features
        return [
            {
                "t5_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "pooled_embeds": np.zeros((vec_width,), np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def check_user_config(self) -> None:
        super().check_user_config()
