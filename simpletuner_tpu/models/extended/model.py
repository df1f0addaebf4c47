"""Extended model families assembled from the shared TPU blocks.

Each class mirrors the corresponding reference family's architecture class
(dims read from the reference's vendored transformers; cited per class) and
rides an existing block implementation here — double/single-stream (Flux),
self+cross DiT (Wan), or linear-attention (Sana).  Checkpoint importers for
these families follow the same key-mapping pattern as flux/sd3/wan in
``models/weight_import.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import TextEncoderSpec
from ..flux.model import Flux
from ..flux.transformer import FluxConfig
from ..lumina2.model import Lumina2
from ..lumina2.transformer import Lumina2Config
from ..pixart.model import PixartConfig, PixartSigma
from ..wan.model import Wan
from ..wan.transformer import WanConfig


class BooguImage(Lumina2):
    """reference: helpers/models/boogu_image/transformer.py:684-697 — a
    Lumina2 (Next-DiT) body: hidden 2304 × 26 layers, 24q/8kv heads, the
    lumina RMSNorm-zero blocks/refiners, edit (reference-image) conditioning
    pipelines.  The reference's class defaults are internally inconsistent
    (its own :711 assert — head_dim 96 vs axes sum 120 — would raise), so the
    consistent Lumina2 axes ride here; the prompt-tuning /
    instruction-reasoner sidecars are not ported."""

    NAME = "boogu_image"
    DEFAULT_FLAVOUR = "v0.1"
    HUGGINGFACE_PATHS = {"v0.1": "boogu/boogu-image-v0.1"}


class WanS2V(Wan):
    """reference: helpers/models/wan_s2v — speech-to-video: Wan DiT whose
    cross-attention context is text ++ projected audio features (the data
    plane pairs same-stem .wav files and supplies ``audio_embeds``)."""

    NAME = "wan_s2v"
    DEFAULT_FLAVOUR = "s2v-14b"
    HUGGINGFACE_PATHS = {"s2v-14b": "Wan-AI/Wan2.2-S2V-14B"}

    def __init__(self, config: Any, arch=None):
        super().__init__(config, arch=arch)
        self.audio_feature_dim = int(getattr(config, "s2v_audio_feature_dim", 64) or 64)

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        batch = super().example_batch(batch_size, resolution)
        batch["audio_embeds"] = jnp.zeros((batch_size, 16, self.audio_feature_dim), jnp.float32)
        return batch

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        inputs = super().get_model_inputs(prepared)
        if "audio_embeds" in prepared:
            audio = prepared["audio_embeds"].astype(inputs["context"].dtype)
            text_dim = inputs["context"].shape[-1]
            if audio.shape[-1] < text_dim:  # zero-pad features to the text width
                audio = jnp.pad(audio, ((0, 0), (0, 0), (0, text_dim - audio.shape[-1])))
            elif audio.shape[-1] > text_dim:
                audio = audio[..., :text_dim]
            inputs["context"] = jnp.concatenate([inputs["context"], audio], axis=1)
        return inputs

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = super().inference_conditioning(batch)
        if "audio_embeds" in batch:
            cond["audio_embeds"] = batch["audio_embeds"]
        return cond
