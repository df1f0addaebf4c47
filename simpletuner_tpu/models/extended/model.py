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


class LongcatImage(Flux):
    """reference: helpers/models/longcat_image/transformer.py:295-302 — the
    Flux MMDiT topology verbatim (19 double + 38 single, 24 heads × 128,
    axes (16,56,56)) with a 3584-dim Qwen context/pooled width and no
    guidance embedding; flux diffusers-layout importer applies."""

    NAME = "longcat_image"
    PREDICTION_TYPE = "flow_matching"
    DEFAULT_FLAVOUR = "v1"
    HUGGINGFACE_PATHS = {"v1": "meituan-longcat/LongCat-Image"}
    LATENT_CHANNEL_COUNT = 16
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen", family="qwen2.5", subfolder="text_encoder", max_length=512),
    )

    def __init__(self, config: Any, arch: Optional[FluxConfig] = None):
        if arch is None and getattr(config, "model_arch_preset", None) != "tiny":
            arch = FluxConfig(
                in_channels=64, hidden_size=3072, num_heads=24, head_dim=128,
                depth_double=19, depth_single=38, txt_in_features=3584,
                vec_in_features=3584, guidance_embed=False,
            )
        super().__init__(config, arch=arch)

    def encode_text(self, prompts):
        """One Qwen encoder supplies both streams (reference longcat_image
        model.py: sequence features are the context; the pooled projection is
        the mean-pooled hidden state)."""
        (qwen,) = self.text_encoders
        out = qwen.encode(prompts)
        hidden = np.asarray(out["last_hidden_state"], np.float32)
        mask = np.asarray(out["attention_mask"], np.float32)[..., None]
        pooled = (hidden * mask).sum(1) / np.maximum(mask.sum(1), 1.0)
        return [
            {
                "t5_embeds": hidden[i],
                "pooled_embeds": pooled[i].astype(np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]


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
