"""LTX-Video family (reference: helpers/models/ltxvideo + ltxvideo2 —
flow-matching video DiT over heavily-compressed causal-VAE latents
(32x spatial, 8x temporal, 128 latent channels), T5-XXL text conditioning;
SURVEY.md §2.3).

The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
reference's vendored ``LTXVideoTransformer3DModel`` (full-inner-dim rotary,
affine across-heads qk RMSNorms, cross-attention on the raw stream, per-block
scale-shift tables) so real LTX weights import key-for-key.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..video_vae import VideoVAEConfig
from ..wan.model import Wan
from .transformer import LTXConfig, LTXTransformer


class LTXVideo(Wan):
    """Shares the video-family machinery with Wan; faithful LTX DiT body."""

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

    def __init__(self, config: Any, arch: Optional[LTXConfig] = None):
        if arch is None:
            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = LTXConfig.tiny()
            elif getattr(config, "model_flavour", None) == "13b-0.9.7":
                # reference helpers/models/ltxvideo: 13B = 48 layers x 32 heads x 128
                arch = LTXConfig(hidden_size=4096, depth=48, num_heads=32, head_dim=128,
                                 cross_dim=4096)
            else:
                arch = LTXConfig()
        super().__init__(config, arch=arch)

    @property
    def is_i2v(self) -> bool:
        return False  # LTX conditions via timestep-0 frames, not channel concat

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return LTXTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def prepare_batch(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Generic flow prep + LTX i2v first-frame protection (reference
        ltxvideo/model.py:194 apply_i2v_augmentation + ltxvideo/__init__.py:65
        apply_first_frame_protection):

        * ``ltx_protect_first_frame``: frame 0 always trains at sigma 0 — the
          model sees the clean conditioning frame.
        * ``ltx_i2v_prob`` (with ``ltx_partial_noise_fraction``): with
          probability p per sample, frame 0's sigma AND noise scale down by a
          random fraction in [0, partial_noise_fraction).

        Per-frame sigmas ride ``timesteps`` as (B, T) into the transformer's
        per-frame conditioning path.
        """
        prepared = super().prepare_batch(rng, batch)
        protect = bool(getattr(self.config, "ltx_protect_first_frame", False))
        prob = float(getattr(self.config, "ltx_i2v_prob", 0.0) or 0.0)
        latents = prepared["latents"]
        if not (protect or prob > 0) or latents.ndim != 5 or latents.shape[1] <= 1:
            return prepared
        frac = float(getattr(self.config, "ltx_partial_noise_fraction", 0.05) or 0.05)
        b, t = latents.shape[:2]
        frame_sig = jnp.broadcast_to(prepared["sigmas"][:, None], (b, t))
        mask0 = jnp.zeros((b, t), jnp.float32).at[:, 0].set(1.0)
        noise = prepared["noise"]
        if protect:
            alpha = 1.0 - mask0  # frame-0 sigma -> 0; noise untouched
        else:
            rng_gate, rng_frac = jax.random.split(jax.random.fold_in(rng, 0x17))
            gate = (jax.random.uniform(rng_gate, (b, 1)) < prob).astype(jnp.float32)
            rn = jax.random.uniform(rng_frac, (b, 1)) * frac
            alpha = 1.0 - mask0 * gate * rn
            noise = noise * alpha[:, :, None, None, None]
        frame_sig = frame_sig * alpha
        s5 = frame_sig[:, :, None, None, None]
        lat32 = latents.astype(jnp.float32)
        prepared["noise"] = noise
        prepared["noisy_latents"] = (1.0 - s5) * lat32 + s5 * noise
        prepared["target"] = noise - lat32
        prepared["timesteps"] = frame_sig
        return prepared

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
