"""PixArt-Sigma family (reference: helpers/models/pixart — epsilon-prediction
DiT with T5-XXL cross-attention, 2x2 patchify, adaLN-single conditioning,
ControlNet and two-stage eDiff support; SURVEY.md §2.3).

The DiT body reuses the Wan block shape (self-attn + cross-attn + FFN with
AdaLN) over 2-D RoPE'd image tokens — PixArt's vendored torch block is the
same computation with learned pos embeds; RoPE is the TPU-friendlier choice
and keeps resolutions flexible without pos-embed interpolation state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import axial_rope
from ..common import ModelFoundation, TextEncoderSpec
from ..layers import AdaLayerNormZero, LayerNorm, LoRADense, MLPEmbedder, modulate, timestep_embedding
from ..wan.transformer import WanBlock, WanConfig

Dtype = Any


@dataclasses.dataclass(frozen=True)
class PixartConfig:
    in_channels: int = 4
    patch_size: int = 2
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    head_dim: int = 72
    text_dim: int = 4096
    ffn_ratio: float = 4.0

    @classmethod
    def tiny(cls) -> "PixartConfig":
        return cls(hidden_size=64, depth=2, num_heads=2, head_dim=32, text_dim=32)


class PixartTransformer(nn.Module):
    config: PixartConfig = PixartConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C)
        timesteps: jax.Array,  # (B,) integer DDPM timesteps
        context: jax.Array,  # (B, L, text_dim)
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        x = latents.reshape(batch, height // p, p, width // p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            batch, (height // p) * (width // p), p * p * channels
        )
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)
        txt = LoRADense(dim, name="text_in", **common, **lora)(context)
        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps.astype(jnp.float32), 256, time_factor=1.0).astype(self.dtype)
        )
        e6 = LoRADense(6 * dim, name="time_proj", **common)(nn.silu(vec)).reshape(-1, 6, dim)

        hh, ww = height // p, width // p
        ids = jnp.stack(
            jnp.meshgrid(jnp.arange(hh), jnp.arange(ww), indexing="ij"), axis=-1
        ).reshape(1, -1, 2)
        ids = jnp.broadcast_to(ids, (batch, ids.shape[1], 2))
        rope = axial_rope((cfg.head_dim // 2, cfg.head_dim - cfg.head_dim // 2), ids)

        wan_cfg = WanConfig(
            hidden_size=dim, num_heads=cfg.num_heads, head_dim=cfg.head_dim,
            ffn_ratio=cfg.ffn_ratio, text_dim=cfg.text_dim,
        )
        block_cls = nn.remat(WanBlock) if self.remat else WanBlock
        for layer in range(cfg.depth):
            x = block_cls(wan_cfg, name=f"block_{layer}", **common, **lora)(x, txt, e6, rope)

        shift, scale = AdaLayerNormZero(2, name="final_mod", **common)(vec, dim)
        x = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)
        x = LoRADense(p * p * channels, name="final_proj", **common)(x)
        x = x.reshape(batch, hh, ww, p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return x.astype(jnp.float32)


class PixartSigma(ModelFoundation):
    NAME = "pixart_sigma"
    PREDICTION_TYPE = "epsilon"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 4
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "1024-ms"
    HUGGINGFACE_PATHS = {
        "1024-ms": "PixArt-alpha/PixArt-Sigma-XL-2-1024-MS",
        "512-ms": "PixArt-alpha/PixArt-Sigma-XL-2-512-MS",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder", max_length=300),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 0.13025  # SDXL VAE

    def __init__(self, config: Any, arch: Optional[PixartConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = PixartConfig.tiny()
        else:
            self.arch = PixartConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return PixartTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = resolution // 8
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 32, self.arch.text_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "latents": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"]}

    def encode_text(self, prompts):
        (t5,) = self.text_encoders
        out = t5.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
