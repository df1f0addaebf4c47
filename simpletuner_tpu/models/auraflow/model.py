"""AuraFlow family (reference: helpers/models/auraflow — 6B flow-matching DiT
with Pile-T5 text encoder, MMDiT double blocks followed by single DiT blocks;
SURVEY.md §2.3).

Body reuses the SD3 MMDiT block for the joint (double) layers and the Wan
block (self+cross) for the single layers — the same computation the reference
vendors, assembled from this framework's shared TPU blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common import ModelFoundation, TextEncoderSpec
from ..layers import AdaLayerNormZero, LayerNorm, LoRADense, MLPEmbedder, modulate, timestep_embedding
from ..sd3.transformer import MMDiTBlock, SD3Config, posemb_2d_sincos

Dtype = Any


@dataclasses.dataclass(frozen=True)
class AuraFlowConfig:
    in_channels: int = 4
    patch_size: int = 2
    hidden_size: int = 3072
    depth_double: int = 4
    depth_single: int = 32
    num_heads: int = 12
    text_dim: int = 2048
    mlp_ratio: float = 4.0

    @classmethod
    def tiny(cls) -> "AuraFlowConfig":
        return cls(hidden_size=64, depth_double=1, depth_single=2, num_heads=2, text_dim=32)


class AuraFlowTransformer(nn.Module):
    config: AuraFlowConfig = AuraFlowConfig()
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
        timesteps: jax.Array,  # (B,) sigma
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
        x = x + posemb_2d_sincos(height // p, width // p, dim)[None].astype(self.dtype)
        txt = LoRADense(dim, name="context_in", **common, **lora)(context)
        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )

        sd3_cfg = SD3Config(
            hidden_size=dim, depth=cfg.depth_double, num_heads=cfg.num_heads,
            context_dim=cfg.text_dim, mlp_ratio=cfg.mlp_ratio, qk_norm=True,
        )
        double_cls = nn.remat(MMDiTBlock) if self.remat else MMDiTBlock
        for layer in range(cfg.depth_double):
            x, txt = double_cls(sd3_cfg, name=f"double_{layer}", **common, **lora)(x, txt, vec)

        # single stream: fuse txt+img tokens, DiT self-attention blocks
        stream = jnp.concatenate([txt, x], axis=1)
        txt_len = txt.shape[1]
        mlp_dim = int(dim * cfg.mlp_ratio)
        head_dim = dim // cfg.num_heads
        from ...ops import dot_product_attention

        for layer in range(cfg.depth_single):
            mods = AdaLayerNormZero(6, name=f"single_{layer}_mod", **common)(vec, dim)
            s_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(stream), mods[0], mods[1])
            q = LoRADense(dim, name=f"single_{layer}_q", **common, **lora)(s_n)
            k = LoRADense(dim, name=f"single_{layer}_k", **common, **lora)(s_n)
            v = LoRADense(dim, name=f"single_{layer}_v", **common, **lora)(s_n)
            shape = (batch, stream.shape[1], cfg.num_heads, head_dim)
            attn = dot_product_attention(q.reshape(shape), k.reshape(shape), v.reshape(shape))
            attn = attn.reshape(batch, stream.shape[1], dim)
            stream = stream + mods[2][:, None, :] * LoRADense(dim, name=f"single_{layer}_proj", **common, **lora)(attn)
            s_m = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(stream), mods[3], mods[4])
            h = LoRADense(mlp_dim, name=f"single_{layer}_mlp_in", **common, **lora)(s_m)
            stream = stream + mods[5][:, None, :] * LoRADense(dim, name=f"single_{layer}_mlp_out", **common, **lora)(
                nn.gelu(h, approximate=True)
            )
        x = stream[:, txt_len:]

        shift, scale = AdaLayerNormZero(2, name="final_mod", **common)(vec, dim)
        x = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)
        x = LoRADense(p * p * channels, name="final_proj", **common)(x)
        x = x.reshape(batch, height // p, width // p, p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return x.astype(jnp.float32)


class AuraFlow(ModelFoundation):
    NAME = "auraflow"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 4
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "v0.3"
    HUGGINGFACE_PATHS = {"v0.3": "fal/AuraFlow-v0.3", "v0.2": "fal/AuraFlow-v0.2"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="pile-t5", family="t5-xxl", subfolder="text_encoder", max_length=256),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 0.13025

    def __init__(self, config: Any, arch: Optional[AuraFlowConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = AuraFlowConfig.tiny()
        else:
            self.arch = AuraFlowConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return AuraFlowTransformer(
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
