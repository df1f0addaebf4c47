"""Sana family (reference: helpers/models/sana — efficient flow DiT with
ReLU **linear attention** (O(N) in sequence length), Gemma text encoder, and a
deep-compression autoencoder; SURVEY.md §2.3).

The linear-attention core is implemented natively here: with φ = ReLU feature
maps, out_i = φ(q_i)·(Σ_j φ(k_j) v_jᵀ) / (φ(q_i)·Σ_j φ(k_j)) — two einsums and
no S×S matrix, which XLA maps to plain MXU matmuls.
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
from ...ops import dot_product_attention

Dtype = Any


def relu_linear_attention(q: jax.Array, k: jax.Array, v: jax.Array, eps: float = 1e-6) -> jax.Array:
    """(B, S, H, D) linear attention with ReLU feature maps."""
    q = jax.nn.relu(q.astype(jnp.float32))
    k = jax.nn.relu(k.astype(jnp.float32))
    v = v.astype(jnp.float32)
    kv = jnp.einsum("bshd,bshe->bhde", k, v)  # (B, H, D, D_v)
    k_sum = k.sum(axis=1)  # (B, H, D)
    normalizer = jnp.einsum("bshd,bhd->bsh", q, k_sum) + eps
    out = jnp.einsum("bshd,bhde->bshe", q, kv) / normalizer[..., None]
    return out


@dataclasses.dataclass(frozen=True)
class SanaConfig:
    in_channels: int = 32  # DC-AE latents
    patch_size: int = 1
    hidden_size: int = 2240
    depth: int = 20
    num_heads: int = 20
    head_dim: int = 112
    text_dim: int = 2304  # gemma-2
    ffn_ratio: float = 2.5

    @classmethod
    def tiny(cls) -> "SanaConfig":
        return cls(in_channels=4, hidden_size=64, depth=2, num_heads=2, head_dim=32, text_dim=32)


class SanaBlock(nn.Module):
    config: SanaConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, vec):
        cfg = self.config
        dim = cfg.hidden_size
        inner = cfg.num_heads * cfg.head_dim
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, seq = x.shape[:2]
        heads = (batch, seq, cfg.num_heads, cfg.head_dim)

        mods = AdaLayerNormZero(6, name="modulation", **common)(vec, dim)

        # linear self-attention
        x_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), mods[0], mods[1])
        q = LoRADense(inner, name="attn_q", **common, **lora)(x_n).reshape(heads)
        k = LoRADense(inner, name="attn_k", **common, **lora)(x_n).reshape(heads)
        v = LoRADense(inner, name="attn_v", **common, **lora)(x_n).reshape(heads)
        attn = relu_linear_attention(q, k, v).reshape(batch, seq, inner).astype(self.dtype)
        x = x + mods[2][:, None, :] * LoRADense(dim, name="attn_proj", **common, **lora)(attn)

        # softmax cross-attention to text
        x_c = LayerNorm(name="cross_norm", **common)(x)
        ctx = (batch, context.shape[1], cfg.num_heads, cfg.head_dim)
        q = LoRADense(inner, name="cross_q", **common, **lora)(x_c).reshape(heads)
        k = LoRADense(inner, name="cross_k", **common, **lora)(context).reshape(ctx)
        v = LoRADense(inner, name="cross_v", **common, **lora)(context).reshape(ctx)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner)
        x = x + LoRADense(dim, name="cross_proj", **common, **lora)(attn)

        # GLU feed-forward
        x_f = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), mods[3], mods[4])
        h = LoRADense(int(dim * cfg.ffn_ratio) * 2, name="ffn_in", **common, **lora)(x_f)
        a, b = jnp.split(h, 2, axis=-1)
        x = x + mods[5][:, None, :] * LoRADense(dim, name="ffn_out", **common, **lora)(a * nn.silu(b))
        return x


class SanaTransformer(nn.Module):
    config: SanaConfig = SanaConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(self, latents, timesteps, context):
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        x = latents.reshape(batch, (height // p) * (width // p), p * p * channels)
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)
        txt = LoRADense(dim, name="text_in", **common, **lora)(context)
        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )
        block_cls = nn.remat(SanaBlock) if self.remat else SanaBlock
        for layer in range(cfg.depth):
            x = block_cls(cfg, name=f"block_{layer}", **common, **lora)(x, txt, vec)
            self.sow("intermediates", f"block_{layer}_hidden", x)
        shift, scale = AdaLayerNormZero(2, name="final_mod", **common)(vec, dim)
        x = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)
        x = LoRADense(p * p * channels, name="final_proj", **common)(x)
        return x.reshape(batch, height, width, channels).astype(jnp.float32)


class Sana(ModelFoundation):
    NAME = "sana"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 32
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "1600m-1024"
    HUGGINGFACE_PATHS = {
        "1600m-1024": "Efficient-Large-Model/Sana_1600M_1024px_diffusers",
        "600m-1024": "Efficient-Large-Model/Sana_600M_1024px_diffusers",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="gemma-2", family="t5-xxl", subfolder="text_encoder", max_length=300),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 0.41407

    def __init__(self, config: Any, arch: Optional[SanaConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = SanaConfig.tiny()
        else:
            self.arch = SanaConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return SanaTransformer(
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
        (gemma,) = self.text_encoders
        out = gemma.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("sana is a flow-matching family")
