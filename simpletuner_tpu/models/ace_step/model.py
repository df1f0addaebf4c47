"""ACE-Step audio family (reference: helpers/models/ace_step — 3.5B
text-to-music flow DiT with DCAE audio VAE, umT5-style text conditioning and a
lyrics embedder sidecar; SURVEY.md §2.3).

The DiT body reuses the Wan block (self-attention + cross-attention + FFN with
AdaLN) over 1-D audio-latent tokens with 1-D RoPE — musically the same
transformer shape the reference vendored, minus CUDA-specific attention.
Lyrics conditioning concatenates a second text stream onto the context axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import axial_rope
from ..common import ModelFoundation, TextEncoderSpec
from ..audio_vae import AudioVAEConfig
from ..layers import AdaLayerNormZero, LayerNorm, LoRADense, MLPEmbedder, modulate, timestep_embedding
from ..wan.transformer import WanBlock, WanConfig

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ACEStepConfig:
    latent_channels: int = 8
    hidden_size: int = 2560
    depth: int = 24
    num_heads: int = 20
    head_dim: int = 128
    text_dim: int = 768
    ffn_ratio: float = 4.0

    @classmethod
    def tiny(cls) -> "ACEStepConfig":
        return cls(latent_channels=4, hidden_size=64, depth=2, num_heads=2, head_dim=32, text_dim=32)


class ACEStepTransformer(nn.Module):
    config: ACEStepConfig = ACEStepConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, S, C) audio latent tokens
        timesteps: jax.Array,
        context: jax.Array,  # (B, L, text_dim)
        lyrics_context: Optional[jax.Array] = None,  # (B, L2, text_dim)
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        x = LoRADense(dim, name="audio_in", **common, **lora)(latents)
        txt = context
        if lyrics_context is not None:
            txt = jnp.concatenate([context, lyrics_context], axis=1)
        txt = LoRADense(dim, name="text_in", **common, **lora)(txt)
        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )
        e6 = LoRADense(6 * dim, name="time_proj", **common)(nn.silu(vec)).reshape(-1, 6, dim)

        # 1-D rope over the token axis (WanBlock expects (cos, sin) for head_dim)
        batch, seq = x.shape[:2]
        ids = jnp.broadcast_to(jnp.arange(seq)[None, :, None], (batch, seq, 1))
        rope = axial_rope((cfg.head_dim,), ids)

        wan_cfg = WanConfig(
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            ffn_ratio=cfg.ffn_ratio,
            text_dim=cfg.text_dim,
        )
        block_cls = nn.remat(WanBlock) if self.remat else WanBlock
        for layer in range(cfg.depth):
            x = block_cls(wan_cfg, name=f"block_{layer}", **common, **lora)(x, txt, e6, rope)

        shift, scale = AdaLayerNormZero(2, name="final_mod", **common)(vec, dim)
        x = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)
        return LoRADense(cfg.latent_channels, name="final_proj", **common)(x).astype(jnp.float32)


class ACEStep(ModelFoundation):
    NAME = "ace_step"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "audio"
    LATENT_CHANNEL_COUNT = 8
    DEFAULT_FLAVOUR = "base"
    HUGGINGFACE_PATHS = {"base": "ACE-Step/ACE-Step-v1-3.5B"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="umt5", family="t5-xxl", subfolder="text_encoder", max_length=256),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj", "ffn_in", "ffn_out")

    def __init__(self, config: Any, arch: Optional[ACEStepConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = ACEStepConfig.tiny()
        else:
            self.arch = ACEStepConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.latent_channels

    def audio_vae_config(self) -> AudioVAEConfig:
        if getattr(self.config, "model_arch_preset", None) == "tiny":
            return AudioVAEConfig.tiny()
        return AudioVAEConfig.ace()

    def create_module(self):
        return ACEStepTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        del resolution
        return {
            "latents": jnp.zeros((batch_size, 64, self.arch.latent_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 32, self.arch.text_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        inputs = {
            "latents": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
        }
        if "lyrics_embeds" in prepared:
            inputs["lyrics_context"] = prepared["lyrics_embeds"]
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        if "lyrics_embeds" in batch:
            cond["lyrics_embeds"] = batch["lyrics_embeds"]
        return cond

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

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("ace_step is a flow-matching family")
