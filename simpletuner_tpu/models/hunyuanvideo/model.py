"""HunyuanVideo family (reference: helpers/models/hunyuanvideo — 8.3B T2V/I2V
flow-matching video MMDiT: double-stream (video+text) blocks followed by
single-stream blocks, 3-D RoPE, Llama text encoder + CLIP pooled, guidance
embed, causal video VAE; SURVEY.md §2.3).

The architecture is the Flux double/single-stream transformer over
(1,2,2)-packed video tokens with (t,h,w) RoPE ids — so this family reuses
``FluxTransformer`` directly with video-token packing around it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..flux.transformer import FluxConfig, FluxTransformer, make_txt_ids
from ..video_vae import VideoVAEConfig


def pack_video_latents(latents: jax.Array, pt: int = 1, ph: int = 2, pw: int = 2) -> jax.Array:
    """(B, T, H, W, C) -> (B, T/pt · H/ph · W/pw, pt·ph·pw·C) tokens."""
    b, t, h, w, c = latents.shape
    x = latents.reshape(b, t // pt, pt, h // ph, ph, w // pw, pw, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(b, (t // pt) * (h // ph) * (w // pw), pt * ph * pw * c)


def unpack_video_latents(tokens: jax.Array, t: int, h: int, w: int, pt: int = 1, ph: int = 2, pw: int = 2) -> jax.Array:
    b = tokens.shape[0]
    c = tokens.shape[-1] // (pt * ph * pw)
    x = tokens.reshape(b, t // pt, h // ph, w // pw, pt, ph, pw, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(b, t, h, w, c)


def make_video_ids(batch: int, t: int, h: int, w: int, pt: int = 1, ph: int = 2, pw: int = 2) -> jax.Array:
    ids = jnp.stack(
        jnp.meshgrid(
            jnp.arange(t // pt), jnp.arange(h // ph), jnp.arange(w // pw), indexing="ij"
        ),
        axis=-1,
    ).reshape(1, -1, 3)
    return jnp.broadcast_to(ids, (batch, ids.shape[1], 3))


class HunyuanVideo(ModelFoundation):
    NAME = "hunyuanvideo"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "video"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 480
    DEFAULT_FLAVOUR = "t2v-720p"
    HUGGINGFACE_PATHS = {
        "t2v-720p": "hunyuanvideo-community/HunyuanVideo",
        "i2v-720p": "hunyuanvideo-community/HunyuanVideo-I2V",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="llama", family="llama-3", subfolder="text_encoder", max_length=256),
        TextEncoderSpec(name="clip-l", family="clip-l", subfolder="text_encoder_2", max_length=77, output="pooled"),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj", "linear1", "linear2")
    VAE_SCALING_FACTOR = 0.476986

    def __init__(self, config: Any, arch: Optional[FluxConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = FluxConfig.tiny()
        else:
            self.arch = FluxConfig(
                in_channels=64,  # 1x2x2 packed 16-channel latents
                hidden_size=3072,
                num_heads=24,
                head_dim=128,
                depth_double=20,
                depth_single=40,
                axes_dim=(16, 56, 56),
                txt_in_features=4096,
                vec_in_features=768,
                guidance_embed=True,
            )

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels // 4  # (1,2,2) packing

    def video_vae_config(self) -> VideoVAEConfig:
        if getattr(self.config, "model_arch_preset", None) == "tiny":
            return VideoVAEConfig.tiny()
        return VideoVAEConfig.wan()  # 4x temporal / 8x spatial / 16ch, hunyuan-compatible shape

    def create_module(self):
        return FluxTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        vae_cfg = self.video_vae_config()
        latent = resolution // vae_cfg.spatial_factor
        txt_len = 16 if self.arch.txt_in_features < 512 else 256
        return {
            "latents": jnp.zeros((batch_size, 3, latent, latent, self.latent_channels), jnp.float32),
            "t5_embeds": jnp.zeros((batch_size, txt_len, self.arch.txt_in_features), jnp.float32),
            "pooled_embeds": jnp.zeros((batch_size, self.arch.vec_in_features), jnp.float32),
        }

    def prepare_batch(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        prepared = super().prepare_batch(rng, batch)
        b, t, h, w = batch["latents"].shape[:4]
        prepared["img_ids"] = make_video_ids(b, t, h, w)
        prepared["txt_ids"] = make_txt_ids(b, batch["t5_embeds"].shape[1])
        value = getattr(self.config, "flux_guidance_value", 1.0)
        prepared["guidance"] = jnp.full((b,), 1.0 if value is None else value, jnp.float32)
        return prepared

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "img": pack_video_latents(prepared["noisy_latents"]),
            "img_ids": prepared["img_ids"],
            "txt": prepared["t5_embeds"],
            "txt_ids": prepared["txt_ids"],
            "timesteps": prepared["timesteps"],
            "vec": prepared["pooled_embeds"],
            "guidance": prepared.get("guidance"),
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        tokens = self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)
        _, t, h, w = prepared["noisy_latents"].shape[:4]
        return unpack_video_latents(tokens, t, h, w)

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        b, t, h, w = batch["latents"].shape[:4]
        value = getattr(self.config, "flux_guidance_value", 1.0)
        return {
            "t5_embeds": batch["t5_embeds"],
            "pooled_embeds": batch["pooled_embeds"],
            "img_ids": make_video_ids(b, t, h, w),
            "txt_ids": make_txt_ids(b, batch["t5_embeds"].shape[1]),
            "guidance": jnp.full((b,), 1.0 if value is None else value, jnp.float32),
        }

    def encode_text(self, prompts):
        llama, clip = self.text_encoders
        out_l = llama.encode(prompts)
        out_c = clip.encode(prompts)
        return [
            {
                "t5_embeds": np.asarray(out_l["last_hidden_state"][i], np.float32),
                "pooled_embeds": np.asarray(
                    out_c.get("pooled", out_c["last_hidden_state"][:, 0])[i], np.float32
                ),
                "attention_mask": np.asarray(out_l["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {
            "t5_embeds": np.stack([np.asarray(e["t5_embeds"]) for e in embeds]),
            "pooled_embeds": np.stack([np.asarray(e["pooled_embeds"]) for e in embeds]),
        }

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("hunyuanvideo is a flow-matching family")
