"""LTX-2 family (reference: helpers/models/ltxvideo2 — 19B audiovisual
flow-matching DiT with joint video+audio denoising, Gemma-3 connector text
conditioning, 128-channel video latents and a mel audio latent stream;
SURVEY.md §2.3 "ltxvideo2").

Training conventions (reference model.py:1960-2250 ``model_predict``):
* video latents are packed to (B, F·H·W, 128) tokens (patch 1);
* BOTH modalities are noised with the same flow sigmas and denoised jointly —
  the loss is the mean of the video and audio flow-matching losses;
* timesteps may be tokenwise (intrinsic/i2v conditioning keeps conditioning
  tokens at σ=0) — the transformer takes (B,) or (B, S) σ values.
The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
vendored ``LTX2VideoTransformer3DModel``.  The Gemma text "connectors" run on
the encode side; cached ``text_embeds`` are their 3840-dim output features.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ...training.losses import flow_interpolate, flow_target
from .transformer import LTX2Config, LTX2Transformer

__all__ = ["LTX2Config", "LTX2Transformer", "LTXVideo2"]


class LTXVideo2(ModelFoundation):
    NAME = "ltxvideo2"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "video"
    LATENT_CHANNEL_COUNT = 128
    DEFAULT_RESOLUTION = 768
    DEFAULT_FLAVOUR = "ltx2"
    HUGGINGFACE_PATHS = {"ltx2": "Lightricks/LTX-2"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="gemma-3", family="gemma-2", subfolder="text_encoder", max_length=256),
    )
    DEFAULT_LORA_TARGET = ("to_q", "to_k", "to_v", "to_out")

    def __init__(self, config: Any, arch: Optional[LTX2Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = LTX2Config.tiny()
        else:
            self.arch = LTX2Config()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("ltxvideo2 is a flow-matching family")

    def video_vae_config(self):
        """Generic causal-VAE config for the latent cache (32x spatial /
        8x temporal / 128ch, matching AutoencoderKLLTX2Video compression).
        ``load_video_vae`` below imports the checkpoint-faithful VAE."""
        from ..video_vae import VideoVAEConfig

        if getattr(self.config, "model_arch_preset", None) == "tiny":
            import dataclasses as _dc

            return _dc.replace(VideoVAEConfig.tiny(), latent_channels=self.arch.in_channels)
        return VideoVAEConfig(
            latent_channels=128,
            base_channels=64,
            channel_multipliers=(1, 2, 4, 8, 8, 8),
            temporal_downsample=(False, True, True, True, False, False),
            num_res_blocks=2,
        )

    # ---- multistage (spatial-upscale) validation ------------------------------------
    # reference ltxvideo2/model.py:140 LTX2_STAGE2_SIGMAS + :1026-1089: stage 1
    # renders at half resolution, the latent upsampler doubles it, stage 2
    # re-noises at sigmas[0] and runs this short ladder
    LTX2_STAGE2_SIGMAS = (0.909375, 0.725, 0.421875)

    def supports_multistage_validation(self) -> bool:
        mode = str(getattr(self.config, "ltx2_validation_pipeline_mode", "trained-stage")
                   or "trained-stage").strip().lower()
        if mode not in ("trained-stage", "spatial-upscale"):
            raise ValueError(
                "ltx2_validation_pipeline_mode must be trained-stage or spatial-upscale"
            )
        return mode == "spatial-upscale"

    def latent_upsampler(self):
        """Cached (module, variables) for the stage-2 spatial upsampler.
        Requires a resolvable checkpoint except under the tiny test preset,
        where a fresh x2 upsampler stands in."""
        if getattr(self, "_latent_upsampler", None) is None:
            import os

            path = getattr(self.config, "ltx2_validation_spatial_upsampler_model", None)
            if path and os.path.isfile(str(path)):
                from .latent_upsampler import load_ltx2_latent_upsampler

                self._latent_upsampler = load_ltx2_latent_upsampler(str(path))
            elif getattr(self.config, "model_arch_preset", None) == "tiny":
                import dataclasses as _dc

                from .latent_upsampler import LTX2LatentUpsampler, LTX2UpsamplerConfig

                cfg = _dc.replace(LTX2UpsamplerConfig.tiny(), in_channels=self.arch.in_channels)
                module = LTX2LatentUpsampler(cfg)
                variables = module.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 1, 4, 4, cfg.in_channels))
                )
                self._latent_upsampler = (module, variables)
            else:
                raise ValueError(
                    "spatial-upscale validation requires "
                    "ltx2_validation_spatial_upsampler_model to point at a local "
                    "safetensors file (no silent random-weight fallback)"
                )
        return self._latent_upsampler

    def spatial_upscale_latents(self, latents: jax.Array) -> jax.Array:
        """2x spatial upscale of (B, T, H, W, C) diffusion latents.  Uses the
        faithful video-VAE per-channel statistics when a real VAE is attached
        (``self._video_vae_stats``); identity statistics otherwise."""
        from .latent_upsampler import upsample_ltx2_video_latents

        module, variables = self.latent_upsampler()
        stats = getattr(self, "_video_vae_stats", None)
        if stats is not None:
            mean, std = stats
        else:
            mean = jnp.zeros((latents.shape[-1],), jnp.float32)
            std = jnp.ones((latents.shape[-1],), jnp.float32)
        return upsample_ltx2_video_latents(latents, module, variables, mean, std)

    @staticmethod
    def load_video_vae(path: str, tiny: bool = False):
        """Checkpoint-faithful ``AutoencoderKLLTX2Video`` import → (module,
        variables); see ``video_vae.py`` for the architecture contract."""
        from .video_vae import LTX2VideoVAE, LTX2VideoVAEConfig, load_ltx2_video_vae

        cfg = LTX2VideoVAEConfig.tiny() if tiny else LTX2VideoVAEConfig()
        return LTX2VideoVAE(cfg), load_ltx2_video_vae(cfg, path)

    def create_module(self):
        return LTX2Transformer(
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
            "latents": jnp.zeros((batch_size, 2, 4, 4, self.arch.in_channels), jnp.float32),
            "audio_latents": jnp.zeros((batch_size, 6, self.arch.audio_in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 8, self.arch.caption_channels), jnp.float32),
        }

    # ---- joint AV noising (reference: both modalities share the flow sigmas) ----------
    def prepare_batch(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        prepared = super().prepare_batch(rng, batch)
        audio = prepared.get("audio_latents")
        if audio is not None:
            rng_a = jax.random.fold_in(rng, 0xA7D10)
            noise_a = prepared.pop("override_audio_noise", None)
            if noise_a is None:
                noise_a = jax.random.normal(rng_a, audio.shape, jnp.float32)
            sigmas = prepared["sigmas"]
            prepared["audio_noisy_latents"] = flow_interpolate(
                audio.astype(jnp.float32), noise_a, sigmas
            )
            prepared["audio_target"] = flow_target(audio.astype(jnp.float32), noise_a)
        return prepared

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]  # (B, F, H, W, C)
        batch, frames, height, width, channels = noisy.shape
        inputs = {
            "video_tokens": noisy.reshape(batch, frames * height * width, channels),
            "audio_tokens": prepared.get(
                "audio_noisy_latents",
                jnp.zeros((batch, 1, self.arch.audio_in_channels), jnp.float32),
            ),
            "text_embeds": prepared["text_embeds"],
            "timesteps": prepared["timesteps"],
            "num_frames": frames,
            "height": height,
            "width": width,
        }
        if "text_attention_mask" in prepared:
            inputs["text_mask"] = prepared["text_attention_mask"]
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        video_out, audio_out = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs
        )
        self._last_audio_pred = audio_out
        return video_out.reshape(prepared["noisy_latents"].shape)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        (video_out, audio_out), state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        self._last_audio_pred = audio_out
        return video_out.reshape(prepared["noisy_latents"].shape), state.get("intermediates", {})

    def loss_fn(self, variables, rng, batch):
        """Joint AV loss: mean of video and audio flow losses (reference
        ltxvideo2 model.py loss over both streams)."""
        prepared = self.prepare_batch(rng, batch)
        pred = self.model_predict(variables, prepared)
        loss = self.compute_loss(pred, prepared)
        aux: Dict[str, jax.Array] = {"timesteps": prepared["timesteps"]}
        if "audio_target" in prepared:
            audio_pred = self._last_audio_pred
            audio_loss = jnp.mean(
                jnp.square(audio_pred.astype(jnp.float32) - prepared["audio_target"])
            )
            loss = 0.5 * (loss + audio_loss)
            aux["audio_loss"] = audio_loss
        return loss, aux

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        if "audio_latents" in batch:
            cond["audio_latents"] = batch["audio_latents"]
        return cond

    def encode_text(self, prompts):
        (gemma,) = self.text_encoders
        out = gemma.encode(prompts)
        hidden = np.asarray(out["last_hidden_state"], np.float32)
        # connectors emit caption_channels-wide features; tile/truncate the
        # encoder width to the connector width (cache-compatible shim until the
        # gemma connector stack lands)
        width = self.arch.caption_channels
        if hidden.shape[-1] < width:
            reps = -(-width // hidden.shape[-1])
            hidden = np.tile(hidden, (1, 1, reps))[..., :width]
        elif hidden.shape[-1] > width:
            hidden = hidden[..., :width]
        return [
            {
                "text_embeds": hidden[i],
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
