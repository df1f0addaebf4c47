"""Cosmos-Predict2 T2I family (reference: helpers/models/cosmos/model.py
``Cosmos2Image`` — NVIDIA's EDM x0-prediction transformer over single-frame
Wan latents; SURVEY.md §2.3).

The DiT body is the shared Cosmos 1/2 core (``models/cosmos1/transformer.py``,
checkpoint-faithful to the vendored CosmosTransformer3DModel).  Family math,
all from the reference:

* σ is drawn **log-normal** — u~U(0,1) → σ = exp(√2·erfinv(2u−1)) — clamped to
  [σ_min, σ_max] = [0.002, 80] (model.py:527-534 ``prepare_edm_sigmas``).
* additive noise x_t = x0 + σ·ε (model.py:433-441), NOT an interpolation.
* EDM preconditioning in ``model_predict`` (model.py:460-495):
  c_in = c_skip = 1/(σ+1), c_out = −σ/(σ+1); the network consumes x_t·c_in at
  timestep σ/(σ+1) (model.py:158-199) and x0_pred = c_skip·x_t + c_out·r.
* loss = MSE(x0_pred, x0) weighted by (σ²+σ_d²)/(σ·σ_d)², σ_data = 1
  (model.py:497-525).
* T5 embeds are zeroed past the attention mask (model.py:373-393); images are
  boosted to single-frame videos before the (Wan) VAE (model.py:394-404).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..cosmos1.transformer import Cosmos1Config, Cosmos1Transformer

__all__ = ["Cosmos2Image"]


class Cosmos2Image(ModelFoundation):
    NAME = "cosmos"
    PREDICTION_TYPE = "sample"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "2b"
    HUGGINGFACE_PATHS = {
        "2b": "nvidia/Cosmos-Predict2-2B-Text2Image",
        "14b": "nvidia/Cosmos-Predict2-14B-Text2Image",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5-11b", family="t5-xxl", subfolder="text_encoder", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("to_q", "to_k", "to_v", "to_out")

    # EDM constants (reference cosmos/model.py:80-84)
    sigma_min = 0.002
    sigma_max = 80.0
    sigma_data = 1.0
    sigma_schedule_order = 7.0

    def __init__(self, config: Any, arch: Optional[Cosmos1Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = Cosmos1Config.tiny()
        elif getattr(config, "model_flavour", None) == "14b":
            self.arch = Cosmos1Config.predict2_14b()
        else:
            self.arch = Cosmos1Config.predict2_2b()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def check_user_config(self) -> None:
        # reference model.py:536-569
        if getattr(self.config, "prediction_type", None) not in (None, "sample"):
            raise ValueError("cosmos is an EDM sample-prediction family")
        if getattr(self.config, "aspect_bucket_alignment", 16) != 16:
            self.config.aspect_bucket_alignment = 16

    def create_module(self):
        return Cosmos1Transformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = max(resolution // 8, 8)
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 12, self.arch.text_embed_dim), jnp.float32),
        }

    # ---- EDM training math ------------------------------------------------------------------

    def prepare_batch(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Log-normal σ + additive noise (reference model.py:407-455, :527-534)."""
        prepared = dict(batch)
        latents = prepared["latents"].astype(jnp.float32)
        rng_noise, rng_t = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        override_noise = prepared.pop("override_noise", None)
        override_sigmas = prepared.pop("override_sigmas", None)
        prepared.pop("override_timesteps", None)
        if override_noise is not None:
            noise = override_noise.astype(jnp.float32)
        batch_size = latents.shape[0]
        if override_sigmas is not None:
            sigmas = override_sigmas.astype(jnp.float32)
        else:
            eps = float(np.finfo(np.float32).eps)
            u = jax.random.uniform(rng_t, (batch_size,), jnp.float32, eps, 1.0 - eps)
            log_sigma = jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * u - 1.0)
            sigmas = jnp.clip(jnp.exp(log_sigma), self.sigma_min, self.sigma_max)
        prepared["sigmas"] = sigmas
        prepared["timesteps"] = sigmas
        expand = sigmas.reshape((batch_size,) + (1,) * (latents.ndim - 1))
        prepared["noisy_latents"] = latents + expand * noise  # x_t = x0 + σ·ε
        prepared["noise"] = noise
        prepared["target"] = latents  # the model predicts x0
        return prepared

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        xt = prepared["noisy_latents"]
        sigmas = prepared.get("sigmas", prepared["timesteps"]).astype(jnp.float32)
        expand = sigmas.reshape((xt.shape[0],) + (1,) * (xt.ndim - 1))
        latent_in = xt.astype(jnp.float32) / (expand + 1.0)  # c_in = 1/(σ+1)
        if latent_in.ndim == 4:  # single-frame video (reference model.py:394-404)
            latent_in = latent_in[:, None]
        return {
            "latents": latent_in,
            # timestep σ/(σ+1) (reference model.py:158-199)
            "timesteps": sigmas / (sigmas + 1.0),
            "context": prepared["text_embeds"],
            "padding_mask_value": 0.0,  # zeros plane (reference model.py:466-478)
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        xt = prepared["noisy_latents"].astype(jnp.float32)
        sigmas = prepared.get("sigmas", prepared["timesteps"]).astype(jnp.float32)
        expand = sigmas.reshape((xt.shape[0],) + (1,) * (xt.ndim - 1))
        r_pred = self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)
        if xt.ndim == 4:
            r_pred = r_pred[:, 0]
        inv = 1.0 / (expand + 1.0)
        # x0_pred = c_skip·x_t + c_out·r (reference model.py:483-495)
        return inv * xt - expand * inv * r_pred.astype(jnp.float32)

    def compute_loss(self, model_pred: jax.Array, prepared: Dict[str, jax.Array]) -> jax.Array:
        """EDM-weighted x0 MSE (reference model.py:497-525)."""
        x0 = prepared["target"].astype(jnp.float32)
        sigmas = prepared["sigmas"].astype(jnp.float32)
        w = (sigmas**2 + self.sigma_data**2) / (sigmas * self.sigma_data) ** 2
        loss = jnp.square(model_pred.astype(jnp.float32) - x0)
        loss = loss * w.reshape((x0.shape[0],) + (1,) * (x0.ndim - 1))
        mask = prepared.get("loss_mask")
        if mask is not None:
            loss = loss * mask.astype(jnp.float32)
        weight = prepared.get("loss_weight")
        if weight is not None:
            loss = loss * weight.reshape((x0.shape[0],) + (1,) * (x0.ndim - 1))
        return loss.mean()

    # ---- inference --------------------------------------------------------------------------

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"]}

    # ---- text -------------------------------------------------------------------------------

    def encode_text(self, prompts):
        (t5,) = self.text_encoders
        out = t5.encode(prompts)
        results = []
        for i in range(len(prompts)):
            embeds = np.asarray(out["last_hidden_state"][i], np.float32)
            mask = np.asarray(out["attention_mask"][i])
            # zero padded positions (reference model.py:388-392)
            embeds = embeds * mask[:, None].astype(np.float32)
            results.append({"text_embeds": embeds, "attention_mask": mask})
        return results

    def collate_text_embeds(self, embeds):
        return {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
