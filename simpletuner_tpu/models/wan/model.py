"""Wan video family (reference: helpers/models/wan/model.py — 1.3B/14B
flow-matching video DiT, umT5 text encoder, causal 3D VAE, T2V/I2V flavours,
TREAD; SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..video_vae import VideoVAEConfig
from .transformer import WanConfig, WanTransformer


class Wan(ModelFoundation):
    NAME = "wan"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "video"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 480
    DEFAULT_FLAVOUR = "t2v-1.3b"
    HUGGINGFACE_PATHS = {
        "t2v-1.3b": "Wan-AI/Wan2.1-T2V-1.3B-Diffusers",
        "t2v-14b": "Wan-AI/Wan2.1-T2V-14B-Diffusers",
        "i2v-14b-480p": "Wan-AI/Wan2.1-I2V-14B-480P-Diffusers",
        # Wan 2.2 MoE expert pairs: each flavour trains ONE denoising expert
        # (reference wan/model.py:311-318; the -high/-low suffix picks the
        # transformer/transformer_2 subfolder via WAN_STAGE_OVERRIDES)
        "i2v-14b-2.2-high": "Wan-AI/Wan2.2-I2V-A14B-Diffusers",
        "i2v-14b-2.2-low": "Wan-AI/Wan2.2-I2V-A14B-Diffusers",
        "flf2v-14b-2.2-high": "Wan-AI/Wan2.2-FLF2V-A14B-Diffusers",
        "flf2v-14b-2.2-low": "Wan-AI/Wan2.2-FLF2V-A14B-Diffusers",
        "ti2v-5b-2.2": "Wan-AI/Wan2.2-TI2V-5B-Diffusers",
        "animegen-t2v-high": "Wan-AI/Wan2.2-T2V-A14B-Diffusers",
        "animegen-t2v-low": "Wan-AI/Wan2.2-T2V-A14B-Diffusers",
    }

    # boundary-split expert training (reference wan/model.py:324-420
    # WAN_STAGE_OVERRIDES): the HIGH-noise expert denoises sigma in
    # [boundary_ratio, 1], the LOW-noise expert finishes [0, boundary_ratio)
    WAN_STAGE_OVERRIDES = {
        "i2v-14b-2.2-high": {
            "trained_stage": "high", "stage_subfolder": "transformer_2",
            "other_stage_subfolder": "transformer", "flow_shift": 5.0,
            "sample_steps": 40, "boundary_ratio": 0.90,
            "guidance": {"high": 3.5, "low": 3.5},
        },
        "i2v-14b-2.2-low": {
            "trained_stage": "low", "stage_subfolder": "transformer",
            "other_stage_subfolder": "transformer_2", "flow_shift": 5.0,
            "sample_steps": 40, "boundary_ratio": 0.90,
            "guidance": {"high": 3.5, "low": 3.5},
        },
        "flf2v-14b-2.2-high": {
            "trained_stage": "high", "stage_subfolder": "transformer_2",
            "other_stage_subfolder": "transformer", "flow_shift": 5.0,
            "sample_steps": 40, "boundary_ratio": 0.90,
            "guidance": {"high": 3.5, "low": 3.5},
        },
        "flf2v-14b-2.2-low": {
            "trained_stage": "low", "stage_subfolder": "transformer",
            "other_stage_subfolder": "transformer_2", "flow_shift": 5.0,
            "sample_steps": 40, "boundary_ratio": 0.90,
            "guidance": {"high": 3.5, "low": 3.5},
        },
        "animegen-t2v-high": {
            "trained_stage": "high", "stage_subfolder": "transformer_2",
            "other_stage_subfolder": "transformer", "flow_shift": 5.0,
            "sample_steps": 40, "boundary_ratio": 0.875,
            "guidance": {"high": 1.0, "low": 1.0},
        },
        "animegen-t2v-low": {
            "trained_stage": "low", "stage_subfolder": "transformer",
            "other_stage_subfolder": "transformer_2", "flow_shift": 5.0,
            "sample_steps": 40, "boundary_ratio": 0.875,
            "guidance": {"high": 1.0, "low": 1.0},
        },
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="umt5-xxl", family="t5-xxl", subfolder="text_encoder", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj", "ffn_in", "ffn_out")
    VAE_SCALING_FACTOR = 1.0

    def __init__(self, config: Any, arch: Optional[WanConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = WanConfig.tiny()
        elif self.flavour and "14b" in self.flavour:
            self.arch = WanConfig.b14()
        else:
            self.arch = WanConfig.b1_3()
        if self.is_i2v and arch is None:
            # I2V input: noisy latents ++ first-frame condition ++ 4-ch mask;
            # the prediction head stays at the base latent width (diffusers
            # Wan I2V: in 36, out 16)
            import dataclasses as _dc

            self.arch = _dc.replace(
                self.arch,
                in_channels=self.arch.in_channels * 2 + 4,
                out_channels=self.arch.out_channels or self.arch.in_channels,
            )

    @property
    def is_i2v(self) -> bool:
        return bool(self.flavour and "i2v" in self.flavour)

    @property
    def latent_channels(self) -> int:
        if self.is_i2v:
            return (self.arch.in_channels - 4) // 2
        return self.arch.in_channels

    def video_vae_config(self) -> VideoVAEConfig:
        if getattr(self.config, "model_arch_preset", None) == "tiny":
            return VideoVAEConfig.tiny()
        return VideoVAEConfig.wan()

    def create_module(self):
        return WanTransformer(
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
        frames = 3  # latent frames (≈ 1 + 4k decoded)
        return {
            "latents": jnp.zeros(
                (batch_size, frames, latent, latent, self.latent_channels), jnp.float32
            ),
            "text_embeds": jnp.zeros((batch_size, 64, self.arch.text_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]
        if self.is_i2v:
            # first-frame conditioning: clean frame 0 broadcast over time + a
            # frame-0-indicator mask (reference wan I2V flavours)
            clean = prepared.get("latents", jnp.zeros_like(noisy))
            first = jnp.broadcast_to(clean[:, :1], clean.shape)
            mask = jnp.zeros(noisy.shape[:-1] + (4,), noisy.dtype).at[:, 0].set(1.0)
            noisy = jnp.concatenate([noisy, first.astype(noisy.dtype), mask], axis=-1)
        return {
            "latents": noisy,
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"]}

    # ---- host-side text encoding -----------------------------------------------------------
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
            raise ValueError("wan is a flow-matching family")
        stage = self._wan_stage_info()
        if stage is not None:
            # stage defaults (reference wan/model.py:920-929): the expert
            # flavours pin the 2.2 flow shift / sampling defaults unless the
            # user set their own
            was = getattr(self.config, "was_provided", lambda _k: False)
            if not was("flow_schedule_shift"):
                self.config.flow_schedule_shift = stage["flow_shift"]
            if not was("validation_num_inference_steps"):
                self.config.validation_num_inference_steps = stage["sample_steps"]
            if not was("validation_guidance"):
                self.config.validation_guidance = stage["guidance"][stage["trained_stage"]]

    # ---- Wan 2.2 two-expert validation (reference wan/model.py:928-1020:
    # --wan_validation_load_other_stage loads the OTHER expert so renders run
    # the full boundary-split ladder) -----------------------------------------------------
    def _wan_stage_info(self):
        return self.WAN_STAGE_OVERRIDES.get(str(getattr(self.config, "model_flavour", "") or ""))

    def supports_multistage_validation(self) -> bool:
        return self._wan_stage_info() is not None and bool(
            getattr(self.config, "wan_validation_load_other_stage", False)
        )

    def _load_other_stage(self):
        cache = getattr(self, "_wan_other_stage", None)
        if cache is not None:
            return cache
        import os

        stage = self._wan_stage_info()
        base = getattr(self.config, "pretrained_model_name_or_path", None)
        if not base:
            raise ValueError(
                "wan_validation_load_other_stage needs pretrained_model_name_or_path "
                "pointing at the LOCAL Wan 2.2 diffusers dir (both expert subfolders)"
            )
        subfolder = stage["other_stage_subfolder"]
        path = os.path.join(str(base), subfolder)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"other-stage subfolder {path!r} not found; the Wan 2.2 "
                "checkpoint dir must hold transformer/ and transformer_2/"
            )
        from ..weight_import import load_transformer_params

        other = type(self)(self.config, arch=self.arch)
        variables = load_transformer_params(other, path)
        self.apply_trace_globals()
        self._wan_other_stage = (other, variables)
        return self._wan_other_stage

    def validation_stage_plan(self, variables):
        """Split-ladder plan for training/validation.py _render_staged: the
        high-noise expert denoises steps whose sigma >= boundary_ratio, the
        low expert finishes — exactly the diffusers Wan 2.2 pipeline's
        boundary switch (t < boundary*1000 -> transformer_2)."""
        if not self.supports_multistage_validation():
            return None
        stage = self._wan_stage_info()
        import numpy as np

        from ...schedulers.flow_euler import FlowMatchEulerScheduler

        steps = int(getattr(self.config, "validation_num_inference_steps", None)
                    or stage["sample_steps"])
        shift = float(getattr(self.config, "flow_schedule_shift", None)
                      or stage["flow_shift"])
        ladder = FlowMatchEulerScheduler.create(steps, shift=shift)
        sigmas = np.asarray(ladder.sigmas)[:steps]
        boundary = float(stage["boundary_ratio"])
        n_high = int(np.sum(sigmas >= boundary))
        until_high = max(1, n_high) / steps

        other_model, other_vars = self._load_other_stage()
        trained_high = stage["trained_stage"] == "high"
        high = (self, variables) if trained_high else (other_model, other_vars)
        low = (other_model, other_vars) if trained_high else (self, variables)
        return [
            {"model": high[0], "variables": high[1], "until": until_high},
            {"model": low[0], "variables": low[1], "until": 1.0},
        ]
