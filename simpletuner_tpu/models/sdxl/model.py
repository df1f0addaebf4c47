"""SDXL family (+ Kolors variant arch).

Reference: helpers/models/sdxl/model.py (SURVEY.md §2.3: epsilon UNet 3.5B,
dual CLIP text encoders — L sequence + G sequence/pooled concatenated to a
2048-dim context — and 6-float micro-conditioning time-ids; refiner support).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..common import ModelFoundation, TextEncoderSpec
from ..staged_validation import TwoStageValidationMixin
from ..unet import UNet2DCondition, UNetConfig, make_sdxl_added_cond


class SDXL(TwoStageValidationMixin, ModelFoundation):
    NAME = "sdxl"
    PREDICTION_TYPE = "epsilon"
    MODEL_TYPE = "unet"
    LATENT_CHANNEL_COUNT = 4
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "base-1.0"
    HUGGINGFACE_PATHS = {
        "base-1.0": "stabilityai/stable-diffusion-xl-base-1.0",
        "refiner-1.0": "stabilityai/stable-diffusion-xl-refiner-1.0",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="clip-l", family="clip-l", subfolder="text_encoder", max_length=77),
        TextEncoderSpec(name="clip-g", family="clip-g", subfolder="text_encoder_2", max_length=77, output="penultimate"),
    )
    DEFAULT_LORA_TARGET = ("to_q", "to_k", "to_v", "to_out")
    VAE_SCALING_FACTOR = 0.13025
    # base/refiner full-pipeline validation (reference sdxl/model.py:352-530)
    STAGED_VALIDATION_PREFIX = "sdxl"
    # reference trains both SDXL CLIPs, full or PEFT-LoRA (trainer.py:3394,4307)
    SUPPORTS_TEXT_ENCODER_TRAINING = True
    SUPPORTS_FULL_TEXT_ENCODER_TRAINING = True

    def __init__(self, config: Any, arch: Optional[UNetConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = UNetConfig.tiny_xl()
        else:
            self.arch = UNetConfig.sdxl()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    @property
    def _is_refiner(self) -> bool:
        # the refiner flavour conditions on 5 time-ids ending in an aesthetic
        # score instead of target size (reference collate.py:74-77
        # is_sdxl_refiner branch + --data_aesthetic_score)
        return bool(self.flavour and "refiner" in str(self.flavour))

    @property
    def _num_time_ids(self) -> int:
        return 5 if self._is_refiner else 6

    @property
    def _pooled_dim(self) -> int:
        # addition_embed_dim = n_ids*fourier + pooled
        return self.arch.addition_embed_dim - self._num_time_ids * self.arch.addition_time_embed_dim

    def _default_time_ids(self, size: float, batch_size: int) -> "jax.Array":
        if self._is_refiner:
            score = float(getattr(self.config, "data_aesthetic_score", 7.0) or 7.0)
            row = [size, size, 0.0, 0.0, score]
        else:
            row = [size, size, 0.0, 0.0, size, size]
        return jnp.tile(jnp.asarray([row], jnp.float32), (batch_size, 1))

    def create_module(self):
        return UNet2DCondition(
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
            "text_embeds": jnp.zeros((batch_size, 77, self.arch.cross_attention_dim), jnp.float32),
            "pooled_embeds": jnp.zeros((batch_size, self._pooled_dim), jnp.float32),
            "time_ids": self._default_time_ids(float(resolution), batch_size),
        }

    def _time_ids(self, prepared: Dict[str, jax.Array], batch_size: int) -> jax.Array:
        if "time_ids" in prepared:
            return prepared["time_ids"]
        # build from collate's size-conditioning metadata (reference collate.py
        # SDXL time-ids: original H W, crop top left, target H W)
        if all(k in prepared for k in ("original_sizes", "crop_coordinates", "target_sizes")):
            if self._is_refiner:
                # (orig H W, crop top left, aesthetic score) — reference
                # collate.py:75-76: the target size is replaced by the static
                # --data_aesthetic_score
                score = float(getattr(self.config, "data_aesthetic_score", 7.0) or 7.0)
                return jnp.concatenate(
                    [
                        prepared["original_sizes"].astype(jnp.float32),
                        prepared["crop_coordinates"].astype(jnp.float32),
                        jnp.full((batch_size, 1), score, jnp.float32),
                    ],
                    axis=-1,
                )
            return jnp.concatenate(
                [
                    prepared["original_sizes"].astype(jnp.float32),
                    prepared["crop_coordinates"].astype(jnp.float32),
                    prepared["target_sizes"].astype(jnp.float32),
                ],
                axis=-1,
            )
        res = float(getattr(self.config, "resolution", 1024) or 1024)
        return self._default_time_ids(res, batch_size)

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        batch_size = prepared["noisy_latents"].shape[0]
        time_ids = self._time_ids(prepared, batch_size)
        added = make_sdxl_added_cond(
            time_ids, prepared["pooled_embeds"], self.arch.addition_time_embed_dim
        )
        return {
            "sample": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "encoder_hidden_states": prepared["text_embeds"],
            "added_cond": added,
        }

    # controlnet support reuses the UNet control branch (same helpers as sd1x)
    from ..sd1x.model import SD1x as _SD1x

    controlnet_module = _SD1x.controlnet_module
    init_controlnet_params = _SD1x.init_controlnet_params
    model_predict = _SD1x.model_predict
    del _SD1x

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        batch_size = batch["latents"].shape[0]
        height = batch["latents"].shape[1] * 8
        return {
            "text_embeds": batch["text_embeds"],
            "pooled_embeds": batch["pooled_embeds"],
            "time_ids": self._default_time_ids(float(height), batch_size),
        }

    # ---- host-side text encoding -----------------------------------------------------------
    def encode_text(self, prompts):
        """CLIP-L seq ++ CLIP-G seq (concat on channels) + G pooled
        (reference sdxl dual-encoder prompt embedding)."""
        import numpy as np

        clip_l, clip_g = self.text_encoders
        out_l = clip_l.encode(prompts)
        out_g = clip_g.encode(prompts)
        results = []
        for i in range(len(prompts)):
            seq = np.concatenate(
                [
                    np.asarray(out_l["last_hidden_state"][i], np.float32),
                    np.asarray(out_g["last_hidden_state"][i], np.float32),
                ],
                axis=-1,
            )
            pooled = np.asarray(
                out_g.get("pooled", out_g["last_hidden_state"][:, 0])[i], np.float32
            )
            results.append(
                {
                    "text_embeds": seq,
                    "pooled_embeds": pooled,
                    "attention_mask": np.asarray(out_l["attention_mask"][i]),
                }
            )
        return results

    def collate_text_embeds(self, embeds):
        import numpy as np

        return {
            "text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds]),
            "pooled_embeds": np.stack([np.asarray(e["pooled_embeds"]) for e in embeds]),
        }

    # ---- in-step text-encoder training (reference trainer.py:3394 prepares
    # text_encoder_1 AND text_encoder_2) ----------------------------------------------------
    def tokenize_captions(self, captions):
        import numpy as np

        out = {}
        for index, suffix in ((0, ""), (1, "_1")):
            tokens = self.text_encoders[index].tokenize(list(captions))
            out[f"te_input_ids{suffix}"] = np.asarray(tokens["input_ids"], np.int32)
            out[f"te_attention_mask{suffix}"] = np.asarray(tokens["attention_mask"], np.int32)
        return out

    def apply_text_encoder(self, te_params, batch):
        """Dual-CLIP in-step encode with trainable params: L seq ++ G seq on
        channels + G pooled, matching the cached encode_text layout exactly."""
        clip_l, clip_g = self.text_encoders[:2]
        out_l = clip_l.model(
            input_ids=batch["te_input_ids"],
            attention_mask=batch["te_attention_mask"],
            params=te_params["te_0"],
        )
        out_g = clip_g.model(
            input_ids=batch["te_input_ids_1"],
            attention_mask=batch["te_attention_mask_1"],
            params=te_params["te_1"],
        )
        seq = jnp.concatenate(
            [out_l.last_hidden_state, out_g.last_hidden_state], axis=-1
        )
        pooled = getattr(out_g, "pooler_output", None)
        if pooled is None:
            pooled = out_g.last_hidden_state[:, 0]
        return {"text_embeds": seq, "pooled_embeds": pooled}

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) == "flow_matching":
            raise ValueError("sdxl is an epsilon/v-prediction family")
