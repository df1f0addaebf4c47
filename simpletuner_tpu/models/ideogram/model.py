"""Ideogram family (reference: helpers/models/ideogram — Ideogram v3/4
FP8-first packed-sequence flow DiT over DC-AE latents with concatenated
Qwen3-VL layer-tap conditioning; SURVEY.md §2.3 "ideogram").

The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
vendored ``Ideogram4Transformer``.  Conventions (reference model.py):
- latents are 32-channel DC-AE features 2x2-packed to 128 (:532-557; our
  ``pack_latents`` order is (ph, pw, c) — the importer permutes
  input_proj/final_linear accordingly);
- the model consumes INVERTED flow time t = 1 − σ and its raw output is
  negated back to the velocity convention (:575, :67-68);
- image mRoPE positions are offset by 65536 (constants.py:8);
- text conditioning is the feature-axis CONCAT of 13 tapped Qwen3-VL layers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..flux.transformer import pack_latents, unpack_latents
from .transformer import (
    IMAGE_POSITION_OFFSET,
    LLM_TOKEN_INDICATOR,
    OUTPUT_IMAGE_INDICATOR,
    QWEN3_VL_ACTIVATION_LAYERS,
    IdeogramConfig,
    IdeogramTransformer,
)

__all__ = ["IdeogramConfig", "IdeogramTransformer", "Ideogram"]


class Ideogram(ModelFoundation):
    NAME = "ideogram"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 32
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "fp8"
    HUGGINGFACE_PATHS = {"fp8": "ideogram-ai/ideogram-v3-fp8"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen3-vl", family="qwen2.5-vl", subfolder="text_encoder", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("qkv", "o", "w1", "w2", "w3")

    def __init__(self, config: Any, arch: Optional[IdeogramConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = IdeogramConfig.tiny()
        else:
            self.arch = IdeogramConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels // 4  # 2x2 packing of DC-AE features

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("ideogram is a flow-matching family")

    def create_module(self):
        return IdeogramTransformer(
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
            "latents": jnp.zeros((batch_size, latent, latent, self.latent_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 6, self.arch.llm_features_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]  # (B, H, W, C)
        batch, height, width, _ = noisy.shape
        grid_h, grid_w = height // 2, width // 2
        packed = pack_latents(noisy)  # (B, S_img, 4C)
        img_len = packed.shape[1]
        text = prepared["text_embeds"]
        txt_len = text.shape[1]

        text_pos = np.arange(txt_len)
        text_ids = np.stack([text_pos] * 3, axis=1)  # (S_txt, 3)
        h_idx = np.repeat(np.arange(grid_h), grid_w)
        w_idx = np.tile(np.arange(grid_w), grid_h)
        img_ids = np.stack([np.zeros_like(h_idx), h_idx, w_idx], axis=1) + IMAGE_POSITION_OFFSET
        position_ids = jnp.asarray(
            np.broadcast_to(np.concatenate([text_ids, img_ids], 0)[None], (batch, txt_len + img_len, 3))
        )

        mask = prepared.get("text_attention_mask")
        if mask is None:
            mask = jnp.ones((batch, txt_len), jnp.int32)
        segment_ids = jnp.concatenate(
            [mask.astype(jnp.int32), jnp.ones((batch, img_len), jnp.int32)], axis=1
        )
        indicator = jnp.concatenate(
            [
                jnp.full((batch, txt_len), LLM_TOKEN_INDICATOR, jnp.int32),
                jnp.full((batch, img_len), OUTPUT_IMAGE_INDICATOR, jnp.int32),
            ],
            axis=1,
        )
        llm_features = jnp.concatenate(
            [text, jnp.zeros((batch, img_len, text.shape[-1]), text.dtype)], axis=1
        )
        x = jnp.concatenate(
            [jnp.zeros((batch, txt_len, packed.shape[-1]), packed.dtype), packed], axis=1
        )
        return {
            "llm_features": llm_features,
            "x": x,
            # the reference consumes inverted flow time (model.py:575)
            "t": 1.0 - prepared["timesteps"].astype(jnp.float32),
            "position_ids": position_ids,
            "segment_ids": segment_ids,
            "indicator": indicator,
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        out = self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)
        txt_len = prepared["text_embeds"].shape[1]
        _, height, width, _ = prepared["noisy_latents"].shape
        # raw output is negated back to velocity (reference model.py:67-68)
        return -unpack_latents(out[:, txt_len:], height, width)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        out, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        txt_len = prepared["text_embeds"].shape[1]
        _, height, width, _ = prepared["noisy_latents"].shape
        return -unpack_latents(out[:, txt_len:], height, width), state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        if "text_attention_mask" in batch:
            cond["text_attention_mask"] = batch["text_attention_mask"]
        return cond

    def _select_taps(self, available: int):
        if available > max(QWEN3_VL_ACTIVATION_LAYERS):
            return QWEN3_VL_ACTIVATION_LAYERS
        n = self.arch.llm_taps
        return tuple(int(round(i * (available - 1) / max(n - 1, 1))) for i in range(n))

    DEFAULT_PROMPT_ENHANCER_HEAD = "diffusers/qwen3-vl-8b-instruct-lm-head"

    def _preprocess_prompts(self, prompts):
        """Prompt upsampling + auto-json (reference ideogram/model.py:260-275:
        every prompt is optionally rewritten by the enhancer head, then
        converted/canonicalized to the JSON caption schema unless
        --ideogram_auto_json is off)."""
        from .prompting import maybe_convert_prompt_to_ideogram_json

        if getattr(self.config, "ideogram_prompt_upsample", False):
            from .prompt_enhancer import load_enhancer_head, upsample_prompt

            if getattr(self, "_enhancer_head", None) is None:
                head_id = (
                    getattr(self.config, "ideogram_prompt_enhancer_head_id", None)
                    or self.DEFAULT_PROMPT_ENHANCER_HEAD
                )
                self._enhancer_head = load_enhancer_head(head_id)
            (qwen,) = self.text_encoders
            resolution = int(getattr(self.config, "resolution", None) or 1024)
            prompts = [
                upsample_prompt(
                    qwen, self._enhancer_head, str(p),
                    height=resolution, width=resolution,
                    seed=int(getattr(self.config, "seed", 0) or 0),
                )
                for p in prompts
            ]
        auto_json = getattr(self.config, "ideogram_auto_json", None)
        auto_json = True if auto_json is None else bool(auto_json)
        return [maybe_convert_prompt_to_ideogram_json(str(p), enabled=auto_json) for p in prompts]

    def encode_text(self, prompts):
        (qwen,) = self.text_encoders
        out = qwen.encode_with_hidden_states(self._preprocess_prompts(prompts))
        taps = out["hidden_states"]
        select = self._select_taps(len(taps))
        stacked = np.concatenate(
            [np.asarray(taps[i], np.float32) for i in select], axis=-1
        )
        return [
            {
                "text_embeds": stacked[i],
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        out = {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
        if all("attention_mask" in e for e in embeds):
            out["text_attention_mask"] = np.stack(
                [np.asarray(e["attention_mask"]) for e in embeds]
            )
        return out
