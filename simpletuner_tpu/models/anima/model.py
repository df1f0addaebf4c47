"""Anima family (reference: helpers/models/anima — circulus Anima image flow
model: a Cosmos DiT core conditioned through an LLM adapter that maps
Qwen3-0.6B hidden states onto the caption's T5 token grid; SURVEY.md §2.3).

The adapter + core live in ``transformer.py`` (core:
``models/cosmos1/transformer.py``).  The text cache stores the Qwen source
hidden states AND the T5 token ids (reference ``t5xxl_ids``); without a local
T5 tokenizer a deterministic hash vocabulary stands in (tiny/test runs).
Timesteps feed as flow σ∈[0,1] (reference ``_to_sigma_space_timesteps``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import AnimaConfig, AnimaTransformer

__all__ = ["AnimaConfig", "AnimaTransformer", "Anima"]


class Anima(ModelFoundation):
    NAME = "anima"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "release"
    HUGGINGFACE_PATHS = {"release": "circulus/anima"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen3", family="qwen2.5", subfolder="text_encoder", max_length=256),
    )
    DEFAULT_LORA_TARGET = ("attn1_q", "attn1_k", "attn1_v", "attn1_out",
                           "attn2_q", "attn2_k", "attn2_v", "attn2_out")

    def __init__(self, config: Any, arch: Optional[AnimaConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = AnimaConfig.tiny()
        else:
            self.arch = AnimaConfig()
        self._t5_tokenizer = None

    @property
    def latent_channels(self) -> int:
        return self.arch.core.in_channels

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("anima is a flow-matching family")

    def create_module(self):
        return AnimaTransformer(
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
            "text_embeds": jnp.zeros((batch_size, 6, self.arch.adapter_dim), jnp.float32),
            "t5_ids": jnp.ones((batch_size, 8), jnp.int32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]  # (B, H, W, C) image family
        inputs = {
            "latents": noisy[:, None],  # T=1 frame axis for the video core
            "timesteps": prepared["timesteps"].astype(jnp.float32),
            "text_embeds": prepared["text_embeds"],
            "t5_ids": prepared["t5_ids"].astype(jnp.int32),
        }
        if "t5_weights" in prepared:
            inputs["t5_weights"] = prepared["t5_weights"]
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        out = self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)
        return out[:, 0]

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        out, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        return out[:, 0], state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"], "t5_ids": batch["t5_ids"]}

    def _resolve_t5_tokenizer(self):
        if self._t5_tokenizer is not None:
            return self._t5_tokenizer
        path = getattr(self.config, "pretrained_model_name_or_path", None)
        if path and str(path).startswith("/"):
            try:
                from transformers import AutoTokenizer

                self._t5_tokenizer = AutoTokenizer.from_pretrained(
                    str(path), subfolder="tokenizer"
                )
            except Exception:
                self._t5_tokenizer = None
        return self._t5_tokenizer

    def encode_text(self, prompts):
        (qwen,) = self.text_encoders
        out = qwen.encode(prompts)
        tokenizer = self._resolve_t5_tokenizer()
        max_len = min(self.arch.adapter_pad_length, 64)
        rows = []
        for i, prompt in enumerate(prompts):
            if tokenizer is not None:
                ids = tokenizer(prompt, truncation=True, max_length=max_len)["input_ids"]
            else:
                ids = [1 + (hash(word) % (self.arch.adapter_vocab_size - 2))
                       for word in str(prompt).split()][:max_len]
            ids = ids + [0] * (max_len - len(ids))
            rows.append({
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "t5_ids": np.asarray(ids, np.int32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            })
        return rows

    def collate_text_embeds(self, embeds):
        return {
            "text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds]),
            "t5_ids": np.stack([np.asarray(e["t5_ids"]) for e in embeds]),
        }
