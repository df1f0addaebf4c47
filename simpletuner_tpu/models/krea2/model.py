"""Krea-2 family (reference: helpers/models/krea2 — an 8.9B single-stream
GQA MMDiT with sigmoid attention gates, theta-1000 rope, and a text-fusion
stage over tapped Qwen3-VL hidden states; SURVEY.md §2.3 "krea2").

The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
vendored ``Krea2Transformer2DModel``.  Text conditioning is a stack of
``num_text_layers`` tapped encoder hidden states per token (reference
pipeline.py:211-213 selects layers (2,5,...,35) of Qwen3-VL-4B); the cache
stores the stacked (S, L, D) tensor.  Timesteps are flow σ∈[0,1] — the
embedder scales by 1000 internally (transformer.py:367).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ..flux.transformer import make_img_ids, pack_latents, unpack_latents
from .transformer import Krea2Config, Krea2Transformer

__all__ = ["Krea2Config", "Krea2Transformer", "Krea2"]

# reference pipeline.py:211-213 — indices into Qwen3-VL-4B hidden_states
KREA2_SELECT_LAYERS = (2, 5, 8, 11, 14, 17, 20, 23, 26, 29, 32, 35)


class Krea2(ModelFoundation):
    NAME = "krea2"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "base"
    HUGGINGFACE_PATHS = {"base": "krea/krea-2", "turbo": "krea/krea-2-turbo"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen3-vl", family="qwen2.5-vl", subfolder="text_encoder", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("to_q", "to_k", "to_v", "to_gate", "to_out")

    def __init__(self, config: Any, arch: Optional[Krea2Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = Krea2Config.tiny()
        else:
            self.arch = Krea2Config()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels // 4  # 2x2 packing

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("krea2 is a flow-matching family")

    def create_module(self):
        return Krea2Transformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = max(resolution // 8, 8)
        channels = self.arch.in_channels // 4
        return {
            "latents": jnp.zeros((batch_size, latent, latent, channels), jnp.float32),
            "text_embeds": jnp.zeros(
                (batch_size, 8, self.arch.num_text_layers, self.arch.text_hidden_dim), jnp.float32
            ),
        }

    def _uses_reference_latents(self) -> bool:
        # --krea2_reference_latents (reference krea2/model.py:96-97): edit
        # training where a clean reference image rides as extra tokens
        return bool(getattr(self.config, "krea2_reference_latents", False))

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]  # (B, H, W, C)
        batch, height, width, _ = noisy.shape
        txt_len = prepared["text_embeds"].shape[1]
        # text rows all-zero; image rows hold the latent-grid coordinates
        # (reference model.py:431-441)
        img_ids = make_img_ids(1, height, width)[0]  # (S_img, 3)
        txt_ids = jnp.zeros((txt_len, 3), jnp.float32)
        hidden = pack_latents(noisy)
        position_ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        if self._uses_reference_latents():
            # reference model.py:466-510: the conditioning dataset's clean
            # latents are packed and appended after the target tokens with a
            # second identical position grid (grids list); predictions are
            # sliced back to the target tokens in model_predict
            ref = prepared.get("control_latents")
            if ref is None:
                raise ValueError(
                    "Krea 2 reference-latent training requires conditioning_latents "
                    "in the batch — link a conditioning dataset via conditioning_data."
                )
            if ref.ndim == 5:
                if ref.shape[1] != 1:
                    raise ValueError(
                        f"Krea 2 reference latents must have a single frame, got {ref.shape}."
                    )
                ref = ref[:, 0]
            if ref.shape != noisy.shape:
                raise ValueError(
                    "Krea 2 reference latents must match target latent shape. "
                    f"Got reference {ref.shape} vs target {noisy.shape}."
                )
            hidden = jnp.concatenate([hidden, pack_latents(ref.astype(noisy.dtype))], axis=1)
            position_ids = jnp.concatenate([position_ids, img_ids], axis=0)
        inputs = {
            "hidden_states": hidden,
            "encoder_hidden_states": prepared["text_embeds"],
            "timesteps": prepared["timesteps"],
            "position_ids": position_ids,
        }
        if "text_attention_mask" in prepared:
            inputs["encoder_attention_mask"] = prepared["text_attention_mask"]
        return inputs

    def _slice_target_tokens(self, out: jax.Array, height: int, width: int) -> jax.Array:
        # reference model.py:540 noise_pred[:, :target_token_count]
        s_img = (height // 2) * (width // 2)
        return out[:, :s_img]

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        out = self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)
        _, height, width, _ = prepared["noisy_latents"].shape
        return unpack_latents(self._slice_target_tokens(out, height, width), height, width)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        out, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        _, height, width, _ = prepared["noisy_latents"].shape
        out = self._slice_target_tokens(out, height, width)
        return unpack_latents(out, height, width), state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        if "text_attention_mask" in batch:
            cond["text_attention_mask"] = batch["text_attention_mask"]
        if self._uses_reference_latents() and "control_latents" in batch:
            # validation edit sampling (reference update_pipeline_call_kwargs:
            # image -> reference_image when the flag is on)
            cond["control_latents"] = batch["control_latents"]
        return cond

    def _select_layers(self, available: int):
        if available > max(KREA2_SELECT_LAYERS):
            return KREA2_SELECT_LAYERS
        # tiny encoders: spread num_text_layers taps evenly over what exists
        n = self.arch.num_text_layers
        return tuple(int(round(i * (available - 1) / max(n - 1, 1))) for i in range(n))

    def encode_text(self, prompts):
        (qwen,) = self.text_encoders
        out = qwen.encode_with_hidden_states(prompts)
        taps = out["hidden_states"]  # tuple of (B, S, D), embeddings first
        select = self._select_layers(len(taps))
        stack = np.stack([np.asarray(taps[i], np.float32) for i in select], axis=2)
        return [
            {
                "text_embeds": stack[i],
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
