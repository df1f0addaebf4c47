"""Cosmos3 family (reference: helpers/models/cosmos3 — NVIDIA Cosmos omni
world models: a Qwen3-VL reasoner backbone run as a Mixture of Transformers
whose generation pathway denoises video latents in-context; SURVEY.md §2.3).

The MoT core lives in ``transformer.py`` and is checkpoint-faithful to the
vendored ``Cosmos3OmniTransformer`` (text2world path: causal text prefix +
full-attention diffusion tokens).  Cosmos3 has NO external text encoder — the
backbone embeds raw token ids (``embed_tokens``), so the text cache carries
token ids.  The sound submodality's AVAE waveform codec is in
``audio_tokenizer.py`` and the frozen split-reasoner (per-layer K/V replay
into the generator-only transformer) in ``reasoner.py``; dedicated
sound/action output heads are not ported.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import (
    Cosmos3Config,
    Cosmos3OmniTransformer,
    cosmos3_patchify,
    cosmos3_position_ids,
    cosmos3_unpatchify,
)

__all__ = ["Cosmos3Config", "Cosmos3OmniTransformer", "Cosmos3"]


class Cosmos3(ModelFoundation):
    NAME = "cosmos3"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "video"
    LATENT_CHANNEL_COUNT = 48
    DEFAULT_RESOLUTION = 704
    DEFAULT_FLAVOUR = "predict2-2b-video"
    HUGGINGFACE_PATHS = {
        "predict2-2b-video": "nvidia/Cosmos-Predict2-2B-Video2World",
        "predict2-14b-video": "nvidia/Cosmos-Predict2-14B-Video2World",
        "predict2-2b-image": "nvidia/Cosmos-Predict2-2B-Text2Image",
    }
    # the backbone IS the text encoder; the cache stores token ids
    TEXT_ENCODER_CONFIGURATION = ()
    DEFAULT_LORA_TARGET = ("attn_gen_q", "attn_gen_k", "attn_gen_v", "attn_gen_out")

    def __init__(self, config: Any, arch: Optional[Cosmos3Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = Cosmos3Config.tiny()
        else:
            self.arch = Cosmos3Config()
        self._tokenizer = None

    @property
    def latent_channels(self) -> int:
        return self.arch.latent_channel

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("cosmos3 is a flow-matching family")

    @staticmethod
    def load_sound_tokenizer(path: str, tiny: bool = False):
        """Checkpoint-faithful ``Cosmos3AVAEAudioTokenizer`` import →
        (module, variables); the sound submodality's waveform↔latent codec
        (reference model.py:494-519 _load_sound_tokenizer)."""
        from .audio_tokenizer import (
            Cosmos3AudioTokenizer,
            Cosmos3AudioTokenizerConfig,
            load_cosmos3_audio_tokenizer,
        )

        cfg = Cosmos3AudioTokenizerConfig.tiny() if tiny else Cosmos3AudioTokenizerConfig()
        return Cosmos3AudioTokenizer(cfg), load_cosmos3_audio_tokenizer(cfg, path)

    def create_module(self):
        return Cosmos3OmniTransformer(
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
            "latents": jnp.zeros((batch_size, 2, 4, 4, self.arch.latent_channel), jnp.float32),
            "text_ids": jnp.ones((batch_size, 6), jnp.int32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]  # (B, T, H, W, C)
        batch, t, h, w, _ = noisy.shape
        text_ids = prepared["text_ids"].astype(jnp.int32)
        und_len = text_ids.shape[1]
        pos = cosmos3_position_ids(self.arch, und_len, t, h, w)
        gen_len = pos.shape[1] - und_len
        # reference feeds scheduler-scale timesteps (σ·1000) per gen token;
        # the transformer multiplies by timestep_scale=1e-3 internally
        sigmas = prepared["timesteps"].astype(jnp.float32) * 1000.0
        return {
            "text_ids": text_ids,
            "vision_tokens": cosmos3_patchify(noisy, self.arch.latent_patch_size),
            "position_ids": jnp.broadcast_to(jnp.asarray(pos)[None], (batch, 3, pos.shape[1])),
            "timesteps": jnp.broadcast_to(sigmas[:, None], (batch, gen_len)),
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        vision_pred, _logits = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs
        )
        _, t, h, w, _ = prepared["noisy_latents"].shape
        return cosmos3_unpatchify(vision_pred, t, h, w, self.arch.latent_patch_size)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        (vision_pred, _logits), state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        _, t, h, w, _ = prepared["noisy_latents"].shape
        pred = cosmos3_unpatchify(vision_pred, t, h, w, self.arch.latent_patch_size)
        return pred, state.get("intermediates", {})

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_ids": batch["text_ids"]}

    def encode_text(self, prompts):
        """Token ids for the backbone's own embedding table.  Uses the
        configured tokenizer when resolvable; otherwise a deterministic
        hash-vocabulary (tiny/test runs)."""
        max_len = 64
        rows = []
        tokenizer = self._resolve_tokenizer()
        for prompt in prompts:
            if tokenizer is not None:
                ids = tokenizer(prompt, truncation=True, max_length=max_len)["input_ids"]
            else:
                ids = [1 + (hash(word) % (self.arch.vocab_size - 2)) for word in str(prompt).split()][:max_len]
            ids = ids + [0] * (max_len - len(ids))
            rows.append({"text_ids": np.asarray(ids, np.int32),
                         "attention_mask": np.asarray([1] * min(len(ids), max_len), np.int64)})
        return rows

    def _resolve_tokenizer(self):
        if self._tokenizer is not None:
            return self._tokenizer
        path = getattr(self.config, "pretrained_model_name_or_path", None)
        if not path or not str(path).startswith("/"):
            return None
        try:
            from transformers import AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(path)
        except Exception:
            self._tokenizer = None
        return self._tokenizer

    def collate_text_embeds(self, embeds):
        return {"text_ids": np.stack([np.asarray(e["text_ids"]) for e in embeds])}
