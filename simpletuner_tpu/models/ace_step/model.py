"""ACE-Step audio family (reference: helpers/models/ace_step — 3.5B
text-to-music flow DiT with music-DCAE latents, umT5 genre/caption
conditioning, speaker embeddings, a conformer lyric encoder, and SSL
(MERT / m-HuBERT) projection losses; SURVEY.md §2.3).

The transformer body lives in ``transformer.py`` and is checkpoint-faithful to
the reference's vendored ``ACEStepTransformer2DModel`` (Lite-LA linear
self-attention, GLUMBConv FFN, adaLN-single, Qwen2 RoPE at theta 1e6,
conformer lyric encoder).  Flow interpolation matches the reference
(model.py:1701 ``σ·noise + (1-σ)·latents``) — the framework's shared flow
path.  Lyrics ride the batch as token ids (``lyrics_tokens``/``lyrics_mask``)
exactly like the reference's ``lyric_token_idx``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio_vae import AudioVAEConfig
from ..common import ModelFoundation, TextEncoderSpec
from .transformer import ACEStepConfig, ACEStepTransformer

__all__ = ["ACEStepConfig", "ACEStepTransformer", "ACEStep"]


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
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")

    # --acestep_lora_target presets (reference ace_step/model.py:278-303).
    # The reference's Lite-LA ``linear_q/k/v`` projections are fused into
    # to_q/k/v in this implementation, so those names are kept for config
    # compatibility but match the same fused modules.
    LORA_TARGET_PRESETS = {
        "attn_qkv": ["to_q", "to_k", "to_v", "to_out.0"],
        "attn_qkv+linear_qkv": [
            "linear_q", "linear_k", "linear_v",
            "to_q", "to_k", "to_v", "to_out.0",
        ],
        "attn_qkv+linear_qkv+speech_embedder": [
            "speaker_embedder", "linear_q", "linear_k", "linear_v",
            "to_q", "to_k", "to_v", "to_out.0",
        ],
    }

    def family_lora_targets(self):
        preset = getattr(self.config, "acestep_lora_target", None) or "attn_qkv+linear_qkv"
        if preset not in self.LORA_TARGET_PRESETS:
            raise ValueError(
                f"unknown acestep_lora_target {preset!r}; available: "
                f"{sorted(self.LORA_TARGET_PRESETS)}"
            )
        return self.LORA_TARGET_PRESETS[preset]

    def sidecar_param_keys(self):
        """--lyrics_embedder_train (reference trainer.py:3292): the conformer
        lyric encoder + its projection train full-rank next to the frozen base
        with their own optimizer/lr (lyrics_embedder_lr/_optimizer)."""
        if getattr(self.config, "lyrics_embedder_train", False):
            return ("lyric_encoder", "lyric_proj")
        return ()

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
        return self.arch.in_channels

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
            "latents": jnp.zeros((batch_size, 16, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 8, self.arch.text_dim), jnp.float32),
        }

    def _to_mel_layout(self, latents: jax.Array) -> jax.Array:
        """Audio-VAE 1-D latents (B, S, C) → mel layout (B, H, S', C)."""
        if latents.ndim == 4:
            return latents
        batch, seq, channels = latents.shape
        h = self.arch.latent_height
        if h == 1:
            return latents[:, None]
        return latents.reshape(batch, h, seq // h, channels)

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        inputs = {
            "latents": self._to_mel_layout(prepared["noisy_latents"]),
            "timesteps": prepared["timesteps"],
            "text_embeds": prepared["text_embeds"],
        }
        if "speaker_embeds" in prepared:
            inputs["speaker_embeds"] = prepared["speaker_embeds"]
        if "lyrics_tokens" in prepared:
            inputs["lyric_tokens"] = prepared["lyrics_tokens"].astype(jnp.int32)
            inputs["lyric_mask"] = prepared.get(
                "lyrics_mask", jnp.ones(prepared["lyrics_tokens"].shape, jnp.float32)
            )
        if "text_attention_mask" in prepared:
            inputs["text_mask"] = prepared["text_attention_mask"]
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        pred = self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)
        return pred.reshape(prepared["noisy_latents"].shape)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        pred, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        return pred.reshape(prepared["noisy_latents"].shape), state.get("intermediates", {})

    @property
    def lyrics_tokenizer(self):
        if getattr(self, "_lyrics_tokenizer", None) is None:
            from .lyrics import LyricsTokenizer

            self._lyrics_tokenizer = LyricsTokenizer(
                model_path=getattr(self.config, "pretrained_model_name_or_path", None)
            )
        return self._lyrics_tokenizer

    def collate_batch_extras(self, samples, bundle, batch) -> None:
        """Lyric tokens from parquet rows / sidecar ``.lyrics.txt`` files
        (reference model.py:1656-1664 extracts lyrics from latent metadata and
        tokenizes them in prepare_batch; tokenization here keeps the train
        step jit-pure).  Lyrics are optional — ACE-Step trains tags-only when
        no sample carries them — but a partial batch tokenizes empties as a
        single masked 0, exactly like the reference's per-sample fallback."""
        lyrics = []
        found = False
        for sample in samples:
            path = sample["image_path"]
            row = (sample.get("metadata") or {}).get("row") or (
                bundle.metadata_backend.image_metadata.get(path, {}) or {}
            ).get("row") or {}
            text = row.get("lyrics")
            if text is None:
                lyrics_path = path.rsplit(".", 1)[0] + ".lyrics.txt"
                if bundle.data_backend.exists(lyrics_path):
                    text = bundle.data_backend.read(lyrics_path).decode("utf-8")
            lyrics.append(text)
            found = found or bool(text)
        if not found:
            return
        ids, mask = self.lyrics_tokenizer.tokenize_batch(lyrics)
        batch["lyrics_tokens"] = ids
        batch["lyrics_mask"] = mask

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        for key in ("speaker_embeds", "lyrics_tokens", "lyrics_mask"):
            if key in batch:
                cond[key] = batch[key]
        if "lyrics_tokens" not in cond and getattr(self.config, "validation_lyrics", None):
            # --validation_lyrics (reference validation.py:4589-4590: audio
            # pipelines receive the configured lyric text)
            batch_size = batch["text_embeds"].shape[0]
            ids, mask = self.lyrics_tokenizer.tokenize_batch(
                [self.config.validation_lyrics] * batch_size
            )
            cond["lyrics_tokens"] = jnp.asarray(ids)
            cond["lyrics_mask"] = jnp.asarray(mask)
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
