"""HeartMuLa: autoregressive RVQ music-generation LM (text+tags → codec tokens).

Reference: helpers/models/heartmula/{model,modeling_heartmula}.py — a Llama
backbone runs over per-frame summed embeddings (audio codebooks + text column),
predicting codebook-0 logits directly; a small Llama decoder refines the
remaining codebooks per frame (context token + teacher-forced codebook embeds),
scored by a per-codebook ``audio_head`` einsum.  The loss is masked next-token
cross-entropy: codebook 0 over frames + the rest over (frames × codebooks−1)
(reference model.py:292-326).

TPU shape: the per-frame decoder batch is folded to (B·(S−1), K, d) so the MXU
sees one big batched matmul; everything is static-shape and jit-safe.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..common import ModelFoundation, TextEncoderSpec
from .llama import LlamaConfig, LlamaTransformer


class HeartMuLaModule(nn.Module):
    text_vocab: int = 128256
    audio_vocab: int = 1024
    num_codebooks: int = 8
    muq_dim: int = 512
    backbone: LlamaConfig = LlamaConfig.flavor("llama-3B")
    decoder: LlamaConfig = LlamaConfig.flavor("llama-300M")
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # (B, S, K+1) int32: K audio codebooks + 1 text column
        tokens_mask: jax.Array,  # (B, S, K+1) which token slots are populated
        attention_mask: Optional[jax.Array] = None,  # (B, S)
        uncond_mask: Optional[jax.Array] = None,  # (B,) CFG dropout rows
    ) -> Dict[str, jax.Array]:
        batch, seq, _ = tokens.shape
        K = self.num_codebooks
        d_backbone = self.backbone.embed_dim

        text_table = nn.Embed(self.text_vocab, d_backbone, param_dtype=self.param_dtype,
                              name="text_embeddings")
        audio_table = nn.Embed(self.audio_vocab * K, d_backbone,
                               param_dtype=self.param_dtype, name="audio_embeddings")
        uncond_table = nn.Embed(1, d_backbone, param_dtype=self.param_dtype,
                                name="unconditional_text_embedding")

        # summed masked frame embedding (reference modeling_heartmula.py:166);
        # the uncond table is always materialised so the param exists even
        # when caption dropout is off
        text_embeds = text_table(tokens[:, :, -1])
        uncond = uncond_table(jnp.zeros((1,), jnp.int32))[0]
        if uncond_mask is not None:
            text_embeds = jnp.where(uncond_mask[:, None, None], uncond, text_embeds)
        else:
            text_embeds = text_embeds + 0.0 * uncond  # keep the param in the graph
        offsets = self.audio_vocab * jnp.arange(K)
        audio_embeds = audio_table(tokens[:, :, :K] + offsets)  # (B, S, K, D)
        embeds = jnp.concatenate([audio_embeds, text_embeds[:, :, None, :]], axis=2)
        hidden = jnp.sum(embeds * tokens_mask[..., None].astype(embeds.dtype), axis=2)

        backbone = LlamaTransformer(
            self.backbone, dtype=self.dtype, param_dtype=self.param_dtype,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, remat=self.remat,
            name="backbone",
        )
        hidden_states = backbone(hidden, attention_mask)

        from ..layers import LoRADense

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False,
                      lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        codebook0_logits = LoRADense(self.audio_vocab, name="codebook0_head", **common)(
            hidden_states[:, :-1, :]
        )

        # frame-local decoder over [context, codebook_1..K-1 embeds]
        target_audio = tokens[:, 1:, :K]
        context = hidden_states[:, :-1, :]
        local = target_audio[:, :, : K - 1] + self.audio_vocab * jnp.arange(K - 1)
        local_embeds = audio_table(local)  # (B, S-1, K-1, D)
        decoder_in = jnp.concatenate([context[:, :, None, :], local_embeds.astype(context.dtype)], axis=2)
        decoder_in = LoRADense(self.decoder.embed_dim, name="projection", **common)(decoder_in)
        frames = seq - 1
        decoder_in = decoder_in.reshape(batch * frames, K, self.decoder.embed_dim)
        decoder = LlamaTransformer(
            self.decoder, dtype=self.dtype, param_dtype=self.param_dtype,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, remat=self.remat,
            name="decoder",
        )
        decoder_hidden = decoder(decoder_in, None)[:, 1:, :]  # predicts codebooks 1..K-1
        audio_head = self.param(
            "audio_head", nn.initializers.normal(0.02),
            (K - 1, self.decoder.embed_dim, self.audio_vocab), self.param_dtype,
        )
        logits = jnp.einsum("bqd,qdv->bqv", decoder_hidden.astype(jnp.float32),
                            audio_head.astype(jnp.float32))
        codebook_logits = logits.reshape(batch, frames, K - 1, self.audio_vocab)
        return {
            "codebook0_logits": codebook0_logits.astype(jnp.float32),
            "codebook_logits": codebook_logits,
        }


class HeartMuLa(ModelFoundation):
    """Reference: helpers/models/heartmula/model.py:28 (HeartMuLa,
    PREDICTION_TYPE=AUTOREGRESSIVE_NEXT_TOKEN, TEXT2AUDIO pipeline)."""

    NAME = "heartmula"
    PREDICTION_TYPE = "autoregressive"
    MODEL_TYPE = "transformer"
    MODALITY = "audio"
    REQUIRES_VAE = False  # consumes pre-tokenised codec frames
    DEFAULT_RESOLUTION = 0
    DEFAULT_FLAVOUR = "3b"
    HUGGINGFACE_PATHS = {"3b": "HeartMuLa/HeartMuLa-oss-3B"}
    TEXT_ENCODER_CONFIGURATION = ()  # tags tokenised into the token grid itself
    DEFAULT_LORA_TARGET = ("q_proj", "k_proj", "v_proj", "o_proj")

    def __init__(self, config: Any, arch: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        tiny = getattr(config, "model_arch_preset", None) == "tiny"
        if arch is not None:
            self.arch = arch
        elif tiny:
            self.arch = dict(
                text_vocab=64, audio_vocab=32, num_codebooks=4, muq_dim=16,
                backbone=LlamaConfig.tiny(), decoder=LlamaConfig.tiny(),
            )
        else:
            self.arch = dict(
                backbone=LlamaConfig.flavor("llama-3B"),
                decoder=LlamaConfig.flavor("llama-300M"),
            )

    def create_module(self):
        return HeartMuLaModule(
            **self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        seq = 16
        K = self.arch.get("num_codebooks", 8)
        return {
            "tokens": jnp.zeros((batch_size, seq, K + 1), jnp.int32),
            "tokens_mask": jnp.ones((batch_size, seq, K + 1), jnp.float32),
            "audio_frame_mask": jnp.ones((batch_size, seq), jnp.float32),
        }

    # ---- jit path (autoregressive: no diffusion prepare) --------------------------------
    def prepare_batch(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        prepared = dict(batch)
        prepared["tokens"] = batch["tokens"].astype(jnp.int32)
        # CFG dropout of the text conditioning (reference caption_dropout)
        p = float(getattr(self.config, "caption_dropout_probability", 0.0) or 0.0)
        if p > 0:
            prepared["uncond_mask"] = (
                jax.random.uniform(jax.random.fold_in(rng, 0xCF), (batch["tokens"].shape[0],)) < p
            )
        return prepared

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        tokens_mask = prepared["tokens_mask"]
        return {
            "tokens": prepared["tokens"],
            "tokens_mask": tokens_mask,
            "attention_mask": jnp.any(tokens_mask > 0, axis=-1).astype(jnp.int32),
            "uncond_mask": prepared.get("uncond_mask"),
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None):
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def loss_fn(self, variables, rng: jax.Array, batch: Dict[str, jax.Array]) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Masked next-token CE over codebook 0 + refined codebooks
        (reference model.py:292 loss)."""
        prepared = self.prepare_batch(rng, batch)
        out = self.model_predict(variables, prepared)
        tokens = prepared["tokens"]
        K = self.arch.get("num_codebooks", 8)
        target = tokens[:, 1:, :K]
        frame_mask = prepared["audio_frame_mask"][:, 1:].astype(jnp.float32)

        logp0 = jax.nn.log_softmax(out["codebook0_logits"], axis=-1)
        loss0 = -jnp.take_along_axis(logp0, target[:, :, 0:1], axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(frame_mask), 1.0)
        loss0 = jnp.sum(loss0 * frame_mask) / denom

        logp = jax.nn.log_softmax(out["codebook_logits"], axis=-1)
        loss_rest = -jnp.take_along_axis(logp, target[:, :, 1:, None], axis=-1)[..., 0]
        loss_rest = jnp.sum(loss_rest * frame_mask[:, :, None]) / (denom * (K - 1))

        loss = loss0 + loss_rest
        return loss, {"ce_codebook0": loss0, "ce_rest": loss_rest}

    def check_user_config(self) -> None:
        if getattr(self.config, "model_type", "lora") == "controlnet":
            raise ValueError("heartmula does not support controlnet training")

    # ---- codec-token data plane (reference model.py:326-481) ----------------------------
    def uses_audio_tokens(self) -> bool:
        return True

    def _normalize_tags(self, tags: str) -> str:
        """<tag>…</tag> wrapping (reference model.py:328-334)."""
        tags = tags.strip().lower()
        if not tags.startswith("<tag>"):
            tags = f"<tag>{tags}"
        if not tags.endswith("</tag>"):
            tags = f"{tags}</tag>"
        return tags

    def _text_token_ids(self, text: str) -> list:
        """BPE ids via tokenizer.json when configured (reference
        model.py:156-170 loads HeartMuLaGen assets); deterministic hash ids
        for the tiny preset.  BOS/EOS framing follows model.py:336-346."""
        bos = int(getattr(self.config, "heartmula_text_bos_id", 1) or 1)
        eos = int(getattr(self.config, "heartmula_text_eos_id", 2) or 2)
        tok_path = getattr(self.config, "heartmula_tokenizer_path", None)
        if tok_path:
            if not hasattr(self, "_hm_tokenizer"):
                from tokenizers import Tokenizer

                self._hm_tokenizer = Tokenizer.from_file(str(tok_path))
            ids = list(self._hm_tokenizer.encode(text).ids)
        elif getattr(self.config, "model_arch_preset", None) == "tiny":
            vocab = int(self.arch.get("text_vocab", 64))
            ids = [(hash(word) % max(vocab - 4, 1)) + 3 for word in text.split()]
        else:
            raise ValueError(
                "heartmula requires --heartmula_tokenizer_path (the HeartMuLaGen "
                "tokenizer.json) for non-tiny training; refusing a silent fallback"
            )
        if not ids:
            return [bos, eos]
        if ids[0] != bos:
            ids = [bos] + ids
        if ids[-1] != eos:
            ids = ids + [eos]
        return ids

    def collate_token_batch(self, examples) -> Dict[str, Any]:
        """Token-grid collation (reference model.py:401-481
        ``collate_audio_tokens``): [tags, <sep>, lyrics] on the text column,
        codec frames on the first K columns, empty_id elsewhere."""
        import numpy as np

        K = int(self.arch.get("num_codebooks", 8))
        empty_id = int(getattr(self.config, "heartmula_empty_id", 0) or 0)

        grids, masks, frame_masks = [], [], []
        for example in examples:
            tag_ids = self._text_token_ids(self._normalize_tags(example["tags"]))
            lyric_ids = self._text_token_ids(str(example["lyrics"]).strip().lower())
            audio = np.asarray(example["audio_tokens"], np.int64)
            if audio.ndim != 2:
                raise ValueError(f"audio tokens must be 2D, got {audio.shape}")
            if audio.shape[0] == K and audio.shape[1] == K:
                raise ValueError(
                    f"ambiguous token matrix {audio.shape}: both dims equal "
                    f"num_codebooks ({K})"
                )
            if audio.shape[0] == K:
                audio = audio.T  # [codebooks, frames] -> [frames, codebooks]
            if audio.shape[1] != K:
                raise ValueError(
                    f"token matrix {audio.shape} does not match num_codebooks {K}"
                )
            prompt_len = len(tag_ids) + 1 + len(lyric_ids)
            seq_len = prompt_len + audio.shape[0]

            grid = np.full((seq_len, K + 1), empty_id, np.int64)
            grid[: len(tag_ids), -1] = tag_ids
            grid[len(tag_ids) + 1 : prompt_len, -1] = lyric_ids
            grid[prompt_len:, :K] = audio

            mask = np.zeros((seq_len, K + 1), bool)
            mask[:prompt_len, -1] = True
            mask[prompt_len:, :K] = True

            frame_mask = np.zeros(seq_len, bool)
            frame_mask[prompt_len:] = True

            grids.append(grid)
            masks.append(mask)
            frame_masks.append(frame_mask)

        # pad to a 32-multiple so duration buckets share compile-cache entries
        max_len = max(g.shape[0] for g in grids)
        max_len = ((max_len + 31) // 32) * 32
        batch = len(grids)
        tokens = np.full((batch, max_len, K + 1), empty_id, np.int64)
        tokens_mask = np.zeros((batch, max_len, K + 1), bool)
        audio_frame_mask = np.zeros((batch, max_len), bool)
        for i, (grid, mask, frame_mask) in enumerate(zip(grids, masks, frame_masks)):
            length = grid.shape[0]
            tokens[i, :length] = grid
            tokens_mask[i, :length] = mask
            audio_frame_mask[i, :length] = frame_mask
        return {
            "tokens": tokens.astype(np.int32),
            "tokens_mask": tokens_mask.astype(np.float32),
            "audio_frame_mask": audio_frame_mask.astype(np.float32),
        }
