"""OmniGen family (reference: helpers/models/omnigen/model.py:25 class OmniGen).

Unified multimodal image generation: the prompt is tokenised (Phi-3 tokenizer)
and consumed by the transformer's own embedding table — there is no external
text encoder, so the text-embed cache stores token ids.  Flow matching with
logit-normal time sampling; the reference parameterises time as cleanliness
t = 1 − σ and target x1 − x0 (model.py:230 ``xt = t·x1 + (1−t)·x0``), which is
exactly our σ-noise convention with prediction −(noise − latents) — the model
output is negated on the way out so the shared flow loss applies unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..common import ModelFoundation
from .transformer import OmniGenConfig, OmniGenTransformer


class OmniGen(ModelFoundation):
    NAME = "omnigen"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "image"
    LATENT_CHANNEL_COUNT = 4  # SDXL-style AutoencoderKL
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "v1"
    HUGGINGFACE_PATHS = {"v1": "Shitao/OmniGen-v1-diffusers"}
    TEXT_ENCODER_CONFIGURATION = ()  # tokens feed the model's own embed table
    DEFAULT_LORA_TARGET = ("to_q", "to_k", "to_v", "to_out", "gate_up_proj", "down_proj")
    VAE_SCALING_FACTOR = 0.13025

    def __init__(self, config: Any, arch: Optional[OmniGenConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = OmniGenConfig.tiny()
        else:
            self.arch = OmniGenConfig()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return OmniGenTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def flow_schedule_config(self):
        # reference model.py:241 sample_flow_sigmas: plain sigmoid(normal),
        # no schedule shift
        import dataclasses

        return dataclasses.replace(
            super().flow_schedule_config(),
            schedule_shift=None, auto_shift=False,
            use_uniform_schedule=False, use_beta_schedule=False,
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = resolution // 8
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "input_ids": jnp.zeros((batch_size, 16), jnp.int32),
            "text_attention_mask": jnp.ones((batch_size, 16), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "latents": prepared["noisy_latents"],
            # the reference feeds cleanliness t = 1 − σ as the timestep
            "timesteps": 1.0 - prepared["timesteps"],
            "input_ids": prepared["input_ids"],
            "text_mask": prepared.get("text_attention_mask"),
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        # reference predicts d x_t/dt = x1 − x0 = latents − noise; our shared
        # flow target is noise − latents, so negate
        return -self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    # ---- host-side text handling ----------------------------------------------------------
    def encode_text(self, prompts):
        """Tokenise with the Phi-3 tokenizer; the 'embedding' cached is the id
        sequence (reference model.py:180 — OmniGen skips text-encoder caching)."""
        import numpy as np

        tok = getattr(self, "_tokenizer", None)
        if tok is None:
            if getattr(self.config, "model_arch_preset", None) == "tiny":
                # offline tiny runs: deterministic hash ids inside the tiny vocab
                vocab = int(self.arch.vocab_size)

                def tok(prompts, padding=None, truncation=True, max_length=120):
                    ids = np.zeros((len(prompts), max_length), np.int32)
                    mask = np.zeros((len(prompts), max_length), np.int32)
                    for row, prompt in enumerate(prompts):
                        words = str(prompt).split()[: max_length - 1]
                        for col, word in enumerate(words):
                            ids[row, col] = (hash(word) % max(vocab - 4, 1)) + 3
                            mask[row, col] = 1
                        ids[row, len(words)] = 2  # eos
                        mask[row, len(words)] = 1
                    return {"input_ids": ids, "attention_mask": mask}
            else:
                from transformers import AutoTokenizer

                tok = AutoTokenizer.from_pretrained(
                    getattr(self.config, "pretrained_model_name_or_path", None)
                    or self.HUGGINGFACE_PATHS[self.flavour or "v1"],
                    subfolder="tokenizer",
                )
            self._tokenizer = tok
        out = tok(list(prompts), padding="max_length", truncation=True, max_length=120)
        return [
            {
                "input_ids": np.asarray(out["input_ids"][i], np.int32),
                "text_attention_mask": np.asarray(out["attention_mask"][i], np.float32),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        import numpy as np

        return {
            "input_ids": np.stack([np.asarray(e["input_ids"]) for e in embeds]),
            "text_attention_mask": np.stack(
                [np.asarray(e["text_attention_mask"]) for e in embeds]
            ),
        }

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("omnigen is a flow-matching family")
