"""LongCat-Image family (reference: helpers/models/longcat_image — meituan's
bilingual 6B editing DiT: the Flux MMDiT topology verbatim
(transformer.py:274-349, 19 double + 38 single, 24 heads x 128) with three
faithful differences:

* **timestep-only modulation** — TimestepEmbeddings (transformer.py:319-321)
  has no pooled-text or guidance embedder; temb is the 256-sinusoid MLP of
  t*1000 alone (``FluxConfig(vector_embed=False, guidance_embed=False)``).
* **Qwen2.5-VL context** (3584-wide) built from a captioning chat template;
  the template prefix/suffix token spans are sliced off the last hidden
  state (pipeline.py:142-145, :194-210 — fixed [36:-5] with the real
  tokenizer; computed from the tokenized template here so tiny tokenizers
  stay consistent).
* **sliding positional ids** (__init__.py:69-87 prepare_pos_ids): text
  tokens take (0, i, i); image tokens (1, L+y, L+x) offset by the prompt
  length L; edit reference tokens (2, L+y, L+x).  The edit flavour feeds
  the reference tokens at **t=0 tokenwise** (model.py:684-706), not at the
  sample's t like Flux-Kontext.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import TextEncoderSpec
from ..flux.model import Flux
from ..flux.transformer import FluxConfig, make_img_ids, pack_latents

__all__ = ["LongcatImage"]

# reference pipeline.py:142-144
PROMPT_PREFIX = (
    "<|im_start|>system\nAs an image captioning expert, generate a descriptive "
    "text prompt based on an image content, suitable for input to a text-to-image "
    "model.<|im_end|>\n<|im_start|>user\n"
)
PROMPT_SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"


class LongcatImage(Flux):
    NAME = "longcat_image"
    PREDICTION_TYPE = "flow_matching"
    DEFAULT_FLAVOUR = "final"
    HUGGINGFACE_PATHS = {
        "final": "meituan-longcat/LongCat-Image",
        "dev": "meituan-longcat/LongCat-Image-Dev",
        "edit": "meituan-longcat/LongCat-Image-Edit",
    }
    LATENT_CHANNEL_COUNT = 16
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="qwen2.5-vl", family="qwen2.5-vl", subfolder="text_encoder", max_length=512),
    )

    def __init__(self, config: Any, arch: Optional[FluxConfig] = None):
        if arch is None:
            if getattr(config, "model_arch_preset", None) == "tiny":
                import dataclasses as _dc

                arch = _dc.replace(
                    FluxConfig.tiny(), vector_embed=False, guidance_embed=False)
            else:
                # reference transformer.py:292-302 defaults
                arch = FluxConfig(
                    in_channels=64, hidden_size=3072, num_heads=24, head_dim=128,
                    depth_double=19, depth_single=38, txt_in_features=3584,
                    vec_in_features=3584, vector_embed=False, guidance_embed=False,
                )
        super().__init__(config, arch=arch)

    @property
    def is_kontext(self) -> bool:
        # edit flavour concatenates packed reference latents (model.py:688-712)
        return self.flavour == "edit"

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        batch = super().example_batch(batch_size=batch_size, resolution=resolution)
        batch.pop("pooled_embeds", None)
        return batch

    def prepare_batch(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        prepared = super().prepare_batch(rng, batch)
        # sliding pos ids (reference __init__.py:69-87): text (0, i, i);
        # image (1, L+y, L+x) — Flux's zero txt_ids / zero-offset img_ids are
        # replaced here
        batch_size = batch["latents"].shape[0]
        txt_len = batch["t5_embeds"].shape[1]
        pos = jnp.arange(txt_len, dtype=jnp.float32)
        txt_ids = jnp.zeros((txt_len, 3), jnp.float32)
        txt_ids = txt_ids.at[:, 1].set(pos).at[:, 2].set(pos)
        prepared["txt_ids"] = jnp.broadcast_to(txt_ids[None], (batch_size, txt_len, 3))
        height, width = batch["latents"].shape[1], batch["latents"].shape[2]
        img_ids = make_img_ids(batch_size, height, width).astype(jnp.float32)
        img_ids = img_ids.at[..., 0].set(1.0).at[..., 1:].add(float(txt_len))
        prepared["img_ids"] = img_ids
        prepared.pop("guidance", None)  # no guidance embedder (transformer.py:319)
        return prepared

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]
        img = pack_latents(noisy)
        img_ids = prepared["img_ids"]
        timesteps = prepared["timesteps"]
        if self.is_kontext and "control_latents" in prepared:
            # edit conditioning (reference model.py:684-712): ref tokens ride
            # with modality id 2, same L-offset, and t=0 tokenwise modulation
            ref = pack_latents(prepared["control_latents"].astype(noisy.dtype))
            batch, height, width = noisy.shape[0], noisy.shape[1], noisy.shape[2]
            txt_len = prepared["t5_embeds"].shape[1]
            ref_ids = make_img_ids(batch, height, width).astype(jnp.float32)
            ref_ids = ref_ids.at[..., 0].set(2.0).at[..., 1:].add(float(txt_len))
            scene_len, ref_len = img.shape[1], ref.shape[1]
            img = jnp.concatenate([img, ref], axis=1)
            img_ids = jnp.concatenate([img_ids, ref_ids], axis=1)
            timesteps = jnp.concatenate(
                [
                    jnp.broadcast_to(timesteps[:, None], (batch, scene_len)),
                    jnp.zeros((batch, ref_len), timesteps.dtype),
                ],
                axis=1,
            )
        inputs = {
            "img": img,
            "img_ids": img_ids,
            "txt": prepared["t5_embeds"],
            "txt_ids": prepared["txt_ids"],
            "timesteps": timesteps,
            "vec": None,
        }
        return inputs

    def encode_text(self, prompts):
        """Qwen2.5-VL last hidden state with the captioning template's
        prefix/suffix token spans sliced off (reference pipeline.py:194-210)."""
        (qwen,) = self.text_encoders
        n_prefix = int(np.asarray(
            qwen.tokenizer([PROMPT_PREFIX])["attention_mask"]).sum())
        n_suffix = max(int(np.asarray(
            qwen.tokenizer([PROMPT_SUFFIX])["attention_mask"]).sum()), 1)
        out = qwen.encode([PROMPT_PREFIX + str(p) + PROMPT_SUFFIX for p in prompts])
        hidden = np.asarray(out["last_hidden_state"], np.float32)
        mask = np.asarray(out["attention_mask"])
        hidden = hidden[:, n_prefix:-n_suffix]
        mask = mask[:, n_prefix:-n_suffix]
        return [
            {"t5_embeds": hidden[i], "attention_mask": mask[i]}
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {
            "t5_embeds": np.stack([np.asarray(e["t5_embeds"]) for e in embeds]),
        }
