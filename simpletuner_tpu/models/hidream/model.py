"""HiDream family (reference: helpers/models/hidream — 17B MoE MMDiT image
flow model with CLIP-L/G + T5-XXL + Llama-3.1 conditioning and a gate
auxiliary (load-balance) loss; SURVEY.md §2.3).

Reference conventions (model.py:590-632 ``model_predict``):
* transformer timestep = scheduler timestep t∈[0,1000] (σ·1000);
* the transformer output is negated ("trained with inverted velocity");
* conditioning = T5 sequence + selected Llama hidden-state layers + pooled
  CLIP-L/G projections (``TEXT_ENCODER_CONFIGURATION``, model.py:86-116).
The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
reference's vendored ``HiDreamImageTransformer2DModel``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import (
    HiDreamConfig,
    HiDreamDoubleBlock,
    HiDreamMoE,
    HiDreamSingleBlock,
    HiDreamTransformer,
)

__all__ = [
    "HiDreamConfig",
    "HiDreamTransformer",
    "HiDreamDoubleBlock",
    "HiDreamSingleBlock",
    "HiDreamMoE",
    "HiDream",
]


class HiDream(ModelFoundation):
    NAME = "hidream"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "i1-full"
    HUGGINGFACE_PATHS = {
        "i1-full": "HiDream-ai/HiDream-I1-Full",
        "i1-dev": "HiDream-ai/HiDream-I1-Dev",
    }
    # reference model.py:86-116: CLIP-L + CLIP-G pooled projections, T5-XXL
    # sequence, Llama-3.1-8B hidden-state stack
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="clip-l", family="clip-l", subfolder="text_encoder", max_length=77, output="pooled"),
        TextEncoderSpec(name="clip-g", family="clip-g", subfolder="text_encoder_2", max_length=77, output="pooled"),
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder_3", max_length=128),
        TextEncoderSpec(name="llama", family="llama-3", subfolder="text_encoder_4", max_length=128,
                        output="hidden_states"),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 0.3611
    VAE_SHIFT_FACTOR = 0.1159

    # how many Llama hidden-state layers ride the cache (cycled over the 48
    # blocks via idx % n, reference transformer.py:1586-1592 safe indexing)
    LLAMA_SELECTED_LAYERS = 8

    def __init__(self, config: Any, arch: Optional[HiDreamConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = HiDreamConfig.tiny()
        else:
            self.arch = HiDreamConfig()
        # reference hidream/model.py:880: the gate aux term joins the loss only
        # when --hidream_use_load_balancing_loss is set, scaled by
        # --hidream_load_balancing_loss_weight (:325 aux_loss_alpha); the metric
        # itself is always reported
        if getattr(config, "hidream_use_load_balancing_loss", False):
            weight = getattr(config, "hidream_load_balancing_loss_weight", None)
            if weight is None:
                weight = getattr(config, "moe_gate_loss_weight", 0.01) or 0.01
            self.moe_aux_weight = float(weight)
        else:
            self.moe_aux_weight = 0.0

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def create_module(self):
        return HiDreamTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = resolution // 8
        n_sel = 2 if getattr(self.config, "model_arch_preset", None) == "tiny" else self.LLAMA_SELECTED_LAYERS
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "t5_embeds": jnp.zeros((batch_size, 16, self.arch.t5_dim), jnp.float32),
            "llama_embeds": jnp.zeros((batch_size, n_sel, 16, self.arch.llama_dim), jnp.float32),
            "pooled_embeds": jnp.zeros((batch_size, self.arch.pooled_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "latents": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "t5_embeds": prepared["t5_embeds"],
            "llama_embeds": prepared["llama_embeds"],
            "pooled": prepared["pooled_embeds"],
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        # "the model is trained with inverted velocity" (reference model.py:631)
        return -self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        pred, state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        return -pred, state.get("intermediates", {})

    def loss_fn(self, variables, rng, batch):
        """Base loss + MoE gate load-balancing aux (reference MoEGate aux_loss)."""
        prepared = self.prepare_batch(rng, batch)
        pred, intermediates = self.model_predict_with_intermediates(variables, prepared)
        loss = self.compute_loss(pred, prepared)

        aux_terms = []

        def collect(node):
            if isinstance(node, dict):
                for key, value in node.items():
                    if key == "moe_aux":
                        leaf = value[0] if isinstance(value, (tuple, list)) else value
                        aux_terms.append(leaf)
                    else:
                        collect(value)

        collect(intermediates)
        aux: Dict[str, jax.Array] = {"timesteps": prepared["timesteps"]}
        if aux_terms:
            gate_loss = jnp.mean(jnp.stack(aux_terms))
            if self.moe_aux_weight > 0.0:
                loss = loss + self.moe_aux_weight * gate_loss
            aux["moe_gate_loss"] = gate_loss
        return loss, aux

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "t5_embeds": batch["t5_embeds"],
            "llama_embeds": batch["llama_embeds"],
            "pooled_embeds": batch["pooled_embeds"],
        }

    def encode_text(self, prompts):
        clip_l, clip_g, t5, llama = self.text_encoders
        out_l = clip_l.encode(prompts)
        out_g = clip_g.encode(prompts)
        out_t5 = t5.encode(prompts)
        out_ll = llama.encode(prompts)
        pooled_l = np.asarray(out_l.get("pooled", out_l["last_hidden_state"][:, 0]), np.float32)
        pooled_g = np.asarray(out_g.get("pooled", out_g["last_hidden_state"][:, 0]), np.float32)
        pooled = np.concatenate([pooled_l, pooled_g], axis=-1)
        # Llama hidden-state stack: (n_layers, B, S, D) → select evenly-spaced
        # layers (the reference extracts config ``llama_layers``)
        hidden = out_ll.get("hidden_states")
        if hidden is None:
            hidden = np.asarray(out_ll["last_hidden_state"])[None]
        hidden = np.asarray(hidden, np.float32)
        n_layers = hidden.shape[0]
        n_sel = min(self.LLAMA_SELECTED_LAYERS, n_layers)
        sel = np.linspace(0, n_layers - 1, n_sel).round().astype(int)
        llama_stack = hidden[sel]  # (n_sel, B, S, D)
        return [
            {
                "t5_embeds": np.asarray(out_t5["last_hidden_state"][i], np.float32),
                "llama_embeds": np.ascontiguousarray(llama_stack[:, i]),
                "pooled_embeds": pooled[i],
                "attention_mask": np.asarray(out_t5["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {
            "t5_embeds": np.stack([np.asarray(e["t5_embeds"]) for e in embeds]),
            "llama_embeds": np.stack([np.asarray(e["llama_embeds"]) for e in embeds]),
            "pooled_embeds": np.stack([np.asarray(e["pooled_embeds"]) for e in embeds]),
        }

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("hidream is a flow-matching family")
