"""HiDream family (reference: helpers/models/hidream — 17B MoE MMDiT image
flow model with Llama/CLIP/T5 conditioning and a gate auxiliary (load-balance)
loss; SURVEY.md §2.3 "hidream: image 17B MoE (gate aux loss)").

MoE design (TPU-first): experts live as stacked parameters (E, D, H) so the
whole layer is two einsums on the MXU; top-k routing applies as a probability
mask (dense compute, exact math — a gather/shard_map EP path can slot in over
an ``expert`` mesh axis later without changing params).  The load-balancing
aux loss reaches the trainer through a ``sow("intermediates", "moe_aux", ...)``
tap.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common import ModelFoundation, TextEncoderSpec
from ..layers import AdaLayerNormZero, LayerNorm, LoRADense, MLPEmbedder, modulate, timestep_embedding
from ..sd3.transformer import posemb_2d_sincos
from ...ops import dot_product_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class HiDreamConfig:
    in_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 2560
    depth: int = 32
    num_heads: int = 20
    context_dim: int = 4096
    pooled_dim: int = 2048
    num_experts: int = 4
    top_k: int = 2
    ffn_ratio: float = 4.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls) -> "HiDreamConfig":
        return cls(in_channels=4, hidden_size=64, depth=2, num_heads=2,
                   context_dim=32, pooled_dim=32, num_experts=2, top_k=1)


class MoEFeedForward(nn.Module):
    """Top-k routed mixture of expert MLPs with a load-balancing aux tap."""

    dim: int
    num_experts: int = 4
    top_k: int = 2
    ffn_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, S, D)
        hidden = int(self.dim * self.ffn_ratio)
        gate_logits = LoRADense(
            self.num_experts, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="gate",
        )(x).astype(jnp.float32)  # (B, S, E)
        probs = jax.nn.softmax(gate_logits, axis=-1)
        top_vals, _ = jax.lax.top_k(probs, self.top_k)
        threshold = top_vals[..., -1:]
        mask = (probs >= threshold).astype(jnp.float32)
        routed = probs * mask
        routed = routed / jnp.maximum(routed.sum(-1, keepdims=True), 1e-9)

        # load-balancing aux (Switch-style): E · Σ_e mean(frac_e) · mean(prob_e)
        frac = mask.mean(axis=(0, 1))
        prob_mean = probs.mean(axis=(0, 1))
        aux = self.num_experts * jnp.sum(frac * prob_mean)
        self.sow("intermediates", "moe_aux", aux)

        w_in = self.param(
            "experts_in", nn.initializers.lecun_normal(),
            (self.num_experts, self.dim, hidden), self.param_dtype,
        )
        w_out = self.param(
            "experts_out", nn.initializers.lecun_normal(),
            (self.num_experts, hidden, self.dim), self.param_dtype,
        )
        h = jnp.einsum("bsd,edh->besh", x.astype(self.dtype), w_in.astype(self.dtype))
        h = nn.gelu(h, approximate=True)
        y = jnp.einsum("besh,ehd->besd", h, w_out.astype(self.dtype))
        return jnp.einsum("besd,bse->bsd", y, routed.astype(self.dtype))


class HiDreamBlock(nn.Module):
    config: HiDreamConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, vec):
        cfg = self.config
        dim = cfg.hidden_size
        inner = cfg.num_heads * cfg.head_dim
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, seq = x.shape[:2]
        heads = (batch, seq, cfg.num_heads, cfg.head_dim)

        mods = AdaLayerNormZero(6, name="modulation", **common)(vec, dim)
        x_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), mods[0], mods[1])
        q = LoRADense(inner, name="attn_q", **common, **lora)(x_n).reshape(heads)
        k = LoRADense(inner, name="attn_k", **common, **lora)(x_n).reshape(heads)
        v = LoRADense(inner, name="attn_v", **common, **lora)(x_n).reshape(heads)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner)
        x = x + mods[2][:, None, :] * LoRADense(dim, name="attn_proj", **common, **lora)(attn)

        x_c = LayerNorm(name="cross_norm", **common)(x)
        ctx = (batch, context.shape[1], cfg.num_heads, cfg.head_dim)
        q = LoRADense(inner, name="cross_q", **common, **lora)(x_c).reshape(heads)
        k = LoRADense(inner, name="cross_k", **common, **lora)(context).reshape(ctx)
        v = LoRADense(inner, name="cross_v", **common, **lora)(context).reshape(ctx)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner)
        x = x + LoRADense(dim, name="cross_proj", **common, **lora)(attn)

        x_f = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), mods[3], mods[4])
        moe = MoEFeedForward(
            dim=dim, num_experts=cfg.num_experts, top_k=cfg.top_k,
            ffn_ratio=cfg.ffn_ratio, name="moe_ff", **common,
        )(x_f)
        x = x + mods[5][:, None, :] * moe
        return x


class HiDreamTransformer(nn.Module):
    config: HiDreamConfig = HiDreamConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(self, latents, timesteps, context, pooled):
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        x = latents.reshape(batch, height // p, p, width // p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            batch, (height // p) * (width // p), p * p * channels
        )
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)
        x = x + posemb_2d_sincos(height // p, width // p, dim)[None].astype(self.dtype)
        txt = LoRADense(dim, name="context_in", **common, **lora)(context)
        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )
        vec = vec + MLPEmbedder(dim, name="pooled_in", **common)(pooled.astype(self.dtype))

        block_cls = nn.remat(HiDreamBlock) if self.remat else HiDreamBlock
        for layer in range(cfg.depth):
            x = block_cls(cfg, name=f"block_{layer}", **common, **lora)(x, txt, vec)

        shift, scale = AdaLayerNormZero(2, name="final_mod", **common)(vec, dim)
        x = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)
        x = LoRADense(p * p * channels, name="final_proj", **common)(x)
        x = x.reshape(batch, height // p, width // p, p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return x.astype(jnp.float32)


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
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="llama", family="llama-3", subfolder="text_encoder", max_length=256),
        TextEncoderSpec(name="clip-l", family="clip-l", subfolder="text_encoder_2", max_length=77, output="pooled"),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj")
    VAE_SCALING_FACTOR = 0.3611
    VAE_SHIFT_FACTOR = 0.1159

    def __init__(self, config: Any, arch: Optional[HiDreamConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = HiDreamConfig.tiny()
        else:
            self.arch = HiDreamConfig()
        self.moe_aux_weight = float(getattr(config, "moe_gate_loss_weight", 0.01) or 0.01)

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
        return {
            "latents": jnp.zeros((batch_size, latent, latent, self.arch.in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 32, self.arch.context_dim), jnp.float32),
            "pooled_embeds": jnp.zeros((batch_size, self.arch.pooled_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {
            "latents": prepared["noisy_latents"],
            "timesteps": prepared["timesteps"],
            "context": prepared["text_embeds"],
            "pooled": prepared["pooled_embeds"],
        }

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        return self.module.apply(variables, **self.get_model_inputs(prepared), rngs=rngs)

    def loss_fn(self, variables, rng, batch):
        """Base loss + MoE gate load-balancing aux (reference hidream gate aux)."""
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
            loss = loss + self.moe_aux_weight * gate_loss
            aux["moe_gate_loss"] = gate_loss
        return loss, aux

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {"text_embeds": batch["text_embeds"], "pooled_embeds": batch["pooled_embeds"]}

    def encode_text(self, prompts):
        llama, clip = self.text_encoders
        out_l = llama.encode(prompts)
        out_c = clip.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out_l["last_hidden_state"][i], np.float32),
                "pooled_embeds": np.asarray(
                    out_c.get("pooled", out_c["last_hidden_state"][:, 0])[i], np.float32
                ),
                "attention_mask": np.asarray(out_l["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {
            "text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds]),
            "pooled_embeds": np.stack([np.asarray(e["pooled_embeds"]) for e in embeds]),
        }

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("hidream is a flow-matching family")
