"""Cosmos3 frozen reasoner in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/cosmos3/reasoner.py (``Cosmos3Reasoner``):
a frozen Qwen3-VL causal text stack (the MoT's understanding pathway split
out as its own component checkpoint) run once over the reasoning/instruction
token sequence.  Each layer's ROTATED keys and raw values are collected as a
memory state (reasoner.py:118-149 — ``reasoner_kv = {"k": k_und, "v":
v_und}`` with k taken after q/k RMS norm + mRoPE), which the generator-only
``Cosmos3OmniTransformer`` replays: generation tokens attend over
[reasoner_k, gen_k] (transformer.py:420-451).

Only the shipped dense-silu configuration is ported (``hidden_act='silu'``,
affine head-dim RMS q/k norms); the nemotron relu² variant is not.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import LoRADense
from .transformer import _apply_mrope, _rms, cosmos3_mrope

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Cosmos3ReasonerConfig:
    """Defaults mirror ``Cosmos3ReasonerConfig`` (reasoner.py:42-62)."""

    vocab_size: int = 151936
    hidden_size: int = 4096
    head_dim: int = 128
    num_heads: int = 32
    num_kv_heads: int = 8
    num_layers: int = 36
    intermediate_size: int = 12288
    rope_theta: float = 5_000_000.0
    rope_axes_dim: Tuple[int, int, int] = (24, 20, 20)
    rms_norm_eps: float = 1e-6
    attention_bias: bool = False

    @classmethod
    def tiny(cls) -> "Cosmos3ReasonerConfig":
        return cls(
            vocab_size=64, hidden_size=32, head_dim=16, num_heads=2, num_kv_heads=1,
            num_layers=2, intermediate_size=64, rope_axes_dim=(4, 2, 2),
        )

    def as_transformer_config(self):
        """The matching MoT config (shared rope/head geometry) for replay."""
        from .transformer import Cosmos3Config

        return Cosmos3Config(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            head_dim=self.head_dim, num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads, num_layers=self.num_layers,
            intermediate_size=self.intermediate_size, rope_theta=self.rope_theta,
            rope_axes_dim=self.rope_axes_dim, rms_norm_eps=self.rms_norm_eps,
            attention_bias=self.attention_bias,
        )


class Cosmos3ReasonerLayer(nn.Module):
    """One causal GQA layer (reasoner.py:157-195); returns the hidden state
    plus the (roped k, raw v) memory pair."""

    config: Cosmos3ReasonerConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin):
        cfg = self.config
        dh = cfg.head_dim
        eps = cfg.rms_norm_eps
        n_rep = cfg.num_heads // cfg.num_kv_heads
        batch, seq = x.shape[:2]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=cfg.attention_bias)

        scale = lambda name, dim: self.param(name, nn.initializers.ones, (dim,), self.param_dtype)
        x_n = _rms(x, scale("input_layernorm", cfg.hidden_size), eps)
        q = LoRADense(cfg.num_heads * dh, name="to_q", **common)(x_n).reshape(batch, seq, cfg.num_heads, dh)
        k = LoRADense(cfg.num_kv_heads * dh, name="to_k", **common)(x_n).reshape(batch, seq, cfg.num_kv_heads, dh)
        v = LoRADense(cfg.num_kv_heads * dh, name="to_v", **common)(x_n).reshape(batch, seq, cfg.num_kv_heads, dh)
        q = _rms(q, scale("norm_q", dh), eps)
        k = _rms(k, scale("norm_k", dh), eps)
        q = _apply_mrope(q, cos, sin)
        k = _apply_mrope(k, cos, sin)

        qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
        kf = jnp.repeat(k, n_rep, axis=2).astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = jnp.repeat(v, n_rep, axis=2).astype(jnp.float32).transpose(0, 2, 1, 3)
        logits = qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(dh)
        mask = jnp.tril(jnp.ones((seq, seq), bool))
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
        attn = (jax.nn.softmax(logits, axis=-1) @ vf).transpose(0, 2, 1, 3)
        attn = attn.reshape(batch, seq, cfg.num_heads * dh).astype(self.dtype)

        x = x + LoRADense(cfg.hidden_size, name="to_out", **common)(attn)
        x_n = _rms(x, scale("post_attention_layernorm", cfg.hidden_size), eps)
        gate = LoRADense(cfg.intermediate_size, name="gate_proj", **common)(x_n)
        up = LoRADense(cfg.intermediate_size, name="up_proj", **common)(x_n)
        x = x + LoRADense(cfg.hidden_size, name="down_proj", **common)(nn.silu(gate) * up)
        return x, (k, v)


class Cosmos3Reasoner(nn.Module):
    """Frozen reasoner stack: token ids + mRoPE ids → per-layer (k, v)
    memory (reasoner.py:279-297)."""

    config: Cosmos3ReasonerConfig = Cosmos3ReasonerConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text_ids: jax.Array, position_ids: jax.Array):
        """text_ids (B, S); position_ids (B, 3, S) → tuple of num_layers
        (k, v) pairs, k roped (B, S, kv_heads, head_dim)."""
        cfg = self.config
        embed = self.param(
            "embed_tokens", nn.initializers.normal(stddev=0.02),
            (cfg.vocab_size, cfg.hidden_size), self.param_dtype,
        )
        x = jnp.take(embed, text_ids, axis=0).astype(self.dtype)
        cos, sin = cosmos3_mrope(cfg.as_transformer_config(), position_ids)
        memory = []
        for layer in range(cfg.num_layers):
            x, kv = Cosmos3ReasonerLayer(
                cfg, dtype=self.dtype, param_dtype=self.param_dtype, name=f"layer_{layer}"
            )(x, cos, sin)
            memory.append(kv)
        return tuple(memory)


def cosmos3_reasoner_params(w: dict, config: Cosmos3ReasonerConfig) -> dict:
    """Map a ``Cosmos3Reasoner`` component state dict (reasoner.py layer
    naming: layers.N.self_attn.to_q / mlp.gate_proj / input_layernorm) to
    our tree."""

    def lin(key):
        out = {"kernel": np.ascontiguousarray(np.asarray(w[f"{key}.weight"], np.float32).T)}
        if f"{key}.bias" in w:
            out["bias"] = np.asarray(w[f"{key}.bias"], np.float32)
        return out

    params: dict = {"embed_tokens": np.asarray(w["embed_tokens.weight"], np.float32)}
    for i in range(config.num_layers):
        src = f"layers.{i}"
        params[f"layer_{i}"] = {
            "to_q": lin(f"{src}.self_attn.to_q"),
            "to_k": lin(f"{src}.self_attn.to_k"),
            "to_v": lin(f"{src}.self_attn.to_v"),
            "to_out": lin(f"{src}.self_attn.to_out"),
            "norm_q": np.asarray(w[f"{src}.self_attn.norm_q.weight"], np.float32),
            "norm_k": np.asarray(w[f"{src}.self_attn.norm_k.weight"], np.float32),
            "input_layernorm": np.asarray(w[f"{src}.input_layernorm.weight"], np.float32),
            "post_attention_layernorm": np.asarray(
                w[f"{src}.post_attention_layernorm.weight"], np.float32
            ),
            "gate_proj": lin(f"{src}.mlp.gate_proj"),
            "up_proj": lin(f"{src}.mlp.up_proj"),
            "down_proj": lin(f"{src}.mlp.down_proj"),
        }
    return {"params": params}


def load_cosmos3_reasoner(config: Cosmos3ReasonerConfig, path: str) -> dict:
    from ..weight_import import read_safetensors

    return cosmos3_reasoner_params(read_safetensors(path), config)
