"""Decoder-LLM text encoders (Gemma-2, Qwen2.5, Llama-3, Mistral-3, ChatGLM).

Reference behavior: families whose ``TEXT_ENCODER_CONFIGURATION`` names an LLM
(reference per-family model.py: sana/lumina2 → Gemma-2, qwen_image/kandinsky5
→ Qwen2.5-VL text stack, hunyuanvideo/hidream → Llama-3, flux2 → Mistral-3,
kolors → ChatGLM-6B) load the HF causal LM and condition on its hidden states.
Here one flax module covers every layout — they are all pre-norm RoPE
transformers differing only in:

  * RMSNorm placement (gemma-2 sandwiches attention/FFN with pre+post norms)
    and parameterization (gemma stores ``weight`` as an offset from 1),
  * activation (silu vs gelu-tanh), qkv biases (qwen2, chatglm),
  * grouped-query sizes, rope theta / partial-rotary-with-interleaved-pairs
    (chatglm rotates only half the head dims, paired even/odd),
  * gemma's sqrt(hidden) embedding scale and attention-logit softcapping.

TPU-first: one jitted forward, causal mask + padding mask fused by XLA,
GQA expanded before the attention kernel, bf16 activations / fp32 params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LLMEncoderConfig:
    arch: str = "llama"  # llama | qwen2 | mistral | gemma2 | chatglm
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    qkv_bias: bool = False
    act: str = "silu"  # silu | gelu_tanh
    embed_scale: bool = False        # gemma: embeddings * sqrt(hidden)
    sandwich_norms: bool = False     # gemma2 pre+post attention/FFN norms
    rms_unit_offset: bool = False    # gemma RMSNorm: x * (1 + weight)
    attn_softcap: float = 0.0        # gemma2: 50.0
    query_scale: Optional[float] = None  # gemma2: query_pre_attn_scalar ** -0.5
    partial_rotary: float = 1.0      # chatglm: 0.5
    rope_interleaved: bool = False   # chatglm pairs even/odd dims
    fused_qkv: bool = False          # chatglm query_key_value

    # ---- real-model presets (dims from the published HF configs) ----------------
    @classmethod
    def gemma2_2b(cls) -> "LLMEncoderConfig":
        return cls(
            arch="gemma2", vocab_size=256000, hidden_size=2304, intermediate_size=9216,
            num_layers=26, num_heads=8, num_kv_heads=4, head_dim=256, rope_theta=10000.0,
            rms_eps=1e-6, act="gelu_tanh", embed_scale=True, sandwich_norms=True,
            rms_unit_offset=True, attn_softcap=50.0, query_scale=256.0 ** -0.5,
        )

    @classmethod
    def qwen25_7b(cls) -> "LLMEncoderConfig":
        return cls(
            arch="qwen2", vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_layers=28, num_heads=28, num_kv_heads=4, head_dim=128,
            rope_theta=1000000.0, rms_eps=1e-6, qkv_bias=True,
        )

    @classmethod
    def llama3_8b(cls) -> "LLMEncoderConfig":
        return cls()

    @classmethod
    def mistral3_24b(cls) -> "LLMEncoderConfig":
        return cls(
            arch="mistral", vocab_size=131072, hidden_size=5120, intermediate_size=32768,
            num_layers=40, num_heads=32, num_kv_heads=8, head_dim=128,
            rope_theta=100000000.0, rms_eps=1e-5,
        )

    @classmethod
    def chatglm3_6b(cls) -> "LLMEncoderConfig":
        return cls(
            arch="chatglm", vocab_size=65024, hidden_size=4096, intermediate_size=13696,
            num_layers=28, num_heads=32, num_kv_heads=2, head_dim=128,
            rope_theta=10000.0, rms_eps=1e-5, qkv_bias=True, fused_qkv=True,
            partial_rotary=0.5, rope_interleaved=True,
        )

    @classmethod
    def tiny(cls, arch: str = "llama") -> "LLMEncoderConfig":
        base = dict(
            vocab_size=1000, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, num_kv_heads=1, head_dim=16, rope_theta=10000.0,
        )
        if arch == "gemma2":
            return cls(
                arch=arch, act="gelu_tanh", embed_scale=True, sandwich_norms=True,
                rms_unit_offset=True, attn_softcap=50.0, query_scale=16.0 ** -0.5,
                rms_eps=1e-6, **base,
            )
        if arch == "qwen2":
            return cls(arch=arch, qkv_bias=True, rms_eps=1e-6, **base)
        if arch == "chatglm":
            return cls(
                arch=arch, qkv_bias=True, fused_qkv=True, partial_rotary=0.5,
                rope_interleaved=True, **base,
            )
        return cls(arch=arch, **base)


def _rms(x: jax.Array, weight: jax.Array, eps: float, unit_offset: bool) -> jax.Array:
    xf = x.astype(jnp.float32)
    norm = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    w = weight.astype(jnp.float32)
    if unit_offset:
        w = 1.0 + w
    return (norm * w).astype(x.dtype)


class _Norm(nn.Module):
    eps: float
    unit_offset: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.unit_offset else nn.initializers.ones
        w = self.param("scale", init, (x.shape[-1],), self.param_dtype)
        return _rms(x, w, self.eps, self.unit_offset)


def _rope_tables(cfg: LLMEncoderConfig, seq: int):
    rot = int(cfg.head_dim * cfg.partial_rotary)
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, rot, 2, dtype=np.float64) / rot))
    pos = np.arange(seq, dtype=np.float64)
    freqs = np.outer(pos, inv)  # (S, rot/2)
    return jnp.asarray(np.cos(freqs), jnp.float32), jnp.asarray(np.sin(freqs), jnp.float32)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, cfg: LLMEncoderConfig) -> jax.Array:
    """x: (B, S, H, D).  Half-split (HF llama) or interleaved-pairs (chatglm),
    optionally on a partial prefix of the head dims."""
    rot = int(cfg.head_dim * cfg.partial_rotary)
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    xf = x_rot.astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    if cfg.rope_interleaved:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
    else:
        half = rot // 2
        c2 = jnp.concatenate([c, c], axis=-1)
        s2 = jnp.concatenate([s, s], axis=-1)
        rotated = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
        out = xf * c2 + rotated * s2
    return jnp.concatenate([out.astype(x.dtype), x_pass], axis=-1) if rot < cfg.head_dim else out.astype(x.dtype)


class LLMBlock(nn.Module):
    config: LLMEncoderConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        cfg = self.config
        batch, seq = x.shape[:2]
        dense = lambda feats, name, bias: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        norm = lambda name: _Norm(
            cfg.rms_eps, cfg.rms_unit_offset, self.param_dtype, name=name
        )

        h = norm("input_norm")(x)
        if cfg.fused_qkv:
            qkv = dense(
                (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim, "qkv_proj", cfg.qkv_bias
            )(h)
            q, k, v = jnp.split(
                qkv,
                [cfg.num_heads * cfg.head_dim, (cfg.num_heads + cfg.num_kv_heads) * cfg.head_dim],
                axis=-1,
            )
        else:
            q = dense(cfg.num_heads * cfg.head_dim, "q_proj", cfg.qkv_bias)(h)
            k = dense(cfg.num_kv_heads * cfg.head_dim, "k_proj", cfg.qkv_bias)(h)
            v = dense(cfg.num_kv_heads * cfg.head_dim, "v_proj", cfg.qkv_bias)(h)
        q = q.reshape(batch, seq, cfg.num_heads, cfg.head_dim)
        k = k.reshape(batch, seq, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(batch, seq, cfg.num_kv_heads, cfg.head_dim)
        q = _apply_rope(q, cos, sin, cfg)
        k = _apply_rope(k, cos, sin, cfg)
        repeat = cfg.num_heads // cfg.num_kv_heads
        if repeat > 1:
            k = jnp.repeat(k, repeat, axis=2)
            v = jnp.repeat(v, repeat, axis=2)

        scale = cfg.query_scale if cfg.query_scale is not None else cfg.head_dim ** -0.5
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * scale
        if cfg.attn_softcap:
            logits = jnp.tanh(logits / cfg.attn_softcap) * cfg.attn_softcap
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
        attn = attn.reshape(batch, seq, cfg.num_heads * cfg.head_dim).astype(self.dtype)
        attn_out = dense(cfg.hidden_size, "o_proj", False)(attn)
        if cfg.sandwich_norms:
            attn_out = norm("post_attn_norm")(attn_out)
        x = x + attn_out

        pre_ff = norm("pre_ff_norm")(x) if cfg.sandwich_norms else norm("post_input_norm")(x)
        if cfg.arch == "chatglm":
            fused = dense(2 * cfg.intermediate_size, "gate_up_proj", False)(pre_ff)
            gate, up = jnp.split(fused, 2, axis=-1)
        else:
            gate = dense(cfg.intermediate_size, "gate_proj", False)(pre_ff)
            up = dense(cfg.intermediate_size, "up_proj", False)(pre_ff)
        act = nn.silu(gate) if cfg.act == "silu" else nn.gelu(gate, approximate=True)
        ff = dense(cfg.hidden_size, "down_proj", False)(act * up)
        if cfg.sandwich_norms:
            ff = norm("post_ff_norm")(ff)
        return x + ff


class LLMEncoder(nn.Module):
    """Causal LM trunk; returns final-norm hidden states (B, S, hidden)."""

    config: LLMEncoderConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        output_hidden_states: bool = False,
    ):
        """Final-norm hidden states; with ``output_hidden_states`` also the
        per-layer taps (embeddings + each block output, transformers
        convention) as a (num_layers+1)-tuple — consumed by families that
        stack tapped layers (krea2 text fusion)."""
        cfg = self.config
        batch, seq = input_ids.shape
        embed = self.param(
            "embed_tokens",
            nn.initializers.normal(stddev=0.02),
            (cfg.vocab_size, cfg.hidden_size),
            self.param_dtype,
        )
        x = jnp.take(embed, input_ids, axis=0).astype(self.dtype)
        if cfg.embed_scale:
            x = x * jnp.asarray(cfg.hidden_size ** 0.5, self.dtype)

        cos, sin = _rope_tables(cfg, seq)
        causal = jnp.tril(jnp.ones((seq, seq), jnp.bool_))[None, None]
        if attention_mask is not None:
            causal = causal & attention_mask.astype(jnp.bool_)[:, None, None, :]

        taps = [x]
        for i in range(cfg.num_layers):
            x = LLMBlock(cfg, dtype=self.dtype, param_dtype=self.param_dtype, name=f"layers_{i}")(
                x, cos, sin, causal
            )
            taps.append(x)
        out = _Norm(cfg.rms_eps, cfg.rms_unit_offset, self.param_dtype, name="final_norm")(x)
        if output_hidden_states:
            return out, tuple(taps)
        return out


# ---------------------------------------------------------------------------------
# HF-checkpoint import (torch safetensors -> our param tree)
# ---------------------------------------------------------------------------------


def llm_params_from_hf(weights: Dict[str, np.ndarray], cfg: LLMEncoderConfig) -> Dict[str, Any]:
    from .weight_import import _to_f32

    def lin(key: str, bias_key: Optional[str] = None):
        out = {"kernel": np.ascontiguousarray(_to_f32(weights[key]).T)}
        if bias_key and bias_key in weights:
            out["bias"] = _to_f32(weights[bias_key])
        return out

    if cfg.arch == "chatglm":
        p = "transformer.encoder.layers"
        params: Dict[str, Any] = {
            "embed_tokens": _to_f32(weights["transformer.embedding.word_embeddings.weight"]),
            "final_norm": {"scale": _to_f32(weights["transformer.encoder.final_layernorm.weight"])},
        }
        for i in range(cfg.num_layers):
            src = f"{p}.{i}"
            params[f"layers_{i}"] = {
                "input_norm": {"scale": _to_f32(weights[f"{src}.input_layernorm.weight"])},
                "qkv_proj": lin(
                    f"{src}.self_attention.query_key_value.weight",
                    f"{src}.self_attention.query_key_value.bias",
                ),
                "o_proj": lin(f"{src}.self_attention.dense.weight"),
                "post_input_norm": {"scale": _to_f32(weights[f"{src}.post_attention_layernorm.weight"])},
                "gate_up_proj": lin(f"{src}.mlp.dense_h_to_4h.weight"),
                "down_proj": lin(f"{src}.mlp.dense_4h_to_h.weight"),
            }
        return params

    params = {
        "embed_tokens": _to_f32(weights["model.embed_tokens.weight"]),
        "final_norm": {"scale": _to_f32(weights["model.norm.weight"])},
    }
    for i in range(cfg.num_layers):
        src = f"model.layers.{i}"
        layer: Dict[str, Any] = {
            "input_norm": {"scale": _to_f32(weights[f"{src}.input_layernorm.weight"])},
            "q_proj": lin(f"{src}.self_attn.q_proj.weight", f"{src}.self_attn.q_proj.bias"),
            "k_proj": lin(f"{src}.self_attn.k_proj.weight", f"{src}.self_attn.k_proj.bias"),
            "v_proj": lin(f"{src}.self_attn.v_proj.weight", f"{src}.self_attn.v_proj.bias"),
            "o_proj": lin(f"{src}.self_attn.o_proj.weight"),
            "gate_proj": lin(f"{src}.mlp.gate_proj.weight"),
            "up_proj": lin(f"{src}.mlp.up_proj.weight"),
            "down_proj": lin(f"{src}.mlp.down_proj.weight"),
        }
        if cfg.sandwich_norms:
            layer["post_attn_norm"] = {"scale": _to_f32(weights[f"{src}.post_attention_layernorm.weight"])}
            layer["pre_ff_norm"] = {"scale": _to_f32(weights[f"{src}.pre_feedforward_layernorm.weight"])}
            layer["post_ff_norm"] = {"scale": _to_f32(weights[f"{src}.post_feedforward_layernorm.weight"])}
        else:
            layer["post_input_norm"] = {"scale": _to_f32(weights[f"{src}.post_attention_layernorm.weight"])}
        params[f"layers_{i}"] = layer
    return params
