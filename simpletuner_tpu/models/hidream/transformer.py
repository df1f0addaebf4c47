"""HiDream-I1 MMDiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/hidream/transformer.py (vendored
``HiDreamImageTransformer2DModel``): 16 double-stream + 32 single-stream
blocks at 20 heads x 128 (inner 2560), Flux-style axial RoPE over
[image, text] ids (image FIRST; text ids all-zero), full-width RMS q/k norms
(over the 2560-dim projection, not per head), DeepSeek-style MoE FFN on the
image stream (4 routed SwiGLU experts, top-2 with UN-normalized gate scores,
plus a half-width shared expert) and a plain SwiGLU FFN on the text stream.
Text tokens per double block = [T5-proj, llama[last], llama[block]] — the
per-block llama segment is recomputed every block and discarded after; the
[T5, llama[last]] prefix carries the residual text stream.  Single blocks run
on the merged [image, T5+llama[last]] stream with the per-block llama segment
appended then truncated (transformer.py:1835-1881).  adaLN linears are
zero-init; timestep embedding is the 256-dim [cos, sin] sinusoid of
t∈[0,1000] through a 2-layer MLP, plus a pooled CLIP-L+G embedding through
the same MLP shape (t_embedder/p_embedder).

TPU-first: the MoE computes all experts densely (two einsums over stacked
(E, d, h) params on the MXU) and weights by the routed gate scores — exact
math for E=4/top-2 at 2x FFN FLOPs, no gather/scatter, trivially shardable
over an expert mesh axis.  The gate aux loss reaches the trainer through a
``sow("intermediates", "moe_aux", ...)`` tap.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import apply_rope, dot_product_attention
from ...ops.rope import axial_rope
from ..layers import LayerNorm, LoRADense, MLPEmbedder, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class HiDreamConfig:
    in_channels: int = 16
    patch_size: int = 2
    num_heads: int = 20
    head_dim: int = 128
    depth_double: int = 16
    depth_single: int = 32
    t5_dim: int = 4096
    llama_dim: int = 4096
    pooled_dim: int = 2048
    num_experts: int = 4
    top_k: int = 2
    multiple_of: int = 256
    axes_dim: Tuple[int, int, int] = (64, 32, 32)
    rope_theta: float = 10000.0

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def ffn_inner(self) -> int:
        # reference FeedForward(dim, 4*dim): 2/3 scaling + multiple_of ceil
        inner = int(2 * (4 * self.hidden_size) / 3)
        return self.multiple_of * ((inner + self.multiple_of - 1) // self.multiple_of)

    @property
    def shared_ffn_inner(self) -> int:
        # shared expert uses hidden_dim // 2 (reference MOEFeedForward:653)
        inner = int(2 * (2 * self.hidden_size) / 3)
        return self.multiple_of * ((inner + self.multiple_of - 1) // self.multiple_of)

    @classmethod
    def tiny(cls) -> "HiDreamConfig":
        return cls(
            in_channels=4, num_heads=2, head_dim=24, depth_double=1, depth_single=2,
            t5_dim=32, llama_dim=32, pooled_dim=32, num_experts=2, top_k=1,
            multiple_of=16, axes_dim=(12, 6, 6),
        )


def _swiglu(x, w1, w2, w3):
    """Reference FeedForward: w2(silu(w1(x)) * w3(x))."""
    return w2(nn.silu(w1(x)) * w3(x))


class HiDreamFFN(nn.Module):
    """Plain SwiGLU feed-forward (text stream / shared expert)."""

    config: HiDreamConfig
    inner: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        w1 = LoRADense(self.inner, name="w1", **common, **lora)
        w2 = LoRADense(self.config.hidden_size, name="w2", **common, **lora)
        w3 = LoRADense(self.inner, name="w3", **common, **lora)
        return _swiglu(x, w1, w2, w3)


class HiDreamMoE(nn.Module):
    """DeepSeek-style MoE (reference MOEFeedForward): softmax gate, top-k with
    raw (un-normalized) scores, routed SwiGLU experts + half-width shared
    expert.  Experts are stacked (E, d, h) params computed densely."""

    config: HiDreamConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, S, D)
        cfg = self.config
        dim = cfg.hidden_size
        hidden = cfg.ffn_inner
        E = cfg.num_experts

        gate_w = self.param("gate", nn.initializers.lecun_normal(), (E, dim), self.param_dtype)
        scores = jax.nn.softmax(
            jnp.einsum("bsd,ed->bse", x.astype(jnp.float32), gate_w.astype(jnp.float32)), axis=-1
        )
        top_vals, _ = jax.lax.top_k(scores, cfg.top_k)
        mask = (scores >= top_vals[..., -1:]).astype(jnp.float32)
        routed = scores * mask  # raw scores, NOT renormalized (norm_topk_prob=False)

        # token-level load-balancing aux (reference MoEGate:606-624):
        # aux = Σ_e mean_tokens(score_e) · E·count_e/(B·S·k)   (alpha applied by the trainer)
        scores_mean = scores.reshape(-1, E).mean(axis=0)
        ce = mask.sum(axis=(0, 1)) / (mask.shape[0] * mask.shape[1] * cfg.top_k)
        aux = jnp.sum(scores_mean * ce * E)
        self.sow("intermediates", "moe_aux", aux)

        w1 = self.param("experts_w1", nn.initializers.lecun_normal(), (E, dim, hidden), self.param_dtype)
        w2 = self.param("experts_w2", nn.initializers.lecun_normal(), (E, hidden, dim), self.param_dtype)
        w3 = self.param("experts_w3", nn.initializers.lecun_normal(), (E, dim, hidden), self.param_dtype)
        xd = x.astype(self.dtype)
        h1 = jnp.einsum("bsd,edh->besh", xd, w1.astype(self.dtype))
        h3 = jnp.einsum("bsd,edh->besh", xd, w3.astype(self.dtype))
        y = jnp.einsum("besh,ehd->besd", nn.silu(h1) * h3, w2.astype(self.dtype))
        out = jnp.einsum("besd,bse->bsd", y, routed.astype(self.dtype))

        shared = HiDreamFFN(
            cfg, inner=cfg.shared_ffn_inner, name="shared_experts",
            dtype=self.dtype, param_dtype=self.param_dtype,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo,
        )(xd)
        return out + shared


def _rms_full(x, scale, eps=1e-5):
    """RMSNorm over the full projection width (reference attn q/k_rms_norm)."""
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), axis=-1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


class HiDreamDoubleBlock(nn.Module):
    """Double-stream block (reference HiDreamImageTransformerBlock): separate
    image/text projections into one joint attention, 12-way zero-init adaLN,
    MoE FFN on image, SwiGLU on text."""

    config: HiDreamConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, img, txt, adaln, rope):
        cfg = self.config
        dim = cfg.hidden_size
        batch = img.shape[0]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        ada = LoRADense(
            12 * dim, name="ada", kernel_init=nn.initializers.zeros, **common
        )(nn.silu(adaln.astype(jnp.float32)).astype(self.dtype))
        mods = [m[:, None, :] for m in jnp.split(ada, 12, axis=-1)]
        (sh_i, sc_i, g_i, shm_i, scm_i, gm_i, sh_t, sc_t, g_t, shm_t, scm_t, gm_t) = mods

        ln = LayerNorm(use_scale=False, use_bias=False, eps=1e-6, **common)
        img_n = ln(img) * (1 + sc_i) + sh_i
        txt_n = ln(txt) * (1 + sc_t) + sh_t

        inner = cfg.num_heads * cfg.head_dim
        q_i = LoRADense(inner, name="attn_q", **common, **lora)(img_n)
        k_i = LoRADense(inner, name="attn_k", **common, **lora)(img_n)
        v_i = LoRADense(inner, name="attn_v", **common, **lora)(img_n)
        q_i = _rms_full(q_i, self.param("q_rms", nn.initializers.ones, (inner,), self.param_dtype))
        k_i = _rms_full(k_i, self.param("k_rms", nn.initializers.ones, (inner,), self.param_dtype))
        q_t = LoRADense(inner, name="attn_q_t", **common, **lora)(txt_n)
        k_t = LoRADense(inner, name="attn_k_t", **common, **lora)(txt_n)
        v_t = LoRADense(inner, name="attn_v_t", **common, **lora)(txt_n)
        q_t = _rms_full(q_t, self.param("q_rms_t", nn.initializers.ones, (inner,), self.param_dtype))
        k_t = _rms_full(k_t, self.param("k_rms_t", nn.initializers.ones, (inner,), self.param_dtype))

        img_len = img.shape[1]
        to_heads = lambda a: a.reshape(batch, a.shape[1], cfg.num_heads, cfg.head_dim)
        q = to_heads(jnp.concatenate([q_i, q_t], axis=1))  # image FIRST
        k = to_heads(jnp.concatenate([k_i, k_t], axis=1))
        v = to_heads(jnp.concatenate([v_i, v_t], axis=1))
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v).reshape(batch, -1, inner)
        attn_i, attn_t = attn[:, :img_len], attn[:, img_len:]
        img = img + g_i * LoRADense(dim, name="attn_proj", **common, **lora)(attn_i)
        txt = txt + g_t * LoRADense(dim, name="attn_proj_t", **common, **lora)(attn_t)

        img_f = ln(img) * (1 + scm_i) + shm_i
        img = img + gm_i * HiDreamMoE(cfg, name="ff_i", **common, **lora)(img_f)
        txt_f = ln(txt) * (1 + scm_t) + shm_t
        txt = txt + gm_t * HiDreamFFN(cfg, inner=cfg.ffn_inner, name="ff_t", **common, **lora)(txt_f)
        return img, txt


class HiDreamSingleBlock(nn.Module):
    """Single-stream block (reference HiDreamImageSingleTransformerBlock):
    one projection set over the merged stream, 6-way adaLN, MoE FFN."""

    config: HiDreamConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, adaln, rope):
        cfg = self.config
        dim = cfg.hidden_size
        batch, seq = x.shape[:2]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        ada = LoRADense(
            6 * dim, name="ada", kernel_init=nn.initializers.zeros, **common
        )(nn.silu(adaln.astype(jnp.float32)).astype(self.dtype))
        sh, sc, g, shm, scm, gm = (m[:, None, :] for m in jnp.split(ada, 6, axis=-1))

        ln = LayerNorm(use_scale=False, use_bias=False, eps=1e-6, **common)
        x_n = ln(x) * (1 + sc) + sh
        inner = cfg.num_heads * cfg.head_dim
        q = LoRADense(inner, name="attn_q", **common, **lora)(x_n)
        k = LoRADense(inner, name="attn_k", **common, **lora)(x_n)
        v = LoRADense(inner, name="attn_v", **common, **lora)(x_n)
        q = _rms_full(q, self.param("q_rms", nn.initializers.ones, (inner,), self.param_dtype))
        k = _rms_full(k, self.param("k_rms", nn.initializers.ones, (inner,), self.param_dtype))
        q = q.reshape(batch, seq, cfg.num_heads, cfg.head_dim)
        k = k.reshape(batch, seq, cfg.num_heads, cfg.head_dim)
        v = v.reshape(batch, seq, cfg.num_heads, cfg.head_dim)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner)
        x = x + g * LoRADense(dim, name="attn_proj", **common, **lora)(attn)

        x_f = ln(x) * (1 + scm) + shm
        x = x + gm * HiDreamMoE(cfg, name="ff_i", **common, **lora)(x_f)
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
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C)
        timesteps: jax.Array,  # (B,) flow σ ∈ (0,1); embedded at σ·1000
        t5_embeds: jax.Array,  # (B, S_t5, t5_dim)
        llama_embeds: jax.Array,  # (B, L_sel, S_ll, llama_dim) selected hidden layers
        pooled: jax.Array,  # (B, pooled_dim) CLIP-L+G projections
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        hh, ww = height // p, width // p
        img_len = hh * ww
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        # --- embeddings -----------------------------------------------------------------
        adaln = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps.astype(jnp.float32), 256).astype(self.dtype)
        )
        adaln = adaln + MLPEmbedder(dim, name="pooled_in", **common)(pooled.astype(self.dtype))

        x = latents.astype(self.dtype).reshape(batch, hh, p, ww, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, img_len, p * p * channels)
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)

        n_blocks = cfg.depth_double + cfg.depth_single
        n_sel = llama_embeds.shape[1]
        t5 = LoRADense(dim, name="caption_proj_t5", use_bias=False, **common, **lora)(
            t5_embeds.astype(self.dtype)
        )
        llama = [
            LoRADense(dim, name=f"caption_proj_{i}", use_bias=False, **common, **lora)(
                llama_embeds[:, i % n_sel].astype(self.dtype)
            )
            for i in range(n_blocks)
        ]

        # persistent text stream = [T5, llama[last]] (reference
        # initial_encoder_hidden_states, transformer.py:1649-1655)
        txt = jnp.concatenate([t5, llama[n_blocks - 1]], axis=1)
        txt_base_len = txt.shape[1]
        llama_len = llama[0].shape[1]

        # --- RoPE: [image(0, row, col), text(0,0,0)] — image FIRST ----------------------
        rows = jnp.repeat(jnp.arange(hh, dtype=jnp.float32), ww)
        cols = jnp.tile(jnp.arange(ww, dtype=jnp.float32), hh)
        img_ids = jnp.stack([jnp.zeros_like(rows), rows, cols], axis=-1)
        txt_len = txt_base_len + llama_len
        ids = jnp.concatenate([img_ids, jnp.zeros((txt_len, 3), jnp.float32)], axis=0)
        cos, sin = axial_rope(cfg.axes_dim, ids[None], cfg.rope_theta)
        rope = (cos, sin)

        double_cls = nn.remat(HiDreamDoubleBlock) if self.remat else HiDreamDoubleBlock
        single_cls = nn.remat(HiDreamSingleBlock) if self.remat else HiDreamSingleBlock

        for layer in range(cfg.depth_double):
            cur_txt = jnp.concatenate([txt, llama[layer]], axis=1)
            x, txt_out = double_cls(cfg, name=f"double_{layer}", **common, **lora)(
                x, cur_txt, adaln, rope
            )
            txt = txt_out[:, :txt_base_len]  # per-block llama segment discarded
            self.sow("intermediates", f"double_{layer}_hidden", x)

        # --- merged single stream [image, T5+llama[last]] -------------------------------
        stream = jnp.concatenate([x, txt], axis=1)
        stream_len = stream.shape[1]
        for layer in range(cfg.depth_single):
            block_id = cfg.depth_double + layer
            merged = jnp.concatenate([stream, llama[block_id]], axis=1)
            merged = single_cls(cfg, name=f"single_{layer}", **common, **lora)(
                merged, adaln, rope
            )
            stream = merged[:, :stream_len]
            self.sow("intermediates", f"single_{layer}_hidden", stream[:, :img_len])

        # --- final (OutEmbed): zero-init modulation + projection ------------------------
        x = stream[:, :img_len]
        ada = LoRADense(
            2 * dim, name="final_mod", kernel_init=nn.initializers.zeros, **common
        )(nn.silu(adaln.astype(jnp.float32)).astype(self.dtype))
        shift, scale = jnp.split(ada, 2, axis=-1)
        x = LayerNorm(use_scale=False, use_bias=False, eps=1e-6, **common)(x)
        x = x * (1 + scale[:, None]) + shift[:, None]
        x = LoRADense(p * p * channels, name="final_proj", **common, **lora)(x)
        x = x.reshape(batch, hh, ww, p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return x.astype(jnp.float32)
