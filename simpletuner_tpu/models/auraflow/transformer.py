"""AuraFlow DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/auraflow/transformer.py (vendored
AuraFlowTransformer2DModel): learned position table with centered-crop
selection, (c, pi, pj)-ordered patch features, 8 learned register tokens
prepended to the projected caption, joint MMDiT blocks (context-first concat)
followed by single-stream DiT blocks over the fused sequence, fp32-LayerNorm
qk norms WITHOUT affine params, SwiGLU FFN with find_multiple(2·4d/3, 256)
hidden width, bias-free linears throughout, and AuraFlow's peculiar residual:
the attention output reaches the residual stream only *through* the FFN
branch (out = residual + gate_mlp·ff(norm2(residual + gate_msa·attn))).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import dot_product_attention
from ..layers import LayerNorm, LoRADense, MLPEmbedder, timestep_embedding

Dtype = Any


def find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


@dataclasses.dataclass(frozen=True)
class AuraFlowConfig:
    in_channels: int = 4
    patch_size: int = 2
    hidden_size: int = 3072
    depth_double: int = 4
    depth_single: int = 32
    num_heads: int = 12
    text_dim: int = 2048
    mlp_ratio: float = 4.0
    pos_embed_max_size: int = 4096  # 64x64 grid = 1024px latents
    num_register_tokens: int = 8

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def ffn_hidden(self) -> int:
        return find_multiple(int(2 * (self.hidden_size * self.mlp_ratio) / 3), 256)

    @classmethod
    def tiny(cls) -> "AuraFlowConfig":
        return cls(
            hidden_size=64, depth_double=1, depth_single=2, num_heads=2, text_dim=32,
            pos_embed_max_size=64,
        )


def _fp32_ln(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class AuraFF(nn.Module):
    """SwiGLU: out_projection(silu(linear_1(x)) * linear_2(x)), bias-free."""

    dim: int
    hidden: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x):
        common = dict(
            dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo,
        )
        a = LoRADense(self.hidden, name="linear_1", **common)(x)
        b = LoRADense(self.hidden, name="linear_2", **common)(x)
        return LoRADense(self.dim, name="out_projection", **common)(nn.silu(a) * b)


def _adaln_zero(vec, dim, name, module, dtype, param_dtype):
    """norm1.linear(silu(temb)) -> 6 mods (shift/scale/gate msa, shift/scale/gate mlp)."""
    lin = LoRADense(
        6 * dim, use_bias=False, dtype=dtype, param_dtype=param_dtype, name=name,
        kernel_init=nn.initializers.zeros,
    )
    mods = lin(nn.silu(vec.astype(jnp.float32)).astype(dtype))
    return jnp.split(mods, 6, axis=-1)


class AuraJointBlock(nn.Module):
    config: AuraFlowConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, ctx, vec):
        cfg = self.config
        dim = cfg.hidden_size
        head_dim = cfg.head_dim
        batch = x.shape[0]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nb = dict(use_bias=False, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        sh, sc, g_msa, sh_mlp, sc_mlp, g_mlp = _adaln_zero(
            vec, dim, "norm1_lin", self, self.dtype, self.param_dtype
        )
        c_sh, c_sc, c_g_msa, c_sh_mlp, c_sc_mlp, c_g_mlp = _adaln_zero(
            vec, dim, "norm1_context_lin", self, self.dtype, self.param_dtype
        )

        x_n = _fp32_ln(x) * (1 + sc[:, None]) + sh[:, None]
        c_n = _fp32_ln(ctx) * (1 + c_sc[:, None]) + c_sh[:, None]

        def heads(t, seq):
            return t.reshape(batch, seq, cfg.num_heads, head_dim)

        q_i = heads(LoRADense(dim, name="attn_q", **common, **nb)(x_n), x.shape[1])
        k_i = heads(LoRADense(dim, name="attn_k", **common, **nb)(x_n), x.shape[1])
        v_i = heads(LoRADense(dim, name="attn_v", **common, **nb)(x_n), x.shape[1])
        q_c = heads(LoRADense(dim, name="attn_add_q", **common, **nb)(c_n), ctx.shape[1])
        k_c = heads(LoRADense(dim, name="attn_add_k", **common, **nb)(c_n), ctx.shape[1])
        v_c = heads(LoRADense(dim, name="attn_add_v", **common, **nb)(c_n), ctx.shape[1])
        # context-first concat (diffusers AuraFlowAttnProcessor2_0)
        q = jnp.concatenate([q_c, q_i], axis=1)
        k = jnp.concatenate([k_c, k_i], axis=1)
        v = jnp.concatenate([v_c, v_i], axis=1)
        q = _fp32_ln(q)
        k = _fp32_ln(k)
        attn = dot_product_attention(q, k, v).reshape(batch, -1, dim)
        ctx_len = ctx.shape[1]
        attn_c, attn_i = attn[:, :ctx_len], attn[:, ctx_len:]

        attn_i = LoRADense(dim, name="attn_proj", **common, **nb)(attn_i)
        attn_c = LoRADense(dim, name="attn_add_proj", **common, **nb)(attn_c)

        ff = AuraFF(dim, cfg.ffn_hidden, name="ff", **common,
                    lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        ff_c = AuraFF(dim, cfg.ffn_hidden, name="ff_context", **common,
                      lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        # AuraFlow residual: attention enters only through the FF branch
        mid = _fp32_ln(x + g_msa[:, None] * attn_i) * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        x = x + g_mlp[:, None] * ff(mid)
        c_mid = _fp32_ln(ctx + c_g_msa[:, None] * attn_c) * (1 + c_sc_mlp[:, None]) + c_sh_mlp[:, None]
        ctx = ctx + c_g_mlp[:, None] * ff_c(c_mid)
        return x, ctx


class AuraSingleBlock(nn.Module):
    config: AuraFlowConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, stream, vec):
        cfg = self.config
        dim = cfg.hidden_size
        batch, seq = stream.shape[:2]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nb = dict(use_bias=False, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        sh, sc, g_msa, sh_mlp, sc_mlp, g_mlp = _adaln_zero(
            vec, dim, "norm1_lin", self, self.dtype, self.param_dtype
        )
        s_n = _fp32_ln(stream) * (1 + sc[:, None]) + sh[:, None]
        shape = (batch, seq, cfg.num_heads, cfg.head_dim)
        q = LoRADense(dim, name="attn_q", **common, **nb)(s_n).reshape(shape)
        k = LoRADense(dim, name="attn_k", **common, **nb)(s_n).reshape(shape)
        v = LoRADense(dim, name="attn_v", **common, **nb)(s_n).reshape(shape)
        q = _fp32_ln(q)
        k = _fp32_ln(k)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, dim)
        attn = LoRADense(dim, name="attn_proj", **common, **nb)(attn)

        ff = AuraFF(dim, cfg.ffn_hidden, name="ff", **common,
                    lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        mid = _fp32_ln(stream + g_msa[:, None] * attn) * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        return stream + g_mlp[:, None] * ff(mid)


class AuraFlowTransformer(nn.Module):
    config: AuraFlowConfig = AuraFlowConfig()
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
        timesteps: jax.Array,  # (B,) sigma in [0, 1]
        context: jax.Array,  # (B, L, text_dim)
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        hh, ww = height // p, width // p

        # patchify with (c, pi, pj) feature order (reference AuraFlowPatchEmbed)
        x = latents.reshape(batch, hh, p, ww, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(batch, hh * ww, channels * p * p)
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)

        # learned position table, centered crop (reference pe_selection_index)
        pos_table = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.1),
            (cfg.pos_embed_max_size, dim),
            self.param_dtype,
        )
        grid_max = int(cfg.pos_embed_max_size ** 0.5)
        starth = grid_max // 2 - hh // 2
        startw = grid_max // 2 - ww // 2
        rows = np.arange(starth, starth + hh)
        cols = np.arange(startw, startw + ww)
        idx = (rows[:, None] * grid_max + cols[None, :]).reshape(-1)
        x = x + pos_table[jnp.asarray(idx)].astype(self.dtype)[None]

        ctx = LoRADense(dim, use_bias=False, name="context_in", **common, **lora)(context)
        registers = self.param(
            "register_tokens",
            nn.initializers.normal(stddev=0.02),
            (cfg.num_register_tokens, dim),
            self.param_dtype,
        )
        ctx = jnp.concatenate(
            [jnp.broadcast_to(registers[None].astype(self.dtype), (batch,) + registers.shape), ctx],
            axis=1,
        )
        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )

        double_cls = nn.remat(AuraJointBlock) if self.remat else AuraJointBlock
        for layer in range(cfg.depth_double):
            x, ctx = double_cls(cfg, name=f"double_{layer}", **common, **lora)(x, ctx, vec)
            self.sow("intermediates", f"double_{layer}_hidden", x)

        stream = jnp.concatenate([ctx, x], axis=1)
        ctx_len = ctx.shape[1]
        single_cls = nn.remat(AuraSingleBlock) if self.remat else AuraSingleBlock
        for layer in range(cfg.depth_single):
            stream = single_cls(cfg, name=f"single_{layer}", **common, **lora)(stream, vec)
            self.sow("intermediates", f"single_{layer}_hidden", stream[:, ctx_len:])
        x = stream[:, ctx_len:]

        # AuraFlowPreFinalBlock: SCALE first, then shift; bias-free linear
        final = LoRADense(2 * dim, use_bias=False, name="final_mod", **common)(
            nn.silu(vec.astype(jnp.float32)).astype(self.dtype)
        )
        scale, shift = jnp.split(final, 2, axis=-1)
        x = x * (1 + scale[:, None]) + shift[:, None]
        x = LoRADense(p * p * channels, use_bias=False, name="final_proj", **common)(x)
        x = x.reshape(batch, hh, ww, p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return x.astype(jnp.float32)
