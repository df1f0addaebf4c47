"""Conditional 2-D UNet (SD 1.x / 2.x / SDXL / Kolors arches).

Reference behavior: the vendored diffusers ``UNet2DConditionModel`` used by
helpers/models/sd1x and helpers/models/sdxl (class contract in SURVEY.md §2.3).
Re-designed for TPU: NHWC layout (XLA convs tile best on NHWC), bf16 compute
with fp32 params, LoRA-aware attention/FFN projections (``lora`` collection),
optional per-block remat, attention over flattened spatial tokens through the
shared dispatcher in ``ops``.

SDXL additions (time_ids fourier + pooled-text ``add_embedding``) follow the
reference's micro-conditioning (reference: helpers/training/collate.py SDXL
time-ids; sdxl pipeline ``added_cond_kwargs``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import dot_product_attention
from .layers import LoRADense, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # transformer depth per cross-attn block (SDXL uses (1, 2, 10))
    transformer_layers: Tuple[int, ...] = (1, 1, 1)
    # which down blocks carry cross-attention (mirrored for up blocks)
    cross_attention_blocks: Tuple[bool, ...] = (True, True, True, False)
    cross_attention_dim: int = 768
    attention_head_dim: int = 64
    norm_groups: int = 32
    # SDXL micro-conditioning: 6 time-ids × fourier 256 + pooled 1280
    addition_embed_dim: int = 0  # 0 = disabled; SDXL: 2816 (=6*256 + 1280)
    addition_time_embed_dim: int = 256
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # diffusers class_embed_type="timestep" (DeepFloyd IF-II aug-level / SD x4
    # upscaler noise-level conditioning): ``class_labels`` (B,) are fourier- +
    # MLP-embedded like a second timestep and added onto temb
    class_embed_timestep: bool = False

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def sd21(cls) -> "UNetConfig":
        return cls(cross_attention_dim=1024)

    @classmethod
    def sdxl(cls) -> "UNetConfig":
        return cls(
            block_out_channels=(320, 640, 1280),
            transformer_layers=(1, 2, 10),
            cross_attention_blocks=(True, True, True),
            cross_attention_dim=2048,
            addition_embed_dim=6 * 256 + 1280,
        )

    @classmethod
    def tiny(cls) -> "UNetConfig":
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            transformer_layers=(1, 1),
            cross_attention_blocks=(True, True),
            cross_attention_dim=32,
            attention_head_dim=16,
            norm_groups=8,
        )

    @classmethod
    def tiny_xl(cls) -> "UNetConfig":
        # dims match the tiny text encoders: CLIP-L 32 + CLIP-G 64 → context 96
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            transformer_layers=(1, 1),
            cross_attention_blocks=(True, True),
            cross_attention_dim=96,
            attention_head_dim=16,
            norm_groups=8,
            addition_embed_dim=6 * 8 + 64,
            addition_time_embed_dim=8,
        )


def _gn(groups: int, channels: int) -> int:
    return groups if channels % groups == 0 else 1


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        residual = x
        h = nn.GroupNorm(_gn(self.norm_groups, x.shape[-1]), epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(h)
        t = LoRADense(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(_gn(self.norm_groups, h.shape[-1]), epsilon=1e-5, dtype=jnp.float32)(h.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name="conv_shortcut"
            )(residual)
        return residual + h


class CrossAttention(nn.Module):
    num_heads: int
    head_dim: int
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        q = LoRADense(inner, use_bias=False, name="to_q", **common)(x)
        k = LoRADense(inner, use_bias=False, name="to_k", **common)(context)
        v = LoRADense(inner, use_bias=False, name="to_v", **common)(context)
        batch, q_len = q.shape[0], q.shape[1]
        kv_len = k.shape[1]
        q = q.reshape(batch, q_len, self.num_heads, self.head_dim)
        k = k.reshape(batch, kv_len, self.num_heads, self.head_dim)
        v = v.reshape(batch, kv_len, self.num_heads, self.head_dim)
        out = dot_product_attention(q, k, v)
        out = out.reshape(batch, q_len, inner)
        return LoRADense(inner, name="to_out", **common)(out)


class PositionNet(nn.Module):
    """GLIGEN grounding-token builder (reference
    helpers/training/grounding/gligen_layers.py + diffusers PositionNet):
    fourier-embedded boxes + phrase embeds → grounding tokens, with learned
    null features filling masked-out entity slots."""

    out_dim: int
    fourier_freqs: int = 8
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, boxes: jax.Array, phrases: jax.Array, masks: jax.Array) -> jax.Array:
        # boxes (B, N, 4) in [0,1] xyxy; phrases (B, N, D_text); masks (B, N)
        freqs = 100.0 ** (jnp.arange(self.fourier_freqs) / self.fourier_freqs)
        pos = boxes[..., None] * freqs  # (B, N, 4, F)
        pos = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)
        pos = pos.reshape(boxes.shape[0], boxes.shape[1], -1)  # (B, N, 8F)
        null_pos = self.param("null_position_feature", nn.initializers.zeros, (pos.shape[-1],), self.param_dtype)
        null_text = self.param("null_text_feature", nn.initializers.zeros, (phrases.shape[-1],), self.param_dtype)
        m = masks[..., None].astype(jnp.float32)
        text = phrases.astype(jnp.float32) * m + (1.0 - m) * null_text
        pos = pos * m + (1.0 - m) * null_pos
        h = jnp.concatenate([text, pos], axis=-1).astype(self.dtype)
        dense = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.silu(LoRADense(self.out_dim // 2, name="linear_0", **dense)(h))
        h = nn.silu(LoRADense(self.out_dim // 2, name="linear_1", **dense)(h))
        return LoRADense(self.out_dim, name="linear_2", **dense)(h)


class TransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def _gate(self, name: str) -> jax.Array:
        """Zero-init fuser gate; lives in the ``lora`` collection under LoRA
        training so GLIGEN layers learn alongside the adapters."""
        if self.lora_rank > 0:
            var = self.variable(
                "lora", name, lambda rng: jnp.zeros((), self.param_dtype),
                self.make_rng("params") if self.is_initializing() else None,
            )
            return var.value
        return self.param(name, nn.initializers.zeros, (), self.param_dtype)

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array, objs: Optional[jax.Array] = None) -> jax.Array:
        common = dict(
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = x + CrossAttention(name="attn1", **common)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm1")(x)
        )
        if objs is not None:
            # GLIGEN gated self-attention fuser (diffusers
            # GatedSelfAttentionDense; injected per reference gligen_layers.py:49)
            inner = x.shape[-1]
            dense = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                         lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                         lora_algo=self.lora_algo)
            proj = LoRADense(inner, name="gligen_linear", **dense)(objs.astype(x.dtype))
            n_vis = x.shape[1]
            fused = jnp.concatenate([x, proj], axis=1)
            h = CrossAttention(name="gligen_attn", **common)(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="gligen_norm1")(fused)
            )[:, :n_vis]
            x = x + jnp.tanh(self._gate("gligen_alpha_attn")) * h
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="gligen_norm2")(x)
            gate = LoRADense(inner * 8, name="gligen_ff_proj", **dense)(h)
            a, b = jnp.split(gate, 2, axis=-1)
            h = LoRADense(inner, name="gligen_ff_out", **dense)(a * nn.gelu(b))
            x = x + jnp.tanh(self._gate("gligen_alpha_dense")) * h
        x = x + CrossAttention(name="attn2", **common)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm2")(x), context
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm3")(x)
        inner = x.shape[-1]
        dense = dict(dtype=self.dtype, param_dtype=self.param_dtype, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        # GEGLU feed-forward (diffusers layout: ff.net.0.proj, ff.net.2)
        gate = LoRADense(inner * 8, name="ff_proj", **dense)(h)
        a, b = jnp.split(gate, 2, axis=-1)
        h = a * nn.gelu(b)
        x = x + LoRADense(inner, name="ff_out", **dense)(h)
        return x


class SpatialTransformer(nn.Module):
    depth: int
    num_heads: int
    head_dim: int
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    norm_groups: int = 32
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array, objs: Optional[jax.Array] = None) -> jax.Array:
        batch, height, width, channels = x.shape
        residual = x
        h = nn.GroupNorm(_gn(self.norm_groups, channels), dtype=jnp.float32)(x.astype(jnp.float32)).astype(self.dtype)
        h = LoRADense(channels, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(h)
        h = h.reshape(batch, height * width, channels)
        for i in range(self.depth):
            h = TransformerBlock(
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                lora_algo=self.lora_algo,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )(h, context, objs)
        h = h.reshape(batch, height, width, channels)
        h = LoRADense(channels, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")(h)
        return residual + h


class Downsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        batch, height, width, channels = x.shape
        x = jax.image.resize(x, (batch, height * 2, width * 2, channels), "nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, C) noisy latents
        timesteps: jax.Array,  # (B,) integer or float timesteps
        encoder_hidden_states: jax.Array,  # (B, T, cross_dim)
        added_cond: Optional[jax.Array] = None,  # SDXL: concat(pooled, fourier(time_ids))
        controlnet_skip_residuals: Optional[Tuple[jax.Array, ...]] = None,
        controlnet_mid_residual: Optional[jax.Array] = None,
        grounding_boxes: Optional[jax.Array] = None,  # (B, N, 4) GLIGEN
        grounding_phrases: Optional[jax.Array] = None,  # (B, N, cross_dim)
        grounding_masks: Optional[jax.Array] = None,  # (B, N) 1 = real entity
        class_labels: Optional[jax.Array] = None,  # (B,) aug/noise level
    ) -> jax.Array:
        cfg = self.config
        time_dim = cfg.block_out_channels[0] * 4

        temb = timestep_embedding(timesteps, cfg.block_out_channels[0], time_factor=1.0)
        temb = LoRADense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="time_embed_0")(temb.astype(self.dtype))
        temb = nn.silu(temb)
        temb = LoRADense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="time_embed_2")(temb)

        if cfg.class_embed_timestep:
            # diffusers class_embed_type="timestep": class labels share the
            # fourier projection and get their own TimestepEmbedding MLP
            if class_labels is None:
                raise ValueError("class_embed_timestep config requires class_labels")
            cemb = timestep_embedding(class_labels, cfg.block_out_channels[0], time_factor=1.0)
            cemb = LoRADense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="class_embed_0")(cemb.astype(self.dtype))
            cemb = nn.silu(cemb)
            cemb = LoRADense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="class_embed_2")(cemb)
            temb = temb + cemb

        if cfg.addition_embed_dim:
            if added_cond is None:
                raise ValueError("SDXL-style config requires added_cond")
            aemb = LoRADense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="add_embed_0")(
                added_cond.astype(self.dtype)
            )
            aemb = nn.silu(aemb)
            aemb = LoRADense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="add_embed_2")(aemb)
            temb = temb + aemb

        context = encoder_hidden_states.astype(self.dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        objs = None
        if grounding_boxes is not None:
            # GLIGEN grounding tokens (reference grounding/gligen_layers.py)
            if grounding_masks is None:
                grounding_masks = jnp.ones(grounding_boxes.shape[:2], jnp.float32)
            objs = PositionNet(
                out_dim=cfg.cross_attention_dim, name="position_net", **common
            )(grounding_boxes, grounding_phrases, grounding_masks)

        block_cls = SpatialTransformer
        resnet_cls = ResnetBlock
        if self.remat:
            block_cls = nn.remat(SpatialTransformer)
            resnet_cls = nn.remat(ResnetBlock)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **common)(
            sample.astype(self.dtype)
        )

        skips = [x]
        # ---- down ----------------------------------------------------------------------------
        for level, out_ch in enumerate(cfg.block_out_channels):
            has_attn = cfg.cross_attention_blocks[level]
            depth = cfg.transformer_layers[min(level, len(cfg.transformer_layers) - 1)]
            for j in range(cfg.layers_per_block):
                x = resnet_cls(out_ch, cfg.norm_groups, name=f"down_{level}_res_{j}", **common)(x, temb)
                if has_attn:
                    x = block_cls(
                        depth=depth,
                        num_heads=out_ch // cfg.attention_head_dim,
                        head_dim=cfg.attention_head_dim,
                        norm_groups=cfg.norm_groups,
                        name=f"down_{level}_attn_{j}",
                        **lora,
                        **common,
                    )(x, context, objs)
                skips.append(x)
            if level < len(cfg.block_out_channels) - 1:
                x = Downsample(out_ch, name=f"down_{level}_downsample", **common)(x)
                skips.append(x)

        # ---- mid -----------------------------------------------------------------------------
        mid_ch = cfg.block_out_channels[-1]
        mid_depth = cfg.transformer_layers[min(len(cfg.block_out_channels) - 1, len(cfg.transformer_layers) - 1)]
        x = resnet_cls(mid_ch, cfg.norm_groups, name="mid_res_0", **common)(x, temb)
        x = block_cls(
            depth=mid_depth,
            num_heads=mid_ch // cfg.attention_head_dim,
            head_dim=cfg.attention_head_dim,
            norm_groups=cfg.norm_groups,
            name="mid_attn",
            **lora,
            **common,
        )(x, context, objs)
        x = resnet_cls(mid_ch, cfg.norm_groups, name="mid_res_1", **common)(x, temb)
        # mid-block tap for U-REPA alignment (reference crepa.py:756 UrepaRegularizer
        # consumes mid-block features); flattened to (B, H·W, C) token layout
        self.sow(
            "intermediates", "mid_hidden",
            x.reshape(x.shape[0], x.shape[1] * x.shape[2], x.shape[3]),
        )
        if controlnet_mid_residual is not None:
            x = x + controlnet_mid_residual

        # ControlNet residuals add onto the skip stack before the up path
        # (classic ControlNet: one zero-conv residual per skip)
        if controlnet_skip_residuals is not None:
            skips = [s + r for s, r in zip(skips, controlnet_skip_residuals)]

        # ---- up ------------------------------------------------------------------------------
        for level, out_ch in reversed(list(enumerate(cfg.block_out_channels))):
            has_attn = cfg.cross_attention_blocks[level]
            depth = cfg.transformer_layers[min(level, len(cfg.transformer_layers) - 1)]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = resnet_cls(out_ch, cfg.norm_groups, name=f"up_{level}_res_{j}", **common)(x, temb)
                if has_attn:
                    x = block_cls(
                        depth=depth,
                        num_heads=out_ch // cfg.attention_head_dim,
                        head_dim=cfg.attention_head_dim,
                        norm_groups=cfg.norm_groups,
                        name=f"up_{level}_attn_{j}",
                        **lora,
                        **common,
                    )(x, context, objs)
            if level > 0:
                x = Upsample(out_ch, name=f"up_{level}_upsample", **common)(x)

        x = nn.GroupNorm(_gn(cfg.norm_groups, x.shape[-1]), epsilon=1e-5, dtype=jnp.float32, name="conv_norm_out")(
            x.astype(jnp.float32)
        )
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **common)(x)
        return x.astype(jnp.float32)


def make_sdxl_added_cond(
    time_ids: jax.Array, pooled: jax.Array, fourier_dim: int = 256
) -> jax.Array:
    """SDXL micro-conditioning vector: pooled text ++ fourier(time_ids) flattened —
    diffusers ``get_aug_embed`` order (text_embeds FIRST, then time_embeds), which
    the pretrained ``add_embedding.linear_1`` column layout depends on.

    ``time_ids`` (B, 6): original H/W, crop top/left, target H/W
    (reference collate.py SDXL time-ids computation)."""
    batch = time_ids.shape[0]
    emb = timestep_embedding(time_ids.reshape(-1), fourier_dim, time_factor=1.0)
    emb = emb.reshape(batch, -1)
    return jnp.concatenate([pooled.astype(emb.dtype), emb], axis=-1)
