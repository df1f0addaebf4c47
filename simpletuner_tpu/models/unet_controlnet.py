"""Classic ControlNet for the UNet families (SD 1.x / 2.x / SDXL).

Reference behavior: diffusers ControlNetModel as used by the sd1x/sdxl/sd3
families' controlnet pipelines (SURVEY.md §2.3 PIPELINE_CLASSES controlnet):
a copy of the UNet encoder (conv_in → down blocks → mid) whose control signal
enters through a zero-initialized hint conv, emitting one zero-conv residual
per skip plus a mid-block residual that the host UNet adds before its up path.

The control input here is the *latent* of the conditioning image (the data
plane already pairs + encodes conditioning datasets), so no separate pixel
hint encoder tower is required.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import ResnetBlock, SpatialTransformer, UNetConfig, Downsample
from .layers import LoRADense, timestep_embedding

Dtype = Any


class UNetControlNet(nn.Module):
    config: UNetConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, C) noisy latents
        control: jax.Array,  # (B, H, W, C) conditioning latents
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        added_cond: Optional[jax.Array] = None,
    ) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
        cfg = self.config
        time_dim = cfg.block_out_channels[0] * 4
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        temb = timestep_embedding(timesteps, cfg.block_out_channels[0], time_factor=1.0)
        temb = LoRADense(time_dim, name="time_embed_0", **common)(temb.astype(self.dtype))
        temb = nn.silu(temb)
        temb = LoRADense(time_dim, name="time_embed_2", **common)(temb)
        if cfg.addition_embed_dim and added_cond is not None:
            aemb = LoRADense(time_dim, name="add_embed_0", **common)(added_cond.astype(self.dtype))
            aemb = nn.silu(aemb)
            temb = temb + LoRADense(time_dim, name="add_embed_2", **common)(aemb)

        context = encoder_hidden_states.astype(self.dtype)
        resnet_cls = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        block_cls = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **common)(
            sample.astype(self.dtype)
        )
        # zero-init hint conv: the branch starts as a no-op (standard ControlNet)
        x = x + nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, name="hint_conv",
            kernel_init=nn.initializers.zeros, **common,
        )(control.astype(self.dtype))

        def zero_conv(value, name):
            return nn.Conv(
                value.shape[-1], (1, 1), name=name, kernel_init=nn.initializers.zeros, **common
            )(value)

        residuals = [zero_conv(x, "zero_conv_0")]
        zero_index = 1
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
                        **common,
                    )(x, context)
                residuals.append(zero_conv(x, f"zero_conv_{zero_index}"))
                zero_index += 1
            if level < len(cfg.block_out_channels) - 1:
                x = Downsample(out_ch, name=f"down_{level}_downsample", **common)(x)
                residuals.append(zero_conv(x, f"zero_conv_{zero_index}"))
                zero_index += 1

        mid_ch = cfg.block_out_channels[-1]
        mid_depth = cfg.transformer_layers[min(len(cfg.block_out_channels) - 1, len(cfg.transformer_layers) - 1)]
        x = resnet_cls(mid_ch, cfg.norm_groups, name="mid_res_0", **common)(x, temb)
        x = block_cls(
            depth=mid_depth,
            num_heads=mid_ch // cfg.attention_head_dim,
            head_dim=cfg.attention_head_dim,
            norm_groups=cfg.norm_groups,
            name="mid_attn",
            **common,
        )(x, context)
        x = resnet_cls(mid_ch, cfg.norm_groups, name="mid_res_1", **common)(x, temb)
        mid_residual = zero_conv(x, "zero_conv_mid")
        return tuple(residuals), mid_residual
