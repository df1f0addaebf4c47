"""PixArt ControlNet branch (PixArt-δ style).

Reference: helpers/models/pixart ControlNet support (SURVEY.md §2.3 — pixart
trains ControlNet in the reference).  PixArt-δ copies the first N DiT blocks;
the control signal enters as a zero-init projection added to the patchified
tokens, and each branch block's output passes through a zero-init projection
that feeds the host's next block (residual i added after host block i).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import LoRADense, MLPEmbedder, timestep_embedding
from .transformer import PixartBlock, PixartConfig, sincos_pos_embed_2d

Dtype = Any


class PixartControlNet(nn.Module):
    config: PixartConfig
    depth: int = 2
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C)
        control: jax.Array,  # (B, H, W, C)
        timesteps: jax.Array,
        context: jax.Array,  # (B, L, text_dim)
    ) -> Tuple[jax.Array, ...]:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        hh, ww = height // p, width // p

        def patchify(v: jax.Array) -> jax.Array:
            v = v.reshape(batch, hh, p, ww, p, channels)
            return jnp.transpose(v, (0, 1, 3, 2, 4, 5)).reshape(batch, hh * ww, p * p * channels)

        x = LoRADense(dim, name="patch_in", **common)(patchify(latents))
        x = x + LoRADense(
            dim, name="control_in", kernel_init=nn.initializers.zeros, **common
        )(patchify(control))
        pos = sincos_pos_embed_2d(dim, hh, ww, cfg.base_size, cfg.interpolation_scale)
        x = x + jnp.asarray(pos, self.dtype)[None]

        txt = LoRADense(dim, name="caption_in_1", **common)(context)
        txt = nn.gelu(txt, approximate=True)
        txt = LoRADense(dim, name="caption_in_2", **common)(txt)

        t_emb = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps.astype(jnp.float32), 256, time_factor=1.0).astype(self.dtype)
        )
        t6 = LoRADense(6 * dim, name="time_proj", **common)(nn.silu(t_emb)).reshape(-1, 6, dim)

        block_cls = nn.remat(PixartBlock) if self.remat else PixartBlock
        residuals = []
        for layer in range(self.depth):
            x = block_cls(cfg, name=f"block_{layer}", **common)(x, txt, t6)
            residuals.append(
                LoRADense(
                    dim, name=f"residual_proj_{layer}",
                    kernel_init=nn.initializers.zeros, **common,
                )(x)
            )
        return tuple(residuals)
