"""SD3 ControlNet branch.

Reference: helpers/models/sd3 ControlNet support (SURVEY.md §2.3 — sd3 trains
ControlNet in the reference; diffusers SD3ControlNetModel behavior): a copy of
the first N MMDiT blocks consuming patchified noisy latents plus a zero-init
projection of the patchified control latents, emitting one zero-init residual
per branch block; the host transformer adds residual[i·N/depth] after each of
its blocks (interval spread).  Mirrors the Flux branch (flux/controlnet.py).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import LoRADense, MLPEmbedder, timestep_embedding
from .transformer import MMDiTBlock, SD3Config, posemb_2d_sincos

Dtype = Any


class SD3ControlNet(nn.Module):
    config: SD3Config
    depth: int = 2
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C) noisy latents
        control: jax.Array,  # (B, H, W, C) control latents (same VAE space)
        timesteps: jax.Array,
        context: jax.Array,
        pooled: jax.Array,
    ) -> Tuple[jax.Array, ...]:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def patchify(v: jax.Array) -> jax.Array:
            v = v.reshape(batch, height // p, p, width // p, p, channels)
            return jnp.transpose(v, (0, 1, 3, 2, 4, 5)).reshape(
                batch, (height // p) * (width // p), p * p * channels
            )

        x = LoRADense(dim, name="patch_in", **common)(patchify(latents))
        # zero-init so the branch starts as an identity (standard ControlNet)
        x = x + LoRADense(
            dim, name="control_in", kernel_init=nn.initializers.zeros, **common
        )(patchify(control))
        hh, ww = height // p, width // p
        if cfg.pos_embed_max_size:
            side = cfg.pos_embed_max_size
            table = self.param(
                "pos_embed", nn.initializers.normal(stddev=0.02),
                (side, side, dim), self.param_dtype,
            )
            top, left = (side - hh) // 2, (side - ww) // 2
            pos = table[top: top + hh, left: left + ww].reshape(hh * ww, dim)
        else:
            pos = posemb_2d_sincos(hh, ww, dim)
        x = x + pos[None].astype(self.dtype)

        txt = LoRADense(dim, name="context_in", **common)(context)
        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )
        vec = vec + MLPEmbedder(dim, name="pooled_in", **common)(pooled.astype(self.dtype))

        block_cls = nn.remat(MMDiTBlock) if self.remat else MMDiTBlock
        residuals = []
        for layer in range(self.depth):
            x, txt = block_cls(
                cfg, context_pre_only=False, name=f"block_{layer}", **common
            )(x, txt, vec)
            residuals.append(
                LoRADense(
                    dim, name=f"residual_proj_{layer}",
                    kernel_init=nn.initializers.zeros, **common,
                )(x)
            )
        return tuple(residuals)
