"""Flux ControlNet branch.

Reference: the Flux ControlNet pipeline class (helpers/models/flux PIPELINE_CLASSES
controlnet + ``controlnet_init``/``controlnet_predict`` contract, SURVEY.md §2.3).
Architecture mirrors diffusers' FluxControlNetModel behavior: a shallow copy of
the double-stream stack consuming (noisy tokens + zero-init'd control tokens),
emitting one zero-init'd residual per block that the host transformer adds to
its image stream.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import axial_rope
from ..layers import LoRADense, MLPEmbedder, timestep_embedding
from .transformer import DoubleStreamBlock, FluxConfig

Dtype = Any


class FluxControlNet(nn.Module):
    """Control branch: N double blocks + per-block zero-init residual projections."""

    config: FluxConfig
    depth: int = 2  # controlnet blocks (reference checkpoints use 2-6)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # (B, S, in_channels) packed noisy latents
        control: jax.Array,  # (B, S, in_channels) packed control latents
        img_ids: jax.Array,
        txt: jax.Array,
        txt_ids: jax.Array,
        timesteps: jax.Array,
        vec: jax.Array,
        guidance: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, ...]:
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        img_tok = LoRADense(dim, name="img_in", **common)(img)
        # zero-init so the branch starts as an identity (standard ControlNet init)
        img_tok = img_tok + LoRADense(
            dim, name="control_in", kernel_init=nn.initializers.zeros, **common
        )(control)
        txt_tok = LoRADense(dim, name="txt_in", **common)(txt)

        cond = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )
        cond = cond + MLPEmbedder(dim, name="vector_in", **common)(vec.astype(self.dtype))
        if cfg.guidance_embed:
            if guidance is None:
                guidance = jnp.ones_like(timesteps)
            cond = cond + MLPEmbedder(dim, name="guidance_in", **common)(
                timestep_embedding(guidance, 256).astype(self.dtype)
            )

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        rope = axial_rope(cfg.axes_dim, ids, cfg.theta)

        block_cls = nn.remat(DoubleStreamBlock) if self.remat else DoubleStreamBlock
        residuals = []
        for layer in range(self.depth):
            img_tok, txt_tok = block_cls(cfg, name=f"double_{layer}", **common)(
                img_tok, txt_tok, cond, rope, None
            )
            residuals.append(
                LoRADense(
                    dim,
                    name=f"residual_proj_{layer}",
                    kernel_init=nn.initializers.zeros,
                    **common,
                )(img_tok)
            )
        return tuple(residuals)
