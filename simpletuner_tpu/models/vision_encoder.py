"""DINOv2-class vision teacher for CREPA (flax).

Reference loads DINOv2 via torch.hub as the CREPA feature encoder
(helpers/training/crepa.py:597-631 _load_encoder/_forward_encoder: patch
tokens ``x_norm_patchtokens`` preferred).  TPU-native: a minimal ViT with the
DINOv2 specifics that matter numerically — cls token + learned position
embeddings (bilinearly interpolated to the input grid), pre-norm blocks with
LayerScale, SwiGLU or GELU MLPs, final LayerNorm, patch tokens returned — and
an importer from the HF ``Dinov2Model`` torch-safetensors layout so real
teacher checkpoints load from a local directory (zero-egress build).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VisionEncoderConfig:
    patch_size: int = 14
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layerscale: bool = True
    swiglu: bool = False  # dinov2-giant uses SwiGLU; s/b/l use GELU MLP
    image_size: int = 518  # position-embedding grid basis

    @classmethod
    def dinov2_small(cls) -> "VisionEncoderConfig":
        return cls(hidden_size=384, depth=12, num_heads=6)

    @classmethod
    def dinov2_base(cls) -> "VisionEncoderConfig":
        return cls()

    @classmethod
    def dinov2_large(cls) -> "VisionEncoderConfig":
        return cls(hidden_size=1024, depth=24, num_heads=16)

    @classmethod
    def dinov2_giant(cls) -> "VisionEncoderConfig":
        return cls(hidden_size=1536, depth=40, num_heads=24, swiglu=True)

    @classmethod
    def tiny(cls) -> "VisionEncoderConfig":
        return cls(patch_size=8, hidden_size=32, depth=2, num_heads=2, image_size=64)


_PRESETS = {
    "dinov2_vits14": VisionEncoderConfig.dinov2_small,
    "dinov2_vitb14": VisionEncoderConfig.dinov2_base,
    "dinov2_vitl14": VisionEncoderConfig.dinov2_large,
    "dinov2_vitg14": VisionEncoderConfig.dinov2_giant,
    "tiny": VisionEncoderConfig.tiny,
}


def preset_config(name: str) -> VisionEncoderConfig:
    key = str(name).strip().lower().replace("-", "_")
    aliases = {
        "dino_v2_s": "dinov2_vits14", "dinov2_s": "dinov2_vits14",
        "dino_v2_b": "dinov2_vitb14", "dinov2_b": "dinov2_vitb14",
        "dino_v2_l": "dinov2_vitl14", "dinov2_l": "dinov2_vitl14",
        "dino_v2_g": "dinov2_vitg14", "dinov2_g": "dinov2_vitg14",
    }
    key = aliases.get(key, key)
    if key not in _PRESETS:
        raise ValueError(f"unknown vision-encoder preset {name!r}; known: {sorted(_PRESETS)}")
    return _PRESETS[key]()


class _Block(nn.Module):
    config: VisionEncoderConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dim = cfg.hidden_size
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        qkv = nn.Dense(dim * 3, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = q.shape
        hd = dim // cfg.num_heads
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_heads, hd)
        v = v.reshape(b, s, cfg.num_heads, hd)
        from ..ops import dot_product_attention

        attn = dot_product_attention(q, k, v).reshape(b, s, dim)
        attn = nn.Dense(dim, dtype=self.dtype, name="proj")(attn)
        if cfg.layerscale:
            ls1 = self.param("ls1", nn.initializers.constant(1e-5), (dim,), jnp.float32)
            attn = attn * ls1.astype(attn.dtype)
        x = x + attn
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        inner = int(dim * cfg.mlp_ratio)
        if cfg.swiglu:
            # dinov2 SwiGLU ffn: hidden = (2/3)*4*dim rounded to multiples of 8
            inner = (int(dim * cfg.mlp_ratio * 2 / 3) + 7) // 8 * 8
            gate = nn.Dense(inner, dtype=self.dtype, name="w1")(h)
            up = nn.Dense(inner, dtype=self.dtype, name="w2")(h)
            m = nn.Dense(dim, dtype=self.dtype, name="w3")(nn.silu(gate) * up)
        else:
            m = nn.Dense(inner, dtype=self.dtype, name="fc1")(h)
            m = nn.Dense(dim, dtype=self.dtype, name="fc2")(nn.gelu(m))
        if cfg.layerscale:
            ls2 = self.param("ls2", nn.initializers.constant(1e-5), (dim,), jnp.float32)
            m = m * ls2.astype(m.dtype)
        return x + m


class VisionTransformer(nn.Module):
    """Returns the final-norm PATCH tokens (B, N, D) — the reference's
    ``x_norm_patchtokens``."""

    config: VisionEncoderConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:  # (B, H, W, 3), normalized
        cfg = self.config
        ps = cfg.patch_size
        b, h, w, _ = images.shape
        x = nn.Conv(
            cfg.hidden_size, (ps, ps), strides=(ps, ps), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(images.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, cfg.hidden_size)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.hidden_size), jnp.float32
        )
        base_grid = cfg.image_size // ps
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, base_grid * base_grid + 1, cfg.hidden_size), jnp.float32,
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (base_grid, base_grid):
            grid = patch_pos.reshape(1, base_grid, base_grid, cfg.hidden_size)
            grid = jax.image.resize(grid, (1, gh, gw, cfg.hidden_size), method="bilinear")
            patch_pos = grid.reshape(1, gh * gw, cfg.hidden_size)
        x = x + patch_pos.astype(x.dtype)
        cls_tok = (cls + cls_pos).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, cfg.hidden_size)), x], axis=1)
        for i in range(cfg.depth):
            x = _Block(cfg, dtype=self.dtype, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return x[:, 1:]  # patch tokens


# ---------------------------------------------------------------------------------
# importer: HF Dinov2Model torch-safetensors -> this module's params
# ---------------------------------------------------------------------------------


def _t(w):  # torch (out, in) -> flax (in, out)
    return np.asarray(w, np.float32).T.copy()


def load_dinov2_params(path: str, config: VisionEncoderConfig) -> Dict[str, Any]:
    """Import facebook/dinov2-* (HF ``Dinov2Model``) weights from a local dir
    or .safetensors file.  Key layout: embeddings.{cls_token,position_embeddings,
    patch_embeddings.projection.*}, encoder.layer.N.{norm1,attention.attention.
    {query,key,value},attention.output.dense,layer_scale1.lambda1,mlp.fc1/fc2,
    layer_scale2.lambda1,norm2}, layernorm.*"""
    from safetensors.numpy import load_file

    if os.path.isdir(path):
        candidates = [os.path.join(path, "model.safetensors")]
        candidates += [os.path.join(path, f) for f in sorted(os.listdir(path))
                       if f.endswith(".safetensors")]
        file = next((c for c in candidates if os.path.isfile(c)), None)
        if file is None:
            raise FileNotFoundError(f"no .safetensors under {path!r}")
    else:
        file = path
    w = load_file(file)
    w = {k.removeprefix("dinov2."): v for k, v in w.items()}

    params: Dict[str, Any] = {
        "cls_token": np.asarray(w["embeddings.cls_token"], np.float32),
        "pos_embed": np.asarray(w["embeddings.position_embeddings"], np.float32),
        "patch_embed": {
            "kernel": np.asarray(
                w["embeddings.patch_embeddings.projection.weight"], np.float32
            ).transpose(2, 3, 1, 0).copy(),
            "bias": np.asarray(w["embeddings.patch_embeddings.projection.bias"], np.float32),
        },
        "norm": {
            "scale": np.asarray(w["layernorm.weight"], np.float32),
            "bias": np.asarray(w["layernorm.bias"], np.float32),
        },
    }
    for i in range(config.depth):
        src = f"encoder.layer.{i}"
        qkv = np.concatenate(
            [_t(w[f"{src}.attention.attention.{name}.weight"]) for name in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [np.asarray(w[f"{src}.attention.attention.{name}.bias"], np.float32)
             for name in ("query", "key", "value")]
        )
        block: Dict[str, Any] = {
            "norm1": {"scale": np.asarray(w[f"{src}.norm1.weight"], np.float32),
                      "bias": np.asarray(w[f"{src}.norm1.bias"], np.float32)},
            "qkv": {"kernel": qkv, "bias": qkv_b},
            "proj": {"kernel": _t(w[f"{src}.attention.output.dense.weight"]),
                     "bias": np.asarray(w[f"{src}.attention.output.dense.bias"], np.float32)},
            "norm2": {"scale": np.asarray(w[f"{src}.norm2.weight"], np.float32),
                      "bias": np.asarray(w[f"{src}.norm2.bias"], np.float32)},
        }
        if config.layerscale:
            block["ls1"] = np.asarray(w[f"{src}.layer_scale1.lambda1"], np.float32)
            block["ls2"] = np.asarray(w[f"{src}.layer_scale2.lambda1"], np.float32)
        if config.swiglu:
            block["w1"] = {"kernel": _t(w[f"{src}.mlp.w12.weight"][: w[f"{src}.mlp.w12.weight"].shape[0] // 2]),
                           "bias": np.asarray(w[f"{src}.mlp.w12.bias"], np.float32)[: w[f"{src}.mlp.w12.bias"].shape[0] // 2]}
            block["w2"] = {"kernel": _t(w[f"{src}.mlp.w12.weight"][w[f"{src}.mlp.w12.weight"].shape[0] // 2:]),
                           "bias": np.asarray(w[f"{src}.mlp.w12.bias"], np.float32)[w[f"{src}.mlp.w12.bias"].shape[0] // 2:]}
            block["w3"] = {"kernel": _t(w[f"{src}.mlp.w3.weight"]),
                           "bias": np.asarray(w[f"{src}.mlp.w3.bias"], np.float32)}
        else:
            block["fc1"] = {"kernel": _t(w[f"{src}.mlp.fc1.weight"]),
                            "bias": np.asarray(w[f"{src}.mlp.fc1.bias"], np.float32)}
            block["fc2"] = {"kernel": _t(w[f"{src}.mlp.fc2.weight"]),
                            "bias": np.asarray(w[f"{src}.mlp.fc2.bias"], np.float32)}
        params[f"block_{i}"] = block
    return params


def build_vision_teacher(
    encoder_name: Optional[str],
    encoder_path: Optional[str],
    rng: Optional[jax.Array] = None,
) -> Tuple[VisionTransformer, Dict[str, Any], int]:
    """(module, params, feature_dim) for the CREPA teacher.

    A local checkpoint path loads real weights; preset "tiny" random-inits
    (tests).  A preset WITHOUT a local path fails loudly — this build cannot
    reach torch.hub (reference downloads dinov2 there)."""
    name = encoder_name or "dinov2_vitg14"
    config = preset_config(name)
    module = VisionTransformer(config)
    if encoder_path:
        params = load_dinov2_params(str(encoder_path), config)
    elif str(name).lower() == "tiny":
        dummy = jnp.zeros((1, config.image_size, config.image_size, 3), jnp.float32)
        init_rng = jax.random.PRNGKey(0) if rng is None else rng
        params = module.init(init_rng, dummy)["params"]
    else:
        raise ValueError(
            f"crepa encoder {name!r} needs crepa_encoder_path pointing at a "
            "local Dinov2Model checkpoint (no torch.hub egress in this build)"
        )
    return module, params, config.hidden_size
