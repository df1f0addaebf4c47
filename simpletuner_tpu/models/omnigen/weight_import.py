"""OmniGen checkpoint import: diffusers OmniGenTransformer2DModel → flax.

Reference layout: Shitao/OmniGen-v1-diffusers ``transformer/`` shards
(helpers/models/omnigen/transformer.py:313) — Phi-3 blocks with
``layers.N.self_attn.to_{q,k,v}`` / ``to_out.0`` / ``mlp.gate_up_proj`` /
``down_proj``, patchifier convs, AdaLayerNorm out.  The 2×2 patch conv maps
onto our Dense patchifier by (out,in,kh,kw) → ((kh,kw,in), out) reshape; the
fixed sincos pos-embed buffer is recomputed, not loaded.

The interleaved input-image branch (``patch_embedding.input_image_proj``,
multimodal token splicing) is not part of the training path and is skipped.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..weight_import import _linear, _to_f32, read_safetensors


def _patch_conv(weights: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    w = _to_f32(weights[f"{key}.weight"])  # (out, in, kh, kw)
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])  # ((kh·kw·in), out)
    out = {"kernel": np.ascontiguousarray(kernel)}
    if f"{key}.bias" in weights:
        out["bias"] = _to_f32(weights[f"{key}.bias"])
    return out


def _rms(weights: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {"weight": _to_f32(weights[f"{key}.weight"])}


def omnigen_params_from_diffusers(weights: Dict[str, np.ndarray], arch) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "output_image_proj": _patch_conv(weights, "patch_embedding.output_image_proj"),
        "embed_tokens": {"embedding": _to_f32(weights["embed_tokens.weight"])},
        "t_embedder": {
            "linear_1": _linear(weights, "t_embedder.linear_1"),
            "linear_2": _linear(weights, "t_embedder.linear_2"),
        },
        "time_token": {
            "linear_1": _linear(weights, "time_token.linear_1"),
            "linear_2": _linear(weights, "time_token.linear_2"),
        },
        "norm": _rms(weights, "norm"),
        "norm_out_linear": _linear(weights, "norm_out.linear"),
        "proj_out": _linear(weights, "proj_out"),
    }
    for i in range(arch.num_layers):
        src = f"layers.{i}"
        params[f"layers_{i}"] = {
            "input_layernorm": _rms(weights, f"{src}.input_layernorm"),
            "post_attention_layernorm": _rms(weights, f"{src}.post_attention_layernorm"),
            "to_q": _linear(weights, f"{src}.self_attn.to_q"),
            "to_k": _linear(weights, f"{src}.self_attn.to_k"),
            "to_v": _linear(weights, f"{src}.self_attn.to_v"),
            "to_out": _linear(weights, f"{src}.self_attn.to_out.0"),
            "gate_up_proj": _linear(weights, f"{src}.mlp.gate_up_proj"),
            "down_proj": _linear(weights, f"{src}.mlp.down_proj"),
        }
    return params


def load_omnigen_params(model, path: str) -> Dict[str, Any]:
    """Import + validate against the model's own init tree."""
    from ..weight_import import _validate_against

    weights = read_safetensors(path)
    params = omnigen_params_from_diffusers(weights, model.arch)
    template = model.init_params(jax.random.PRNGKey(0))
    _validate_against(template["params"], params, model.NAME)
    variables = dict(template)
    variables["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    return variables
