"""HeartMuLa checkpoint import: torchtune-style safetensors → flax.

Reference layout (helpers/models/heartmula/modeling_heartmula.py:90
``_map_llama_key`` documents the on-disk names): ``backbone.layers.N.attn.
{q_proj,k_proj,v_proj,output_proj}``, ``mlp.{w1,w2,w3}``,
``{sa_norm,mlp_norm,norm}.scale``, plus ``text_embeddings`` /
``audio_embeddings`` / ``unconditional_text_embedding`` tables,
``projection``, ``codebook0_head`` and the per-codebook ``audio_head``
tensor.  The MuQ continuous-segment projector (``muq_linear``) conditions a
generation-time feature stream we don't train on and is skipped.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..weight_import import _linear, _to_f32, read_safetensors


def _llama_stack(weights: Dict[str, np.ndarray], prefix: str, num_layers: int) -> Dict[str, Any]:
    stack: Dict[str, Any] = {
        "norm": {"scale": _to_f32(weights[f"{prefix}.norm.scale"])},
    }
    for i in range(num_layers):
        src = f"{prefix}.layers.{i}"
        stack[f"layers_{i}"] = {
            "sa_norm": {"scale": _to_f32(weights[f"{src}.sa_norm.scale"])},
            "mlp_norm": {"scale": _to_f32(weights[f"{src}.mlp_norm.scale"])},
            "q_proj": _linear(weights, f"{src}.attn.q_proj"),
            "k_proj": _linear(weights, f"{src}.attn.k_proj"),
            "v_proj": _linear(weights, f"{src}.attn.v_proj"),
            "o_proj": _linear(weights, f"{src}.attn.output_proj"),
            "w1": _linear(weights, f"{src}.mlp.w1"),
            "w2": _linear(weights, f"{src}.mlp.w2"),
            "w3": _linear(weights, f"{src}.mlp.w3"),
        }
    return stack


def heartmula_params(weights: Dict[str, np.ndarray], arch: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "text_embeddings": {"embedding": _to_f32(weights["text_embeddings.weight"])},
        "audio_embeddings": {"embedding": _to_f32(weights["audio_embeddings.weight"])},
        "unconditional_text_embedding": {
            "embedding": _to_f32(weights["unconditional_text_embedding.weight"])
        },
        "projection": _linear(weights, "projection"),
        "codebook0_head": _linear(weights, "codebook0_head"),
        "audio_head": _to_f32(weights["audio_head"]),
        "backbone": _llama_stack(weights, "backbone", arch["backbone"].num_layers),
        "decoder": _llama_stack(weights, "decoder", arch["decoder"].num_layers),
    }


def load_heartmula_params(model, path: str) -> Dict[str, Any]:
    from ..weight_import import _validate_against

    weights = read_safetensors(path)
    params = heartmula_params(weights, model.arch)
    template = model.init_params(jax.random.PRNGKey(0))
    _validate_against(template["params"], params, model.NAME)
    variables = dict(template)
    variables["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    return variables
