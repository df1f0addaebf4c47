"""Text-encoder LoRA adapters (reference trainer.py:4307 '"lora" in
model_type and train_text_encoder': PEFT LoraConfig over the CLIP text
encoders, save_hooks exporting "text_encoder."-prefixed PEFT layers).

TPU-native shape: the HF Flax CLIP module stays untouched; adapters live as a
pytree mirroring the encoder params at the PEFT default target modules
(q/k/v/out projections), and ``merge_te_lora`` folds W' = W + (α/r)·A@B inside
the jitted train step — the text encoder is small (CLIP-L 123M / CLIP-G 694M),
so a per-step merge is a rounding error next to the diffusion backbone while
keeping the HF module's apply path byte-identical.  Gradients flow to the
adapter through the merge (it is linear in A and B).

Trainable collections: ``te_lora = {"te_0": tree, "te_1": tree, ...}`` (one
entry per trainable CLIP encoder, reference trains text_encoder_1/2 only —
"The third text encoder is not trained for SD3", trainer.py:3396); the frozen
full encoder params ride ``frozen["te_base"]`` with the same keys.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# PEFT default LoRA target modules for CLIPTextModel (reference passes
# save_hooks' text-encoder LoRA through PEFT's default CLIP mapping)
TE_LORA_TARGETS: Tuple[str, ...] = ("q_proj", "k_proj", "v_proj", "out_proj")

# diffusers per-encoder safetensors prefixes (save_hooks.py text_encoder
# LoRA layers land under these)
TE_PREFIXES: Tuple[str, ...] = ("text_encoder", "text_encoder_2", "text_encoder_3")

# α/r applied in the merge; static at trace time (same trace-context-global
# pattern as layers._LORA_DROPOUT).  Exported files carry raw A/B plus the
# alpha in metadata, like PEFT.
_TE_LORA_SCALE: float = 1.0


def set_te_lora_scale(scale: float) -> None:
    global _TE_LORA_SCALE
    _TE_LORA_SCALE = float(scale)


def get_te_lora_scale() -> float:
    return _TE_LORA_SCALE


def _is_target(name: str, node: Any) -> bool:
    return (
        name in TE_LORA_TARGETS
        and isinstance(node, dict)
        and "kernel" in node
        and getattr(node["kernel"], "ndim", 0) == 2
    )


def init_te_lora(te_params: Dict[str, Any], rank: int, rng: jax.Array) -> Dict[str, Any]:
    """Adapter tree for one encoder: every q/k/v/out projection gets
    {lora_A: (in, r) kaiming-uniform, lora_B: (r, out) zeros} (PEFT init)."""
    from ..models.layers import lora_a_initializer

    out: Dict[str, Any] = {}

    def walk(tree: Dict[str, Any], dst: Dict[str, Any], key: jax.Array) -> None:
        for i, (name, node) in enumerate(sorted(tree.items())):
            sub_key = jax.random.fold_in(key, i)
            if _is_target(name, node):
                in_features, out_features = node["kernel"].shape
                dst[name] = {
                    "lora_A": np.asarray(
                        lora_a_initializer(rank)(sub_key, (in_features, rank), jnp.float32)
                    ),
                    "lora_B": np.zeros((rank, out_features), np.float32),
                }
            elif isinstance(node, dict):
                child: Dict[str, Any] = {}
                walk(node, child, sub_key)
                if child:
                    dst[name] = child

    walk(te_params, out, rng)
    if not out:
        raise ValueError(
            f"no LoRA target modules {TE_LORA_TARGETS} found in text-encoder "
            "params; TE LoRA supports CLIP-family encoders"
        )
    return out


def merge_te_lora(te_base: Dict[str, Any], te_lora: Dict[str, Any]) -> Dict[str, Any]:
    """W' = W + (α/r)·A@B at every adapted projection; other leaves pass
    through by reference.  jit-safe and differentiable in the adapter."""
    scale = _TE_LORA_SCALE

    def walk(base: Dict[str, Any], lora: Dict[str, Any]) -> Dict[str, Any]:
        merged = dict(base)
        for name, node in lora.items():
            if "lora_A" in node:
                kernel = base[name]["kernel"]
                delta = scale * jnp.dot(
                    node["lora_A"].astype(jnp.float32), node["lora_B"].astype(jnp.float32)
                )
                merged[name] = {
                    **base[name],
                    "kernel": (kernel.astype(jnp.float32) + delta).astype(kernel.dtype),
                }
            else:
                merged[name] = walk(base[name], node)
        return merged

    return walk(te_base, te_lora)


def merge_te_collections(te_base: Dict[str, Any], te_lora: Dict[str, Any]) -> Dict[str, Any]:
    """Merge per-encoder: {"te_0": ..., ...} -> apply-ready te_params dict."""
    return {key: merge_te_lora(te_base[key], te_lora[key]) for key in te_lora}


# ---------------------------------------------------------------------------------
# PEFT-layout export / import (reference save_hooks text_encoder LoRA layers)
# ---------------------------------------------------------------------------------


def te_lora_state_dict(
    te_lora: Dict[str, Any], alpha: Optional[float] = None
) -> Dict[str, np.ndarray]:
    """{"text_encoder.text_model.encoder.layers.0.self_attn.q_proj.lora_A.weight":
    (r, in), ...} — PEFT torch layout (A is (r, in) = our (in, r) transposed)."""
    tensors: Dict[str, np.ndarray] = {}

    def walk(tree: Dict[str, Any], prefix: str) -> None:
        for name, node in sorted(tree.items()):
            dotted = f"{prefix}.{name}"
            if "lora_A" in node:
                tensors[f"{dotted}.lora_A.weight"] = np.asarray(node["lora_A"], np.float32).T.copy()
                tensors[f"{dotted}.lora_B.weight"] = np.asarray(node["lora_B"], np.float32).T.copy()
                if alpha is not None:
                    rank = np.asarray(node["lora_A"]).shape[1]
                    tensors[f"{dotted}.alpha"] = np.asarray(float(alpha), np.float32)
                    del rank
            else:
                walk(node, dotted)

    for key, tree in sorted(te_lora.items()):
        index = int(key.split("_")[1])
        walk(tree, TE_PREFIXES[index])
    return tensors


def te_lora_from_state_dict(
    tensors: Dict[str, np.ndarray], template: Dict[str, Any]
) -> Dict[str, Any]:
    """Inverse of ``te_lora_state_dict``: PEFT tensors -> adapter pytree with
    the template's structure.  Missing adapted modules fail loudly."""
    out: Dict[str, Any] = {}
    missing = []

    def walk(tree: Dict[str, Any], prefix: str, dst: Dict[str, Any]) -> None:
        for name, node in tree.items():
            dotted = f"{prefix}.{name}"
            if "lora_A" in node:
                a_key, b_key = f"{dotted}.lora_A.weight", f"{dotted}.lora_B.weight"
                if a_key not in tensors or b_key not in tensors:
                    missing.append(dotted)
                    continue
                dst[name] = {
                    "lora_A": np.ascontiguousarray(np.asarray(tensors[a_key], np.float32).T),
                    "lora_B": np.ascontiguousarray(np.asarray(tensors[b_key], np.float32).T),
                }
            else:
                child: Dict[str, Any] = {}
                walk(node, dotted, child)
                dst[name] = child

    for key, tree in template.items():
        index = int(key.split("_")[1])
        dst: Dict[str, Any] = {}
        walk(tree, TE_PREFIXES[index], dst)
        out[key] = dst
    if missing:
        raise KeyError(f"text-encoder LoRA file is missing adapted modules: {missing[:5]}")
    return out
