"""Base-model weight quantization.

Reference: helpers/training/quantisation/__init__.py:1257 ``quantise_model``
with quanto/torchao/bnb/SDNQ backends (SURVEY.md §2.6) — the dominant recipe is
"int8 base + bf16 LoRA".  TPU-native equivalent: symmetric per-output-channel
int8 (or fp8 on v5p+) storage for the *frozen* param tree; weights dequantize
on the fly inside the jitted step, so HBM holds int8 while the MXU still sees
bf16 operands (XLA fuses the convert+scale into each consumer matmul).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# reference precision names (cmd_args --base_model_precision) -> our modes
PRECISION_ALIASES = {
    "no_change": None,
    "int8-quanto": "int8",
    "int8-torchao": "int8",
    "int8-sdnq": "int8",
    "int8bnb": "int8",
    "int8": "int8",
    "fp8-quanto": "fp8",
    "fp8-torchao": "fp8",
    "fp8uz-quanto": "fp8",
    "fp8": "fp8",
    "nf4-bnb": "int8",  # nearest TPU-native equivalent
    "int4-quanto": "int8",
    "int2-quanto": "int8",
}


@jax.tree_util.register_pytree_node_class
class QuantizedParam:
    """One quantized weight: int8/fp8 values + per-channel fp32 scales."""

    def __init__(self, values: jax.Array, scales: jax.Array, axis: int):
        self.values = values
        self.scales = scales
        self.axis = axis

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        shape = [1] * self.values.ndim
        shape[self.axis] = self.values.shape[self.axis]
        return (self.values.astype(jnp.float32) * self.scales.reshape(shape)).astype(dtype)

    def tree_flatten(self):
        return (self.values, self.scales), self.axis

    @classmethod
    def tree_unflatten(cls, axis, children):
        return cls(children[0], children[1], axis)

    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim


def _quantize_leaf(value: jax.Array, mode: str) -> Any:
    # quantize matmul weights only; biases/norm scales stay fp32
    if value.ndim < 2:
        return value
    axis = value.ndim - 1  # per-output-channel (flax kernels are (in, out))
    reduce_axes = tuple(i for i in range(value.ndim) if i != axis)
    absmax = jnp.max(jnp.abs(value.astype(jnp.float32)), axis=reduce_axes)
    if mode == "int8":
        scales = jnp.maximum(absmax / 127.0, 1e-12)
        shape = [1] * value.ndim
        shape[axis] = value.shape[axis]
        q = jnp.clip(jnp.round(value.astype(jnp.float32) / scales.reshape(shape)), -127, 127)
        return QuantizedParam(q.astype(jnp.int8), scales, axis)
    if mode == "fp8":
        scales = jnp.maximum(absmax / 448.0, 1e-12)  # e4m3 max normal
        shape = [1] * value.ndim
        shape[axis] = value.shape[axis]
        q = (value.astype(jnp.float32) / scales.reshape(shape)).astype(jnp.float8_e4m3fn)
        return QuantizedParam(q, scales, axis)
    raise ValueError(f"unknown quantization mode {mode!r}")


def quantize_params(frozen: Dict[str, Any], mode: str = "int8") -> Dict[str, Any]:
    """Quantize the frozen base in-place-of-apply layout.

    Every 2-D ``kernel`` leaf of ``frozen["params"]`` is stored as int8/fp8 *in
    the params tree itself*, with per-output-channel fp32 scales in a parallel
    ``qscales`` collection that ``LoRADense`` reads at its use site.  Keeping
    the dequant INSIDE each block's remat scope is what makes 12B-int8 fit one
    16G chip: a top-level ``tree_map(dequantize)`` materializes the full bf16
    copy for the whole step (int8 + bf16 resident simultaneously), while the
    use-site dequant is a transient per-layer fusion.
    """
    params = frozen.get("params")
    if params is None:
        return frozen

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    q_leaves = []
    scales: Dict[str, Any] = {}
    for path, value in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        if names[-1] == "kernel" and value.ndim == 2:
            absmax = jnp.max(jnp.abs(value.astype(jnp.float32)), axis=0)
            if mode == "int8":
                s = jnp.maximum(absmax / 127.0, 1e-12)
                q = jnp.clip(jnp.round(value.astype(jnp.float32) / s[None, :]), -127, 127).astype(jnp.int8)
            elif mode == "fp8":
                s = jnp.maximum(absmax / 448.0, 1e-12)
                q = (value.astype(jnp.float32) / s[None, :]).astype(jnp.float8_e4m3fn)
            else:
                raise ValueError(f"unknown quantization mode {mode!r}")
            q_leaves.append(q)
            node = scales
            for name in names[:-1]:
                node = node.setdefault(name, {})
            node["kernel_scale"] = s.astype(jnp.float32)
        else:
            q_leaves.append(value)

    out = dict(frozen)
    out["params"] = jax.tree_util.tree_unflatten(treedef, q_leaves)
    out["qscales"] = scales
    return out


def dequantize_params(frozen: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Inverse: rebuild compute-dtype weights (export/validation surfaces).

    Handles both the use-site layout (``qscales`` collection) and the legacy
    ``QuantizedParam`` leaves."""
    out = {}
    scales = frozen.get("qscales")
    for key, tree in frozen.items():
        if key == "qscales":
            continue
        if key == "params" and scales is not None:
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            treedef = jax.tree_util.tree_structure(tree)
            leaves = []
            for path, value in flat:
                if hasattr(value, "dtype") and value.dtype in (
                    jnp.int8, jnp.dtype(jnp.float8_e4m3fn)
                ):
                    node = scales
                    ok = True
                    for k in path[:-1]:
                        name = getattr(k, "key", str(k))
                        if not isinstance(node, dict) or name not in node:
                            ok = False
                            break
                        node = node[name]
                    s = node.get("kernel_scale") if ok and isinstance(node, dict) else None
                    if s is not None:
                        value = (value.astype(jnp.float32) * s[None, :]).astype(dtype)
                leaves.append(value)
            out[key] = jax.tree_util.tree_unflatten(treedef, leaves)
            continue
        out[key] = jax.tree_util.tree_map(
            lambda v: v.dequantize(dtype) if isinstance(v, QuantizedParam) else v,
            tree,
            is_leaf=lambda v: isinstance(v, QuantizedParam),
        )
    return out


def has_quantized(frozen: Any) -> bool:
    if isinstance(frozen, dict) and "qscales" in frozen:
        return True
    found = False

    def visit(v):
        nonlocal found
        if isinstance(v, QuantizedParam):
            found = True
        return v

    jax.tree_util.tree_map(visit, frozen, is_leaf=lambda v: isinstance(v, QuantizedParam))
    return found


def resolve_precision(config: Any) -> Optional[str]:
    raw = getattr(config, "base_model_precision", None)
    if not raw or raw == "no_change":
        return None
    if raw not in PRECISION_ALIASES:
        raise ValueError(
            f"unknown base_model_precision {raw!r}; known: {sorted(PRECISION_ALIASES)}"
        )
    return PRECISION_ALIASES[raw]
