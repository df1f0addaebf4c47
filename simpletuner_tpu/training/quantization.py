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


def quantize_params(params: Any, mode: str = "int8") -> Any:
    """Quantize every >=2-D leaf of a frozen param tree."""
    return jax.tree_util.tree_map(lambda v: _quantize_leaf(v, mode), params)


def dequantize_params(params: Any, dtype=jnp.bfloat16) -> Any:
    """Inverse: lazily rebuild compute-dtype weights inside the jitted step."""
    return jax.tree_util.tree_map(
        lambda v: v.dequantize(dtype) if isinstance(v, QuantizedParam) else v,
        params,
        is_leaf=lambda v: isinstance(v, QuantizedParam),
    )


def has_quantized(params: Any) -> bool:
    found = False

    def visit(v):
        nonlocal found
        if isinstance(v, QuantizedParam):
            found = True
        return v

    jax.tree_util.tree_map(visit, params, is_leaf=lambda v: isinstance(v, QuantizedParam))
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
