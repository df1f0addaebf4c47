"""Block-quantized optimizer states (8-bit / 4-bit / fp8 Adam moments).

Reference behavior: bitsandbytes 8-bit optimizers and torchao's low-bit Adam
variants (reference: helpers/training/optimizer_param.py:532-660) store the
Adam moments quantized with per-block scales, dequantizing on the fly each
step.  Here the same memory profile is native jnp: moments live as ``int8``,
``int4``, or ``float8_e4m3fn`` arrays with one fp32 scale per block, and the
(de)quantization rides inside the jitted update — XLA fuses it into the
elementwise update, so the cost is bandwidth, which is exactly what shrinking
the state buys back.

Quantization scheme (matches bnb's dynamic blockwise absmax in spirit):
  * flatten each leaf, pad to a multiple of ``block_size``, reshape (nb, B)
  * scale = absmax(block) / qmax;  q = round(x / scale)
  * second moment (non-negative) uses the unsigned range for int types
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

DEFAULT_BLOCK = 256


def _pad_len(n: int, block: int) -> int:
    return (-n) % block


# Dynamic (log-spaced) integer codes.  A *linear* int8 code diverges in Adam:
# within a block whose absmax is large, small second-moment entries round to
# zero and the update blows up through 1/(sqrt(0)+eps).  bnb solves this with
# its "dynamic map" 8-bit code; we use the same idea as a pure log-linear
# grid: code 0 ↔ 0, code ±i ↔ ±exp(ln_min + (i-1)·step) · blockmax, giving a
# constant ~4.4% relative error across 2^16 of dynamic range (int8) instead of
# absolute error proportional to the block max.
INT4_PACKED = "int4_packed"  # two 4-bit codes per uint8 byte (jnp.int4 arrays
# are rejected by some PJRT plugins, and packing is the honest 0.5 B/elem)

_INT8_LEVELS = 127
_INT8_RANGE_LN = 16.0 * 0.6931471805599453   # 2^16
_INT4_LEVELS = 7                              # signed: sign x 7 levels
_INT4_RANGE_LN = 8.0 * 0.6931471805599453    # 2^8
_UINT4_LEVELS = 15                            # unsigned (2nd moment): 15 levels
_UINT4_RANGE_LN = 12.0 * 0.6931471805599453  # 2^12 — a finer floor matters for
# Adam's denominator: entries decoding to 0 explode through 1/(sqrt(0)+eps)
_FP8_MAX = 240.0  # stay below e4m3 max-finite 448 to keep headroom for EMA growth


def _log_code(norm: jax.Array, levels: int, range_ln: float) -> jax.Array:
    """Signed log-spaced code in [-levels, levels]; 0 encodes 0."""
    step = range_ln / (levels - 1)
    mag = jnp.abs(norm)
    idx = jnp.round((jnp.log(jnp.maximum(mag, 1e-30)) + range_ln) / step) + 1.0
    idx = jnp.clip(idx, 0.0, float(levels))
    idx = jnp.where(mag < jnp.exp(-range_ln) * 0.5, 0.0, idx)
    return jnp.sign(norm) * idx


def _log_decode(code: jax.Array, levels: int, range_ln: float) -> jax.Array:
    step = range_ln / (levels - 1)
    mag = jnp.exp(-range_ln + (jnp.abs(code) - 1.0) * step)
    return jnp.sign(code) * jnp.where(code == 0, 0.0, mag)


def quantize_blockwise(
    x: jax.Array, dtype: Any, block: int = DEFAULT_BLOCK, unsigned: bool = False
):
    """Returns (q, scale) with q of ``dtype`` shaped like x flattened+padded.

    ``unsigned=True`` (4-bit only) spends all 15 codes on magnitudes — used for
    Adam's non-negative second moment, where dynamic-range floor beats sign."""
    flat = x.reshape(-1).astype(jnp.float32)
    pad = _pad_len(flat.size, block)
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    dt = None if dtype == INT4_PACKED else jnp.dtype(dtype)

    if dtype == INT4_PACKED:
        safe = jnp.where(absmax > 0, absmax, 1.0)
        norm = blocks / safe
        if unsigned:
            # 0 encodes 0; 1..15 log grid over 2^12 of dynamic range
            step = _UINT4_RANGE_LN / (_UINT4_LEVELS - 1)
            mag = jnp.abs(norm)
            idx = jnp.round((jnp.log(jnp.maximum(mag, 1e-30)) + _UINT4_RANGE_LN) / step) + 1.0
            idx = jnp.clip(idx, 0.0, float(_UINT4_LEVELS))
            idx = jnp.where(mag < jnp.exp(-_UINT4_RANGE_LN) * 0.5, 0.0, idx)
            nibble = idx.astype(jnp.uint8)
        else:
            code = _log_code(norm, _INT4_LEVELS, _INT4_RANGE_LN)
            nibble = (code + 8.0).astype(jnp.uint8)  # 1..15, 8 = zero
        hi = nibble[:, 0::2]
        lo = nibble[:, 1::2]
        packed = ((hi << 4) | lo).astype(jnp.uint8)
        return packed, absmax.astype(jnp.float32)

    if dt == jnp.dtype(jnp.float8_e4m3fn):
        scale = absmax / _FP8_MAX
        safe = jnp.where(scale > 0, scale, 1.0)
        q = (blocks / safe).astype(dtype)
        return q, scale.astype(jnp.float32)

    if dt == jnp.dtype(jnp.int8):
        safe = jnp.where(absmax > 0, absmax, 1.0)
        q = _log_code(blocks / safe, _INT8_LEVELS, _INT8_RANGE_LN).astype(jnp.int8)
        return q, absmax.astype(jnp.float32)

    raise ValueError(f"unsupported quantized state dtype {dtype}")


def dequantize_blockwise(
    q: jax.Array,
    scale: jax.Array,
    shape,
    block: int = DEFAULT_BLOCK,
    dtype: Any = None,
    unsigned: bool = False,
):
    dt = q.dtype
    if dtype == INT4_PACKED or dt == jnp.dtype(jnp.uint8):
        hi = ((q >> 4) & 0xF).astype(jnp.float32)
        lo = (q & 0xF).astype(jnp.float32)
        nib = jnp.stack([hi, lo], axis=-1).reshape(q.shape[0], -1)
        if unsigned:
            step = _UINT4_RANGE_LN / (_UINT4_LEVELS - 1)
            mag = jnp.exp(-_UINT4_RANGE_LN + (nib - 1.0) * step)
            val = jnp.where(nib == 0, 0.0, mag)
        else:
            val = _log_decode(nib - 8.0, _INT4_LEVELS, _INT4_RANGE_LN)
        flat = (val * scale).reshape(-1)
    elif dt == jnp.dtype(jnp.float8_e4m3fn):
        flat = (q.astype(jnp.float32) * scale).reshape(-1)
    else:
        val = _log_decode(q.astype(jnp.float32), _INT8_LEVELS, _INT8_RANGE_LN)
        flat = (val * scale).reshape(-1)
    n = 1
    for d in shape:
        n *= d
    return flat[:n].reshape(shape)


class QuantizedAdamState(NamedTuple):
    count: jax.Array
    mu_q: optax.Updates
    mu_scale: optax.Updates
    nu_q: optax.Updates
    nu_scale: optax.Updates


def scale_by_adam_quantized(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    state_dtype: Any = jnp.int8,
    block_size: int = DEFAULT_BLOCK,
    min_quant_size: int = 4096,
) -> optax.GradientTransformation:
    """Adam whose moments are stored block-quantized.

    Leaves smaller than ``min_quant_size`` keep fp32 moments (quantizing tiny
    biases/norms saves nothing and costs precision) — same policy as bnb's
    ``min_8bit_size``.
    """

    def _small(p) -> bool:
        return p.size < min_quant_size

    def init(params):
        def init_leaf(p, unsigned=False):
            if _small(p):
                return (jnp.zeros_like(p, jnp.float32), jnp.zeros((), jnp.float32))
            q, s = quantize_blockwise(
                jnp.zeros(p.shape, jnp.float32), state_dtype, block_size, unsigned=unsigned
            )
            return (q, s)

        mu = jax.tree_util.tree_map(init_leaf, params)
        mu_q = jax.tree_util.tree_map(lambda t: t[0], mu, is_leaf=lambda t: isinstance(t, tuple))
        mu_s = jax.tree_util.tree_map(lambda t: t[1], mu, is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree_util.tree_map(lambda p: init_leaf(p, unsigned=True), params)
        nu_q = jax.tree_util.tree_map(lambda t: t[0], nu, is_leaf=lambda t: isinstance(t, tuple))
        nu_s = jax.tree_util.tree_map(lambda t: t[1], nu, is_leaf=lambda t: isinstance(t, tuple))
        return QuantizedAdamState(jnp.zeros((), jnp.int32), mu_q, mu_s, nu_q, nu_s)

    def update(updates, state, params=None):
        count = state.count + 1
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu_q = treedef.flatten_up_to(state.mu_q)
        flat_mu_s = treedef.flatten_up_to(state.mu_scale)
        flat_nu_q = treedef.flatten_up_to(state.nu_q)
        flat_nu_s = treedef.flatten_up_to(state.nu_scale)

        out_updates, out = [], []
        for g, mq, ms, nq, ns in zip(flat_g, flat_mu_q, flat_mu_s, flat_nu_q, flat_nu_s):
            gf = g.astype(jnp.float32)
            if gf.size < min_quant_size:
                m = mq * b1 + gf * (1.0 - b1)
                n = nq * b2 + jnp.square(gf) * (1.0 - b2)
                out_updates.append(((m / b1c) / (jnp.sqrt(n / b2c) + eps)).astype(g.dtype))
                out.append((m, ms, n, ns))
                continue
            m = dequantize_blockwise(mq, ms, gf.shape, block_size) * b1 + gf * (1.0 - b1)
            n = (
                dequantize_blockwise(nq, ns, gf.shape, block_size, unsigned=True) * b2
                + jnp.square(gf) * (1.0 - b2)
            )
            out_updates.append(((m / b1c) / (jnp.sqrt(n / b2c) + eps)).astype(g.dtype))
            new_mq, new_ms = quantize_blockwise(m, state_dtype, block_size)
            new_nq, new_ns = quantize_blockwise(n, state_dtype, block_size, unsigned=True)
            out.append((new_mq, new_ms, new_nq, new_ns))

        new_state = QuantizedAdamState(
            count,
            treedef.unflatten([o[0] for o in out]),
            treedef.unflatten([o[1] for o in out]),
            treedef.unflatten([o[2] for o in out]),
            treedef.unflatten([o[3] for o in out]),
        )
        return treedef.unflatten(out_updates), new_state

    return optax.GradientTransformation(init, update)


def adamw_quantized(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    state_dtype: Any = jnp.int8,
    block_size: int = DEFAULT_BLOCK,
) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_adam_quantized(b1, b2, eps, state_dtype, block_size),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


class QuantizedLionState(NamedTuple):
    mu_q: optax.Updates
    mu_scale: optax.Updates


def lion_quantized(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.99,
    weight_decay: float = 1e-2,
    state_dtype: Any = jnp.int8,
    block_size: int = DEFAULT_BLOCK,
    min_quant_size: int = 4096,
) -> optax.GradientTransformation:
    """Lion with its single momentum buffer stored block-quantized
    (bnb-lion8bit equivalent)."""

    def init(params):
        def init_leaf(p):
            if p.size < min_quant_size:
                return (jnp.zeros_like(p, jnp.float32), jnp.zeros((), jnp.float32))
            return quantize_blockwise(jnp.zeros(p.shape, jnp.float32), state_dtype, block_size)

        mu = jax.tree_util.tree_map(init_leaf, params)
        mu_q = jax.tree_util.tree_map(lambda t: t[0], mu, is_leaf=lambda t: isinstance(t, tuple))
        mu_s = jax.tree_util.tree_map(lambda t: t[1], mu, is_leaf=lambda t: isinstance(t, tuple))
        return QuantizedLionState(mu_q, mu_s)

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lion_quantized requires params (weight decay)")
        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu_q = treedef.flatten_up_to(state.mu_q)
        flat_mu_s = treedef.flatten_up_to(state.mu_scale)
        flat_p = treedef.flatten_up_to(params)

        out_updates, out_m = [], []
        for g, mq, ms, p in zip(flat_g, flat_mu_q, flat_mu_s, flat_p):
            gf = g.astype(jnp.float32)
            small = gf.size < min_quant_size
            m = mq if small else dequantize_blockwise(mq, ms, gf.shape, block_size)
            direction = jnp.sign(m * b1 + gf * (1.0 - b1))
            new_m = m * b2 + gf * (1.0 - b2)
            step = direction + weight_decay * p.astype(jnp.float32)
            out_updates.append(step.astype(g.dtype))
            if small:
                out_m.append((new_m, ms))
            else:
                out_m.append(quantize_blockwise(new_m, state_dtype, block_size))

        new_state = QuantizedLionState(
            treedef.unflatten([o[0] for o in out_m]),
            treedef.unflatten([o[1] for o in out_m]),
        )
        return treedef.unflatten(out_updates), new_state

    inner = optax.GradientTransformation(init, update)
    return optax.chain(inner, optax.scale_by_learning_rate(learning_rate))
