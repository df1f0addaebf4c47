"""Pallas TPU flash attention (forward + backward) with segment-id masking.

Replaces the reference's CUDA attention backends (flash-attn / SageAttention /
xformers — reference: helpers/training/attention_backend.py:1076) with a single
TPU kernel pair:

* forward: online-softmax tiling, f32 accumulation on the MXU, grid
  ``(batch, heads, q_blocks, kv_blocks)`` with the kv dimension innermost so the
  accumulator lives in VMEM scratch across kv iterations;
* backward: two kernels (dq and dkv) that recompute attention probabilities
  from the saved logsumexp, never materializing the full S×S matrix.

Segment ids (int32 per token) implement padding/sample masking: positions attend
only within equal segment ids, and padded tokens (``SEGMENT_PAD_ID``) are masked
out everywhere.  TPU layout notes: q-side per-row values (segment ids, logsumexp,
delta) are replicated across the 128 lanes, kv-side segment ids are replicated
across 8 sublanes — this keeps all in-kernel broadcasts as cheap ``jnp.tile``
along lanes instead of cross-lane transposes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEGMENT_PAD_ID = -1
DEFAULT_MASK_VALUE = -1e30
_LANES = 128
_SUBLANES = 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _lane_broadcast(x: jax.Array, width: int) -> jax.Array:
    """Broadcast a lane-replicated (rows, 128) array to (rows, width)."""
    repeats, rem = divmod(width, _LANES)
    if repeats == 0:
        return x[:, :width]
    if rem:
        raise NotImplementedError(f"width {width} not a multiple of {_LANES}")
    if repeats == 1:
        return x
    return jnp.tile(x, (1, repeats))


def _compute_mask(q_seg: jax.Array, kv_seg_row: jax.Array, block_kv: int) -> jax.Array:
    """(Bq, 128) lane-replicated q segs + (1, Bk) kv segs -> (Bq, Bk) bool mask."""
    q_tiled = _lane_broadcast(q_seg, block_kv)
    return jnp.logical_and(q_tiled == kv_seg_row, kv_seg_row != SEGMENT_PAD_ID)


# ---------------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------------


def _fwd_kernel(
    *refs,
    sm_scale: float,
    kv_blocks: int,
    block_kv: int,
    use_mask: bool,
):
    # MXU note: all dots take bf16 (input-dtype) operands with f32
    # accumulation — explicit f32 operands would drop the MXU to its ~1/8
    # f32 pipe (the round-4 kernel did exactly that and measured 29% eff)
    if use_mask:
        q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        q_ref, k_ref, v_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    kv_index = pl.program_id(3)

    @pl.when(kv_index == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[:] = jnp.zeros_like(l_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # (Bq, Bk) f32

    if use_mask:
        mask = _compute_mask(q_seg_ref[0], kv_seg_ref[0, :1], block_kv)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    m_prev = m_ref[:]  # (Bq, 128) lane-replicated
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=1)[:, None]  # (Bq, 1)
    m_next = jnp.maximum(m_prev, m_cur)  # (Bq, 128)
    p = jnp.exp(s - _lane_broadcast(m_next, s.shape[1]))
    if use_mask:
        p = jnp.where(mask, p, 0.0)
    alpha = jnp.exp(m_prev - m_next)  # (Bq, 128)
    l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dim = acc_ref.shape[1]
    acc_ref[:] = acc_ref[:] * _lane_broadcast(alpha, dim) + pv
    m_ref[:] = m_next
    l_ref[:] = l_next

    @pl.when(kv_index == kv_blocks - 1)
    def _finish():
        l_final = l_ref[:]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        out_ref[0] = (acc_ref[:] * _lane_broadcast(l_inv, dim)).astype(out_ref.dtype)
        lse_ref[0] = m_ref[:] + jnp.log(jnp.where(l_final == 0.0, 1.0, l_final))


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_seg: Optional[jax.Array],
    kv_seg: Optional[jax.Array],
    sm_scale: float,
    block_q: int,
    block_kv: int,
    interpret: bool,
):
    batch, heads, sq, dim = q.shape
    sk = k.shape[2]
    grid = (batch, heads, sq // block_q, sk // block_kv)
    use_mask = q_seg is not None

    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, kv_blocks=grid[3], block_kv=block_kv,
        use_mask=use_mask,
    )
    seg_operands = []
    seg_specs = []
    if use_mask:
        # lane/sublane replicated segment id planes
        seg_operands = [
            jnp.broadcast_to(q_seg[:, :, None], (batch, sq, _LANES)),
            jnp.broadcast_to(kv_seg[:, None, :], (batch, _SUBLANES, sk)),
        ]
        seg_specs = [
            pl.BlockSpec((1, block_q, _LANES), lambda b, h, i, j: (b, i, 0)),
            pl.BlockSpec((1, _SUBLANES, block_kv), lambda b, h, i, j: (b, 0, j)),
        ]
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=seg_specs + [
            pl.BlockSpec((1, block_q, dim), lambda b, h, i, j: (b * heads + h, i, 0)),
            pl.BlockSpec((1, block_kv, dim), lambda b, h, i, j: (b * heads + h, j, 0)),
            pl.BlockSpec((1, block_kv, dim), lambda b, h, i, j: (b * heads + h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, h, i, j: (b * heads + h, i, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda b, h, i, j: (b * heads + h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch * heads, sq, dim), q.dtype),
            jax.ShapeDtypeStruct((batch * heads, sq, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, dim), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        *seg_operands,
        q.reshape(batch * heads, sq, dim),
        k.reshape(batch * heads, sk, dim),
        v.reshape(batch * heads, sk, dim),
    )
    out = out.reshape(batch, heads, sq, dim)
    return out, lse  # lse stays lane-replicated (B*H, Sq, 128)


# ---------------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------------


def _bwd_dq_kernel(
    *refs,
    sm_scale: float,
    kv_blocks: int,
    block_kv: int,
    use_mask: bool,
):
    if use_mask:
        q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc_ref = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc_ref = refs
    kv_index = pl.program_id(3)

    @pl.when(kv_index == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    if use_mask:
        mask = _compute_mask(q_seg_ref[0], kv_seg_ref[0, :1], block_kv)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    lse = _lane_broadcast(lse_ref[0], s.shape[1])
    p = jnp.exp(s - lse)  # (Bq, Bk)
    if use_mask:
        p = jnp.where(mask, p, 0.0)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = _lane_broadcast(delta_ref[0], s.shape[1])
    ds = p * (dp - delta)
    dq_acc_ref[:] += sm_scale * jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_index == kv_blocks - 1)
    def _finish():
        dq_ref[0] = dq_acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    *refs,
    sm_scale: float,
    q_blocks: int,
    block_kv: int,
    use_mask: bool,
):
    if use_mask:
        q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc_ref, dv_acc_ref = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc_ref, dv_acc_ref = refs
    q_index = pl.program_id(3)

    @pl.when(q_index == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    if use_mask:
        mask = _compute_mask(q_seg_ref[0], kv_seg_ref[0, :1], block_kv)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    lse = _lane_broadcast(lse_ref[0], s.shape[1])
    p = jnp.exp(s - lse)  # (Bq, Bk)
    if use_mask:
        p = jnp.where(mask, p, 0.0)
    p_lo = p.astype(do_ref.dtype)
    # dV += P^T dO
    dv_acc_ref[:] += jax.lax.dot_general(
        p_lo, do_ref[0], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = _lane_broadcast(delta_ref[0], s.shape[1])
    ds = p * (dp - delta)  # (Bq, Bk)
    # dK += scale * dS^T Q
    dk_acc_ref[:] += sm_scale * jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_index == q_blocks - 1)
    def _finish():
        dk_ref[0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _flash_backward(
    q,
    k,
    v,
    q_seg,
    kv_seg,
    out,
    lse,
    do,
    sm_scale: float,
    block_q: int,
    block_kv: int,
    interpret: bool,
):
    batch, heads, sq, dim = q.shape
    sk = k.shape[2]
    bh = batch * heads
    use_mask = q_seg is not None

    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # (B,H,Sq)
    delta_w = jnp.broadcast_to(delta.reshape(bh, sq)[:, :, None], (bh, sq, _LANES))

    seg_operands = []
    if use_mask:
        seg_operands = [
            jnp.broadcast_to(q_seg[:, :, None], (batch, sq, _LANES)),
            jnp.broadcast_to(kv_seg[:, None, :], (batch, _SUBLANES, sk)),
        ]

    qf = q.reshape(bh, sq, dim)
    kf = k.reshape(bh, sk, dim)
    vf = v.reshape(bh, sk, dim)
    dof = do.reshape(bh, sq, dim)

    def _qix(b, h, i, j):
        return (b * heads + h, i, 0)

    def _kix(b, h, i, j):
        return (b * heads + h, j, 0)

    seg_specs_dq = [
        pl.BlockSpec((1, block_q, _LANES), lambda b, h, i, j: (b, i, 0)),
        pl.BlockSpec((1, _SUBLANES, block_kv), lambda b, h, i, j: (b, 0, j)),
    ] if use_mask else []
    grid_dq = (batch, heads, sq // block_q, sk // block_kv)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, sm_scale=sm_scale, kv_blocks=grid_dq[3],
            block_kv=block_kv, use_mask=use_mask,
        ),
        grid=grid_dq,
        in_specs=seg_specs_dq + [
            pl.BlockSpec((1, block_q, dim), _qix),
            pl.BlockSpec((1, block_kv, dim), _kix),
            pl.BlockSpec((1, block_kv, dim), _kix),
            pl.BlockSpec((1, block_q, dim), _qix),
            pl.BlockSpec((1, block_q, _LANES), _qix),
            pl.BlockSpec((1, block_q, _LANES), _qix),
        ],
        out_specs=pl.BlockSpec((1, block_q, dim), _qix),
        out_shape=jax.ShapeDtypeStruct((bh, sq, dim), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*seg_operands, qf, kf, vf, dof, lse, delta_w)

    # dkv: kv blocks as the third (parallel) axis, q innermost for accumulation
    def _qix2(b, h, j, i):
        return (b * heads + h, i, 0)

    def _kix2(b, h, j, i):
        return (b * heads + h, j, 0)

    seg_specs_dkv = [
        pl.BlockSpec((1, block_q, _LANES), lambda b, h, j, i: (b, i, 0)),
        pl.BlockSpec((1, _SUBLANES, block_kv), lambda b, h, j, i: (b, 0, j)),
    ] if use_mask else []
    grid_dkv = (batch, heads, sk // block_kv, sq // block_q)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, sm_scale=sm_scale, q_blocks=grid_dkv[3],
            block_kv=block_kv, use_mask=use_mask,
        ),
        grid=grid_dkv,
        in_specs=seg_specs_dkv + [
            pl.BlockSpec((1, block_q, dim), _qix2),
            pl.BlockSpec((1, block_kv, dim), _kix2),
            pl.BlockSpec((1, block_kv, dim), _kix2),
            pl.BlockSpec((1, block_q, dim), _qix2),
            pl.BlockSpec((1, block_q, _LANES), _qix2),
            pl.BlockSpec((1, block_q, _LANES), _qix2),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, dim), _kix2),
            pl.BlockSpec((1, block_kv, dim), _kix2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, dim), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, dim), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, dim), jnp.float32),
            pltpu.VMEM((block_kv, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*seg_operands, qf, kf, vf, dof, lse, delta_w)

    dq = dq.reshape(batch, heads, sq, dim)
    dk = dk.reshape(batch, heads, sk, dim)
    dv = dv.reshape(batch, heads, sk, dim)
    return dq, dk, dv


# ---------------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attention_core(q, k, v, q_seg, kv_seg, sm_scale, block_q, block_kv, interpret,
                          residual_tag):
    out, _ = _flash_forward(q, k, v, q_seg, kv_seg, sm_scale, block_q, block_kv, interpret)
    return out


def _core_fwd(q, k, v, q_seg, kv_seg, sm_scale, block_q, block_kv, interpret, residual_tag):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _flash_forward(q, k, v, q_seg, kv_seg, sm_scale, block_q, block_kv, interpret)
    # the backward needs (out, lse): without making them visible to the remat
    # policy, every rematted block re-runs the FORWARD kernel inside the
    # backward pass just to regenerate them (~2.6 ms x 57 blocks on the 12B
    # flagship).  Tag them here — inside the custom_vjp fwd — so
    # save_only_these_names("<tag>", "<tag>_lse") skips that recompute.
    # Memory notes (learned from a 2.6G flagship OOM): (1) the kernel's two
    # outputs share one tuple allocation, so saving the RAW out pins the full
    # lane-replicated f32 lse (54MB/block) — save a transposed copy instead
    # (the exact (B,S,H,D) form the model consumes, so XLA CSEs it with the
    # downstream use); (2) lse saves one lane (128x smaller) behind an
    # optimization_barrier so the slice materializes as its own buffer.
    lse_compact = jax.lax.optimization_barrier(lse[:, :, :1])
    out_res = out
    if residual_tag:
        out_res = checkpoint_name(jnp.swapaxes(out, 1, 2), residual_tag)
        lse_compact = checkpoint_name(lse_compact, residual_tag + "_lse")
        out = jnp.swapaxes(out_res, 1, 2)
    return out, (q, k, v, q_seg, kv_seg, out_res, lse_compact)


def _core_bwd(sm_scale, block_q, block_kv, interpret, residual_tag, residuals, do):
    q, k, v, q_seg, kv_seg, out_res, lse_compact = residuals
    out = jnp.swapaxes(out_res, 1, 2) if residual_tag else out_res
    lse = jnp.broadcast_to(lse_compact, lse_compact.shape[:2] + (_LANES,))
    dq, dk, dv = _flash_backward(
        q, k, v, q_seg, kv_seg, out, lse, do, sm_scale, block_q, block_kv, interpret
    )
    return dq, dk, dv, None, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
    residual_tag: Optional[str] = None,
) -> jax.Array:
    """Flash attention over ``(batch, heads, seq, head_dim)`` tensors.

    Sequences are padded to block multiples internally; padded tokens get
    ``SEGMENT_PAD_ID`` and contribute nothing.  Differentiable via the Pallas
    backward kernels.  ``residual_tag`` names the (out, lse) residuals for
    ``jax.checkpoint`` policies (save "<tag>"+"<tag>_lse" to skip the forward
    kernel re-run inside rematted backward passes).
    """
    batch, heads, sq, dim = q.shape
    sk = k.shape[2]
    if sm_scale is None:
        sm_scale = dim ** -0.5

    block_q = min(block_q, _round_up(sq, _LANES))
    block_kv = min(block_kv, _round_up(sk, _LANES))
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_kv)
    # the unmasked fast path (no segment ids, no padding) drops the mask
    # compute and its operands from all four kernels entirely
    needs_mask = (
        q_segment_ids is not None or kv_segment_ids is not None
        or sq_pad != sq or sk_pad != sk
    )
    if needs_mask:
        if q_segment_ids is None:
            q_segment_ids = jnp.zeros((batch, sq), jnp.int32)
        if kv_segment_ids is None:
            kv_segment_ids = jnp.zeros((batch, sk), jnp.int32)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        q_segment_ids = jnp.pad(
            q_segment_ids, ((0, 0), (0, sq_pad - sq)), constant_values=SEGMENT_PAD_ID
        )
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        kv_segment_ids = jnp.pad(
            kv_segment_ids, ((0, 0), (0, sk_pad - sk)), constant_values=SEGMENT_PAD_ID
        )

    out = _flash_attention_core(
        q,
        k,
        v,
        q_segment_ids.astype(jnp.int32) if needs_mask else None,
        kv_segment_ids.astype(jnp.int32) if needs_mask else None,
        sm_scale,
        block_q,
        block_kv,
        interpret,
        residual_tag,
    )
    if sq_pad != sq:
        out = out[:, :, :sq, :]
    return out


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Straightforward XLA attention; ground truth for the Pallas kernels and the
    fallback backend on non-TPU platforms."""
    dim = q.shape[-1]
    if sm_scale is None:
        sm_scale = dim ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * sm_scale
    if q_segment_ids is not None or kv_segment_ids is not None:
        batch, _, sq, sk = s.shape
        if q_segment_ids is None:
            q_segment_ids = jnp.zeros((batch, sq), jnp.int32)
        if kv_segment_ids is None:
            kv_segment_ids = jnp.zeros((batch, sk), jnp.int32)
        mask = (q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]) & (
            kv_segment_ids[:, None, None, :] != SEGMENT_PAD_ID
        )
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(mask, p, 0.0)  # fully-masked (padded) rows emit exactly 0
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
