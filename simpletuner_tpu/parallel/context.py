"""Context (sequence) parallelism over the ``context`` mesh axis.

Reference: helpers/training/context_parallel.py:17-193 — two comm strategies
selected by ``--context_parallel_comm_strategy``:

* ``allgather`` (reference default, "ring"): every rank keeps its Q shard and
  gathers the full K/V before attention.  On TPU the gather is one ICI
  ``all_gather`` fused by XLA; grads flow back as ``reduce_scatter``.
* ``alltoall`` (Ulysses): ranks exchange so each holds the FULL sequence for a
  subset of heads — attention is then fully local — and exchange back.

All strategies are segment-id aware (reference: the CP + masked-loss
interaction, flux/model.py:755-771): padded/packed batches mask exactly like
the local kernels (``ops/flash_attention.py`` semantics: attend where
``q_seg == kv_seg`` and ``kv_seg != SEGMENT_PAD_ID``).

Strategies are pure functions over (B, S_local, H, D) shards, used inside
``shard_map`` by the attention dispatcher (ops/attention.py) when the trainer
enables CP; batch-identity across CP ranks (reference
context_parallel_sync.py) comes free because the global batch array is simply
*replicated* over the context axis by its sharding spec.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_attention import DEFAULT_MASK_VALUE, SEGMENT_PAD_ID
from .mesh import CONTEXT_AXIS, DATA_AXIS, FSDP_AXIS


@dataclasses.dataclass
class ContextParallelConfig:
    mesh: Mesh
    strategy: str = "allgather"  # allgather | alltoall | ring
    axis_name: str = CONTEXT_AXIS

    def __post_init__(self):
        if self.strategy not in ("allgather", "alltoall", "ring", "ulysses"):
            raise ValueError(f"unknown CP strategy {self.strategy!r}")
        if self.strategy == "ulysses":
            self.strategy = "alltoall"


def allgather_attention(
    q: jax.Array,  # (B, S_local, H, D)
    k: jax.Array,
    v: jax.Array,
    q_seg: Optional[jax.Array],  # (B, S_local) or None
    kv_seg: Optional[jax.Array],
    axis_name: str,
    inner_fn: Callable,
) -> jax.Array:
    """Q stays sharded; K/V (and kv segment ids) gather along the sequence."""
    k_full = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    kv_seg_full = (
        jax.lax.all_gather(kv_seg, axis_name, axis=1, tiled=True)
        if kv_seg is not None
        else None
    )
    return inner_fn(q, k_full, v_full, q_seg, kv_seg_full)


def alltoall_attention(
    q: jax.Array,  # (B, S_local, H, D)
    k: jax.Array,
    v: jax.Array,
    q_seg: Optional[jax.Array],
    kv_seg: Optional[jax.Array],
    axis_name: str,
    inner_fn: Callable,
) -> jax.Array:
    """Ulysses: scatter heads / gather sequence, local attention, inverse."""
    size = jax.lax.axis_size(axis_name)
    if q.shape[2] % size:
        raise ValueError(f"num_heads {q.shape[2]} not divisible by context size {size}")

    def scatter_heads(x):
        # (B, S/c, H, D) -> (B, S, H/c, D)
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    def gather_heads(x):
        # (B, S, H/c, D) -> (B, S/c, H, D)
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    # segment ids have no head axis — each rank needs the FULL-sequence ids
    q_seg_full = (
        jax.lax.all_gather(q_seg, axis_name, axis=1, tiled=True) if q_seg is not None else None
    )
    kv_seg_full = (
        jax.lax.all_gather(kv_seg, axis_name, axis=1, tiled=True) if kv_seg is not None else None
    )
    out = inner_fn(scatter_heads(q), scatter_heads(k), scatter_heads(v), q_seg_full, kv_seg_full)
    return gather_heads(out)


def ring_attention(
    q: jax.Array,  # (B, S_local, H, D)
    k: jax.Array,
    v: jax.Array,
    q_seg: Optional[jax.Array] = None,  # (B, S_local)
    kv_seg: Optional[jax.Array] = None,
    axis_name: str = CONTEXT_AXIS,
    inner_fn: Callable = None,  # unused: ring computes its own blockwise math
) -> jax.Array:
    """True ring attention: KV shards (and their segment ids) rotate around the
    ICI ring via ``ppermute`` while each step's partial attention merges
    online-softmax style — comm overlaps compute under XLA's scheduler and no
    rank ever holds the full KV.  Expressed as ``lax.scan`` so reverse-mode AD
    works.  Masking uses a large-negative finite value so the running-max
    arithmetic stays NaN-free; fully-masked rows emit exactly 0 (matching
    ``mha_reference``).
    """
    size = jax.lax.axis_size(axis_name)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    q_f = q.astype(jnp.float32) * scale
    masked = q_seg is not None or kv_seg is not None
    if masked:
        if q_seg is None:
            q_seg = jnp.zeros(q.shape[:2], jnp.int32)
        if kv_seg is None:
            kv_seg = jnp.zeros(k.shape[:2], jnp.int32)

    def partial_attention(k_blk, v_blk, kv_seg_blk):
        # (B, H, S, T) logits; returns unnormalized acc + (m, l) statistics
        logits = jnp.einsum("bshd,bthd->bhst", q_f, k_blk.astype(jnp.float32))
        if masked:
            allowed = (q_seg[:, None, :, None] == kv_seg_blk[:, None, None, :]) & (
                kv_seg_blk[:, None, None, :] != SEGMENT_PAD_ID
            )
            logits = jnp.where(allowed, logits, DEFAULT_MASK_VALUE)
        m = jnp.max(logits, axis=-1)  # (B, H, S)
        p = jnp.exp(logits - m[..., None])
        if masked:
            p = jnp.where(allowed, p, 0.0)
        l = jnp.sum(p, axis=-1)  # (B, H, S)
        acc = jnp.einsum("bhst,bthd->bshd", p, v_blk.astype(jnp.float32))
        return acc, m, l

    perm = [(i, (i + 1) % size) for i in range(size)]

    def step(carry, _):
        acc, m_run, l_run, k_cur, v_cur, seg_cur = carry
        acc_new, m_new, l_new = partial_attention(k_cur, v_cur, seg_cur)
        m_tot = jnp.maximum(m_run, m_new)
        w_old = jnp.exp(m_run - m_tot)
        w_new = jnp.exp(m_new - m_tot)
        # acc carries (B, S, H, D); stats are (B, H, S) -> move to (B, S, H, 1)
        w_old_b = jnp.transpose(w_old, (0, 2, 1))[..., None]
        w_new_b = jnp.transpose(w_new, (0, 2, 1))[..., None]
        acc = acc * w_old_b + acc_new * w_new_b
        l_run = l_run * w_old + l_new * w_new
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        seg_next = (
            jax.lax.ppermute(seg_cur, axis_name, perm) if seg_cur is not None else None
        )
        return (acc, m_tot, l_run, k_next, v_next, seg_next), None

    # derive the init carry from q so every component is "varying" over the
    # manual mesh axes (a plain jnp.zeros constant would mismatch the outputs)
    zeros_stat = jnp.transpose(jnp.sum(q_f, axis=-1) * 0.0, (0, 2, 1))  # (B, H, S)
    init = (
        q_f * 0.0,
        zeros_stat + DEFAULT_MASK_VALUE,
        zeros_stat,
        k,
        v,
        kv_seg if masked else None,
    )
    (acc, _m, l, _k, _v, _s), _ = jax.lax.scan(step, init, None, length=size)
    l_b = jnp.transpose(l, (0, 2, 1))[..., None]
    # a where-guard (not a tiny epsilon floor): d(acc/m)/dm = -acc/m² would
    # underflow m² to 0 for fully-masked rows and back-propagate NaNs
    denom = jnp.where(l_b > 0.0, l_b, 1.0)
    out = (acc / denom).astype(q.dtype)
    if masked:
        # rows with no visible kv anywhere (e.g. q padding) emit exactly 0
        out = jnp.where(l_b > 0.0, out, 0.0).astype(q.dtype)
    return out


def context_parallel_attention(
    q: jax.Array,  # global (B, S, H, D) inside jit
    k: jax.Array,
    v: jax.Array,
    config: ContextParallelConfig,
    inner_fn: Callable,
    q_segment_ids: Optional[jax.Array] = None,  # global (B, S)
    kv_segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """shard_map wrapper: shards S over ``context``, B over data×fsdp, runs the
    selected strategy per shard.  ``inner_fn(q, k, v, q_seg, kv_seg)`` computes
    local attention with the kernel-level masking semantics."""
    from jax import shard_map

    spec = P((DATA_AXIS, FSDP_AXIS), CONTEXT_AXIS, None, None)
    seg_spec = P((DATA_AXIS, FSDP_AXIS), CONTEXT_AXIS)
    strategy = {
        "allgather": allgather_attention,
        "alltoall": alltoall_attention,
        "ring": ring_attention,
    }[config.strategy]

    has_seg = q_segment_ids is not None or kv_segment_ids is not None
    if has_seg:
        batch = q.shape[0]
        if q_segment_ids is None:
            q_segment_ids = jnp.zeros((batch, q.shape[1]), jnp.int32)
        if kv_segment_ids is None:
            kv_segment_ids = jnp.zeros((batch, k.shape[1]), jnp.int32)

        def local(q_l, k_l, v_l, qs_l, ks_l):
            return strategy(q_l, k_l, v_l, qs_l, ks_l, config.axis_name, inner_fn)

        return shard_map(
            local,
            mesh=config.mesh,
            in_specs=(spec, spec, spec, seg_spec, seg_spec),
            out_specs=spec,
        )(q, k, v, q_segment_ids, kv_segment_ids)

    def local(q_l, k_l, v_l):
        return strategy(q_l, k_l, v_l, None, None, config.axis_name, inner_fn)

    return shard_map(
        local,
        mesh=config.mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)
