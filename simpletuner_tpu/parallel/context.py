"""Context (sequence) parallelism over the ``context`` mesh axis.

Reference: helpers/training/context_parallel.py:17-193 — two comm strategies
selected by ``--context_parallel_comm_strategy``:

* ``allgather`` (reference default, "ring"): every rank keeps its Q shard and
  gathers the full K/V before attention.  On TPU the gather is one ICI
  ``all_gather`` fused by XLA; grads flow back as ``reduce_scatter``.
* ``alltoall`` (Ulysses): ranks exchange so each holds the FULL sequence for a
  subset of heads — attention is then fully local — and exchange back.

Both are pure functions over (B, S_local, H, D) shards, used inside
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

from .mesh import CONTEXT_AXIS, DATA_AXIS, FSDP_AXIS


@dataclasses.dataclass
class ContextParallelConfig:
    mesh: Mesh
    strategy: str = "allgather"  # allgather | alltoall
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
    axis_name: str,
    inner_fn: Callable,
) -> jax.Array:
    """Q stays sharded; K/V are gathered along the sequence axis."""
    k_full = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    return inner_fn(q, k_full, v_full)


def alltoall_attention(
    q: jax.Array,  # (B, S_local, H, D)
    k: jax.Array,
    v: jax.Array,
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

    out = inner_fn(scatter_heads(q), scatter_heads(k), scatter_heads(v))
    return gather_heads(out)


def ring_attention(
    q: jax.Array,  # (B, S_local, H, D)
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    inner_fn: Callable = None,  # unused: ring computes its own blockwise math
) -> jax.Array:
    """True ring attention: KV shards rotate around the ICI ring via
    ``ppermute`` while each step's partial attention merges online-softmax
    style — comm overlaps compute under XLA's scheduler and no rank ever holds
    the full KV.  Expressed as ``lax.scan`` so reverse-mode AD works.
    """
    size = jax.lax.axis_size(axis_name)
    index = jax.lax.axis_index(axis_name)
    del index  # masking-free (full bidirectional attention)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    q_f = q.astype(jnp.float32) * scale

    def partial_attention(k_blk, v_blk):
        # (B, S, H, Sk) logits; returns unnormalized acc + (m, l) statistics
        logits = jnp.einsum("bshd,bthd->bhst", q_f, k_blk.astype(jnp.float32))
        m = jnp.max(logits, axis=-1)  # (B, H, S)
        p = jnp.exp(logits - m[..., None])
        l = jnp.sum(p, axis=-1)  # (B, H, S)
        acc = jnp.einsum("bhst,bthd->bshd", p, v_blk.astype(jnp.float32))
        return acc, m, l

    perm = [(i, (i + 1) % size) for i in range(size)]

    def step(carry, _):
        acc, m_run, l_run, k_cur, v_cur = carry
        acc_new, m_new, l_new = partial_attention(k_cur, v_cur)
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
        return (acc, m_tot, l_run, k_next, v_next), None

    # derive the init carry from q so every component is "varying" over the
    # manual mesh axes (a plain jnp.zeros constant would mismatch the outputs)
    zeros_stat = jnp.transpose(jnp.sum(q_f, axis=-1) * 0.0, (0, 2, 1))  # (B, H, S)
    init = (
        q_f * 0.0,
        zeros_stat - jnp.inf,
        zeros_stat,
        k,
        v,
    )
    (acc, _m, l, _k, _v), _ = jax.lax.scan(step, init, None, length=size)
    l_b = jnp.transpose(l, (0, 2, 1))[..., None]
    return (acc / jnp.maximum(l_b, 1e-30)).astype(q.dtype)


def context_parallel_attention(
    q: jax.Array,  # global (B, S, H, D) inside jit
    k: jax.Array,
    v: jax.Array,
    config: ContextParallelConfig,
    inner_fn: Callable,
) -> jax.Array:
    """shard_map wrapper: shards S over ``context``, B over data×fsdp, runs the
    selected strategy per shard."""
    from jax import shard_map

    spec = P((DATA_AXIS, FSDP_AXIS), CONTEXT_AXIS, None, None)
    strategy = {
        "allgather": allgather_attention,
        "alltoall": alltoall_attention,
        "ring": ring_attention,
    }[config.strategy]

    def local(q_l, k_l, v_l):
        return strategy(q_l, k_l, v_l, config.axis_name, inner_fn)

    return shard_map(
        local,
        mesh=config.mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)
