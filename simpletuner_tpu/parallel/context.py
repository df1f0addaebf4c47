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
        # reference names: ring -> allgather path, ulysses -> alltoall
        if self.strategy == "ring":
            self.strategy = "allgather"
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
    strategy = allgather_attention if config.strategy == "allgather" else alltoall_attention

    def local(q_l, k_l, v_l):
        return strategy(q_l, k_l, v_l, config.axis_name, inner_fn)

    return shard_map(
        local,
        mesh=config.mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)
