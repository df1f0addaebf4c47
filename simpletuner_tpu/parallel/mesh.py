"""Device mesh construction.

Replaces the reference's accelerate/NCCL process-group topology (reference:
helpers/training/context_parallel.py:61-155 DeviceMesh ("dp_replicate", "ring",
"ulysses"); helpers/training/trainer.py:1179 FSDP plugin) with one
``jax.sharding.Mesh`` carrying three axes:

* ``data``    — pure data parallelism (batch replicated params)
* ``fsdp``    — param/grad/optimizer sharding (ZeRO-3 / FSDP equivalent)
* ``context`` — sequence (context) parallelism for long-token models

Batch is sharded over (data × fsdp); params over fsdp; sequence over context.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
CONTEXT_AXIS = "context"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, CONTEXT_AXIS)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    fsdp_size: int = 1
    context_size: int = 1
    data_size: Optional[int] = None  # None = all remaining devices

    @classmethod
    def from_training_config(cls, config: Any, num_devices: Optional[int] = None) -> "MeshConfig":
        num_devices = num_devices or jax.device_count()
        context = int(config.get("context_parallel_size", 1) or 1)
        if config.get("fsdp"):
            fsdp = int(config.get("fsdp_size") or 0) or max(num_devices // context, 1)
        else:
            fsdp = 1
        data = config.get("dp_replicate_size")
        return cls(fsdp_size=fsdp, context_size=context, data_size=int(data) if data else None)


def build_mesh(
    mesh_config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    fsdp = mesh_config.fsdp_size
    context = mesh_config.context_size
    if total % (fsdp * context):
        raise ValueError(
            f"device count {total} not divisible by fsdp({fsdp}) * context({context})"
        )
    data = mesh_config.data_size or total // (fsdp * context)
    if data * fsdp * context != total:
        raise ValueError(
            f"mesh {data}x{fsdp}x{context} != {total} devices"
        )
    array = np.asarray(devices).reshape(data, fsdp, context)
    return Mesh(array, MESH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Training batches shard their leading dim over data×fsdp."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def batch_pspec() -> P:
    return P((DATA_AXIS, FSDP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_pspec(shape: Sequence[int], fsdp_size: int, min_size: int = 2 ** 16) -> P:
    """FSDP rule: shard the largest divisible dim over ``fsdp``; tiny or
    indivisible params stay replicated."""
    if fsdp_size <= 1 or not shape or int(np.prod(shape)) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: shape[i], reverse=True)
    for idx in order:
        if shape[idx] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[idx] = FSDP_AXIS
            return P(*spec)
    return P()


def params_shardings(mesh: Mesh, params: Any, min_size: int = 2 ** 16) -> Any:
    fsdp = mesh.shape[FSDP_AXIS]
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, param_pspec(p.shape, fsdp, min_size)), params
    )


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    shards = mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]
    if global_batch_size % shards:
        raise ValueError(f"global batch {global_batch_size} not divisible by {shards} batch shards")
    return global_batch_size // shards
