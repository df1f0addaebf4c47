"""Multi-host (multi-process) runtime wiring.

Reference: the reference treats multi-node as first-class through ``accelerate
launch`` composition (helpers/training/trainer.py:7394-7446 machine_rank /
main_process_ip / main_process_port plumbing; documentation/DISTRIBUTED.md).
The TPU-native replacement is JAX's single-program multi-host model: every host
runs the same program, ``jax.distributed.initialize()`` joins them into one
runtime, ``jax.devices()`` becomes the global device list, and collectives ride
ICI/DCN inside the jitted step (SURVEY.md §5.8).

Three launch modes are supported:

* **TPU pod runtimes** (GKE/Cloud TPU VMs): ``jax.distributed.initialize()``
  with no arguments auto-detects the coordinator from the TPU metadata server.
  Enabled when ``SIMPLETUNER_MULTIHOST=auto`` (or ``1``) with no explicit
  coordinator configured.
* **Explicit env wiring** (also how accelerate users think about it):
  ``SIMPLETUNER_COORDINATOR_ADDRESS`` (host:port of process 0),
  ``SIMPLETUNER_NUM_PROCESSES``, ``SIMPLETUNER_PROCESS_ID``.  This is the
  direct analogue of the reference's main_process_ip/port/machine_rank flags.
* **Single process** (default): no env set → no-op; ``jax.process_count()``
  stays 1 and every multi-host code path degrades to the single-host behavior.

Batch assembly across hosts: each process collates only its own slice of the
(deterministically identical) global batch and the trainer assembles the
global array with ``jax.make_array_from_process_local_data``; the index
pattern each host owns is computed by :func:`host_local_indices` (it is NOT a
contiguous range when gradient accumulation reshapes the batch into
micro-batches).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

import jax

logger = logging.getLogger(__name__)

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Join the multi-host runtime if configured; returns True if distributed.

    Idempotent: safe to call from both ``train.py`` and test drivers.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    # NOTE: do not touch jax.devices()/process_count() before initialize() —
    # any backend query locks in the single-process runtime
    coordinator = os.environ.get("SIMPLETUNER_COORDINATOR_ADDRESS")
    num_processes = os.environ.get("SIMPLETUNER_NUM_PROCESSES")
    process_id = os.environ.get("SIMPLETUNER_PROCESS_ID")
    auto = os.environ.get("SIMPLETUNER_MULTIHOST", "").lower() in ("1", "auto", "true")

    if coordinator:
        if num_processes is None or process_id is None:
            raise ValueError(
                "SIMPLETUNER_COORDINATOR_ADDRESS is set but "
                "SIMPLETUNER_NUM_PROCESSES / SIMPLETUNER_PROCESS_ID are not — "
                "all three are required for explicit multi-host wiring "
                "(the analogue of accelerate's main_process_ip/port + machine_rank)"
            )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_processes),
            process_id=int(process_id),
        )
        _initialized = True
        logger.info(
            "joined multi-host runtime: process %s/%s via %s (%d global devices)",
            process_id, num_processes, coordinator, jax.device_count(),
        )
        return True
    if auto:
        # TPU pod runtime: coordinator auto-detected from the environment
        jax.distributed.initialize()
        _initialized = True
        logger.info(
            "joined multi-host runtime (auto): process %d/%d (%d global devices)",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )
        return jax.process_count() > 1
    return False


def host_barrier(name: str, timeout_ms: int = 3_600_000) -> None:
    """Cross-process rendezvous via the coordination service (RPC, no device
    collectives).  Preferred over ``multihost_utils.sync_global_devices`` for
    host-side sync points (caching done, checkpoint finalize): a psum-based
    barrier would create a Gloo/ICI communicator whose context init has a
    ~30 s key-exchange deadline — too short when processes arrive skewed by
    independent XLA compiles.  The coordination-service barrier accepts an
    explicit timeout (default 1 h)."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # initialized by some other path; fall back
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def host_local_indices(
    global_batch: int,
    grad_accum_steps: int,
    process_index: Optional[int] = None,
    num_processes: Optional[int] = None,
) -> Optional[List[int]]:
    """Flat global-batch indices this host must materialize.

    The global batch of size G is consumed as ``grad_accum_steps`` (A)
    micro-batches of G/A samples each (row-major reshape to (A, G/A)); within
    each micro-batch, batch shards are laid out over devices in process order,
    so process p owns rows [p·m, (p+1)·m) of every micro-batch where
    m = G/(A·N).  Returns None when single-process (no slicing needed).
    """
    num_processes = num_processes if num_processes is not None else jax.process_count()
    if num_processes <= 1:
        return None
    process_index = process_index if process_index is not None else jax.process_index()
    accum = max(int(grad_accum_steps), 1)
    if global_batch % (accum * num_processes):
        raise ValueError(
            f"global batch {global_batch} not divisible by grad_accum({accum}) "
            f"x num_processes({num_processes})"
        )
    micro = global_batch // accum
    per_host = micro // num_processes
    out: List[int] = []
    for a in range(accum):
        base = a * micro + process_index * per_host
        out.extend(range(base, base + per_host))
    return out
