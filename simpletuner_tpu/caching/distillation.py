"""Distillation teacher-output cache: deterministic ODE pairs on disk.

Reference: helpers/caching/distillation.py:25 ``DistillationCache`` (torch ``.pt``
artifact store with round-robin ``load_next_pair``) and
helpers/distillation/perflow/generator.py ``PerFlowODEGenerator`` (materialises
(noise, teacher-ODE-endpoint) pairs once, so training never re-runs the
multi-step teacher solve).

TPU-native shape: artifacts are ``.pt`` dicts written through the storage
backend's ``torch_save`` (byte-compatible with the reference's consumers);
generation is ONE jitted ``lax.scan`` Euler solve over the teacher — the whole
trajectory stays on device, only the endpoints come back to the host.
"""

from __future__ import annotations

import logging
import os
from collections import deque
from typing import Any, Deque, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class DistillationCache:
    """Round-robin artifact store for deterministic teacher ODE pairs."""

    def __init__(self, id: str, data_backend, cache_dir: str, distillation_type: str = "generic"):
        self.id = id
        self.data_backend = data_backend
        self.cache_dir = cache_dir or ""
        self.distillation_type = distillation_type or "generic"
        self._artifact_paths: List[str] = []
        self._artifact_queue: Deque[str] = deque()
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)

    # ---- discovery ------------------------------------------------------------------------
    def discover_all_files(self) -> List[str]:
        found = sorted(
            p for p in self.data_backend.list_files(
                file_extensions=["pt"], instance_data_dir=self.cache_dir
            )
        )
        existing = set(self._artifact_paths)
        for path in found:
            if path not in existing:
                self._artifact_paths.append(path)
                self._artifact_queue.append(path)
        self._artifact_paths.sort()
        return found

    def has_cached_pairs(self) -> bool:
        return bool(self._artifact_paths or self.discover_all_files())

    def __len__(self) -> int:
        if not self._artifact_paths:
            self.discover_all_files()
        return len(self._artifact_paths)

    # ---- write ------------------------------------------------------------------------------
    def next_artifact_name(self, prefix: str = "pair") -> str:
        return f"{prefix}_{len(self):05d}.pt"

    def write_pair(self, payload: Dict[str, Any], metadata: Optional[Dict[str, Any]] = None) -> str:
        """payload: dict of numpy arrays (latents, noise, optional embeds)."""
        record = dict(payload)
        record["metadata"] = dict(metadata or {})
        record["metadata"].setdefault("distillation_type", self.distillation_type)
        target = os.path.join(self.cache_dir, self.next_artifact_name())
        self.data_backend.torch_save(record, target)
        if target not in self._artifact_paths:
            self._artifact_paths.append(target)
            self._artifact_paths.sort()
        return target

    # ---- read -------------------------------------------------------------------------------
    def load_next_pair(self) -> Tuple[Optional[Dict[str, Any]], Optional[str]]:
        if not self._artifact_paths:
            self.discover_all_files()
        if not self._artifact_paths:
            return None, None
        if not self._artifact_queue:
            self._artifact_queue.extend(self._artifact_paths)
        path = self._artifact_queue.popleft()
        try:
            payload = self.data_backend.torch_load(path)
        except Exception as exc:
            logger.error("failed to load distillation artifact %s: %s", path, exc)
            return None, None
        if not isinstance(payload, dict):
            payload = {"value": payload}
        payload.setdefault("metadata", {})
        payload["metadata"].setdefault("artifact_path", path)
        return payload, path

    def next_batch(self, batch_size: int) -> Optional[Dict[str, np.ndarray]]:
        """Stack ``batch_size`` pairs into batch arrays (host side, per step)."""
        entries = []
        for _ in range(batch_size):
            payload, _ = self.load_next_pair()
            if payload is None:
                return None
            entries.append(payload)
        keys = [
            k for k, v in entries[0].items()
            if k != "metadata" and hasattr(v, "shape")
        ]
        return {k: np.stack([np.asarray(e[k], np.float32) for e in entries]) for k in keys}


def generate_ode_pairs(
    model,
    variables: Dict[str, Any],
    cache: DistillationCache,
    batches: List[Dict[str, Any]],
    num_steps: int = 28,
    seed: int = 0,
    max_pairs: Optional[int] = None,
) -> int:
    """Materialise (noise, teacher ODE endpoint) pairs from real caption batches.

    ``batches``: collated batches supplying the conditioning (text embeds and
    latent shapes).  For each sample we integrate the teacher's probability
    flow σ: 1 → 0 with ``num_steps`` Euler steps inside one jitted
    ``lax.scan`` (reference generator.py runs the torch pipeline stepwise on
    GPU; on TPU the whole solve is a single compiled program).
    Returns the number of pairs written.
    """
    import jax
    import jax.numpy as jnp

    if not model.is_flow:
        raise NotImplementedError(
            "ODE-pair generation targets flow-matching families "
            "(reference PerFlow/ReFlow caches)"
        )

    @jax.jit
    def solve(prepared, noise):
        dt = 1.0 / num_steps

        def body(carry, _):
            x, sigma = carry
            step = dict(prepared)
            step["noisy_latents"] = x
            b = x.shape[0]
            step["sigmas"] = jnp.full((b,), sigma, jnp.float32)
            step["timesteps"] = step["sigmas"]
            velocity = model.model_predict(variables, step)
            return (x - dt * velocity, sigma - dt), None

        (x0, _), _ = jax.lax.scan(body, (noise, jnp.float32(1.0)), None, length=num_steps)
        return x0

    written = 0
    rng = jax.random.PRNGKey(seed)
    for index, batch in enumerate(batches):
        latents = np.asarray(batch["latents"], np.float32)
        rng, sub, sub_prep = jax.random.split(rng, 3)
        noise = jax.random.normal(sub, latents.shape, jnp.float32)
        device_batch = {
            k: jnp.asarray(v) for k, v in batch.items()
            if hasattr(v, "dtype") and getattr(v, "dtype", None) is not None
            and np.asarray(v).dtype.kind in "fiub"
        }
        # the family's prepare_batch builds conditioning (img/txt ids etc.);
        # the solve then overrides the noising state per Euler step
        device_batch["override_noise"] = noise
        prepared = model.prepare_batch(sub_prep, device_batch)
        endpoint = np.asarray(solve(prepared, noise))
        embed_keys = [
            k for k in batch
            if k.endswith("_embeds") and isinstance(batch[k], np.ndarray)
        ]
        for i in range(latents.shape[0]):
            if max_pairs is not None and written >= max_pairs:
                break
            payload = {
                "latents": endpoint[i],
                "noise": np.asarray(noise[i]),
            }
            for k in embed_keys:
                payload[k] = np.asarray(batch[k][i], np.float32)
            cache.write_pair(
                payload,
                metadata={
                    "num_steps": num_steps,
                    "seed": seed,
                    "batch_index": index,
                    "scheduler": {"prediction_type": "flow_matching"},
                },
            )
            written += 1
    logger.info("distillation cache %s: wrote %d ODE pairs", cache.id, written)
    return written
