"""Profiling & resource guards.

Reference: SURVEY.md §5.1 — opt-in torch.profiler session (trainer.py:6317),
memory attribution reports (trainer.py:2587), and the disk-space guard with a
STOP action before checkpoints (disk_space.py; trainer.py:6076-6104).
TPU equivalents: ``jax.profiler`` xplane traces, device memory stats, and the
same free-space thresholds.
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Any, Dict, Optional

import jax

logger = logging.getLogger(__name__)


class ProfilerSession:
    """jax.profiler trace over a step window (view in TensorBoard/XProf)."""

    def __init__(self, config: Any, output_dir: str):
        self.log_dir = os.path.join(output_dir, "profile")
        raw = config.get("profile_steps") if hasattr(config, "get") else None
        self.start_step: Optional[int] = None
        self.stop_step: Optional[int] = None
        if raw:
            if isinstance(raw, str) and "-" in raw:
                start, stop = raw.split("-", 1)
                self.start_step, self.stop_step = int(start), int(stop)
            else:
                self.start_step = int(raw)
                self.stop_step = self.start_step + 5
        self._active = False

    @property
    def enabled(self) -> bool:
        return self.start_step is not None

    def step(self, global_step: int) -> None:
        if not self.enabled:
            return
        if not self._active and global_step == self.start_step:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            logger.info("profiler trace started at step %d -> %s", global_step, self.log_dir)
        elif self._active and global_step >= (self.stop_step or 0):
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler trace stopped at step %d", global_step)

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def device_memory_report() -> Dict[str, Any]:
    """Per-device HBM stats (reference _report_cuda_usage, trainer.py:2587)."""
    report = {}
    for device in jax.local_devices():
        try:
            stats = device.memory_stats()
        except Exception:
            stats = None
        if stats:
            report[str(device)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return report


class DiskGuard:
    """Free-space thresholds with a STOP action before checkpoint writes
    (reference helpers/training/disk_space.py + cmd_args.py:1422-1435)."""

    def __init__(self, config: Any, output_dir: str):
        self.output_dir = output_dir
        self.threshold_gb = float(config.get("disk_space_threshold_gb", 5.0) or 5.0)
        self.action = (config.get("disk_space_action") or "warn").lower()  # warn | stop

    def free_gb(self) -> float:
        usage = shutil.disk_usage(self.output_dir)
        return usage.free / 1e9

    def check_before_checkpoint(self) -> bool:
        """False → the caller must skip the checkpoint (or abort on 'stop')."""
        free = self.free_gb()
        if free >= self.threshold_gb:
            return True
        message = f"low disk space: {free:.1f} GB free < {self.threshold_gb:.1f} GB threshold"
        if self.action == "stop":
            raise RuntimeError(message + " (disk_space_action=stop)")
        logger.warning("%s; skipping checkpoint", message)
        return False
