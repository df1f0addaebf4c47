"""Profiler session windowing, memory report, disk guard thresholds."""

import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.training.profiling import DiskGuard, ProfilerSession, device_memory_report


def _cfg(**extra):
    return TrainingConfig(
        {"model_family": "flux", "optimizer": "adamw", "learning_rate": 1e-4,
         "max_train_steps": 10, **extra}
    )


class TestProfiler:
    def test_disabled_by_default(self, tmp_path):
        session = ProfilerSession(_cfg(), str(tmp_path))
        assert not session.enabled
        session.step(0)  # no-op

    def test_window_parsing(self, tmp_path):
        session = ProfilerSession(_cfg(profile_steps="3-6"), str(tmp_path))
        assert session.enabled
        assert (session.start_step, session.stop_step) == (3, 6)

    def test_single_step_form(self, tmp_path):
        session = ProfilerSession(_cfg(profile_steps=10), str(tmp_path))
        assert (session.start_step, session.stop_step) == (10, 15)


def test_memory_report_runs():
    report = device_memory_report()
    assert isinstance(report, dict)


class TestDiskGuard:
    def test_plenty_of_space(self, tmp_path):
        guard = DiskGuard(_cfg(disk_space_threshold_gb=0.001), str(tmp_path))
        assert guard.check_before_checkpoint()

    def test_warn_skips(self, tmp_path):
        guard = DiskGuard(_cfg(disk_space_threshold_gb=10 ** 9), str(tmp_path))
        assert not guard.check_before_checkpoint()

    def test_stop_raises(self, tmp_path):
        guard = DiskGuard(
            _cfg(disk_space_threshold_gb=10 ** 9, disk_space_action="stop"), str(tmp_path)
        )
        with pytest.raises(RuntimeError, match="low disk space"):
            guard.check_before_checkpoint()
