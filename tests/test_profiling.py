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


class TestDiskGuardReferenceMode:
    """disk_low_threshold/_action/_script (reference disk_space.py semantics)."""

    def test_threshold_parsing(self):
        from simpletuner_tpu.training.profiling import parse_size_threshold

        assert parse_size_threshold("100G") == 100 * 1024 ** 3
        assert parse_size_threshold("50M") == 50 * 1024 ** 2
        assert parse_size_threshold("1.5T") == int(1.5 * 1024 ** 4)
        assert parse_size_threshold("512") == 512
        assert parse_size_threshold(None) is None
        with pytest.raises(ValueError, match="disk_low_threshold"):
            parse_size_threshold("ten gigs")

    def test_stop_action(self, tmp_path):
        guard = DiskGuard(
            _cfg(disk_low_threshold="1024T", disk_low_action="stop"), str(tmp_path)
        )
        with pytest.raises(RuntimeError, match="critically low"):
            guard.check_before_checkpoint()

    def test_plenty_passes(self, tmp_path):
        guard = DiskGuard(_cfg(disk_low_threshold="1K"), str(tmp_path))
        assert guard.check_before_checkpoint()

    def test_script_action_runs_cleanup(self, tmp_path):
        marker = tmp_path / "ran"
        script = tmp_path / "cleanup.sh"
        script.write_text(f"#!/bin/sh\ntouch {marker}\n")
        script.chmod(0o755)
        guard = DiskGuard(
            _cfg(disk_low_threshold="1024T", disk_low_action="script",
                 disk_low_script=str(script)),
            str(tmp_path),
        )
        # script runs, then space is still low -> stop
        with pytest.raises(RuntimeError, match="still low"):
            guard.check_before_checkpoint()
        assert marker.exists()

    def test_script_action_requires_script(self, tmp_path):
        with pytest.raises(ValueError, match="disk_low_script"):
            DiskGuard(
                _cfg(disk_low_threshold="1024T", disk_low_action="script"),
                str(tmp_path),
            )

    def test_unknown_action_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="disk_low_action"):
            DiskGuard(_cfg(disk_low_action="panic"), str(tmp_path))

    def test_nonexistent_output_dir_walks_parents(self, tmp_path):
        guard = DiskGuard(_cfg(disk_low_threshold="1K"), str(tmp_path / "not" / "yet"))
        assert guard.free_bytes() > 0
