"""Checkpoint save/resume.

Reference semantics (reference: helpers/training/trainer.py:6105-6226 save,
:4636 resume, :6013-6075 retention; SURVEY.md §5.4): step/epoch/rolling
checkpoints written atomically (tmp dir + guard file + manifest), retention
cleanup by ``checkpoints_total_limit``, resume restores optimizer/EMA/sampler
state.  TPU-native storage is Orbax (sharded, async-capable); exports for the
release artifact path are safetensors via ``training/lora.py``.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from typing import Any, Dict, List, Optional

import jax
import orbax.checkpoint as ocp

GUARD_FILE = ".checkpoint_complete"
MANIFEST_FILE = "manifest.json"
_STEP_RE = re.compile(r"checkpoint-(\d+)$")


class CheckpointManager:
    def __init__(
        self,
        output_dir: str,
        total_limit: Optional[int] = None,
        rolling_total_limit: int = 1,
        async_save: bool = False,
    ):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self.total_limit = total_limit
        self.rolling_total_limit = rolling_total_limit
        self.async_save = async_save
        self._checkpointer = ocp.StandardCheckpointer()
        self._pending = None  # in-flight async finalize thread
        self._pending_error: Optional[BaseException] = None  # raised by a background finalize

    # ---- paths --------------------------------------------------------------------------
    def path_for_step(self, step: int, rolling: bool = False) -> str:
        suffix = f"rolling-checkpoint-{step}" if rolling else f"checkpoint-{step}"
        return os.path.join(self.output_dir, suffix)

    def list_checkpoints(self, rolling: bool = False) -> List[str]:
        prefix = "rolling-checkpoint-" if rolling else "checkpoint-"
        found = []
        for name in os.listdir(self.output_dir):
            if name.startswith(prefix) and name[len(prefix):].isdigit():
                path = os.path.join(self.output_dir, name)
                if os.path.exists(os.path.join(path, GUARD_FILE)):
                    found.append(path)
        return sorted(found, key=lambda p: int(p.rsplit("-", 1)[1]))

    def latest_checkpoint(self) -> Optional[str]:
        complete = self.list_checkpoints() + self.list_checkpoints(rolling=True)
        if not complete:
            return None
        return max(complete, key=lambda p: int(p.rsplit("-", 1)[1]))

    def resolve_resume(self, resume_from: Optional[str]) -> Optional[str]:
        if not resume_from or resume_from in ("none", "false"):
            return None
        if resume_from == "latest":
            return self.latest_checkpoint()
        path = resume_from if os.path.isabs(resume_from) else os.path.join(self.output_dir, resume_from)
        return path if os.path.isdir(path) else None

    # ---- save ----------------------------------------------------------------------------
    def save(
        self,
        step: int,
        state,
        extra_state: Optional[Dict[str, Any]] = None,
        rolling: bool = False,
        on_complete: Optional[Any] = None,  # callable(final_path) after finalize
    ) -> str:
        """Atomic: write to tmp dir, fsync metadata, rename, then guard file.

        With ``async_save`` the Orbax write and the finalize (manifest + rename
        + guard + retention) run on a background thread so the train loop
        resumes immediately (SURVEY.md §5.4 Orbax async mapping); the next save
        joins any in-flight one first.
        """
        self.wait()
        final_path = self.path_for_step(step, rolling)
        tmp_path = final_path + ".tmp"
        if os.path.exists(tmp_path):
            shutil.rmtree(tmp_path)
        if os.path.exists(final_path):
            shutil.rmtree(final_path)
        os.makedirs(tmp_path, exist_ok=True)

        self._checkpointer.save(os.path.join(tmp_path, "state"), state)

        def finalize():
            self._checkpointer.wait_until_finished()
            if extra_state:
                with open(os.path.join(tmp_path, "trainer_state.json"), "w") as handle:
                    json.dump(extra_state, handle)
            manifest = {
                "step": step,
                "rolling": rolling,
                "created_at": time.time(),
                "format_version": 1,
            }
            with open(os.path.join(tmp_path, MANIFEST_FILE), "w") as handle:
                json.dump(manifest, handle)
            os.replace(tmp_path, final_path)
            with open(os.path.join(final_path, GUARD_FILE), "w") as handle:
                handle.write(str(step))
            self._cleanup(rolling)
            if on_complete is not None:
                on_complete(final_path)

        if self.async_save:
            import threading

            def guarded_finalize():
                # Thread.join never re-raises — capture so wait()/the next
                # save() surfaces Orbax/disk failures instead of silently
                # continuing without a checkpoint
                try:
                    finalize()
                except BaseException as exc:  # noqa: BLE001
                    self._pending_error = exc

            self._pending = threading.Thread(target=guarded_finalize, daemon=True)
            self._pending.start()
        else:
            finalize()
        return final_path

    def wait(self) -> None:
        """Join any in-flight async save (call before resume/exit); re-raises a
        background finalize failure."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._pending_error is not None:
            error, self._pending_error = self._pending_error, None
            raise RuntimeError("async checkpoint finalize failed") from error

    def _cleanup(self, rolling: bool) -> None:
        limit = self.rolling_total_limit if rolling else self.total_limit
        if not limit or limit <= 0:
            return
        checkpoints = self.list_checkpoints(rolling=rolling)
        for path in checkpoints[:-limit]:
            shutil.rmtree(path, ignore_errors=True)
        # delete incomplete (unguarded) temp dirs too, like the reference's
        # unguarded-latest cleanup (trainer.py:4605-4635)
        for name in os.listdir(self.output_dir):
            if name.endswith(".tmp"):
                shutil.rmtree(os.path.join(self.output_dir, name), ignore_errors=True)

    # ---- restore --------------------------------------------------------------------------
    def restore(self, path: str, target_state):
        """Restore into the structure/shardings of ``target_state``."""
        self.wait()
        restored = self._checkpointer.restore(
            os.path.join(path, "state"), target=target_state
        )
        extra_path = os.path.join(path, "trainer_state.json")
        extra = {}
        if os.path.exists(extra_path):
            with open(extra_path) as handle:
                extra = json.load(handle)
        return restored, extra
