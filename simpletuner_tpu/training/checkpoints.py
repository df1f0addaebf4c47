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

import logging

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

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
        if str(resume_from).startswith(("s3://", "r2://")):
            return self.download_remote(str(resume_from))
        path = resume_from if os.path.isabs(resume_from) else os.path.join(self.output_dir, resume_from)
        return path if os.path.isdir(path) else None

    def download_remote(self, uri: str, client=None) -> str:
        """Download an s3://bucket/prefix checkpoint into output_dir and
        validate it before resuming (reference trainer.py:4485-4635: remote S3
        resume with manifest validation + guard files).

        ``client`` is injectable for tests; by default a boto3 client built
        from the usual AWS env vars (+ AWS_ENDPOINT_URL for R2/Wasabi).
        """
        rest = uri.split("://", 1)[1]
        bucket, _, prefix = rest.partition("/")
        prefix = prefix.rstrip("/")
        if not bucket or not prefix:
            raise ValueError(f"malformed remote checkpoint uri {uri!r}")
        if client is None:
            try:
                import boto3
            except ImportError as exc:
                raise RuntimeError(
                    "remote checkpoint resume needs boto3 (pip install boto3)"
                ) from exc
            client = boto3.client("s3", endpoint_url=os.environ.get("AWS_ENDPOINT_URL"))

        local = os.path.join(self.output_dir, os.path.basename(prefix))
        tmp = local + ".downloading"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)

        keys: list = []
        token = None
        while True:
            kwargs = {"Bucket": bucket, "Prefix": prefix + "/"}
            if token:
                kwargs["ContinuationToken"] = token
            page = client.list_objects_v2(**kwargs)
            keys.extend(obj["Key"] for obj in page.get("Contents", []))
            if not page.get("IsTruncated"):
                break
            token = page.get("NextContinuationToken")
        if not keys:
            raise FileNotFoundError(f"no objects under {uri}")

        for key in keys:
            rel = key[len(prefix) + 1:]
            dest = os.path.join(tmp, rel)
            os.makedirs(os.path.dirname(dest) or tmp, exist_ok=True)
            client.download_file(bucket, key, dest)

        manifest_path = os.path.join(tmp, MANIFEST_FILE)
        if not os.path.exists(manifest_path):
            shutil.rmtree(tmp)
            raise ValueError(f"remote checkpoint {uri} has no {MANIFEST_FILE}; refusing to resume")
        with open(manifest_path) as handle:
            manifest = json.load(handle)
        missing = [
            rel for rel in manifest.get("files", [])
            if not os.path.exists(os.path.join(tmp, rel))
        ]
        if missing:
            shutil.rmtree(tmp)
            raise ValueError(f"remote checkpoint {uri} incomplete; missing {missing[:5]}")
        if os.path.isdir(local):
            shutil.rmtree(local)
        os.replace(tmp, local)
        logger.info("downloaded remote checkpoint %s -> %s (%d objects)", uri, local, len(keys))
        return local

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
        import jax

        is_primary = jax.process_index() == 0
        multiprocess = jax.process_count() > 1
        final_path = self.path_for_step(step, rolling)
        tmp_path = final_path + ".tmp"
        if is_primary:
            if os.path.exists(tmp_path):
                shutil.rmtree(tmp_path)
            if os.path.exists(final_path):
                shutil.rmtree(final_path)
            os.makedirs(tmp_path, exist_ok=True)
        if multiprocess:
            # all processes participate in the Orbax write (each contributes
            # its addressable shards); host-side file surgery is primary-only
            from ..parallel.distributed import host_barrier

            host_barrier(f"ckpt_mkdir_{step}_{rolling}")

        self._checkpointer.save(os.path.join(tmp_path, "state"), state)

        def finalize():
            self._checkpointer.wait_until_finished()
            if multiprocess:
                from ..parallel.distributed import host_barrier

                host_barrier(f"ckpt_written_{step}_{rolling}")
            if not is_primary:
                return
            if extra_state:
                with open(os.path.join(tmp_path, "trainer_state.json"), "w") as handle:
                    json.dump(extra_state, handle)
            # relative file list lets remote-resume validate completeness
            # (reference trainer.py:4485-4635 manifest validation)
            files = []
            for root, _dirs, names in os.walk(tmp_path):
                for name in names:
                    if name == MANIFEST_FILE:
                        continue
                    files.append(
                        os.path.relpath(os.path.join(root, name), tmp_path)
                    )
            manifest = {
                "step": step,
                "rolling": rolling,
                "created_at": time.time(),
                "format_version": 1,
                "files": sorted(files),
            }
            with open(os.path.join(tmp_path, MANIFEST_FILE), "w") as handle:
                json.dump(manifest, handle)
            os.replace(tmp_path, final_path)
            with open(os.path.join(final_path, GUARD_FILE), "w") as handle:
                handle.write(str(step))
            self._cleanup(rolling)
            if on_complete is not None:
                on_complete(final_path)

        if self.async_save and not multiprocess:
            # multiprocess finalize holds a cross-process barrier; running it
            # on a background thread while the main thread issues collectives
            # can deadlock — force synchronous finalize across hosts
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
