"""PublishingManager: export artifacts + background uploads.

Reference: helpers/publishing/manager.py (hub model cards + push), providers
S3/Azure/Dropbox (helpers/publishing/providers/), background upload executor
(trainer.py:2101-2199), post-upload user scripts (training/script_runner.py).
"""

from __future__ import annotations

import logging
import os
import subprocess
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, List, Optional

from .metadata import build_model_card

logger = logging.getLogger(__name__)


class PublishingManager:
    def __init__(self, model, config, output_dir: str):
        self.model = model
        self.config = config
        self.output_dir = output_dir
        self._executor = ThreadPoolExecutor(max_workers=2, thread_name_prefix="publish")
        self._pending: List[Future] = []

    # ---- model card ---------------------------------------------------------------------
    def write_model_card(
        self,
        path: Optional[str] = None,
        validation_prompts: Optional[List[str]] = None,
        validation_images: Optional[List[str]] = None,
        train_steps: Optional[int] = None,
    ) -> str:
        card = build_model_card(
            self.model, self.config, validation_prompts, validation_images, train_steps
        )
        path = path or os.path.join(self.output_dir, "README.md")
        with open(path, "w") as handle:
            handle.write(card)
        return path

    # ---- hub upload -----------------------------------------------------------------------
    def push_to_hub(self, checkpoint_path: str, blocking: bool = False) -> Optional[Future]:
        repo_id = self.config.get("hub_model_id")
        if not repo_id or not self.config.get("push_to_hub"):
            return None

        def upload():
            from huggingface_hub import HfApi

            api = HfApi()
            api.create_repo(repo_id, exist_ok=True, private=bool(self.config.get("hub_private", True)))
            api.upload_folder(
                folder_path=checkpoint_path,
                repo_id=repo_id,
                commit_message=f"training checkpoint {os.path.basename(checkpoint_path)}",
            )
            logger.info("pushed %s to hub repo %s", checkpoint_path, repo_id)

        if blocking:
            upload()
            return None
        future = self._executor.submit(self._guarded, upload)
        self._pending.append(future)
        return future

    # ---- provider upload (S3 / Azure Blob / Dropbox) --------------------------------------
    def upload_to_provider(self, checkpoint_path: str) -> Optional[Future]:
        from .providers import get_provider

        provider = get_provider(self.config)
        if provider is None:
            return None

        def upload():
            provider.upload(checkpoint_path)
            # post-upload user script (reference training/script_runner.py,
            # trainer.py:2115-2147 post-upload hooks)
            script = self.config.get("post_upload_script")
            if script:
                subprocess.run(
                    [str(script), checkpoint_path],
                    check=False,
                    timeout=float(self.config.get("post_checkpoint_script_timeout", 600) or 600),
                )

        future = self._executor.submit(self._guarded, upload)
        self._pending.append(future)
        return future

    # ---- post-checkpoint user script (reference script_runner.py) --------------------------
    def run_post_checkpoint_script(self, checkpoint_path: str) -> None:
        script = self.config.get("post_checkpoint_script")
        if not script:
            return
        try:
            subprocess.run(
                [str(script), checkpoint_path],
                check=False,
                timeout=float(self.config.get("post_checkpoint_script_timeout", 600) or 600),
            )
        except Exception as exc:
            logger.warning("post-checkpoint script failed: %s", exc)

    def on_checkpoint(self, checkpoint_path: str, final: bool = False) -> None:
        """Everything that follows a checkpoint: card, uploads, user script.

        Intermediate checkpoints push to the hub only with
        --push_checkpoints_to_hub (reference cmd_args: push_to_hub covers the
        final artifact, push_checkpoints_to_hub every interval)."""
        if final or self.config.get("push_checkpoints_to_hub"):
            self.push_to_hub(checkpoint_path)
        self.upload_to_provider(checkpoint_path)
        self.run_post_checkpoint_script(checkpoint_path)

    @staticmethod
    def _guarded(fn):
        try:
            fn()
        except Exception as exc:  # uploads must never kill training
            logger.warning("background publish failed: %s", exc)

    def wait(self, timeout: Optional[float] = None) -> None:
        # submitted fns are wrapped by _guarded (which logs), so result() can
        # only raise on timeout — surface that instead of swallowing it
        for future in self._pending:
            try:
                future.result(timeout=timeout)
            except Exception as exc:
                logger.warning("pending publish did not finish: %s", exc)
        self._pending.clear()
