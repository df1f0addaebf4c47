"""NSFW scan-and-filter hook for caching passes.

Reference: helpers/image_manipulation/nsfw_classifier.py + the VAE cache's
scan pass (helpers/caching/vae.py:578-635) — images are classified during VAE
cache preprocessing, rejected files are excluded from the bucket index, and a
JSON report is written next to the cache.

The classifier ensemble itself is an HF image-classification pipeline
(default Falconsai/nsfw_image_detection); loading is lazy and a clear error
is raised when the model is unavailable (e.g. offline).  A custom callable
can be injected for testing or alternative policies via ``classifier_fn``.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)

DEFAULT_NSFW_CHECK_MODELS = "Falconsai/nsfw_image_detection:0.85"


class NSFWFilter:
    """Ensemble image classifier with majority voting (reference
    nsfw_check_min_votes)."""

    def __init__(
        self,
        models_csv: str = DEFAULT_NSFW_CHECK_MODELS,
        min_votes: int = 1,
        classifier_fn: Optional[Callable[[Any], bool]] = None,
    ):
        self.specs: List[Tuple[str, float]] = []
        for entry in (models_csv or "").split(","):
            entry = entry.strip()
            if not entry:
                continue
            model_id, _, thresh = entry.partition(":")
            self.specs.append((model_id, float(thresh) if thresh else 0.85))
        self.min_votes = max(1, int(min_votes))
        self.classifier_fn = classifier_fn
        self._pipelines = None
        self._lock = threading.Lock()
        self.report: Dict[str, Any] = {"images_scanned": 0, "images_rejected": 0, "rejected_files": []}

    def _ensure_pipelines(self):
        if self.classifier_fn is not None or self._pipelines is not None:
            return
        with self._lock:
            if self._pipelines is not None:
                return
            pipelines = []
            for model_id, threshold in self.specs:
                try:
                    from transformers import pipeline

                    pipelines.append((pipeline("image-classification", model=model_id), threshold))
                except Exception as exc:
                    raise RuntimeError(
                        f"NSFW scan requested but classifier {model_id!r} could not be "
                        f"loaded (offline or missing): {exc}.  Pre-download the model "
                        "or disable enable_nsfw_check."
                    ) from exc
            self._pipelines = pipelines

    def is_rejected(self, image, filepath: str = "") -> bool:
        """True when the ensemble votes the sample NSFW."""
        if self.classifier_fn is not None:
            rejected = bool(self.classifier_fn(image))
        else:
            self._ensure_pipelines()
            votes = 0
            for pipe, threshold in self._pipelines:
                for result in pipe(image):
                    if result["label"].lower() in ("nsfw", "porn", "explicit") and result["score"] >= threshold:
                        votes += 1
                        break
            rejected = votes >= self.min_votes
        with self._lock:
            self.report["images_scanned"] += 1
            if rejected:
                self.report["images_rejected"] += 1
                self.report["rejected_files"].append(filepath)
        return rejected

    def filter_files(self, paths: Sequence[str], read_image) -> List[str]:
        """Return the subset of ``paths`` that pass the scan."""
        safe = []
        for path in paths:
            try:
                image = read_image(path)
            except Exception:
                continue
            if self.is_rejected(image, path):
                logger.warning("Rejected NSFW sample during cache preprocessing: %s", path)
                continue
            safe.append(path)
        return safe

    def write_report(self, cache_dir: str, backend_id: str) -> None:
        if self.report["images_scanned"] == 0:
            return
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, "nsfw_classifier_report_rank0.json")
        with open(path, "w") as handle:
            json.dump({"data_backend_id": backend_id, "summary": self.report}, handle, indent=2)
