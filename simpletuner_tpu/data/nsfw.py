"""NSFW scan-and-filter hook for caching passes.

Reference: helpers/image_manipulation/nsfw_classifier.py + the VAE cache's
scan pass (helpers/caching/vae.py:578-635) — images are classified during VAE
cache preprocessing, rejected files are excluded from the bucket index, and a
JSON report is written next to the cache.

Video semantics (reference nsfw_classifier.py:143-190, :306-332): a sample
with multiple frames has ``nsfw_check_video_frame_count`` frames selected by
``nsfw_check_video_frame_selection`` (first | middle | uniform), each frame is
classified by the full ensemble, and the video is rejected once
``nsfw_check_video_min_flagged_frames`` frames are flagged.

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
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)

DEFAULT_NSFW_CHECK_MODELS = "Falconsai/nsfw_image_detection:0.85"


def csv_option_allows(value: Any, candidate: str) -> bool:
    """True when a csv option ("all" or a comma list) permits ``candidate``
    (reference nsfw_classifier.py:99-112)."""
    if value is None:
        return False
    items = value.split(",") if isinstance(value, str) else list(value)
    tokens = {str(v).strip().lower() for v in items if str(v).strip()}
    return "all" in tokens or candidate.lower() in tokens


def select_frame_indices(total_frames: int, frame_count: int, selection: str) -> List[int]:
    """Frame indices to classify (reference nsfw_classifier.py:143-160)."""
    if total_frames <= 0:
        return []
    frame_count = max(1, min(int(frame_count), total_frames))
    selection = str(selection or "uniform").lower()
    if selection == "first":
        return list(range(frame_count))
    if selection == "middle":
        start = max(0, (total_frames - frame_count) // 2)
        return list(range(start, start + frame_count))
    if selection != "uniform":
        raise ValueError(f"Unknown NSFW video frame selection mode: {selection}")
    if frame_count == 1:
        return [total_frames // 2]
    indices = [round(i * (total_frames - 1) / (frame_count - 1)) for i in range(frame_count)]
    return sorted(dict.fromkeys(indices))


def extract_classifier_frames(sample: Any, frame_count: int = 3, selection: str = "uniform"):
    """Normalize an image / frame-list / (T,H,W,C) array into a list of PIL
    frames for classification (reference nsfw_classifier.py:163-190)."""
    import numpy as np
    from PIL import Image

    def to_pil(frame):
        if isinstance(frame, Image.Image):
            return frame.convert("RGB")
        array = np.asarray(frame)
        if array.dtype != np.uint8:
            lo, hi = float(array.min()), float(array.max())
            if hi <= 1.01 and lo >= -0.01:
                array = (array * 255.0).clip(0, 255)
            elif lo < 0:  # [-1, 1] normalized
                array = ((array + 1.0) * 127.5).clip(0, 255)
            array = array.astype(np.uint8)
        if array.ndim == 3 and array.shape[0] in (1, 3) and array.shape[-1] not in (1, 3):
            array = np.moveaxis(array, 0, -1)  # CHW -> HWC
        if array.ndim == 3 and array.shape[-1] == 1:
            array = array[..., 0]
        return Image.fromarray(array).convert("RGB")

    if isinstance(sample, Image.Image):
        # keep identity for already-RGB images (classifier_fn hooks may rely
        # on attributes tagged by the reader)
        return [sample if sample.mode == "RGB" else sample.convert("RGB")]
    if isinstance(sample, (list, tuple)):
        indices = select_frame_indices(len(sample), frame_count, selection)
        return [to_pil(sample[i]) for i in indices]
    array = np.asarray(sample)
    if array.ndim == 5:
        array = array[0]
    if array.ndim == 4:
        indices = select_frame_indices(array.shape[0], frame_count, selection)
        return [to_pil(array[i]) for i in indices]
    return [to_pil(array)]


class NSFWFilter:
    """Ensemble image classifier with majority voting (reference
    nsfw_check_min_votes) and per-frame video voting."""

    def __init__(
        self,
        models_csv: str = DEFAULT_NSFW_CHECK_MODELS,
        min_votes: int = 1,
        classifier_fn: Optional[Callable[[Any], bool]] = None,
        video_frame_count: int = 3,
        video_frame_selection: str = "uniform",
        video_min_flagged_frames: int = 1,
        delete_fn: Optional[Callable[[str], None]] = None,
    ):
        self.specs: List[Tuple[str, float]] = []
        for entry in (models_csv or "").split(","):
            entry = entry.strip()
            if not entry:
                continue
            model_id, _, thresh = entry.partition(":")
            self.specs.append((model_id, float(thresh) if thresh else 0.85))
        self.min_votes = max(1, int(min_votes))
        # reference nsfw_classifier.py:212-217 validation
        self.video_frame_count = int(video_frame_count)
        self.video_min_flagged_frames = int(video_min_flagged_frames)
        self.video_frame_selection = str(video_frame_selection or "uniform").lower()
        if self.video_frame_count < 1:
            raise ValueError("nsfw_check_video_frame_count must be at least 1.")
        if self.video_min_flagged_frames < 1:
            raise ValueError("nsfw_check_video_min_flagged_frames must be at least 1.")
        if self.video_min_flagged_frames > self.video_frame_count:
            raise ValueError(
                "nsfw_check_video_min_flagged_frames cannot exceed nsfw_check_video_frame_count."
            )
        if self.video_frame_selection not in ("first", "middle", "uniform"):
            raise ValueError(
                f"Unknown NSFW video frame selection mode: {self.video_frame_selection}"
            )
        self.classifier_fn = classifier_fn
        self.delete_fn = delete_fn  # --delete_nsfw_images (factory.py:4185)
        self._pipelines = None
        self._lock = threading.Lock()
        self.report: Dict[str, Any] = {
            "images_scanned": 0,
            "images_rejected": 0,
            "rejected_files": [],
            "files_deleted": 0,
        }

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

    def _frame_flagged(self, frame) -> bool:
        """One frame through the full ensemble: flagged when votes reach
        nsfw_check_min_votes (reference classify_image)."""
        if self.classifier_fn is not None:
            return bool(self.classifier_fn(frame))
        self._ensure_pipelines()
        votes = 0
        for pipe, threshold in self._pipelines:
            for result in pipe(frame):
                if result["label"].lower() in ("nsfw", "porn", "explicit") and result["score"] >= threshold:
                    votes += 1
                    break
        return votes >= self.min_votes

    def is_rejected(self, sample, filepath: str = "") -> bool:
        """True when the sample is NSFW.  Multi-frame samples (video) count
        flagged frames against nsfw_check_video_min_flagged_frames
        (reference classify_sample, nsfw_classifier.py:306-332)."""
        frames = extract_classifier_frames(
            sample, self.video_frame_count, self.video_frame_selection
        )
        if not frames:
            raise ValueError(f"No frames available for NSFW classification: {filepath}")
        flagged = 0
        rejected = False
        for frame in frames:
            if self._frame_flagged(frame):
                flagged += 1
                if flagged >= self.video_min_flagged_frames:
                    rejected = True
                    break
        with self._lock:
            self.report["images_scanned"] += 1
            if rejected:
                self.report["images_rejected"] += 1
                self.report["rejected_files"].append(filepath)
        return rejected

    def filter_files(self, paths: Sequence[str], read_image) -> List[str]:
        """Return the subset of ``paths`` that pass the scan.  Rejected files
        are deleted from the storage backend when delete_nsfw_images is set
        (reference vae.py:447 delete_from_backend)."""
        safe = []
        for path in paths:
            try:
                image = read_image(path)
            except Exception:
                continue
            if self.is_rejected(image, path):
                logger.warning("Rejected NSFW sample during cache preprocessing: %s", path)
                if self.delete_fn is not None:
                    try:
                        self.delete_fn(path)
                        with self._lock:
                            self.report["files_deleted"] += 1
                    except Exception as exc:
                        logger.error("delete_nsfw_images: could not delete %s: %s", path, exc)
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
