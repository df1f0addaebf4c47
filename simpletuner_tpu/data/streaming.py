"""Streaming data plane: bucket-scan and sampling without materialization.

Reference: helpers/data_backend/huggingface.py streaming mode (``streaming=True``
IterableDataset).  The reference's streaming support is shallow — it cannot
list files (:865), reports ``len == 0`` (:949) and still routes through the
map-style metadata scan.  This module is the TPU-native replacement designed
for billion-sample datasets:

- **no materialization anywhere**: buckets are assigned per-row as the stream
  flows (width/height metadata columns when mapped, PIL probe of the image
  bytes otherwise) and rows buffer per-bucket until one bucket fills a batch
  (webdataset-style bucket batching);
- **shard-aware rank splits**: each process consumes a disjoint shard
  (``HuggingfaceDatasetsBackend.configure_sharding``), so the sampler emits
  *host-local* batches directly — the identical-global-batch + slice contract
  used by map-style datasets (``parallel/distributed.host_local_indices``)
  does not apply and ``MultiDatasetIterator`` skips it via
  ``emits_local_batches``;
- **bounded state**: per-sample metadata lives in an LRU sized to the
  backend's read window; resume state is a single stream cursor.

Resume semantics: ``save_state`` records the number of rows consumed from the
stream; ``load_state`` fast-forwards past them.  Rows that were buffered in a
partially-filled bucket at checkpoint time are dropped on resume (bounded by
buckets x batch_size; they were never trained on).  This is documented
behavior, not silent loss.
"""

from __future__ import annotations

import io
import logging
from collections import OrderedDict
from typing import Any, Dict, Iterator, List, Optional

from .buckets import BucketConfig, bucket_key_for_size, image_passes_constraints

logger = logging.getLogger(__name__)


class StreamingMetadataBackend:
    """Duck-type of ``MetadataBackend`` for streams: assigns buckets per-row,
    never scans, never persists a full index."""

    is_streaming = True

    def __init__(
        self,
        id: str,
        data_backend,
        bucket_config: BucketConfig,
        metadata_window: int = 8192,
    ):
        self.id = id
        self.data_backend = data_backend
        self.bucket_config = bucket_config
        self.metadata_window = int(metadata_window)
        # rolling metadata for recently-streamed samples (collate + VAE cache
        # read crop/size info from here)
        self.image_metadata: "OrderedDict[str, Dict[str, Any]]" = OrderedDict()
        # intentionally empty: nothing downstream may enumerate a stream
        self.aspect_ratio_bucket_indices: Dict[str, List[str]] = {}
        self.rank_suffix: Optional[str] = None
        self.instance_data_dir: Optional[str] = None
        self.repeats = 0
        self._skipped = 0
        self._assigned = 0

    # ---- per-row bucketing -------------------------------------------------------------------
    def _row_size(self, location: str, row: Dict[str, Any]) -> Optional[tuple]:
        size = None
        if hasattr(self.data_backend, "size_for"):
            size = self.data_backend.size_for(location)
        if size is not None:
            return size
        # no width/height columns mapped: probe the decoded image bytes
        try:
            from PIL import Image

            with Image.open(io.BytesIO(self.data_backend.read(location))) as img:
                orientation = (img.getexif() or {}).get(0x0112, 1)
                if orientation in (5, 6, 7, 8):
                    return img.size[1], img.size[0]
                return img.size
        except Exception:
            return None

    def assign(self, location: str, row: Dict[str, Any]) -> Optional[str]:
        """Bucket one streamed row; returns the bucket key or None (filtered).
        Records size metadata + a slim caption row for collate."""
        size = self._row_size(location, row)
        if size is None:
            self._skipped += 1
            return None
        width, height = size
        ok, reason = image_passes_constraints(width, height, self.bucket_config)
        if not ok:
            self._skipped += 1
            return None
        key = bucket_key_for_size(width, height, self.bucket_config, seed_token=location)
        meta: Dict[str, Any] = {"original_size": [width, height], "bucket": key}
        caption_col = getattr(self.data_backend, "caption_column", None)
        if caption_col and caption_col in row:
            value = row[caption_col]
            if isinstance(value, list):
                value = value[0] if value else ""
            # slim row (caption only — never image bytes) so parquet-style
            # caption lookup works without re-touching the stream window
            meta["row"] = {caption_col: str(value)}
        self.image_metadata[location] = meta
        while len(self.image_metadata) > self.metadata_window:
            self.image_metadata.popitem(last=False)
        self._assigned += 1
        return key

    # ---- MetadataBackend surface (inert for streams) -------------------------------------------
    def refresh(self, force: bool = False, max_workers: int = 16) -> Dict[str, List[str]]:
        return self.aspect_ratio_bucket_indices

    def discover(self, max_workers: int = 16) -> Dict[str, List[str]]:
        return self.aspect_ratio_bucket_indices

    def save_cache(self) -> None:  # nothing to persist: the index is the stream
        pass

    def load_cache(self) -> bool:
        return True

    def merge_rank_metadata(self, num_processes: int, write_union: bool = False) -> None:
        pass

    def bucket_keys(self) -> List[str]:
        return []

    def remove_image(self, path: str) -> None:
        self.image_metadata.pop(path, None)

    def split_buckets_between_processes(self, *args, **kwargs) -> Dict[str, List[str]]:
        return {}

    def __len__(self) -> int:
        raise TypeError(f"streaming dataset {self.id} has no length")


class StreamingSampler:
    """Bucket-batching over an unbounded stream.

    Pulls (position, row) from ``backend.stream_rows``, assigns each row to an
    aspect bucket, and yields a batch the moment any bucket's buffer reaches
    ``batch_size``.  Emits **host-local** batches (the backend shard is already
    rank-disjoint).
    """

    emits_local_batches = True

    def __init__(
        self,
        id: str,
        backend,
        metadata_backend: StreamingMetadataBackend,
        batch_size: int,
        max_buffered_buckets: int = 64,
    ):
        self.id = id
        self.backend = backend
        self.metadata_backend = metadata_backend
        self.batch_size = int(batch_size)
        self.max_buffered_buckets = int(max_buffered_buckets)
        self.current_epoch = 0
        self._rows_consumed = 0  # cursor into this process's shard
        self._buffers: Dict[str, List[Dict[str, Any]]] = {}

    # ---- state (checkpoint/resume) --------------------------------------------------------------
    def save_state(self) -> Dict[str, Any]:
        buffered = sum(len(v) for v in self._buffers.values())
        if buffered:
            logger.info(
                "streaming sampler %s: %d buffered sample(s) in partially-filled "
                "buckets will be dropped on resume (never trained on)",
                self.id, buffered,
            )
        return {
            "id": self.id,
            "streaming": True,
            "current_epoch": self.current_epoch,
            "rows_consumed": self._rows_consumed,
            "batch_size": self.batch_size,
        }

    def load_state(self, state: Dict[str, Any]) -> None:
        if not state.get("streaming"):
            logger.warning(
                "streaming sampler %s: checkpoint state is from a map-style "
                "sampler; restarting the stream from position 0", self.id
            )
            return
        if state.get("batch_size") not in (None, self.batch_size):
            return  # schedule change: restart the stream (mirrors MultiAspectSampler)
        self.current_epoch = int(state.get("current_epoch", 0))
        self._rows_consumed = int(state.get("rows_consumed", 0))
        self._buffers = {}

    # ---- iteration -------------------------------------------------------------------------
    def __iter__(self) -> Iterator[List[Dict[str, Any]]]:
        self._buffers = {}
        for pos, row in self.backend.stream_rows(
            skip=self._rows_consumed, epoch=self.current_epoch
        ):
            self._rows_consumed += 1
            location = f"hf://{pos}"
            key = self.metadata_backend.assign(location, row)
            if key is None:
                continue
            buffer = self._buffers.setdefault(key, [])
            buffer.append(
                {
                    "image_path": location,
                    "bucket": key,
                    "dataset_id": self.id,
                    "metadata": dict(self.metadata_backend.image_metadata.get(location, {})),
                }
            )
            if len(buffer) >= self.batch_size:
                yield buffer[: self.batch_size]
                self._buffers[key] = buffer[self.batch_size:]
            elif len(self._buffers) > self.max_buffered_buckets:
                # too many distinct aspect buckets in flight: evict the
                # smallest buffer so the window stays bounded (loud, counted)
                smallest = min(self._buffers, key=lambda k: len(self._buffers[k]))
                dropped = self._buffers.pop(smallest)
                logger.warning(
                    "streaming sampler %s: evicting %d sample(s) from bucket %s "
                    "(> %d buckets in flight); widen aspect constraints or raise "
                    "max_buffered_buckets",
                    self.id, len(dropped), smallest, self.max_buffered_buckets,
                )
        # stream exhausted: epoch rollover (drop incomplete buffers, reset cursor)
        leftover = sum(len(v) for v in self._buffers.values())
        if leftover:
            logger.info(
                "streaming sampler %s: epoch %d ended with %d sample(s) in "
                "incomplete buckets (dropped; counted for audit)",
                self.id, self.current_epoch, leftover,
            )
        self.current_epoch += 1
        self._rows_consumed = 0
        self._buffers = {}

    def __len__(self) -> int:
        estimate = getattr(self.backend, "estimated_samples", None)
        if estimate:
            return max(int(estimate) // self.batch_size, 1)
        raise TypeError(f"streaming dataset {self.id} has no known length")
