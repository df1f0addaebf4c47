"""HuggingFace datasets storage backend (map-style + streaming).

Reference: helpers/data_backend/huggingface.py (1,107 LoC: map-style random
access, ``streaming=True`` IterableDataset mode, image/video/audio column
config, virtual ``hf://`` paths, local sidecar cache for .pt/.json artifacts).

Map-style rows are addressed as ``hf://<index>``; image bytes come from the
configured image column, captions from the caption column.  Cache tensors
(VAE/text) are written to a local sidecar directory since HF datasets are
read-only.

Streaming mode (``"streaming": true`` in the dataset entry) targets
billion-sample datasets that can never be materialized:

- the underlying ``datasets.IterableDataset`` is rank-split with
  ``split_dataset_by_node`` (falling back to modulo skip-sharding) so each
  training process consumes a disjoint shard — shard-aware by design, unlike
  the reference which streams the full set on every rank
  (helpers/data_backend/huggingface.py:865 "Cannot list files in streaming
  mode");
- rows are addressed by stream position (``hf://<pos>``) and held in a bounded
  window so the collate path can ``read()`` them between sampler yield and
  batch assembly; reading an evicted position is a hard error, never a silent
  skip;
- ``column_map`` remaps logical columns (image/caption/width/height) onto the
  dataset's actual schema, extending the reference's image_column/
  caption_column pair.
"""

from __future__ import annotations

import io
import logging
import os
import threading
from collections import OrderedDict
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

from .base import BaseDataBackend

logger = logging.getLogger(__name__)

# bounded number of materialized rows kept for read()/caption_for(); must
# comfortably exceed (bucket count x batch size) + prefetch depth so rows
# survive from sampler yield to collate
DEFAULT_STREAM_WINDOW = 8192


class HuggingfaceDatasetsBackend(BaseDataBackend):
    type = "huggingface"

    def __init__(self, config, compress_cache: bool = False):
        import datasets

        extra = getattr(config, "extra", {}) or {}
        self.id = config.id
        self.compress_cache = compress_cache
        dataset_name = extra.get("dataset_name") or config.instance_data_dir
        if not dataset_name:
            raise ValueError(f"dataset {config.id}: huggingface backend needs dataset_name")
        split = extra.get("split", "train")
        revision = extra.get("revision")
        column_map = dict(extra.get("column_map") or {})
        self.image_column = column_map.get("image") or extra.get("image_column", "image")
        self.caption_column = column_map.get("caption") or extra.get("caption_column", "caption")
        self.width_column = column_map.get("width") or extra.get("width_column")
        self.height_column = column_map.get("height") or extra.get("height_column")
        self.streaming = bool(extra.get("streaming", False))
        self.shuffle_buffer_size = int(extra.get("shuffle_buffer_size", 0) or 0)
        self.stream_window = int(extra.get("stream_window", DEFAULT_STREAM_WINDOW) or DEFAULT_STREAM_WINDOW)
        # optional size hint for progress reporting/weighting; never required
        self.estimated_samples = extra.get("estimated_samples")
        self._dataset_name = dataset_name
        self._split = split
        self._revision = revision
        # rank split applied lazily via configure_sharding (factory calls it
        # once process topology is known)
        self._process_index = 0
        self._num_processes = 1
        # streaming row window: stream position -> row dict
        self._window: "OrderedDict[int, Dict[str, Any]]" = OrderedDict()
        self._window_lock = threading.Lock()
        self._evicted_through = -1  # highest position ever evicted

        if self.streaming:
            if os.path.isdir(str(dataset_name)):
                base = datasets.load_from_disk(dataset_name)
                if hasattr(base, "keys") and split in getattr(base, "keys", lambda: [])():
                    base = base[split]
                self.dataset = base.to_iterable_dataset()
            else:
                self.dataset = datasets.load_dataset(
                    dataset_name, split=split, revision=revision, streaming=True
                )
        elif os.path.isdir(str(dataset_name)):
            self.dataset = datasets.load_from_disk(dataset_name)
            if hasattr(self.dataset, "keys") and split in getattr(self.dataset, "keys", lambda: [])():
                self.dataset = self.dataset[split]
        else:
            self.dataset = datasets.load_dataset(dataset_name, split=split, revision=revision)
        self.cache_dir = extra.get("hf_cache_dir") or os.path.join(
            os.path.expanduser("~/.cache/simpletuner_tpu"), f"hf_{config.id}"
        )
        os.makedirs(self.cache_dir, exist_ok=True)
        self.instance_data_dir = None

    # ---- sharding ---------------------------------------------------------------------------
    def configure_sharding(self, process_index: int, num_processes: int) -> None:
        """Give each process a disjoint shard of the stream (map-style datasets
        shard at the sampler layer instead, so this is streaming-only)."""
        self._process_index = int(process_index)
        self._num_processes = max(int(num_processes), 1)
        if not self.streaming or self._num_processes <= 1:
            return
        try:
            from datasets.distributed import split_dataset_by_node

            self.dataset = split_dataset_by_node(
                self.dataset, rank=self._process_index, world_size=self._num_processes
            )
            self._sharded_natively = True
        except Exception:  # modulo skip-sharding fallback (older datasets libs)
            self._sharded_natively = False

    # ---- streaming iteration ------------------------------------------------------------------
    def _record(self, pos: int, row: Dict[str, Any]) -> None:
        with self._window_lock:
            self._window[pos] = row
            while len(self._window) > self.stream_window:
                evicted, _ = self._window.popitem(last=False)
                self._evicted_through = max(self._evicted_through, evicted)

    def stream_rows(
        self, skip: int = 0, epoch: int = 0
    ) -> Iterator[Tuple[int, Dict[str, Any]]]:
        """Yield (position, row) over this process's shard, populating the
        read window.  ``skip`` fast-forwards for resume; ``epoch`` reseeds the
        shuffle buffer so epochs see different orders."""
        if not self.streaming:
            raise RuntimeError(f"dataset {self.id}: stream_rows requires streaming=true")
        ds = self.dataset
        if self.shuffle_buffer_size and hasattr(ds, "shuffle"):
            ds = ds.shuffle(seed=1000 + epoch, buffer_size=self.shuffle_buffer_size)
        native = getattr(self, "_sharded_natively", True)
        pos = 0
        for raw_pos, row in enumerate(ds):
            if not native and self._num_processes > 1:
                if raw_pos % self._num_processes != self._process_index:
                    continue
            if pos < skip:
                pos += 1
                continue
            self._record(pos, row)
            yield pos, row
            pos += 1

    # ---- addressing ---------------------------------------------------------------------------
    @staticmethod
    def _index(location: str) -> Optional[int]:
        if location.startswith("hf://"):
            try:
                return int(location[5:].split(".")[0])
            except ValueError:
                return None
        return None

    def _row(self, index: int) -> Dict[str, Any]:
        if self.streaming:
            with self._window_lock:
                row = self._window.get(index)
            if row is None:
                raise KeyError(
                    f"dataset {self.id}: streaming row hf://{index} is not in the "
                    f"{self.stream_window}-row window (evicted through "
                    f"{self._evicted_through}); raise 'stream_window' in the dataset "
                    "entry or reduce prefetch depth — serving stale positions "
                    "silently would desynchronize sample/metadata pairing"
                )
            return row
        return self.dataset[index]

    def caption_for(self, location: str) -> Optional[str]:
        index = self._index(location)
        if index is None:
            return None
        value = self._row(index).get(self.caption_column)
        if isinstance(value, list):
            value = value[0] if value else None
        return value

    def size_for(self, location: str) -> Optional[Tuple[int, int]]:
        """(width, height) from metadata columns when mapped, else None."""
        if not (self.width_column and self.height_column):
            return None
        index = self._index(location)
        if index is None:
            return None
        row = self._row(index)
        try:
            return int(row[self.width_column]), int(row[self.height_column])
        except (KeyError, TypeError, ValueError):
            return None

    @staticmethod
    def _image_bytes(image: Any) -> bytes:
        if isinstance(image, bytes):
            return image
        if isinstance(image, dict) and "bytes" in image:
            return image["bytes"]
        buffer = io.BytesIO()
        image.save(buffer, format="PNG")  # PIL image feature
        return buffer.getvalue()

    def read(self, location: str) -> bytes:
        index = self._index(location)
        if index is None:  # cache sidecar file
            with open(os.path.join(self.cache_dir, location), "rb") as handle:
                return handle.read()
        return self._image_bytes(self._row(index)[self.image_column])

    def write(self, location: str, data: bytes) -> None:
        path = os.path.join(self.cache_dir, location.lstrip("/"))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as handle:
            handle.write(data)

    def delete(self, location: str) -> None:
        path = os.path.join(self.cache_dir, location.lstrip("/"))
        if os.path.exists(path):
            os.remove(path)

    def exists(self, location: str) -> bool:
        index = self._index(location)
        if index is not None:
            if self.streaming:
                with self._window_lock:
                    return index in self._window
            return 0 <= index < len(self.dataset)
        return os.path.exists(os.path.join(self.cache_dir, location.lstrip("/")))

    def list_files(
        self,
        file_extensions: Optional[Sequence[str]] = None,
        instance_data_dir: Optional[str] = None,
    ) -> List[str]:
        if self.streaming:
            raise RuntimeError(
                f"dataset {self.id}: a streaming HF dataset cannot be listed — the "
                "factory must route it through the streaming metadata/sampler path "
                "(this error means a non-streaming component got wired to it)"
            )
        return [f"hf://{i}" for i in range(len(self.dataset))]

    def get_instance_representation(self) -> Dict[str, Any]:
        return {
            "type": self.type,
            "id": self.id,
            "streaming": self.streaming,
            "image_column": self.image_column,
            "caption_column": self.caption_column,
        }
