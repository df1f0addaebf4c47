"""HuggingFace datasets storage backend.

Reference: helpers/data_backend/huggingface.py (44k LoC incl. streaming +
column mapping).  Rows are addressed as ``hf://<index>``; image bytes come from
the configured image column, captions from the caption column.  Cache tensors
(VAE/text) are written to a local sidecar directory since HF datasets are
read-only.
"""

from __future__ import annotations

import io
import logging
import os
from typing import Any, Dict, List, Optional, Sequence

from .base import BaseDataBackend

logger = logging.getLogger(__name__)


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
        self.image_column = extra.get("image_column", "image")
        self.caption_column = extra.get("caption_column", "caption")
        if os.path.isdir(str(dataset_name)):
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

    @staticmethod
    def _index(location: str) -> Optional[int]:
        if location.startswith("hf://"):
            try:
                return int(location[5:].split(".")[0])
            except ValueError:
                return None
        return None

    def caption_for(self, location: str) -> Optional[str]:
        index = self._index(location)
        if index is None:
            return None
        value = self.dataset[index].get(self.caption_column)
        if isinstance(value, list):
            value = value[0] if value else None
        return value

    def read(self, location: str) -> bytes:
        index = self._index(location)
        if index is None:  # cache sidecar file
            with open(os.path.join(self.cache_dir, location), "rb") as handle:
                return handle.read()
        image = self.dataset[index][self.image_column]
        if isinstance(image, bytes):
            return image
        if isinstance(image, dict) and "bytes" in image:
            return image["bytes"]
        buffer = io.BytesIO()
        image.save(buffer, format="PNG")  # PIL image feature
        return buffer.getvalue()

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
            return 0 <= index < len(self.dataset)
        return os.path.exists(os.path.join(self.cache_dir, location.lstrip("/")))

    def list_files(
        self,
        file_extensions: Optional[Sequence[str]] = None,
        instance_data_dir: Optional[str] = None,
    ) -> List[str]:
        return [f"hf://{i}" for i in range(len(self.dataset))]

    def get_instance_representation(self) -> Dict[str, Any]:
        return {"type": self.type, "id": self.id}
