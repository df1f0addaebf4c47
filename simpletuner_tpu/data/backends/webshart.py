"""WebDataset tar-shard storage backend.

Reference: helpers/data_backend/webshart.py:59 (Rust `webshart` shard
discovery/reading) + helpers/metadata/backends/webshart.py:409.  Members are
addressed ``<shard>.tar/<member>``; the C++ indexer (native/shardreader.cpp)
builds offset tables that are cached as JSON sidecars; captions come from
same-stem ``.txt``/``.json`` members (WebDataset convention).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

from ...native import shardreader
from .base import BaseDataBackend

logger = logging.getLogger(__name__)


class WebshartDataBackend(BaseDataBackend):
    type = "webshart"

    def __init__(self, config, compress_cache: bool = False):
        self.id = config.id
        self.compress_cache = compress_cache
        self.shard_dir = config.instance_data_dir
        if not self.shard_dir or not os.path.isdir(self.shard_dir):
            raise ValueError(f"dataset {config.id}: instance_data_dir must hold .tar shards")
        extra = getattr(config, "extra", {}) or {}
        self.cache_dir = extra.get("webshart_index_dir") or os.path.join(self.shard_dir, ".shard_index")
        os.makedirs(self.cache_dir, exist_ok=True)
        # member path -> (shard_path, offset, size)
        self._index: Dict[str, Tuple[str, int, int]] = {}
        self._captions: Dict[str, str] = {}
        self._build_index()
        self.instance_data_dir = self.shard_dir

    def _build_index(self) -> None:
        shards = sorted(
            os.path.join(self.shard_dir, f)
            for f in os.listdir(self.shard_dir)
            if f.endswith(".tar")
        )
        for shard in shards:
            sidecar = os.path.join(
                self.cache_dir, os.path.basename(shard) + f".{os.path.getmtime(shard):.0f}.json"
            )
            if os.path.exists(sidecar):
                with open(sidecar) as handle:
                    entries = [tuple(e) for e in json.load(handle)]
            else:
                entries = shardreader.index_tar(shard)
                with open(sidecar, "w") as handle:
                    json.dump(entries, handle)
            shard_name = os.path.basename(shard)
            for name, offset, size in entries:
                key = f"{shard_name}/{name}"
                self._index[key] = (shard, int(offset), int(size))
        # caption members: same stem .txt
        for key in self._index:
            if key.endswith(".txt"):
                stem = key[:-4]
                self._captions[stem] = key
        logger.info(
            "webshart %s: %d shards, %d members", self.id, len(shards), len(self._index)
        )

    def caption_for(self, location: str) -> Optional[str]:
        stem = os.path.splitext(location)[0]
        caption_key = self._captions.get(stem)
        if caption_key is None:
            return None
        return self.read(caption_key).decode("utf-8", errors="replace").strip()

    def read(self, location: str) -> bytes:
        if location in self._index:
            shard, offset, size = self._index[location]
            return shardreader.read_member(shard, offset, size)
        with open(location, "rb") as handle:  # cache sidecar files by abs path
            return handle.read()

    def write(self, location: str, data: bytes) -> None:
        path = location if os.path.isabs(location) else os.path.join(self.cache_dir, location)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as handle:
            handle.write(data)
        os.replace(tmp, path)

    def delete(self, location: str) -> None:
        path = location if os.path.isabs(location) else os.path.join(self.cache_dir, location)
        if os.path.exists(path):
            os.remove(path)

    def exists(self, location: str) -> bool:
        if location in self._index:
            return True
        path = location if os.path.isabs(location) else os.path.join(self.cache_dir, location)
        return os.path.exists(path)

    def list_files(
        self,
        file_extensions: Optional[Sequence[str]] = None,
        instance_data_dir: Optional[str] = None,
    ) -> List[str]:
        extensions = tuple(
            ext.lower() if ext.startswith(".") else "." + ext.lower()
            for ext in (file_extensions or (".png", ".jpg", ".jpeg", ".webp"))
        )
        return sorted(k for k in self._index if k.lower().endswith(extensions))

    def get_instance_representation(self) -> Dict[str, Any]:
        return {"type": self.type, "id": self.id, "shard_dir": self.shard_dir}
