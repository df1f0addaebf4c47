"""In-memory backend for tests and ephemeral caches (reference:
helpers/data_backend/memory.py)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from .base import BaseDataBackend


class MemoryDataBackend(BaseDataBackend):
    type = "memory"

    def __init__(self, id: str, compress_cache: bool = False):
        self.id = id
        self.compress_cache = compress_cache
        self._store: Dict[str, bytes] = {}

    def read(self, location: str) -> bytes:
        return self._store[str(location)]

    def write(self, location: str, data: bytes) -> None:
        self._store[str(location)] = bytes(data)

    def delete(self, location: str) -> None:
        self._store.pop(str(location), None)

    def exists(self, location: str) -> bool:
        return str(location) in self._store

    def list_files(
        self,
        file_extensions: Optional[Sequence[str]] = None,
        instance_data_dir: Optional[str] = None,
    ) -> List[str]:
        from .local import IMAGE_EXTENSIONS

        keys = sorted(self._store)
        # default to image extensions like every other backend — callers that
        # want cache files pass explicit extensions
        extensions = tuple(
            ext.lower() if ext.startswith(".") else "." + ext.lower()
            for ext in (file_extensions or IMAGE_EXTENSIONS)
        )
        keys = [k for k in keys if k.lower().endswith(extensions)]
        if instance_data_dir:
            keys = [k for k in keys if k.startswith(instance_data_dir)]
        return keys
