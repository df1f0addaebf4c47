"""CSV-of-URLs storage backend.

Reference: helpers/data_backend/csv_url_list.py — a CSV listing (url, caption)
rows; images fetch over HTTP with an on-disk cache, captions come from the
``caption`` column via the ``csv`` caption strategy.
"""

from __future__ import annotations

import csv
import hashlib
import logging
import os
from typing import Any, Dict, List, Optional, Sequence

from .base import BaseDataBackend

logger = logging.getLogger(__name__)


class CSVDataBackend(BaseDataBackend):
    type = "csv"

    def __init__(self, config, compress_cache: bool = False):
        extra = getattr(config, "extra", {}) or {}
        self.id = config.id
        self.compress_cache = compress_cache
        self.csv_file = extra.get("csv_file") or config.instance_data_dir
        if not self.csv_file or not os.path.exists(self.csv_file):
            raise ValueError(f"dataset {config.id}: csv_file not found: {self.csv_file!r}")
        self.url_column = extra.get("csv_url_column", "url")
        self.caption_column = extra.get("csv_caption_column", "caption")
        self.cache_dir = extra.get("csv_cache_dir") or os.path.join(
            os.path.dirname(self.csv_file), f".{config.id}_url_cache"
        )
        os.makedirs(self.cache_dir, exist_ok=True)
        self.rows: Dict[str, Dict[str, str]] = {}
        with open(self.csv_file, newline="") as handle:
            for row in csv.DictReader(handle):
                url = row.get(self.url_column)
                if url:
                    self.rows[url] = row
        self.instance_data_dir = None

    def caption_for(self, location: str) -> Optional[str]:
        row = self.rows.get(location)
        return row.get(self.caption_column) if row else None

    def _cache_path(self, url: str) -> str:
        digest = hashlib.sha256(url.encode()).hexdigest()
        ext = os.path.splitext(url.split("?")[0])[1] or ".bin"
        return os.path.join(self.cache_dir, digest + ext)

    def read(self, location: str) -> bytes:
        if os.path.exists(location):  # cache files are written by absolute path
            with open(location, "rb") as handle:
                return handle.read()
        cached = self._cache_path(location)
        if os.path.exists(cached):
            with open(cached, "rb") as handle:
                return handle.read()
        import requests

        response = requests.get(location, timeout=30)
        response.raise_for_status()
        data = response.content
        with open(cached, "wb") as handle:
            handle.write(data)
        return data

    def write(self, location: str, data: bytes) -> None:
        path = location if os.path.isabs(location) else self._cache_path(location)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as handle:
            handle.write(data)

    def delete(self, location: str) -> None:
        for path in (location, self._cache_path(location)):
            if os.path.exists(path):
                os.remove(path)

    def exists(self, location: str) -> bool:
        return (
            location in self.rows
            or os.path.exists(location)
            or os.path.exists(self._cache_path(location))
        )

    def list_files(
        self,
        file_extensions: Optional[Sequence[str]] = None,
        instance_data_dir: Optional[str] = None,
    ) -> List[str]:
        urls = sorted(self.rows)
        if file_extensions:
            extensions = tuple(
                ext.lower() if ext.startswith(".") else "." + ext.lower() for ext in file_extensions
            )
            urls = [u for u in urls if u.split("?")[0].lower().endswith(extensions)]
        return urls

    def get_instance_representation(self) -> Dict[str, Any]:
        return {"type": self.type, "id": self.id, "csv_file": self.csv_file}
