"""Checkpoint upload providers: S3/R2, Azure Blob, Dropbox.

Reference behavior: helpers/publishing/providers/ (SURVEY.md §2.8) — each
provider walks the checkpoint directory and uploads every file under a
destination prefix.  SDK clients are injectable (tests run against stubs; the
real clients import lazily so missing optional deps only fail the provider
actually selected).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Iterator, Optional, Tuple

logger = logging.getLogger(__name__)


def _walk(checkpoint_path: str) -> Iterator[Tuple[str, str]]:
    base = os.path.basename(os.path.normpath(checkpoint_path))
    for root, _dirs, files in os.walk(checkpoint_path):
        for name in files:
            local = os.path.join(root, name)
            rel = os.path.relpath(local, checkpoint_path)
            yield local, f"{base}/{rel}".replace(os.sep, "/")


class S3Provider:
    """S3/R2/Wasabi (reference providers/s3.py)."""

    name = "s3"

    def __init__(self, config, client: Any = None):
        self.bucket = config.get("publishing_s3_bucket")
        self.prefix = (config.get("publishing_s3_prefix") or "").strip("/")
        self.endpoint = config.get("publishing_s3_endpoint")
        self._client = client
        if not self.bucket:
            raise ValueError("publishing_provider=s3 requires publishing_s3_bucket")

    def client(self):
        if self._client is None:
            import boto3

            self._client = boto3.client("s3", endpoint_url=self.endpoint)
        return self._client

    def upload(self, checkpoint_path: str) -> int:
        client = self.client()
        count = 0
        for local, rel in _walk(checkpoint_path):
            key = "/".join(filter(None, [self.prefix, rel]))
            client.upload_file(local, self.bucket, key)
            count += 1
        logger.info("uploaded %d files from %s to s3://%s", count, checkpoint_path, self.bucket)
        return count


class AzureBlobProvider:
    """Azure Blob Storage (reference providers/azure.py)."""

    name = "azure"

    def __init__(self, config, client: Any = None):
        self.container = config.get("publishing_azure_container")
        self.prefix = (config.get("publishing_azure_prefix") or "").strip("/")
        self.connection_string = config.get("publishing_azure_connection_string") or os.environ.get(
            "AZURE_STORAGE_CONNECTION_STRING"
        )
        self._client = client
        if not self.container:
            raise ValueError("publishing_provider=azure requires publishing_azure_container")

    def client(self):
        if self._client is None:
            from azure.storage.blob import BlobServiceClient  # optional dep

            self._client = BlobServiceClient.from_connection_string(self.connection_string)
        return self._client

    def upload(self, checkpoint_path: str) -> int:
        service = self.client()
        container = service.get_container_client(self.container)
        count = 0
        for local, rel in _walk(checkpoint_path):
            blob = "/".join(filter(None, [self.prefix, rel]))
            with open(local, "rb") as handle:
                container.upload_blob(name=blob, data=handle, overwrite=True)
            count += 1
        logger.info("uploaded %d files from %s to azure://%s", count, checkpoint_path, self.container)
        return count


class DropboxProvider:
    """Dropbox (reference providers/dropbox.py)."""

    name = "dropbox"

    def __init__(self, config, client: Any = None):
        self.root = "/" + (config.get("publishing_dropbox_path") or "checkpoints").strip("/")
        self.token = config.get("publishing_dropbox_token") or os.environ.get("DROPBOX_TOKEN")
        self._client = client

    def client(self):
        if self._client is None:
            import dropbox  # optional dep

            self._client = dropbox.Dropbox(self.token)
        return self._client

    def upload(self, checkpoint_path: str) -> int:
        client = self.client()
        count = 0
        for local, rel in _walk(checkpoint_path):
            with open(local, "rb") as handle:
                client.files_upload(handle.read(), f"{self.root}/{rel}")
            count += 1
        logger.info("uploaded %d files from %s to dropbox:%s", count, checkpoint_path, self.root)
        return count


_PROVIDERS = {"s3": S3Provider, "r2": S3Provider, "azure": AzureBlobProvider, "dropbox": DropboxProvider}


def get_provider(config, client: Any = None) -> Optional[Any]:
    name = (config.get("publishing_provider") or "").lower()
    if not name:
        return None
    cls = _PROVIDERS.get(name)
    if cls is None:
        raise ValueError(
            f"unknown publishing_provider {name!r}; known: {sorted(_PROVIDERS)}"
        )
    return cls(config, client=client)
