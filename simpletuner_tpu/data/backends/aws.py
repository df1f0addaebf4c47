"""S3-compatible storage backend (AWS / Cloudflare R2 / Wasabi / MinIO).

Reference: helpers/data_backend/aws.py (boto3 S3 client with connection pools,
retry config, R2/Wasabi endpoint support).  Construction fails with a clear
error when boto3 is absent; all trainer paths treat that as a config error.
"""

from __future__ import annotations

import fnmatch
import logging
from typing import Any, Dict, List, Optional, Sequence

from .base import BaseDataBackend

logger = logging.getLogger(__name__)


class S3DataBackend(BaseDataBackend):
    type = "aws"

    def __init__(self, config, compress_cache: bool = False):
        try:
            import boto3
            from botocore.config import Config
        except ImportError as exc:
            raise ImportError(
                "dataset type 'aws' needs boto3; install it or switch the dataset to 'local'"
            ) from exc

        extra = getattr(config, "extra", {}) or {}
        self.id = config.id
        self.compress_cache = compress_cache
        self.bucket_name = extra.get("aws_bucket_name")
        if not self.bucket_name:
            raise ValueError(f"dataset {config.id}: aws_bucket_name is required")
        self.data_prefix = (extra.get("aws_data_prefix") or "").strip("/")
        region = extra.get("aws_region_name")
        endpoint = extra.get("aws_endpoint_url")
        self.client = boto3.client(
            "s3",
            region_name=region,
            endpoint_url=endpoint,
            aws_access_key_id=extra.get("aws_access_key_id"),
            aws_secret_access_key=extra.get("aws_secret_access_key"),
            config=Config(
                retries={"max_attempts": int(extra.get("aws_max_retries", 5)), "mode": "adaptive"},
                max_pool_connections=int(extra.get("aws_max_pool_connections", 32)),
            ),
        )
        self.instance_data_dir = self.data_prefix

    def _key(self, location: str) -> str:
        return location.lstrip("/")

    def read(self, location: str) -> bytes:
        response = self.client.get_object(Bucket=self.bucket_name, Key=self._key(location))
        return response["Body"].read()

    def write(self, location: str, data: bytes) -> None:
        self.client.put_object(Bucket=self.bucket_name, Key=self._key(location), Body=data)

    def delete(self, location: str) -> None:
        self.client.delete_object(Bucket=self.bucket_name, Key=self._key(location))

    def exists(self, location: str) -> bool:
        try:
            self.client.head_object(Bucket=self.bucket_name, Key=self._key(location))
            return True
        except Exception:
            return False

    def list_files(
        self,
        file_extensions: Optional[Sequence[str]] = None,
        instance_data_dir: Optional[str] = None,
    ) -> List[str]:
        prefix = (instance_data_dir or self.data_prefix or "").strip("/")
        extensions = tuple(
            ext.lower() if ext.startswith(".") else "." + ext.lower()
            for ext in (file_extensions or (".png", ".jpg", ".jpeg", ".webp"))
        )
        keys: List[str] = []
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=self.bucket_name, Prefix=prefix):
            for obj in page.get("Contents", []):
                key = obj["Key"]
                if key.lower().endswith(extensions):
                    keys.append(key)
        return sorted(keys)

    def get_instance_representation(self) -> Dict[str, Any]:
        return {"type": self.type, "id": self.id, "bucket": self.bucket_name, "prefix": self.data_prefix}
