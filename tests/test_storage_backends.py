"""Storage backends: csv-url cache behavior, huggingface datasets addressing,
aws construction errors without boto3."""

import csv
import io
import os

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.configuration.dataloader import DatasetConfig


def _png_bytes(seed=0):
    arr = np.random.default_rng(seed).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class TestCSVBackend:
    def test_rows_and_captions(self, tmp_path):
        from simpletuner_tpu.data.backends.csv_url import CSVDataBackend

        # pre-populate the cache so no network fetch happens
        csv_path = tmp_path / "data.csv"
        with open(csv_path, "w", newline="") as handle:
            writer = csv.DictWriter(handle, fieldnames=["url", "caption"])
            writer.writeheader()
            writer.writerow({"url": "http://example.com/a.png", "caption": "a red square"})
            writer.writerow({"url": "http://example.com/b.png", "caption": "a blue circle"})
        config = DatasetConfig.from_dict(
            {"id": "csvtest", "type": "csv", "csv_file": str(csv_path)}
        )
        backend = CSVDataBackend(config)
        files = backend.list_files()
        assert len(files) == 2
        assert backend.caption_for("http://example.com/a.png") == "a red square"

        # write/read through the URL cache path
        backend.write("http://example.com/a.png", _png_bytes())
        assert backend.exists("http://example.com/a.png")
        assert backend.read("http://example.com/a.png")[:4] == b"\x89PNG"


class TestHuggingfaceBackend:
    def test_rows_and_captions(self, tmp_path):
        import datasets

        from simpletuner_tpu.data.backends.huggingface import HuggingfaceDatasetsBackend

        images = [Image.fromarray(np.full((16, 16, 3), i * 40, np.uint8)) for i in range(3)]
        ds = datasets.Dataset.from_dict(
            {"image": images, "caption": ["one", "two", "three"]}
        ).cast_column("image", datasets.Image())
        disk = str(tmp_path / "hfds")
        ds.save_to_disk(disk)

        config = DatasetConfig.from_dict(
            {
                "id": "hftest",
                "type": "huggingface",
                "dataset_name": disk,
                "hf_cache_dir": str(tmp_path / "cache"),
            }
        )
        backend = HuggingfaceDatasetsBackend(config)
        files = backend.list_files()
        assert files == ["hf://0", "hf://1", "hf://2"]
        assert backend.caption_for("hf://1") == "two"
        data = backend.read("hf://0")
        img = Image.open(io.BytesIO(data))
        assert img.size == (16, 16)
        # sidecar cache write
        backend.write("vae/x.pt", b"abc")
        assert backend.exists("vae/x.pt")


class TestAWSBackend:
    def test_missing_boto3_or_bucket_raises(self):
        from simpletuner_tpu.data.backends.aws import S3DataBackend

        config = DatasetConfig.from_dict({"id": "s3test", "type": "aws"})
        with pytest.raises((ImportError, ValueError)):
            S3DataBackend(config)
