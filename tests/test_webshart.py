"""Webshart tar-shard backend: C++ index correctness vs python tarfile, member
reads, captions, and an end-to-end metadata pass."""

import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.configuration.dataloader import DatasetConfig
from simpletuner_tpu.native import shardreader


def _png_bytes(seed=0):
    arr = np.random.default_rng(seed).integers(0, 255, (48, 64, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("shards")
    for s in range(2):
        with tarfile.open(root / f"data-{s:04d}.tar", "w") as tar:
            for i in range(3):
                png = _png_bytes(seed=s * 10 + i)
                info = tarfile.TarInfo(f"sample_{s}_{i}.png")
                info.size = len(png)
                tar.addfile(info, io.BytesIO(png))
                caption = f"a picture {s}-{i}".encode()
                info = tarfile.TarInfo(f"sample_{s}_{i}.txt")
                info.size = len(caption)
                tar.addfile(info, io.BytesIO(caption))
    return str(root)


class TestIndexer:
    def test_index_matches_tarfile(self, shard_dir):
        shard = os.path.join(shard_dir, "data-0000.tar")
        entries = shardreader.index_tar(shard)
        with tarfile.open(shard) as tar:
            expected = [(m.name, m.offset_data, m.size) for m in tar if m.isreg()]
        assert sorted(entries) == sorted(expected)

    def test_member_read_matches(self, shard_dir):
        shard = os.path.join(shard_dir, "data-0000.tar")
        entries = {name: (off, size) for name, off, size in shardreader.index_tar(shard)}
        with tarfile.open(shard) as tar:
            expected = tar.extractfile("sample_0_1.png").read()
        off, size = entries["sample_0_1.png"]
        assert shardreader.read_member(shard, off, size) == expected


class TestBackend:
    def test_list_read_caption(self, shard_dir):
        from simpletuner_tpu.data.backends.webshart import WebshartDataBackend

        config = DatasetConfig.from_dict(
            {"id": "ws", "type": "webshart", "instance_data_dir": shard_dir}
        )
        backend = WebshartDataBackend(config)
        files = backend.list_files()
        assert len(files) == 6  # pngs only
        data = backend.read(files[0])
        assert data[:4] == b"\x89PNG"
        assert backend.caption_for(files[0]).startswith("a picture")
        # index sidecars persisted for warm restarts
        assert os.listdir(os.path.join(shard_dir, ".shard_index"))

    def test_metadata_discovery_over_shards(self, shard_dir, tmp_path):
        from simpletuner_tpu.data.backends.webshart import WebshartDataBackend
        from simpletuner_tpu.data.buckets import BucketConfig
        from simpletuner_tpu.data.metadata import MetadataBackend

        config = DatasetConfig.from_dict(
            {"id": "ws", "type": "webshart", "instance_data_dir": shard_dir}
        )
        backend = WebshartDataBackend(config)
        metadata = MetadataBackend(
            id="ws",
            data_backend=backend,
            bucket_config=BucketConfig(resolution=64, resolution_type="pixel_area"),
            cache_file=str(tmp_path / "idx.json"),
            metadata_file=str(tmp_path / "meta.json"),
        )
        buckets = metadata.discover()
        assert sum(len(v) for v in buckets.values()) == 6
