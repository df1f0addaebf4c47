"""Storage-backend contract suite (reference: helpers/data_backend/base.py:8
ABC surface + tests/test_data_backend*.py): every backend must satisfy the
same read/write/delete/exists/list_files/read_image_batch/torch IO/gzip/
instance-representation contract.  Parameterized over local + memory; S3 is
exercised against an in-process fake boto3 client (reference mocks boto3 the
same way — no network)."""

import io
import sys
import types

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.data.backends.local import LocalDataBackend
from simpletuner_tpu.data.backends.memory import MemoryDataBackend


def _png_bytes(seed=0, size=16):
    arr = np.random.default_rng(seed).integers(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(params=["local", "memory"])
def backend(request, tmp_path):
    if request.param == "local":
        return LocalDataBackend("t", instance_data_dir=str(tmp_path)), str(tmp_path) + "/"
    return MemoryDataBackend("t"), ""


class TestContract:
    def test_rw_delete_exists(self, backend):
        be, root = backend
        loc = root + "a/b/file.bin"
        assert not be.exists(loc)
        be.write(loc, b"hello")
        assert be.exists(loc)
        assert be.read(loc) == b"hello"
        be.write(loc, b"overwritten")
        assert be.read(loc) == b"overwritten"
        be.delete(loc)
        assert not be.exists(loc)

    def test_write_batch(self, backend):
        be, root = backend
        locs = [root + f"wb/{i}.bin" for i in range(3)]
        be.write_batch(locs, [b"0", b"1", b"2"])
        assert [be.read(l) for l in locs] == [b"0", b"1", b"2"]

    def test_list_files_extension_filter(self, backend, tmp_path):
        be, root = backend
        for name in ("x.png", "y.jpg", "z.txt", "sub/deep.webp"):
            be.write(root + "ds/" + name, b"data")
        listing = be.list_files(instance_data_dir=(root + "ds") if root else "ds")
        names = [l.rsplit("/", 1)[-1] for l in listing]
        assert "x.png" in names and "y.jpg" in names and "deep.webp" in names
        assert "z.txt" not in names
        only_png = be.list_files(
            file_extensions=["png"], instance_data_dir=(root + "ds") if root else "ds")
        assert [l.rsplit("/", 1)[-1] for l in only_png] == ["x.png"]

    def test_read_image_batch_drops_corrupt(self, backend):
        be, root = backend
        good, bad = root + "img/good.png", root + "img/bad.png"
        be.write(good, _png_bytes())
        be.write(bad, b"not an image at all")
        kept, images = be.read_image_batch([good, bad])
        assert kept == [good]
        assert images[0].size == (16, 16)
        # delete_problematic_images prunes the bad file
        kept, _ = be.read_image_batch([good, bad], delete_problematic_images=True)
        assert kept == [good]
        assert not be.exists(bad)

    def test_torch_roundtrip_numpy_dict_bf16(self, backend):
        import torch

        import jax.numpy as jnp

        be, root = backend
        obj = {
            "latents": np.arange(12, dtype=np.float32).reshape(3, 4),
            "meta": {"crop": [1, 2], "name": "x"},
            "bf16": torch.arange(6, dtype=torch.bfloat16),
            "jax_bf16": jnp.full((2, 2), 1.5, dtype=jnp.bfloat16),
        }
        be.torch_save(obj, root + "cache/item.pt")
        out = be.torch_load(root + "cache/item.pt")
        np.testing.assert_array_equal(out["latents"], obj["latents"])
        assert out["meta"] == {"crop": [1, 2], "name": "x"}
        # bf16 tensors come back as f32 numpy (JAX consumption path)
        assert out["bf16"].dtype == np.float32
        np.testing.assert_allclose(out["bf16"], np.arange(6, dtype=np.float32))
        assert out["jax_bf16"].dtype == np.float32
        np.testing.assert_allclose(out["jax_bf16"], np.full((2, 2), 1.5, np.float32))

    def test_torch_save_reference_pt_compat(self, backend):
        """The .pt payload must load with plain torch.load — byte-level cache
        interop with the reference (SURVEY §2.4 text-embed cache layout)."""
        import torch

        be, root = backend
        be.torch_save({"v": np.ones((2, 2), np.float32)}, root + "cache/ref.pt")
        raw = be._maybe_decompress(be.read(root + "cache/ref.pt"))
        loaded = torch.load(io.BytesIO(raw), map_location="cpu", weights_only=False)
        assert isinstance(loaded["v"], torch.Tensor)

    def test_gzip_compression_roundtrip_and_magic_sniff(self, backend):
        be, root = backend
        be.compress_cache = True
        payload = {"z": np.zeros((64, 64), np.float32)}  # compresses well
        be.torch_save(payload, root + "cache/c.pt")
        stored = be.read(root + "cache/c.pt")
        assert stored[:2] == b"\x1f\x8b"  # actually gzipped on disk
        out = be.torch_load(root + "cache/c.pt")
        np.testing.assert_array_equal(out["z"], payload["z"])
        # uncompressed payloads written before compress_cache was flipped on
        # still load (magic sniffing, reference base.py:126-153)
        be.compress_cache = False
        be.torch_save(payload, root + "cache/plain.pt")
        be.compress_cache = True
        out2 = be.torch_load(root + "cache/plain.pt")
        np.testing.assert_array_equal(out2["z"], payload["z"])

    def test_instance_representation_is_json_safe(self, backend):
        import json

        be, _ = backend
        rep = be.get_instance_representation()
        assert rep["id"] == "t" and rep["type"] in ("local", "memory")
        json.dumps(rep)


# ---- S3 against a fake boto3 (no network) ---------------------------------------------


class _FakeBody:
    def __init__(self, data):
        self._data = data

    def read(self):
        return self._data


class _FakeS3Client:
    def __init__(self, store):
        self.store = store

    def get_object(self, Bucket, Key):
        if Key not in self.store:
            raise KeyError(Key)
        return {"Body": _FakeBody(self.store[Key])}

    def put_object(self, Bucket, Key, Body):
        self.store[Key] = Body

    def delete_object(self, Bucket, Key):
        self.store.pop(Key, None)

    def head_object(self, Bucket, Key):
        if Key not in self.store:
            raise KeyError(Key)
        return {}

    def get_paginator(self, name):
        assert name == "list_objects_v2"
        store = self.store

        class _Paginator:
            def paginate(self, Bucket, Prefix):
                keys = sorted(k for k in store if k.startswith(Prefix))
                # two pages to exercise pagination handling
                half = (len(keys) + 1) // 2
                for chunk in (keys[:half], keys[half:]):
                    yield {"Contents": [{"Key": k} for k in chunk]}

        return _Paginator()


@pytest.fixture
def s3_backend(monkeypatch):
    store = {}
    fake_boto3 = types.ModuleType("boto3")
    fake_boto3.client = lambda *a, **k: _FakeS3Client(store)
    fake_botocore = types.ModuleType("botocore")
    fake_config_mod = types.ModuleType("botocore.config")
    fake_config_mod.Config = lambda **k: None
    fake_botocore.config = fake_config_mod
    monkeypatch.setitem(sys.modules, "boto3", fake_boto3)
    monkeypatch.setitem(sys.modules, "botocore", fake_botocore)
    monkeypatch.setitem(sys.modules, "botocore.config", fake_config_mod)

    from simpletuner_tpu.configuration.dataloader import DatasetConfig
    from simpletuner_tpu.data.backends.aws import S3DataBackend

    config = DatasetConfig.from_dict({
        "id": "s3fake", "type": "aws", "aws_bucket_name": "bkt",
        "aws_data_prefix": "train/", "aws_region_name": "auto",
    })
    return S3DataBackend(config), store


class TestS3Backend:
    def test_rw_exists_delete(self, s3_backend):
        be, store = s3_backend
        be.write("train/a.png", b"imgdata")
        assert store["train/a.png"] == b"imgdata"
        assert be.exists("train/a.png")
        assert be.read("train/a.png") == b"imgdata"
        be.delete("train/a.png")
        assert not be.exists("train/a.png")
        # leading slash is normalized into a bucket key
        be.write("/train/b.png", b"x")
        assert "train/b.png" in store

    def test_list_files_prefix_and_extensions(self, s3_backend):
        be, store = s3_backend
        for key in ("train/a.png", "train/b.JPG", "train/c.txt", "other/d.png",
                    "train/sub/e.webp"):
            store[key] = b"x"
        keys = be.list_files()
        assert keys == ["train/a.png", "train/b.JPG", "train/sub/e.webp"]
        assert be.list_files(file_extensions=[".png"]) == ["train/a.png"]
        assert be.list_files(instance_data_dir="other") == ["other/d.png"]

    def test_torch_io_over_s3(self, s3_backend):
        be, _ = s3_backend
        be.torch_save({"t": np.full((2, 3), 7.0, np.float32)}, "train/cache/x.pt")
        out = be.torch_load("train/cache/x.pt")
        np.testing.assert_array_equal(out["t"], np.full((2, 3), 7.0, np.float32))

    def test_instance_representation(self, s3_backend):
        be, _ = s3_backend
        rep = be.get_instance_representation()
        assert rep == {"type": "aws", "id": "s3fake", "bucket": "bkt", "prefix": "train"}
