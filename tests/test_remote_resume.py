"""Remote (S3) checkpoint resume with manifest validation (reference
trainer.py:4485-4635; VERDICT r1 Missing #8)."""

import json
import os

import pytest

from simpletuner_tpu.training.checkpoints import CheckpointManager


class StubS3:
    """boto3-shaped client over a dict of key -> bytes."""

    def __init__(self, objects):
        self.objects = objects

    def list_objects_v2(self, Bucket, Prefix, **kw):
        keys = [k for k in sorted(self.objects) if k.startswith(Prefix)]
        return {"Contents": [{"Key": k} for k in keys], "IsTruncated": False}

    def download_file(self, Bucket, Key, dest):
        with open(dest, "wb") as fh:
            fh.write(self.objects[Key])


def _manager(tmp_path):
    return CheckpointManager(str(tmp_path / "out"))


def test_remote_download_and_validate(tmp_path):
    mgr = _manager(tmp_path)
    manifest = {"step": 5, "files": ["state/data.bin", "trainer_state.json"]}
    objects = {
        "ckpts/checkpoint-5/manifest.json": json.dumps(manifest).encode(),
        "ckpts/checkpoint-5/state/data.bin": b"\x01\x02",
        "ckpts/checkpoint-5/trainer_state.json": b"{}",
    }
    local = mgr.download_remote("s3://bucket/ckpts/checkpoint-5", client=StubS3(objects))
    assert os.path.isdir(local)
    assert os.path.exists(os.path.join(local, "state", "data.bin"))
    assert local.endswith("checkpoint-5")


def test_remote_download_missing_manifest(tmp_path):
    mgr = _manager(tmp_path)
    objects = {"ckpts/checkpoint-5/state/data.bin": b"\x01"}
    with pytest.raises(ValueError, match="manifest"):
        mgr.download_remote("s3://bucket/ckpts/checkpoint-5", client=StubS3(objects))


def test_remote_download_incomplete(tmp_path):
    mgr = _manager(tmp_path)
    manifest = {"step": 5, "files": ["state/data.bin", "missing.bin"]}
    objects = {
        "ckpts/checkpoint-5/manifest.json": json.dumps(manifest).encode(),
        "ckpts/checkpoint-5/state/data.bin": b"\x01",
    }
    with pytest.raises(ValueError, match="incomplete"):
        mgr.download_remote("s3://bucket/ckpts/checkpoint-5", client=StubS3(objects))


def test_remote_empty_prefix(tmp_path):
    mgr = _manager(tmp_path)
    with pytest.raises(FileNotFoundError):
        mgr.download_remote("s3://bucket/nothing/here", client=StubS3({}))
