"""Publishing: model cards, modelspec metadata, post-checkpoint script hook."""

import os
import stat

import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.publishing import PublishingManager, build_model_card, safetensors_modelspec


@pytest.fixture
def model():
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 16,
            "optimizer": "adamw",
            "learning_rate": 1e-4,
            "max_train_steps": 100,
            "resolution": 1024,
            "instance_prompt": "sks style",
            "tracker_run_name": "my-flux-lora",
        }
    )
    return Flux(cfg, arch=FluxConfig.tiny())


def test_modelspec(model):
    spec = safetensors_modelspec(model, model.config)
    assert spec["modelspec.architecture"] == "flux-1-dev/lora"
    assert spec["modelspec.resolution"] == "1024x1024"
    assert spec["modelspec.trigger_phrase"] == "sks style"
    assert all(isinstance(v, str) for v in spec.values())


def test_modelspec_trigger_words_and_tag_frequency(model):
    """ComfyUI trigger-word metadata (reference save_hooks.py:593-610)."""
    import json

    spec = safetensors_modelspec(
        model, model.config,
        trigger_words=["ohwx person"],
        tag_frequency={"train": {"a photo": 12, "ohwx person": 12}},
    )
    # dataset trigger words merge with the config instance_prompt
    assert spec["trained_words"] == "sks style, ohwx person"
    assert spec["modelspec.trigger_phrase"] == "sks style"
    freq = json.loads(spec["ss_tag_frequency"])
    assert freq["train"]["a photo"] == 12


def test_model_card(model):
    card = build_model_card(
        model, model.config, validation_prompts=["a photo"], train_steps=500
    )
    assert card.startswith("---")
    assert "base_model: black-forest-labs/FLUX.1-dev" in card
    assert "# my-flux-lora" in card
    assert "- Steps: 500" in card
    assert "Trigger phrase: `sks style`" in card


def test_manager_writes_card(model, tmp_path):
    manager = PublishingManager(model, model.config, str(tmp_path))
    path = manager.write_model_card(train_steps=42)
    assert os.path.exists(path)
    assert "- Steps: 42" in open(path).read()


def test_post_checkpoint_script(model, tmp_path):
    marker = tmp_path / "ran.txt"
    script = tmp_path / "hook.sh"
    script.write_text(f"#!/bin/sh\necho $1 > {marker}\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    model.config.post_checkpoint_script = str(script)
    manager = PublishingManager(model, model.config, str(tmp_path))
    ckpt = tmp_path / "checkpoint-10"
    ckpt.mkdir()
    manager.run_post_checkpoint_script(str(ckpt))
    assert marker.exists()
    assert "checkpoint-10" in marker.read_text()


def test_hub_push_disabled_without_config(model, tmp_path):
    manager = PublishingManager(model, model.config, str(tmp_path))
    assert manager.push_to_hub(str(tmp_path)) is None


class _StubS3Client:
    def __init__(self):
        self.uploads = []

    def upload_file(self, local, bucket, key):
        self.uploads.append((bucket, key))


class _StubContainer:
    def __init__(self, sink):
        self.sink = sink

    def upload_blob(self, name, data, overwrite=True):
        self.sink.append(name)


class _StubAzure:
    def __init__(self):
        self.blobs = []

    def get_container_client(self, container):
        return _StubContainer(self.blobs)


class _StubDropbox:
    def __init__(self):
        self.paths = []

    def files_upload(self, data, path):
        self.paths.append(path)


def _ckpt(tmp_path):
    d = tmp_path / "checkpoint-7"
    (d / "state").mkdir(parents=True, exist_ok=True)
    (d / "state" / "data.bin").write_bytes(b"\x00")
    (d / "manifest.json").write_text("{}")
    return str(d)


def test_s3_provider_uploads_all_files(tmp_path):
    from simpletuner_tpu.publishing.providers import S3Provider

    class Cfg(dict):
        def get(self, k, default=None):
            return super().get(k, default)

    client = _StubS3Client()
    provider = S3Provider(Cfg(publishing_s3_bucket="b", publishing_s3_prefix="runs"), client=client)
    n = provider.upload(_ckpt(tmp_path))
    assert n == 2
    assert ("b", "runs/checkpoint-7/manifest.json") in client.uploads


def test_azure_and_dropbox_providers(tmp_path):
    from simpletuner_tpu.publishing.providers import AzureBlobProvider, DropboxProvider

    class Cfg(dict):
        def get(self, k, default=None):
            return super().get(k, default)

    az = _StubAzure()
    provider = AzureBlobProvider(Cfg(publishing_azure_container="c"), client=az)
    assert provider.upload(_ckpt(tmp_path)) == 2
    assert any(b.endswith("manifest.json") for b in az.blobs)

    db = _StubDropbox()
    provider = DropboxProvider(Cfg(publishing_dropbox_path="ckpts"), client=db)
    assert provider.upload(_ckpt(tmp_path)) == 2
    assert any(p.startswith("/ckpts/checkpoint-7/") for p in db.paths)


def test_unknown_provider_raises():
    from simpletuner_tpu.publishing.providers import get_provider

    class Cfg(dict):
        def get(self, k, default=None):
            return super().get(k, default)

    import pytest

    with pytest.raises(ValueError):
        get_provider(Cfg(publishing_provider="gopher"))
    assert get_provider(Cfg()) is None
