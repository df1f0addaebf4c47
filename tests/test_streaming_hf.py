"""Streaming HF-datasets contract tests (reference
helpers/data_backend/huggingface.py streaming surface, VERDICT r3 item 9).

The fake stream below poisons every materialization path (__len__,
__getitem__, list()) so the tests *prove* the bucket-scan and sampling paths
never materialize the dataset.
"""

import io
import json
import os
import types

import numpy as np
import pytest

from simpletuner_tpu.data.streaming import StreamingMetadataBackend, StreamingSampler
from simpletuner_tpu.data.buckets import BucketConfig


def _png_bytes(w, h, color=(120, 30, 200)):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


class FakeStream:
    """Iterable-only dataset: any materialization attempt is a hard failure."""

    def __init__(self, rows):
        self.rows = rows
        self.iterated = 0
        self.shuffle_seeds = []

    def __iter__(self):
        for row in self.rows:
            self.iterated += 1
            yield dict(row)

    def __len__(self):
        raise AssertionError("streaming dataset was materialized via len()")

    def __getitem__(self, index):
        raise AssertionError("streaming dataset was materialized via indexing")

    def shuffle(self, seed=None, buffer_size=None):
        self.shuffle_seeds.append(seed)
        return self


def make_rows(n, with_image=True):
    rows = []
    for i in range(n):
        # two aspect groups: square and 4:3 landscape
        if i % 2 == 0:
            w, h = 256, 256
        else:
            w, h = 320, 240
        row = {"text": f"caption {i}", "w": w, "h": h}
        if with_image:
            row["image"] = {"bytes": _png_bytes(w, h)}
        rows.append(row)
    return rows


def make_backend(monkeypatch, rows, extra=None):
    import datasets

    from simpletuner_tpu.data.backends.huggingface import HuggingfaceDatasetsBackend

    stream = FakeStream(rows)
    monkeypatch.setattr(
        datasets, "load_dataset",
        lambda name, split=None, revision=None, streaming=False: stream,
    )
    config = types.SimpleNamespace(
        id="stream-ds",
        instance_data_dir=None,
        extra={
            "dataset_name": "fake/stream",
            "streaming": True,
            "column_map": {"image": "image", "caption": "text", "width": "w", "height": "h"},
            **(extra or {}),
        },
    )
    backend = HuggingfaceDatasetsBackend(config)
    return backend, stream


def bucket_cfg():
    return BucketConfig(
        resolution=128, resolution_type="pixel_area",
        aspect_bucket_alignment=32, crop=False,
    )


class TestStreamingBackend:
    def test_window_read_and_caption(self, monkeypatch):
        backend, stream = make_backend(monkeypatch, make_rows(6))
        seen = []
        for pos, row in backend.stream_rows():
            seen.append(pos)
            if len(seen) == 4:
                break
        assert seen == [0, 1, 2, 3]
        assert backend.caption_for("hf://2") == "caption 2"
        data = backend.read("hf://3")
        from PIL import Image

        assert Image.open(io.BytesIO(data)).size == (320, 240)
        assert backend.size_for("hf://1") == (320, 240)

    def test_list_files_raises(self, monkeypatch):
        backend, _ = make_backend(monkeypatch, make_rows(3))
        with pytest.raises(RuntimeError, match="cannot be listed"):
            backend.list_files()

    def test_evicted_position_fails_loud(self, monkeypatch):
        backend, _ = make_backend(monkeypatch, make_rows(8), extra={"stream_window": 2})
        for _pos, _row in backend.stream_rows():
            pass
        with pytest.raises(KeyError, match="not in the 2-row window"):
            backend.read("hf://0")
        # recent rows still readable
        assert backend.caption_for("hf://7") == "caption 7"

    def test_rank_split_disjoint_union(self, monkeypatch):
        rows = make_rows(10)
        captions_by_rank = []
        for rank in (0, 1):
            backend, _ = make_backend(monkeypatch, rows)
            backend.configure_sharding(rank, 2)
            captions = [
                row["text"] for _pos, row in backend.stream_rows()
            ]
            captions_by_rank.append(set(captions))
        assert captions_by_rank[0].isdisjoint(captions_by_rank[1])
        assert captions_by_rank[0] | captions_by_rank[1] == {f"caption {i}" for i in range(10)}

    def test_resume_skip(self, monkeypatch):
        backend, _ = make_backend(monkeypatch, make_rows(6))
        first = [row["text"] for _p, row in backend.stream_rows(skip=4)]
        assert first == ["caption 4", "caption 5"]


class TestStreamingScan:
    def test_bucket_scan_from_columns_never_decodes(self, monkeypatch):
        # rows WITHOUT an image column: bucketing must ride w/h metadata only
        backend, stream = make_backend(monkeypatch, make_rows(8, with_image=False))
        metadata = StreamingMetadataBackend("stream-ds", backend, bucket_cfg())
        keys = set()
        for pos, row in backend.stream_rows():
            key = metadata.assign(f"hf://{pos}", row)
            assert key is not None
            keys.add(key)
        assert len(keys) == 2  # square + 4:3
        assert stream.iterated == 8
        # the index is never built
        assert metadata.aspect_ratio_bucket_indices == {}
        with pytest.raises(TypeError):
            len(metadata)

    def test_scan_probes_bytes_without_size_columns(self, monkeypatch):
        backend, _ = make_backend(monkeypatch, make_rows(2))
        backend.width_column = backend.height_column = None
        metadata = StreamingMetadataBackend("stream-ds", backend, bucket_cfg())
        for pos, row in backend.stream_rows():
            assert metadata.assign(f"hf://{pos}", row) is not None

    def test_metadata_window_bounded(self, monkeypatch):
        backend, _ = make_backend(monkeypatch, make_rows(12, with_image=False))
        metadata = StreamingMetadataBackend("stream-ds", backend, bucket_cfg(), metadata_window=4)
        for pos, row in backend.stream_rows():
            metadata.assign(f"hf://{pos}", row)
        assert len(metadata.image_metadata) == 4


class TestStreamingSampler:
    def _sampler(self, monkeypatch, n=12, batch=2):
        backend, stream = make_backend(monkeypatch, make_rows(n, with_image=False))
        metadata = StreamingMetadataBackend("stream-ds", backend, bucket_cfg())
        sampler = StreamingSampler("stream-ds", backend, metadata, batch_size=batch)
        return sampler, stream

    def test_batches_are_bucket_homogeneous(self, monkeypatch):
        sampler, stream = self._sampler(monkeypatch)
        batches = list(iter(sampler))
        assert batches, "no batches yielded"
        for batch in batches:
            assert len(batch) == 2
            assert len({s["bucket"] for s in batch}) == 1
            for s in batch:
                assert s["metadata"]["original_size"] in ([256, 256], [320, 240])
        # every row was seen exactly once; nothing materialized
        assert stream.iterated == 12
        # 6 square + 6 landscape rows -> 3 + 3 batches
        assert len(batches) == 6

    def test_epoch_rollover_reshuffles(self, monkeypatch):
        sampler, stream = self._sampler(monkeypatch, n=4)
        list(iter(sampler))
        assert sampler.current_epoch == 1
        list(iter(sampler))
        assert sampler.current_epoch == 2

    def test_resume_continues_at_cursor(self, monkeypatch):
        sampler, _ = self._sampler(monkeypatch, n=12)
        it = iter(sampler)
        first = next(it)
        state = sampler.save_state()
        assert state["streaming"] and state["rows_consumed"] >= 2

        # fresh sampler (new process): restore and continue
        sampler2, _ = self._sampler(monkeypatch, n=12)
        sampler2.load_state(state)
        resumed = next(iter(sampler2))
        first_caps = {s["metadata"]["row"]["text"] for s in first} if first[0]["metadata"].get("row") else set()
        resumed_positions = {s["image_path"] for s in resumed}
        consumed_positions = {f"hf://{i}" for i in range(state["rows_consumed"])}
        assert resumed_positions.isdisjoint(consumed_positions)

    def test_len_raises_without_estimate(self, monkeypatch):
        sampler, _ = self._sampler(monkeypatch)
        with pytest.raises(TypeError):
            len(sampler)

    def test_len_uses_estimate(self, monkeypatch):
        backend, _ = make_backend(
            monkeypatch, make_rows(4, with_image=False), extra={"estimated_samples": 100}
        )
        metadata = StreamingMetadataBackend("stream-ds", backend, bucket_cfg())
        sampler = StreamingSampler("stream-ds", backend, metadata, batch_size=2)
        assert len(sampler) == 50


class TestStreamingFactory:
    def _args(self, tmp_path, mdb_entries, **overrides):
        from simpletuner_tpu.configuration import TrainingConfig

        mdb = tmp_path / "mdb.json"
        mdb.write_text(json.dumps(mdb_entries))
        payload = {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "train_batch_size": 2,
            "resolution": 64,
            "resolution_type": "pixel_area",
            "max_train_steps": 4,
            "cache_dir": str(tmp_path / "cache"),
            "data_backend_config": str(mdb),
            "optimizer": "adamw",
            "learning_rate": 1e-3,
        }
        payload.update(overrides)
        return TrainingConfig(payload)

    def _entries(self, tmp_path, **stream_overrides):
        entry = {
            "id": "stream",
            "type": "huggingface",
            "dataset_name": "fake/stream",
            "streaming": True,
            "caption_strategy": "huggingface",
            "column_map": {"image": "image", "caption": "text", "width": "w", "height": "h"},
            "text_embeds": "embeds",
        }
        entry.update(stream_overrides)
        return [
            entry,
            {
                "id": "embeds",
                "dataset_type": "text_embeds",
                "type": "local",
                "default": True,
                "text_cache_ondemand": True,
                "cache_dir": str(tmp_path / "cache" / "text"),
            },
        ]

    def _build(self, monkeypatch, tmp_path, entries=None, args=None):
        import jax
        import jax.numpy as jnp

        from simpletuner_tpu.data.factory import configure_multi_databackend
        from simpletuner_tpu.models.flux import Flux, FluxConfig
        from simpletuner_tpu.models.text_encoders import load_text_encoders
        from simpletuner_tpu.models.vae import AutoencoderKL, VAEConfig

        import datasets

        stream = FakeStream(make_rows(24))
        monkeypatch.setattr(
            datasets, "load_dataset",
            lambda name, split=None, revision=None, streaming=False: stream,
        )
        entries = entries or self._entries(tmp_path)
        args = args or self._args(tmp_path, entries)
        arch = FluxConfig.tiny()
        model = Flux(args, arch=arch)
        model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
        vae = AutoencoderKL(VAEConfig.tiny())
        vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        encode = jax.jit(lambda imgs: vae.apply(vae_params, imgs, method=AutoencoderKL.encode))

        def vae_encode_fn(images, count):
            return encode(jnp.asarray(images))

        plane = configure_multi_databackend(args, model, vae_encode_fn=vae_encode_fn)
        return plane, stream

    def test_e2e_streaming_batches(self, monkeypatch, tmp_path):
        plane, stream = self._build(monkeypatch, tmp_path)
        batch = plane.iterator.next_batch()
        assert batch["latents"].shape[0] == 2
        assert batch["latents"].ndim == 4
        assert all(c.startswith("caption ") for c in batch["captions"])
        # nothing was materialized: only the rows needed for the first full
        # bucket were pulled
        assert stream.iterated <= 24
        # resume state round-trips through the iterator
        state = plane.iterator.save_state()
        assert state["samplers"]["stream"]["streaming"] is True

    def test_requires_ondemand_text_cache(self, monkeypatch, tmp_path):
        entries = self._entries(tmp_path)
        entries[1]["text_cache_ondemand"] = False
        with pytest.raises(ValueError, match="text_cache_ondemand"):
            self._build(monkeypatch, tmp_path, entries=entries)

    def test_rejects_filename_captions(self, monkeypatch, tmp_path):
        entries = self._entries(tmp_path, caption_strategy="filename")
        with pytest.raises(ValueError, match="caption_strategy"):
            self._build(monkeypatch, tmp_path, entries=entries)

    def test_requires_live_vae(self, monkeypatch, tmp_path):
        import datasets

        from simpletuner_tpu.data.factory import configure_multi_databackend
        from simpletuner_tpu.models.flux import Flux, FluxConfig
        from simpletuner_tpu.models.text_encoders import load_text_encoders

        stream = FakeStream(make_rows(4))
        monkeypatch.setattr(
            datasets, "load_dataset",
            lambda name, split=None, revision=None, streaming=False: stream,
        )
        args = self._args(tmp_path, self._entries(tmp_path))
        model = Flux(args, arch=FluxConfig.tiny())
        model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
        with pytest.raises(ValueError, match="live VAE"):
            configure_multi_databackend(args, model, vae_encode_fn=None)
