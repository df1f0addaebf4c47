"""NSFW scan-and-filter hook (reference helpers/caching/vae.py:578 scan pass)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.data.nsfw import NSFWFilter


def test_injected_classifier_filters_and_reports(tmp_path):
    root = tmp_path / "imgs"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(root / f"i_{i}.png")

    # reject images whose mean red channel is above the median (2 of 4)
    means = {}
    for i in range(4):
        means[str(root / f"i_{i}.png")] = np.asarray(Image.open(root / f"i_{i}.png"))[..., 0].mean()
    cutoff = sorted(means.values())[2]

    flt = NSFWFilter(classifier_fn=lambda img: np.asarray(img)[..., 0].mean() >= cutoff)
    paths = sorted(means)
    safe = flt.filter_files(paths, lambda p: Image.open(p))
    assert len(safe) == 2
    assert flt.report["images_scanned"] == 4 and flt.report["images_rejected"] == 2

    flt.write_report(str(tmp_path / "cache"), "unit")
    report = json.load(open(tmp_path / "cache" / "nsfw_classifier_report_rank0.json"))
    assert report["summary"]["images_rejected"] == 2


def test_offline_model_load_fails_loudly():
    flt = NSFWFilter(models_csv="definitely/not-a-local-model:0.9")
    with pytest.raises(RuntimeError, match="could not be loaded"):
        flt.is_rejected(Image.new("RGB", (8, 8)))


def test_vae_cache_integration(tmp_path, monkeypatch):
    """A cache built with a filter drops rejected files from the bucket index."""
    from simpletuner_tpu.caching.vae_cache import VAECache
    from simpletuner_tpu.data.backends.local import LocalDataBackend
    from simpletuner_tpu.data.buckets import BucketConfig
    from simpletuner_tpu.data.metadata import MetadataBackend

    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(root / f"i_{i}.png")
    backend = LocalDataBackend("unit", str(root))
    bucket_cfg = BucketConfig(resolution=0.0625, resolution_type="pixel_area")
    metadata = MetadataBackend(
        "unit", backend, bucket_cfg, instance_data_dir=str(root),
        cache_file=str(tmp_path / "meta" / "buckets.json"),
    )
    metadata.discover()
    n_before = sum(len(v) for v in metadata.aspect_ratio_bucket_indices.values())
    assert n_before == 4

    rejected = {str(root / "i_1.png"), str(root / "i_3.png")}
    flt = NSFWFilter(classifier_fn=lambda img: getattr(img, "_path", None) in rejected)

    # classify by path: wrap read_image to tag the path on the PIL object
    cache = VAECache(
        id="unit", data_backend=backend, metadata_backend=metadata,
        cache_dir=str(tmp_path / "vae"), bucket_config=bucket_cfg,
        encode_fn=lambda arr, seed: arr[:, ::8, ::8, :],
        nsfw_filter=flt,
    )
    original_filter = flt.filter_files

    def tagged_filter(paths, read_image):
        def tagged(p):
            img = read_image(p)
            img._path = p
            return img

        return original_filter(paths, tagged)

    flt.filter_files = tagged_filter
    cache.process_buckets()
    n_after = sum(len(v) for v in metadata.aspect_ratio_bucket_indices.values())
    assert n_after == 2
    assert flt.report["images_rejected"] == 2
