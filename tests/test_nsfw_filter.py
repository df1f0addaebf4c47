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


# ---------------------------------------------------------------------------------
# video NSFW scan (reference nsfw_classifier.py:143-190 frame selection,
# :306-332 per-frame voting, vae.py:447 delete_from_backend)
# ---------------------------------------------------------------------------------


def test_select_frame_indices_modes():
    from simpletuner_tpu.data.nsfw import select_frame_indices

    assert select_frame_indices(10, 3, "first") == [0, 1, 2]
    assert select_frame_indices(10, 3, "middle") == [3, 4, 5]
    # round(i*9/2) with banker's rounding (round(4.5)=4), as the reference
    assert select_frame_indices(10, 3, "uniform") == [0, 4, 9]
    assert select_frame_indices(10, 1, "uniform") == [5]
    assert select_frame_indices(2, 5, "first") == [0, 1]  # clamp to total
    with pytest.raises(ValueError, match="selection"):
        select_frame_indices(10, 3, "spiral")


def test_video_min_flagged_frames_voting():
    from simpletuner_tpu.data.nsfw import NSFWFilter

    frames = [Image.new("RGB", (8, 8), (255 if i in (2, 7) else 0, 0, 0)) for i in range(10)]
    red = lambda img: np.asarray(img)[..., 0].mean() > 128

    # uniform pick of 5 of 10 frames = indices {0,2,4,7,9}: 2 flagged
    flt1 = NSFWFilter(classifier_fn=red, video_frame_count=5,
                      video_min_flagged_frames=3)
    assert not flt1.is_rejected(frames, "clip.mp4")

    flt2 = NSFWFilter(classifier_fn=red, video_frame_count=5,
                      video_min_flagged_frames=2)
    assert flt2.is_rejected(frames, "clip.mp4")

    # "first" selection sees frame 2 only -> 1 flagged
    flt3 = NSFWFilter(classifier_fn=red, video_frame_count=3,
                      video_frame_selection="first", video_min_flagged_frames=2)
    assert not flt3.is_rejected(frames, "clip.mp4")


def test_video_param_validation():
    from simpletuner_tpu.data.nsfw import NSFWFilter

    with pytest.raises(ValueError, match="at least 1"):
        NSFWFilter(classifier_fn=lambda i: False, video_frame_count=0)
    with pytest.raises(ValueError, match="cannot exceed"):
        NSFWFilter(classifier_fn=lambda i: False, video_frame_count=2,
                   video_min_flagged_frames=3)


def test_ndarray_video_and_normalization():
    from simpletuner_tpu.data.nsfw import extract_classifier_frames

    clip = np.zeros((6, 8, 8, 3), np.float32)
    clip[4] = 1.0  # white frame in [0,1] space
    frames = extract_classifier_frames(clip, frame_count=3, selection="uniform")
    assert len(frames) == 3
    assert np.asarray(frames[0]).max() == 0
    # 5D (B,T,H,W,C) batches use the first clip
    frames5 = extract_classifier_frames(clip[None], frame_count=2, selection="first")
    assert len(frames5) == 2


def test_delete_nsfw_images_calls_backend_delete(tmp_path):
    from simpletuner_tpu.data.nsfw import NSFWFilter

    deleted = []
    flt = NSFWFilter(classifier_fn=lambda img: True, delete_fn=deleted.append)
    img = tmp_path / "bad.png"
    Image.new("RGB", (8, 8)).save(img)
    safe = flt.filter_files([str(img)], lambda p: Image.open(p).convert("RGB"))
    assert safe == []
    assert deleted == [str(img)]
    assert flt.report["files_deleted"] == 1


def test_factory_gating_by_backend_and_sample_type():
    from simpletuner_tpu.configuration.dataloader import DatasetConfig
    from simpletuner_tpu.data.factory import _build_nsfw_filter

    args = {"enable_nsfw_check": True, "nsfw_check_models": "x:0.5",
            "nsfw_check_backend_types": "local",
            "nsfw_check_sample_types": "image"}
    cfg_img = DatasetConfig.from_dict({"id": "a", "type": "local", "dataset_type": "image"})
    assert _build_nsfw_filter(args, config=cfg_img) is not None
    cfg_aws = DatasetConfig.from_dict({"id": "b", "type": "aws", "dataset_type": "image",
                                       "aws_bucket_name": "x"})
    assert _build_nsfw_filter(args, config=cfg_aws) is None
    cfg_vid = DatasetConfig.from_dict({"id": "c", "type": "local", "dataset_type": "video"})
    assert _build_nsfw_filter(args, config=cfg_vid) is None
    args["nsfw_check_sample_types"] = "image,video"
    assert _build_nsfw_filter(args, config=cfg_vid) is not None
