import json
import os
import random

import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.data.backends.local import LocalDataBackend
from simpletuner_tpu.data.buckets import BucketConfig, bucket_key_for_size, target_size_for_aspect
from simpletuner_tpu.data.factory import configure_multi_databackend
from simpletuner_tpu.data.metadata import MetadataBackend
from simpletuner_tpu.data.sampler import MultiAspectSampler
from simpletuner_tpu.data.training_sample import prepare_image


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("data")
    rng = random.Random(0)
    sizes = [(512, 512), (640, 480), (480, 640), (800, 600), (512, 512), (1024, 768)]
    for i, (w, h) in enumerate(sizes * 3):  # 18 images
        img = Image.new("RGB", (w, h), (rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255)))
        img.save(root / f"img_{i:03d}.png")
        (root / f"img_{i:03d}.txt").write_text(f"a photo number {i}")
    return str(root)


def test_bucket_math_static_shapes():
    cfg = BucketConfig(resolution=512, resolution_type="pixel_area", crop=False)
    # same aspect -> same bucket and same target size
    k1 = bucket_key_for_size(1024, 768, cfg)
    k2 = bucket_key_for_size(640, 480, cfg)
    assert k1 == k2
    w, h = target_size_for_aspect(float(k1), cfg)
    assert w % 64 == 0 and h % 64 == 0
    assert abs(w * h - 512 * 512) / (512 * 512) < 0.4


def test_bucket_square_crop():
    cfg = BucketConfig(resolution=512, resolution_type="pixel_area", crop=True, crop_aspect="square")
    assert bucket_key_for_size(1024, 768, cfg) == "1.0"
    assert target_size_for_aspect(1.0, cfg) == (512, 512)


class TestCropAspectBuckets:
    """crop_aspect=closest|random over crop_aspect_buckets + the
    max_upscale_threshold candidate filter (reference training_sample.py:239-299)."""

    def test_closest_picks_nearest(self):
        from simpletuner_tpu.data.buckets import select_crop_aspect

        cfg = BucketConfig(
            resolution=512, crop=True, crop_aspect="closest",
            crop_aspect_buckets=[0.5, 1.0, 1.5],
        )
        assert select_crop_aspect(1600, 1000, cfg) == 1.5  # source aspect 1.6
        assert select_crop_aspect(1000, 1900, cfg) == 0.5

    def test_random_is_deterministic_per_file(self):
        from simpletuner_tpu.data.buckets import select_crop_aspect

        cfg = BucketConfig(
            resolution=512, crop=True, crop_aspect="random",
            crop_aspect_buckets=[0.75, 1.0, 1.33],
        )
        first = select_crop_aspect(1024, 1024, cfg, seed_token="a.png")
        assert all(
            select_crop_aspect(1024, 1024, cfg, seed_token="a.png") == first
            for _ in range(5)
        )
        chosen = {select_crop_aspect(1024, 1024, cfg, seed_token=f"{i}.png") for i in range(40)}
        assert len(chosen) > 1  # different files spread over buckets

    def test_max_upscale_threshold_filters(self):
        from simpletuner_tpu.data.buckets import select_crop_aspect, target_size_for_aspect

        cfg = BucketConfig(
            resolution=1024, crop=True, crop_aspect="closest",
            crop_aspect_buckets=[0.5, 1.0, 2.0], max_upscale_threshold=0.1,
        )
        # a small 320x320 source: every 1024px-area bucket needs >1.1x upscale
        # -> falls back to the source's own aspect
        assert select_crop_aspect(320, 320, cfg) == 1.0  # rounded source aspect
        # a large source keeps the normal closest pick
        big = select_crop_aspect(2048, 1024, cfg)
        assert big == 2.0
        tw, th = target_size_for_aspect(big, cfg)
        assert tw <= 2048 * 1.1 and th <= 1024 * 1.1

    def test_bucket_key_uses_selected_aspect(self):
        cfg = BucketConfig(
            resolution=512, crop=True, crop_aspect="closest",
            crop_aspect_buckets=[1.0],
        )
        # wide source forced into the square bucket
        assert bucket_key_for_size(1600, 900, cfg, seed_token="x.png") == "1.0"

    def test_weighted_random_dict_buckets(self):
        from simpletuner_tpu.data.buckets import select_crop_aspect

        cfg = BucketConfig(
            resolution=512, crop=True, crop_aspect="random",
            crop_aspect_buckets=[{"aspect": 1.0, "weight": 1.0}, {"aspect": 2.0, "weight": 0.0}],
        )
        assert all(
            select_crop_aspect(1024, 1024, cfg, seed_token=f"{i}") == 1.0 for i in range(20)
        )


def _wh(image):
    """(w, h) for either a PIL image or the native path's uint8 ndarray."""
    if hasattr(image, "shape"):
        return image.shape[1], image.shape[0]
    return image.size


def test_prepare_image_exact_bucket_dims(image_dir):
    from PIL import Image

    cfg = BucketConfig(resolution=256, resolution_type="pixel_area", crop=True, crop_aspect="square")
    img = Image.open(os.path.join(image_dir, "img_001.png"))
    sample = prepare_image(img, cfg, "center")
    assert _wh(sample.image) == sample.target_size == (256, 256)

    cfg2 = BucketConfig(resolution=256, resolution_type="pixel_area", crop=False)
    sample2 = prepare_image(img, cfg2)
    tw, th = target_size_for_aspect(float(sample2.bucket_key), cfg2)
    assert _wh(sample2.image) == (tw, th)


def test_metadata_discovery_and_persistence(image_dir):
    backend = LocalDataBackend("test", image_dir)
    cfg = BucketConfig(resolution=256, resolution_type="pixel_area")
    meta = MetadataBackend("test", backend, cfg, instance_data_dir=image_dir)
    meta.refresh()
    assert len(meta) == 18
    assert len(meta.bucket_keys()) >= 2
    # second instance loads from cache without re-probing
    meta2 = MetadataBackend("test", backend, cfg, instance_data_dir=image_dir)
    assert meta2.load_cache()
    assert meta2.aspect_ratio_bucket_indices == meta.aspect_ratio_bucket_indices


def test_sampler_batches_uniform_bucket(image_dir):
    backend = LocalDataBackend("test", image_dir)
    cfg = BucketConfig(resolution=256, resolution_type="pixel_area")
    meta = MetadataBackend("test", backend, cfg, instance_data_dir=image_dir)
    meta.refresh()
    sampler = MultiAspectSampler("test", meta, batch_size=2, seed=1)
    seen = []
    for batch in sampler:
        assert len(batch) == 2
        assert len({s["bucket"] for s in batch}) == 1  # uniform aspect per batch
        seen.extend(s["image_path"] for s in batch)
    assert len(seen) == len(set(seen))  # no dupes within epoch
    assert len(seen) >= 14  # drop_last may drop stragglers per bucket


def test_sampler_state_roundtrip(image_dir):
    backend = LocalDataBackend("t", image_dir)
    cfg = BucketConfig(resolution=256, resolution_type="pixel_area")
    meta = MetadataBackend("t", backend, cfg, instance_data_dir=image_dir)
    meta.refresh()

    s1 = MultiAspectSampler("t", meta, batch_size=2, seed=7)
    it = iter(s1)
    first_batches = [next(it), next(it)]
    state = s1.save_state()

    s2 = MultiAspectSampler("t", meta, batch_size=2, seed=7)
    s2.load_state(json.loads(json.dumps(state)))
    resumed = [b for b in s2]
    remaining_from_s1 = [b for b in it]
    got = [[x["image_path"] for x in b] for b in resumed]
    expected = [[x["image_path"] for x in b] for b in remaining_from_s1]
    assert got == expected


@pytest.fixture(scope="module")
def tiny_pipeline(image_dir, tmp_path_factory):
    """Full config-#1-style slice: tiny flux + tiny encoders + tiny vae."""
    import jax
    import jax.numpy as jnp

    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig
    from simpletuner_tpu.models.text_encoders import load_text_encoders
    from simpletuner_tpu.models.vae import AutoencoderKL, VAEConfig

    cache_root = str(tmp_path_factory.mktemp("cache"))
    mdb = [
        {
            "id": "images",
            "type": "local",
            "instance_data_dir": image_dir,
            "crop": True,
            "crop_style": "center",
            "crop_aspect": "square",
            "resolution": 64,
            "resolution_type": "pixel_area",
            "caption_strategy": "textfile",
            "cache_dir_vae": os.path.join(cache_root, "vae"),
            "text_embeds": "embeds",
        },
        {
            "id": "embeds",
            "dataset_type": "text_embeds",
            "type": "local",
            "default": True,
            "cache_dir": os.path.join(cache_root, "text"),
        },
    ]
    args = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "train_batch_size": 2,
            "resolution": 64,
            "resolution_type": "pixel_area",
            "max_train_steps": 10,
            "cache_dir": cache_root,
            "data_backend_config": mdb,
            "caption_dropout_probability": 0.1,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
        }
    )
    arch = FluxConfig.tiny()
    model = Flux(args, arch=arch)
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    # tiny VAE with 16 latent channels? tiny flux in_channels=16 -> latents C=4
    vae = AutoencoderKL(VAEConfig.tiny())
    vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    import functools

    @functools.lru_cache(maxsize=8)
    def encode_jit(shape):
        return jax.jit(lambda imgs: vae.apply(vae_params, imgs, method=AutoencoderKL.encode))

    def vae_encode_fn(images, count):
        return encode_jit(images.shape)(jnp.asarray(images))

    # tiny flux expects txt_in 32 / vec 32: tiny encoders emit 32/32
    plane = configure_multi_databackend(args, model, vae_encode_fn=vae_encode_fn)
    return args, model, plane


def test_factory_builds_and_caches(tiny_pipeline, image_dir):
    args, model, plane = tiny_pipeline
    assert "images" in plane.bundles
    bundle = plane.bundles["images"]
    # vae cache fully populated (discover returns the full candidate list;
    # cached-ness is checked per path)
    todo = [f for f in bundle.vae_cache.discover_unprocessed_files()
            if not bundle.vae_cache.exists(f)]
    assert todo == []
    # text cache populated for all captions
    assert bundle.text_cache.exists("a photo number 0")


def test_iterator_produces_static_shape_batches(tiny_pipeline):
    args, model, plane = tiny_pipeline
    batch = plane.iterator.next_batch()
    assert batch["latents"].shape[0] == 2
    assert batch["latents"].ndim == 4
    assert batch["t5_embeds"].shape[0] == 2
    assert batch["pooled_embeds"].shape == (2, 32)
    assert "original_sizes" in batch and batch["original_sizes"].shape == (2, 2)


def test_end_to_end_training_slice(tiny_pipeline):
    """The minimum end-to-end slice (SURVEY §7 step 4): data plane -> train step."""
    import jax
    import jax.numpy as jnp

    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    args, model, plane = tiny_pipeline
    batch = plane.iterator.next_batch()
    init_batch = {
        "latents": jnp.asarray(batch["latents"][:1]),
        "t5_embeds": jnp.asarray(batch["t5_embeds"][:1]),
        "pooled_embeds": jnp.asarray(batch["pooled_embeds"][:1]),
    }
    variables = model.init_params(jax.random.PRNGKey(0), init_batch)
    schedule = get_lr_schedule(args, 10)
    tx = get_optimizer(args, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))

    losses = []
    for i in range(4):
        batch = plane.iterator.next_batch(step=i)
        device_batch = {
            "latents": jnp.asarray(batch["latents"]),
            "t5_embeds": jnp.asarray(batch["t5_embeds"]),
            "pooled_embeds": jnp.asarray(batch["pooled_embeds"]),
        }
        state, metrics = step(state, device_batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))


def test_dataplane_state_roundtrip(tiny_pipeline):
    args, model, plane = tiny_pipeline
    state = plane.save_state()
    encoded = json.dumps(state)
    plane.load_state(json.loads(encoded))


def test_bucket_report(tiny_pipeline):
    from simpletuner_tpu.data.bucket_report import data_plane_report, format_report

    args, model, plane = tiny_pipeline
    reports = data_plane_report(plane)
    assert reports and reports[0]["total_samples"] > 0
    text = format_report(reports[0])
    assert "dataset images" in text and "%" in text


def test_vae_cache_consistency_repair(tiny_pipeline):
    import glob as _glob

    args, model, plane = tiny_pipeline
    cache = plane.bundles["images"].vae_cache
    report = cache.scan_cache_consistency()
    assert report["missing"] == [] and report["orphans"] == []

    # delete one cached latent + plant an orphan, then repair
    cached = _glob.glob(os.path.join(cache.cache_dir, "*.pt"))
    os.remove(cached[0])
    orphan = os.path.join(cache.cache_dir, "deadbeef-orphan.pt")
    open(orphan, "wb").write(b"junk")
    report = cache.scan_cache_consistency()
    assert len(report["missing"]) == 1 and len(report["orphans"]) == 1

    result = cache.repair_consistency()
    assert result["encoded"] >= 1 and result["orphans_removed"] == 1
    final = cache.scan_cache_consistency()
    assert final["missing"] == [] and final["orphans"] == []


def test_data_backend_sampling_auto_weighting():
    """data_backend_sampling=auto-weighting biases dataset selection by size
    (reference get_backend_weight, factory.py:4973)."""
    from simpletuner_tpu.data.dataset import MultiDatasetIterator

    class FakeSampler:
        def __init__(self, n):
            self.n = n
        def __len__(self):
            return self.n

    class FakeConfig:
        dataset_weight = None
        probability = None

    class FakeBundle:
        def __init__(self, n):
            self.sampler = FakeSampler(n)
            self.config = FakeConfig()
            self.id = f"b{n}"

    class FakeModelConfig:
        data_backend_sampling = "auto-weighting"

    class FakeModel:
        config = FakeModelConfig()

    it = MultiDatasetIterator.__new__(MultiDatasetIterator)
    it.model = FakeModel()
    big, small = FakeBundle(90), FakeBundle(10)
    assert it._weight(big) == 90.0 and it._weight(small) == 10.0

    FakeModelConfig.data_backend_sampling = "uniform"
    assert it._weight(big) == 1.0 and it._weight(small) == 1.0

    # explicit probability always wins
    small.config.probability = 3.0
    FakeModelConfig.data_backend_sampling = "auto-weighting"
    assert it._weight(small) == 3.0
