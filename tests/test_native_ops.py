"""Native C++ image ops: build, correctness vs PIL, and pipeline integration."""

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu import native
from simpletuner_tpu.data.buckets import BucketConfig
from simpletuner_tpu.data.training_sample import image_to_array, prepare_image

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib failed to build")


def _random_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


class TestResize:
    def test_matches_pil_lanczos_downscale(self):
        arr = _random_image(128, 96)
        ours = native.resize_u8(arr, 64, 48)
        pil = np.asarray(Image.fromarray(arr).resize((48, 64), Image.LANCZOS))
        assert ours.shape == pil.shape == (64, 48, 3)
        # identical kernels up to rounding: allow ±2 levels on >99% of pixels
        diff = np.abs(ours.astype(int) - pil.astype(int))
        assert np.mean(diff <= 2) > 0.99, f"max diff {diff.max()}, mean {diff.mean()}"

    def test_matches_pil_lanczos_upscale(self):
        # PIL quantizes to u8 between the two passes; we keep float — so allow
        # slightly wider tolerance on upscales (mean diff ~1 level)
        arr = _random_image(32, 32, seed=1)
        ours = native.resize_u8(arr, 64, 64)
        pil = np.asarray(Image.fromarray(arr).resize((64, 64), Image.LANCZOS))
        diff = np.abs(ours.astype(int) - pil.astype(int))
        assert diff.mean() < 2.0, f"max diff {diff.max()}, mean {diff.mean()}"
        assert np.mean(diff <= 4) > 0.95

    def test_identity_resize(self):
        arr = _random_image(40, 40, seed=2)
        out = native.resize_u8(arr, 40, 40)
        np.testing.assert_array_equal(out, arr)


class TestCrop:
    def test_crop_exact(self):
        arr = _random_image(64, 64, seed=3)
        out = native.crop_u8(arr, 10, 20, 32, 30)
        np.testing.assert_array_equal(out, arr[10:42, 20:50])


class TestNormalize:
    def test_matches_numpy(self):
        arr = _random_image(16, 16, seed=4)
        out = native.to_f32_normalized(arr)
        expected = arr.astype(np.float32) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(out, expected, rtol=1e-6)
        assert out.dtype == np.float32


class TestPipelineIntegration:
    def test_prepare_image_native_dims_match_pil(self):
        config = BucketConfig(
            resolution=64, resolution_type="pixel_area", crop=True, crop_aspect="square"
        )
        img = Image.fromarray(_random_image(100, 80, seed=5))
        import random

        nat = prepare_image(img, config, crop_style="center", rng=random.Random(0))
        pil = prepare_image(img, config, crop_style="center", rng=random.Random(0), use_native=False)
        assert isinstance(nat.image, np.ndarray)
        assert nat.target_size == pil.target_size
        assert nat.crop_coordinates == pil.crop_coordinates
        assert nat.bucket_key == pil.bucket_key
        a = image_to_array(nat.image)
        b = image_to_array(pil.image)
        assert a.shape == b.shape
        # same resample math; white-noise input maximizes quantization drift,
        # so gate on the mean difference (≈1 u8 level)
        assert np.mean(np.abs(a - b)) < (1.5 / 127.5)


def test_face_crop_uses_cascade_or_fallback():
    """crop_style=face: cascade path returns a valid window; noise falls back
    to the upper-center heuristic without crashing."""
    import numpy as np
    from PIL import Image

    from simpletuner_tpu.data.buckets import BucketConfig
    from simpletuner_tpu.data.training_sample import prepare_image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (128, 256, 3), dtype=np.uint8))
    cfg = BucketConfig(resolution=0.004096, crop=True, crop_aspect="square")
    sample = prepare_image(img, cfg, crop_style="face")
    assert sample.target_size == (64, 64)
    left, top = sample.crop_coordinates
    assert 0 <= left and 0 <= top
