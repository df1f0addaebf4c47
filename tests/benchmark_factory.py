"""Data-backend factory build-time benchmark (reference:
tests/benchmark_factory*.py measuring factory build time/memory into
tests/benchmark_results.json).  Run directly: python tests/benchmark_factory.py
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time


def run_benchmark(num_images: int = 64) -> dict:
    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.data.factory import configure_multi_databackend
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig
    from simpletuner_tpu.models.text_encoders import load_text_encoders
    from simpletuner_tpu.models.vae import AutoencoderKL, VAEConfig

    workdir = tempfile.mkdtemp(prefix="factory_bench_")
    image_dir = os.path.join(workdir, "images")
    os.makedirs(image_dir)
    rng = np.random.default_rng(0)
    for i in range(num_images):
        Image.fromarray(rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)).save(
            os.path.join(image_dir, f"img_{i:04d}.png")
        )
        with open(os.path.join(image_dir, f"img_{i:04d}.txt"), "w") as handle:
            handle.write(f"an image number {i}")

    cache_root = os.path.join(workdir, "cache")
    mdb = [
        {"id": "images", "type": "local", "instance_data_dir": image_dir,
         "crop": True, "crop_style": "center", "crop_aspect": "square",
         "resolution": 64, "resolution_type": "pixel_area",
         "caption_strategy": "textfile",
         "cache_dir_vae": os.path.join(cache_root, "vae"), "text_embeds": "embeds"},
        {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
         "default": True, "cache_dir": os.path.join(cache_root, "text")},
    ]
    args = TrainingConfig(
        {"model_family": "flux", "model_type": "lora", "lora_rank": 4,
         "train_batch_size": 2, "resolution": 64, "max_train_steps": 10,
         "cache_dir": cache_root, "data_backend_config": mdb,
         "optimizer": "adamw", "learning_rate": 1e-3}
    )
    model = Flux(args, arch=FluxConfig.tiny())
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    vae = AutoencoderKL(VAEConfig.tiny())
    vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    encode = jax.jit(lambda x: vae.apply(vae_params, x, method=AutoencoderKL.encode))
    encode_fn = lambda imgs, n: np.asarray(encode(jnp.asarray(imgs)))  # noqa: E731

    t0 = time.perf_counter()
    configure_multi_databackend(args, model, vae_encode_fn=encode_fn)
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    configure_multi_databackend(args, model, vae_encode_fn=encode_fn)
    warm = time.perf_counter() - t0

    shutil.rmtree(workdir, ignore_errors=True)
    results = {
        "num_images": num_images,
        "cold_build_s": round(cold, 3),
        "warm_build_s": round(warm, 3),
    }
    out = os.path.join(os.path.dirname(__file__), "benchmark_results.json")
    with open(out, "w") as handle:
        json.dump(results, handle, indent=2)
    return results


def test_factory_benchmark_smoke():
    results = run_benchmark(num_images=16)
    assert results["cold_build_s"] > 0
    # warm rebuild reuses bucket + latent + text caches: must be much faster
    assert results["warm_build_s"] < results["cold_build_s"]


if __name__ == "__main__":
    print(json.dumps(run_benchmark(), indent=2))
