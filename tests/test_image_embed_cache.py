"""Image-embed cache: encode, persist, collate integration (CREPA teacher path)."""

import os

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.caching.image_embed import ImageEmbedCache, build_clip_vision_encode_fn
from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.data.backends.local import LocalDataBackend


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("embed_imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            root / f"im_{i}.png"
        )
        (root / f"im_{i}.txt").write_text(f"pic {i}")
    return str(root)


def test_cache_encode_and_reload(image_dir, tmp_path):
    encode_fn, image_size = build_clip_vision_encode_fn(tiny=True)
    backend = LocalDataBackend("e", image_dir)
    cache = ImageEmbedCache(
        id="e", data_backend=backend, cache_dir=str(tmp_path / "embeds"),
        encode_fn=lambda arrs: encode_fn(arrs), image_size=image_size,
    )
    files = backend.list_files()
    done = cache.process_files(files)
    assert done == 4
    embed = cache.get(files[0])
    assert embed.ndim == 2  # (tokens, dim)
    # warm reload: no encoder needed
    cache2 = ImageEmbedCache(
        id="e", data_backend=backend, cache_dir=str(tmp_path / "embeds"),
        encode_fn=None, image_size=image_size,
    )
    np.testing.assert_allclose(cache2.get(files[0]), embed, rtol=1e-6)


def test_factory_collate_teacher_embeds(image_dir, tmp_path):
    import jax
    import jax.numpy as jnp

    from simpletuner_tpu.data.factory import configure_multi_databackend
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig
    from simpletuner_tpu.models.text_encoders import load_text_encoders
    from simpletuner_tpu.models.vae import AutoencoderKL, VAEConfig

    cache_root = str(tmp_path / "cache")
    mdb = [
        {
            "id": "images",
            "type": "local",
            "instance_data_dir": image_dir,
            "crop": True, "crop_style": "center", "crop_aspect": "square",
            "resolution": 64, "resolution_type": "pixel_area",
            "caption_strategy": "textfile",
            "cache_dir_vae": os.path.join(cache_root, "vae"),
            "text_embeds": "embeds",
            "conditioning_image_embeds": "clipvision",
        },
        {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
         "default": True, "cache_dir": os.path.join(cache_root, "text")},
    ]
    args = TrainingConfig(
        {"model_family": "flux", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "train_batch_size": 2, "resolution": 64,
         "max_train_steps": 4, "cache_dir": cache_root,
         "data_backend_config": mdb, "optimizer": "adamw", "learning_rate": 1e-3}
    )
    model = Flux(args, arch=FluxConfig.tiny())
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    vae = AutoencoderKL(VAEConfig.tiny())
    vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    encode = jax.jit(lambda x: vae.apply(vae_params, x, method=AutoencoderKL.encode))
    plane = configure_multi_databackend(
        args, model, vae_encode_fn=lambda imgs, n: np.asarray(encode(jnp.asarray(imgs)))
    )
    batch = plane.iterator.next_batch()
    assert "teacher_embeds" in batch
    assert batch["teacher_embeds"].shape[0] == 2
    assert batch["teacher_embeds"].ndim == 3
