"""Multi-conditioning datasets: combined/random sampling, mask+reference mix,
fail-loud unmatched pairs (reference collate.py:733-994 multi-backend
conditioning collection; collate.py:755-771 pairing errors)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.data.factory import configure_multi_databackend
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.models.text_encoders import load_text_encoders

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def edit_dataset(tmp_path_factory):
    rng = np.random.default_rng(0)
    img_dir = tmp_path_factory.mktemp("imgs")
    ref_a = tmp_path_factory.mktemp("ref_a")
    ref_b = tmp_path_factory.mktemp("ref_b")
    mask_dir = tmp_path_factory.mktemp("masks")
    for i in range(4):
        for d in (img_dir, ref_a, ref_b):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
                d / f"im_{i}.png"
            )
        (img_dir / f"im_{i}.txt").write_text(f"pic {i}")
        mask = np.zeros((64, 64), np.uint8)
        mask[:32] = 255
        Image.fromarray(mask).save(mask_dir / f"im_{i}.png")
    return str(img_dir), str(ref_a), str(ref_b), str(mask_dir)


def _mdb(img_dir, cache_root, cond_ids, cond_dirs, cond_types=None):
    cond_types = cond_types or [None] * len(cond_ids)
    cfg = [
        {
            "id": "images",
            "type": "local",
            "instance_data_dir": img_dir,
            "crop": True,
            "crop_style": "center",
            "crop_aspect": "square",
            "resolution": 64,
            "resolution_type": "pixel_area",
            "caption_strategy": "textfile",
            "cache_dir_vae": os.path.join(cache_root, "vae"),
            "text_embeds": "embeds",
            "conditioning_data": list(cond_ids),
        },
        {
            "id": "embeds",
            "dataset_type": "text_embeds",
            "type": "local",
            "default": True,
            "cache_dir": os.path.join(cache_root, "text"),
        },
    ]
    for cid, cdir, ctype in zip(cond_ids, cond_dirs, cond_types):
        entry = {
            "id": cid,
            "dataset_type": "conditioning",
            "type": "local",
            "instance_data_dir": cdir,
            "resolution": 64,
            "resolution_type": "pixel_area",
            "cache_dir_vae": os.path.join(cache_root, f"vae_{cid}"),
        }
        if ctype:
            entry["conditioning_type"] = ctype
        cfg.append(entry)
    return cfg


def _build_plane(mdb, cache_root, sampling, flavour="kontext"):
    args = TrainingConfig(
        {
            "model_family": "flux",
            "model_flavour": flavour,
            "model_type": "lora",
            "lora_rank": 4,
            "train_batch_size": 2,
            "resolution": 64,
            "max_train_steps": 4,
            "cache_dir": cache_root,
            "data_backend_config": mdb,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "conditioning_multidataset_sampling": sampling,
        }
    )
    model = Flux(args, arch=FluxConfig.tiny())
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    from simpletuner_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig.tiny())
    vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    encode = jax.jit(lambda x: vae.apply(vae_params, x, method=AutoencoderKL.encode))
    plane = configure_multi_databackend(
        args, model, vae_encode_fn=lambda imgs, n: np.asarray(encode(jnp.asarray(imgs)))
    )
    return model, plane


def test_combined_mode_stacks_reference_backends(edit_dataset, tmp_path_factory):
    img_dir, ref_a, ref_b, _ = edit_dataset
    cache_root = str(tmp_path_factory.mktemp("cache_combined"))
    model, plane = _build_plane(
        _mdb(img_dir, cache_root, ["ref_a", "ref_b"], [ref_a, ref_b]),
        cache_root,
        "combined",
    )
    batch = plane.iterator.next_batch()
    assert batch["control_latents"].ndim == 5
    assert batch["control_latents"].shape[1] == 2
    # multi-reference kontext trains end-to-end: 2 refs -> 2 extra token groups
    variables = model.init_params(jax.random.PRNGKey(0), {
        k: jnp.asarray(v) for k, v in batch.items()
        if isinstance(v, np.ndarray) and v.dtype.kind in "fiub"
    })
    device_batch = {
        k: jnp.asarray(v) for k, v in batch.items()
        if isinstance(v, np.ndarray) and v.dtype.kind in "fiub"
    }
    loss, _ = model.loss_fn(variables, jax.random.PRNGKey(1), device_batch)
    assert np.isfinite(float(loss))


def test_random_mode_picks_single_backend(edit_dataset, tmp_path_factory):
    img_dir, ref_a, ref_b, _ = edit_dataset
    cache_root = str(tmp_path_factory.mktemp("cache_random"))
    _, plane = _build_plane(
        _mdb(img_dir, cache_root, ["ref_a", "ref_b"], [ref_a, ref_b]),
        cache_root,
        "random",
    )
    batch = plane.iterator.next_batch()
    assert batch["control_latents"].ndim == 4


def test_mask_and_reference_coexist(edit_dataset, tmp_path_factory):
    img_dir, ref_a, _, mask_dir = edit_dataset
    cache_root = str(tmp_path_factory.mktemp("cache_mixed"))
    _, plane = _build_plane(
        _mdb(
            img_dir, cache_root,
            ["ref_a", "masks"], [ref_a, mask_dir],
            cond_types=[None, "mask"],
        ),
        cache_root,
        "combined",
    )
    batch = plane.iterator.next_batch()
    assert batch["control_latents"].ndim == 4  # one reference backend
    latent_hw = batch["latents"].shape[1:3]
    assert batch["loss_mask"].shape == (2, *latent_hw, 1)


def test_unmatched_conditioning_pair_raises(edit_dataset, tmp_path_factory):
    img_dir, ref_a, _, _ = edit_dataset
    # a conditioning dir missing one of the training files
    partial = tmp_path_factory.mktemp("ref_partial")
    for i in range(3):  # im_3.png deliberately absent
        Image.open(os.path.join(ref_a, f"im_{i}.png")).save(partial / f"im_{i}.png")
    cache_root = str(tmp_path_factory.mktemp("cache_partial"))
    _, plane = _build_plane(
        _mdb(img_dir, cache_root, ["ref_p"], [str(partial)]),
        cache_root,
        "combined",
    )
    with pytest.raises(ValueError, match="no sample for"):
        for _ in range(8):  # draw until the batch containing im_3 comes up
            plane.iterator.next_batch()


def test_dangling_conditioning_id_raises(edit_dataset, tmp_path_factory):
    img_dir, ref_a, _, _ = edit_dataset
    cache_root = str(tmp_path_factory.mktemp("cache_dangling"))
    mdb = _mdb(img_dir, cache_root, ["ref_a"], [ref_a])
    mdb[0]["conditioning_data"] = ["ref_a", "does_not_exist"]
    with pytest.raises(ValueError, match="does_not_exist"):
        _build_plane(mdb, cache_root, "combined")
