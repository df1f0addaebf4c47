"""Masked loss: mask-conditioning dataset -> latent-res loss masks -> loss math."""

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
from simpletuner_tpu.training.losses import LossConfig, diffusion_loss

pytestmark = pytest.mark.slow

def test_mask_weighting_math():
    pred = jnp.ones((2, 8, 8, 4))
    target = jnp.zeros((2, 8, 8, 4))
    config = LossConfig(loss_type="l2", prediction_type="flow_matching")
    full = diffusion_loss(pred, target, config, sigmas=jnp.full((2,), 0.5))
    mask = jnp.zeros((2, 8, 8, 1)).at[:, :4].set(1.0)  # half masked in
    masked = diffusion_loss(pred, target, config, sigmas=jnp.full((2,), 0.5), mask=mask)
    # pointwise error is uniform, so masked mean == full mean
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-5)

    # error only OUTSIDE the mask -> masked loss ~ 0
    pred2 = jnp.zeros((2, 8, 8, 4)).at[:, 4:].set(3.0)
    masked2 = diffusion_loss(pred2, target, config, sigmas=jnp.full((2,), 0.5), mask=mask)
    assert float(masked2) < 1e-6

@pytest.fixture(scope="module")
def masked_dataset(tmp_path_factory):
    rng = np.random.default_rng(0)
    img_dir = tmp_path_factory.mktemp("imgs")
    mask_dir = tmp_path_factory.mktemp("masks")
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            img_dir / f"im_{i}.png"
        )
        (img_dir / f"im_{i}.txt").write_text(f"pic {i}")
        mask = np.zeros((64, 64), np.uint8)
        mask[: 32 + i] = 255
        Image.fromarray(mask).save(mask_dir / f"im_{i}.png")
    return str(img_dir), str(mask_dir)

def test_collate_supplies_loss_mask(masked_dataset, tmp_path_factory):
    img_dir, mask_dir = masked_dataset
    cache_root = str(tmp_path_factory.mktemp("cache"))
    mdb = [
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
            "conditioning_data": "masks",
        },
        {
            "id": "masks",
            "dataset_type": "conditioning",
            "conditioning_type": "mask",
            "type": "local",
            "instance_data_dir": mask_dir,
            "resolution": 64,
            "resolution_type": "pixel_area",
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
            "max_train_steps": 4,
            "cache_dir": cache_root,
            "data_backend_config": mdb,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
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
    batch = plane.iterator.next_batch()
    assert "loss_mask" in batch
    latent_hw = batch["latents"].shape[1:3]
    assert batch["loss_mask"].shape == (2, *latent_hw, 1)
    values = np.unique(batch["loss_mask"])
    assert set(values.tolist()) <= {0.0, 1.0}

    # masked loss flows through the model's loss_fn
    variables = model.init_params(jax.random.PRNGKey(0))
    device_batch = {
        k: jnp.asarray(v) for k, v in batch.items()
        if isinstance(v, np.ndarray) and v.dtype.kind in "fiub"
    }
    loss, _ = model.loss_fn(variables, jax.random.PRNGKey(1), device_batch)
    assert np.isfinite(float(loss))

def test_use_soft_min_snr_substitutes_snr_curve():
    """use_soft_min_snr swaps the SNR curve inside min-SNR-gamma weighting
    (reference min_snr_gamma.py:35): weights differ from plain min-SNR and
    match the analytic soft formula."""
    import jax.numpy as jnp
    import numpy as np

    from simpletuner_tpu.training.losses import (
        DDPMScheduleConfig,
        LossConfig,
        diffusion_loss,
        compute_snr,
        compute_soft_min_snr,
        make_alphas_cumprod,
    )

    ac = make_alphas_cumprod(DDPMScheduleConfig())
    t = jnp.asarray([10, 500, 990])
    soft = np.asarray(compute_soft_min_snr(t, ac, sigma_data=0.5))
    ac_np = np.asarray(ac)[np.asarray(t)]
    sigma_sq = 1.0 - ac_np
    want = sigma_sq * 0.25 / (sigma_sq + 0.25) ** 2
    np.testing.assert_allclose(soft, want, rtol=1e-5)

    pred = jnp.ones((3, 4, 4, 4))
    target = jnp.zeros((3, 4, 4, 4))
    plain = diffusion_loss(
        pred, target,
        LossConfig(snr_gamma=5.0, prediction_type="epsilon"),
        timesteps=t, alphas_cumprod=ac)
    softw = diffusion_loss(
        pred, target,
        LossConfig(snr_gamma=5.0, prediction_type="epsilon",
                   use_soft_min_snr=True, soft_min_snr_sigma_data=0.5),
        timesteps=t, alphas_cumprod=ac)
    assert float(plain) != float(softw)
    # analytic check of the soft-weighted mean
    snr_soft = want
    w = np.minimum(snr_soft, 5.0) / np.maximum(snr_soft, 1e-8)
    np.testing.assert_allclose(float(softw), float(np.mean(1.0 * w)), rtol=1e-4)


def test_refiner_training_timestep_window():
    """refiner_training restricts sampled timesteps to the low-noise segment;
    invert_schedule flips to the high-noise segment (reference
    custom_schedule.py:18-31 segmented refiner range)."""
    import jax
    import numpy as np

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.registry import get_model_family
    from simpletuner_tpu.training.losses import sample_timesteps

    def draws(**over):
        cfg = TrainingConfig({
            "model_family": "sd1x", "model_type": "full", "model_arch_preset": "tiny",
            "optimizer": "adamw", "learning_rate": 1e-4, "max_train_steps": 1, **over,
        })
        model = get_model_family(cfg)
        t = sample_timesteps(jax.random.PRNGKey(0), 512, model.timestep_sampling_config())
        return np.asarray(t)

    normal = draws(refiner_training=True, refiner_training_strength=0.2)
    assert normal.max() < 200 and normal.min() >= 0

    inverted = draws(refiner_training=True, refiner_training_strength=0.2,
                     refiner_training_invert_schedule=True)
    assert inverted.min() >= 200

    full = draws(refiner_training=True, sdxl_refiner_uses_full_range=True)
    assert full.max() >= 800  # unrestricted

    plain = draws()
    assert plain.max() >= 800 and plain.min() < 200


def test_flow_custom_timesteps_fixed_and_round_robin():
    """flow_custom_timesteps: explicit sigma list (timesteps >1 normalize);
    fixed-list draws from the list, round-robin cycles by step (reference
    common.py:4525,4637)."""
    import jax
    import numpy as np

    from simpletuner_tpu.training.losses import (
        FlowScheduleConfig,
        parse_flow_custom_timesteps,
        sample_flow_sigmas,
    )

    assert parse_flow_custom_timesteps("250, 500;750") == (0.25, 0.5, 0.75)
    assert parse_flow_custom_timesteps([0.1, 0.9]) == (0.1, 0.9)
    assert parse_flow_custom_timesteps("") is None

    cfg = FlowScheduleConfig(custom_sigmas=(0.25, 0.5, 0.75))
    draws = np.asarray(sample_flow_sigmas(jax.random.PRNGKey(0), 64, cfg))
    assert set(np.round(draws, 4)) <= {0.25, 0.5, 0.75}
    assert len(set(np.round(draws, 4))) > 1

    rr = FlowScheduleConfig(custom_sigmas=(0.25, 0.5, 0.75), custom_mode="round-robin")
    step0 = np.asarray(sample_flow_sigmas(jax.random.PRNGKey(0), 2, rr, global_step=0))
    step1 = np.asarray(sample_flow_sigmas(jax.random.PRNGKey(0), 2, rr, global_step=1))
    np.testing.assert_allclose(step0, [0.25, 0.5])
    np.testing.assert_allclose(step1, [0.75, 0.25])

    import pytest

    with pytest.raises(ValueError, match="flow_timesteps_mode"):
        sample_flow_sigmas(jax.random.PRNGKey(0), 2,
                           FlowScheduleConfig(custom_sigmas=(0.5,), custom_mode="nope"))


def test_flux_fast_schedule_quantized_sigmas():
    """flux_fast_schedule: training sigmas draw uniformly from the schnell
    4-level table [1.0, 0.3, 0.2, 0.1] (SD3-Turbo schedule, reference
    flux/__init__.py:11-20); shifts/modes do not perturb the table."""
    from simpletuner_tpu.training.losses import FlowScheduleConfig, sample_flow_sigmas

    cfg = FlowScheduleConfig(fast_schedule=True, schedule_shift=3.0, sigmoid_scale=2.0)
    draws = np.asarray(sample_flow_sigmas(jax.random.PRNGKey(0), 256, cfg))
    levels = {float(v) for v in np.round(draws.astype(np.float64), 4)}
    assert levels <= {1.0, 0.3, 0.2, 0.1}
    assert len(levels) == 4  # 256 draws hit every level

    # only flux/chroma accept the flag; other flow families fail loudly
    from simpletuner_tpu.models.registry import ModelRegistry

    sd3_cfg = TrainingConfig(
        {
            "model_family": "sd3",
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "flux_fast_schedule": True,
            "max_train_steps": 10,
        }
    )
    sd3 = ModelRegistry.create("sd3", sd3_cfg)
    with pytest.raises(ValueError, match="flux_fast_schedule"):
        sd3.flow_schedule_config()

    flux_cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "flux_fast_schedule": True,
            "max_train_steps": 10,
        }
    )
    flux = Flux(flux_cfg, arch=FluxConfig.tiny())
    assert flux.flow_schedule_config().fast_schedule is True
