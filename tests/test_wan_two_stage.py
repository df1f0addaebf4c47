"""Wan 2.2 two-expert validation (reference wan/model.py:928-1020:
--wan_validation_load_other_stage loads the other denoising expert so renders
run the boundary-split ladder — high-noise expert at sigma >= boundary_ratio,
low-noise expert after)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.wan.model import Wan


def _cfg(**extra):
    return TrainingConfig(
        {
            "model_family": "wan",
            "model_type": "lora",
            "lora_rank": 4,
            "model_arch_preset": "tiny",
            "optimizer": "adamw",
            "learning_rate": 1e-4,
            "max_train_steps": 10,
            "model_flavour": "animegen-t2v-high",
            **extra,
        }
    )


def test_stage_defaults_applied():
    model = Wan(_cfg())
    model.check_user_config()
    assert float(model.config.flow_schedule_shift) == 5.0
    assert int(model.config.validation_num_inference_steps) == 40
    assert float(model.config.validation_guidance) == 1.0


def test_no_plan_without_opt_in():
    model = Wan(_cfg())
    batch = model.example_batch(batch_size=1)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    assert model.validation_stage_plan(variables) is None
    # non-2.2 flavours never plan
    assert Wan(_cfg(model_flavour="t2v-1.3b",
                    wan_validation_load_other_stage=True)).supports_multistage_validation() is False


def test_missing_other_subfolder_raises(tmp_path):
    model = Wan(_cfg(
        wan_validation_load_other_stage=True,
        pretrained_model_name_or_path=str(tmp_path),
    ))
    batch = model.example_batch(batch_size=1)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    with pytest.raises(FileNotFoundError, match="transformer"):
        model.validation_stage_plan(variables)


def test_boundary_split_plan_and_chain(tmp_path):
    """Export a tiny low-noise expert as transformer/, plan, and check the
    split index matches the sigma boundary under the 2.2 shift."""
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.weight_export import export_wan_to_diffusers

    low = Wan(_cfg(model_flavour="animegen-t2v-low"))
    batch = low.example_batch(batch_size=1)
    low_vars = low.init_params(jax.random.PRNGKey(7), batch)
    weights = export_wan_to_diffusers(jax.device_get(low_vars["params"]), low.arch)
    subdir = tmp_path / "transformer"
    os.makedirs(subdir)
    save_file(weights, str(subdir / "diffusion_pytorch_model.safetensors"))

    steps = 8
    model = Wan(_cfg(
        wan_validation_load_other_stage=True,
        pretrained_model_name_or_path=str(tmp_path),
        validation_num_inference_steps=steps,
        flow_schedule_shift=5.0,
    ))
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    plan = model.validation_stage_plan(variables)
    assert plan is not None and len(plan) == 2
    # trained flavour is HIGH: stage 1 is self, stage 2 the loaded expert
    assert plan[0]["model"] is model
    assert plan[1]["model"] is not model

    from simpletuner_tpu.schedulers.flow_euler import FlowMatchEulerScheduler

    sigmas = np.asarray(FlowMatchEulerScheduler.create(steps, shift=5.0).sigmas)[:steps]
    n_high = int((sigmas >= 0.875).sum())
    assert plan[0]["until"] == pytest.approx(max(1, n_high) / steps)
    assert plan[1]["until"] == 1.0

    # both stages denoise: run the split ladder end-to-end on tiny shapes
    from simpletuner_tpu.schedulers.sampling import sample_loop

    scheduler = FlowMatchEulerScheduler.create(steps, shift=5.0)
    latent_shape = tuple(batch["latents"].shape)
    noise = jax.random.normal(jax.random.PRNGKey(3), latent_shape, jnp.float32)
    latents = noise
    boundary_step = 0
    for stage in plan:
        stop = steps if stage["until"] == 1.0 else int(round(steps * stage["until"]))
        cond = stage["model"].inference_conditioning(
            {**batch, "latents": jnp.zeros(latent_shape)}
        )
        denoise = stage["model"].denoise_fn(stage["variables"], cond)
        latents = sample_loop(
            scheduler, denoise, latents,
            start_step=boundary_step, stop_step=stop, start_latents=latents,
        )
        boundary_step = stop
    assert bool(jnp.isfinite(latents).all())
