"""SD3 + PixArt ControlNet (VERDICT r2 Next #6): zero-init identity, residual
injection, controlnet-only train step, and diffusers-layout export round trip.
Reference: helpers/models/sd3 and helpers/models/pixart ControlNet support
(SURVEY.md §2.3); pattern mirrors the Flux branch (tests/test_controlnet.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models import weight_export as wx
from simpletuner_tpu.models.registry import get_model_family
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow


def _setup(family):
    cfg = TrainingConfig(
        {
            "model_family": family,
            "model_type": "controlnet",
            "model_arch_preset": "tiny",
            "controlnet_depth": 1,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            "report_to": "none",
        }
    )
    model = get_model_family(cfg)
    batch = model.example_batch(batch_size=2, resolution=32)
    batch["control_latents"] = jax.random.normal(
        jax.random.PRNGKey(9), batch["latents"].shape, jnp.float32
    )
    variables = dict(model.init_params(jax.random.PRNGKey(0), batch))
    variables["controlnet"] = model.init_controlnet_params(jax.random.PRNGKey(1), batch)
    return model, batch, variables


@pytest.fixture(scope="module", params=["sd3", "pixart_sigma"])
def setup(request):
    return request.param, *_setup(request.param)


def test_zero_init_identity(setup):
    _, model, batch, variables = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    base_vars = {k: v for k, v in variables.items() if k != "controlnet"}
    with_cn = model.model_predict(variables, prepared)
    without = model.model_predict(base_vars, prepared)
    np.testing.assert_allclose(np.asarray(with_cn), np.asarray(without), atol=1e-5)


def test_nonzero_residuals_change_output(setup):
    _, model, batch, variables = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    without = model.model_predict(
        {k: v for k, v in variables.items() if k != "controlnet"}, prepared
    )
    poked = jax.tree_util.tree_map(lambda p: p, variables["controlnet"])
    proj = poked["residual_proj_0"]["kernel"]
    poked["residual_proj_0"]["kernel"] = jnp.ones_like(proj) * 0.05
    out = model.model_predict({**variables, "controlnet": poked}, prepared)
    assert not np.allclose(np.asarray(out), np.asarray(without), atol=1e-4)


def test_controlnet_train_step(setup):
    _, model, batch, variables = setup
    # the jitted step donates the state; copy so the module-scoped fixture's
    # buffers survive for the export tests that run after this one
    variables = jax.tree_util.tree_map(jnp.array, variables)
    schedule = get_lr_schedule(model.config, 10)
    tx = get_optimizer(model.config, schedule)
    state = create_train_state(model, variables, tx)
    assert "controlnet" in state.trainable and "params" in state.frozen
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


def test_controlnet_export_round_trip(setup):
    family, model, batch, variables = setup
    cn = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), variables["controlnet"])
    if family == "sd3":
        exported = wx.export_sd3_controlnet_to_diffusers(cn, model.arch, depth=1)
        assert "pos_embed_input.proj.weight" in exported
        assert "controlnet_blocks.0.weight" in exported
        back = wx.import_sd3_controlnet_from_diffusers(exported, model.arch, depth=1)
    else:
        exported = wx.export_pixart_controlnet_to_diffusers(cn, model.arch, depth=1)
        assert "pos_embed_input.proj.weight" in exported
        assert "controlnet_blocks.0.weight" in exported
        back = wx.import_pixart_controlnet_from_diffusers(exported, model.arch, depth=1)

    flat_a = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(cn)[0]}
    flat_b = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert set(flat_a) == set(flat_b)
    for key in flat_a:
        np.testing.assert_array_equal(
            flat_a[key], np.asarray(flat_b[key], np.float32), err_msg=key
        )


def test_save_full_pipeline_includes_controlnet(setup, tmp_path):
    family, model, batch, variables = setup
    if family == "pixart_sigma":
        pytest.skip("pipeline export covers pixart via the same code path; sd3 asserts it")
    import os

    out = str(tmp_path / "pipe")
    wx.save_full_pipeline(
        model,
        {
            "params": jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), variables["params"]),
            "controlnet": jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), variables["controlnet"]),
        },
        out,
    )
    assert os.path.exists(os.path.join(out, "controlnet", "diffusion_pytorch_model.safetensors"))
    assert os.path.exists(os.path.join(out, "controlnet", "config.json"))


def test_sd3_controlnet_trainer_e2e(tmp_path):
    """model_type=controlnet trains end-to-end through the Trainer with a
    paired conditioning dataset and exports the ControlNet in the pipeline
    directory (reference sd3 ControlNet training + save hooks)."""
    import os

    from PIL import Image

    from simpletuner_tpu.training.trainer import Trainer

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    cond_dir = tmp_path / "control"
    img_dir.mkdir(); cond_dir.mkdir()
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)).save(
            img_dir / f"img_{i}.png"
        )
        (img_dir / f"img_{i}.txt").write_text(f"a photo {i}")
        Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)).save(
            cond_dir / f"img_{i}.png"
        )
    cache = str(tmp_path / "cache")
    config = TrainingConfig({
        "model_family": "sd3", "model_type": "controlnet", "model_arch_preset": "tiny",
        "controlnet_depth": 1, "train_batch_size": 1, "resolution": 64,
        "resolution_type": "pixel_area", "max_train_steps": 2,
        "cache_dir": cache, "output_dir": str(tmp_path / "out"),
        "optimizer": "adamw", "learning_rate": 1e-3, "seed": 7, "report_to": "none",
        "data_backend_config": [
            {"id": "images", "type": "local", "instance_data_dir": str(img_dir),
             "crop": True, "crop_style": "center", "crop_aspect": "square",
             "resolution": 64, "resolution_type": "pixel_area",
             "caption_strategy": "textfile",
             "cache_dir_vae": os.path.join(cache, "vae"),
             "text_embeds": "embeds", "repeats": 7,
             "conditioning_data": "control"},
            {"id": "control", "dataset_type": "conditioning", "type": "local",
             "instance_data_dir": str(cond_dir), "resolution": 64,
             "resolution_type": "pixel_area",
             "cache_dir_vae": os.path.join(cache, "vae_control")},
            {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
             "default": True, "cache_dir": os.path.join(cache, "text")},
        ],
    })
    trainer = Trainer(config=config)
    trainer.run()
    assert trainer.global_step == 2
    ckpts = trainer.checkpoint_manager.list_checkpoints()
    cn_path = os.path.join(
        ckpts[-1], "pipeline", "controlnet", "diffusion_pytorch_model.safetensors"
    )
    assert os.path.exists(cn_path), f"no exported controlnet in {ckpts[-1]}"
