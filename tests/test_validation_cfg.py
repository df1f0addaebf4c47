"""Validation CFG: negative-prompt guidance for non-guidance-embed families."""

import os

import jax
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.sd1x.model import SD1x
from simpletuner_tpu.models.text_encoders import load_text_encoders
from simpletuner_tpu.training.validation import Validation

pytestmark = pytest.mark.slow

def test_cfg_render(tmp_path):
    cfg = TrainingConfig(
        {
            "model_family": "sd1x",
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            "validation_prompt": "a cat",
            "validation_negative_prompt": "blurry",
            "validation_guidance": 5.0,
            "validation_num_inference_steps": 2,
            "validation_resolution": 64,
        }
    )
    model = SD1x(cfg)
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    validation = Validation(model, cfg, output_dir=str(tmp_path))
    assert validation._wants_cfg()
    validation.precompute_embeds()
    assert validation._negative_embeds is not None

    batch = model.example_batch(batch_size=1, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    paths = validation.run_validations(variables, step=1, force=True)
    assert paths and os.path.exists(paths[0])

def test_flux_guidance_embed_skips_cfg():
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig

    cfg = TrainingConfig(
        {"model_family": "flux", "model_type": "lora", "lora_rank": 4,
         "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10,
         "validation_prompt": "x", "validation_guidance": 5.0}
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    validation = Validation(model, cfg)
    assert not validation._wants_cfg()  # distilled guidance embed, no CFG

def test_validation_preview_strip(tmp_path):
    cfg = TrainingConfig(
        {
            "model_family": "sd1x",
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            "validation_prompt": "a cat",
            "validation_num_inference_steps": 4,
            "validation_resolution": 64,
            "validation_preview": True,
        }
    )
    model = SD1x(cfg)
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    validation = Validation(model, cfg, output_dir=str(tmp_path))
    validation.precompute_embeds()
    batch = model.example_batch(batch_size=1, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    paths = validation.run_validations(variables, step=1, force=True)
    assert paths
    assert os.path.exists(os.path.join(str(tmp_path), "validation", "preview_0.png"))

def _make_taesd_fixture(path):
    """Random full-size taesd decoder weights in the torch sequential layout."""
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.tae import TAEConfig

    config = TAEConfig.taesd()
    rng = np.random.default_rng(7)
    w = {}

    def put(key, out_c, in_c, bias=True):
        w[f"{key}.weight"] = rng.normal(0, 0.02, (out_c, in_c, 3, 3)).astype(np.float32)
        if bias:
            w[f"{key}.bias"] = rng.normal(0, 0.02, (out_c,)).astype(np.float32)

    c = config.base_channels
    put("1", c, config.latent_channels)
    index, layer = 3, 0
    for stage in range(config.num_stages):
        for _ in range(3):
            put(f"{index}.conv.0", c, c)
            put(f"{index}.conv.2", c, c)
            put(f"{index}.conv.4", c, c)
            layer += 1
            index += 1
        index += 1
        put(str(index), c, c, bias=False)
        index += 1
    put(f"{index}.conv.0", c, c)
    put(f"{index}.conv.2", c, c)
    put(f"{index}.conv.4", c, c)
    index += 1
    put(str(index), 3, c)
    save_file(w, str(path))


class _CaptureWebhook:
    def __init__(self):
        self.events = []

    def send_raw(self, event):
        self.events.append(event)


def test_validation_preview_streams_tae_events(tmp_path):
    """Streamed TAE previews (reference ValidationPreviewer, validation.py:1633):
    one webhook event per Nth sampling step, decoded by the tiny autoencoder."""
    tae_path = tmp_path / "taesd_decoder.safetensors"
    _make_taesd_fixture(tae_path)
    cfg = TrainingConfig(
        {
            "model_family": "sd1x",
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            "validation_prompt": "a cat",
            "validation_num_inference_steps": 4,
            "validation_resolution": 64,
            "validation_preview": True,
            "validation_preview_steps": 2,
            "validation_preview_tae_path": str(tae_path),
        }
    )
    model = SD1x(cfg)
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    hook = _CaptureWebhook()
    validation = Validation(model, cfg, output_dir=str(tmp_path), webhook_handler=hook)
    assert validation._tae_decode is not None
    validation.precompute_embeds()
    batch = model.example_batch(batch_size=1, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    validation.run_validations(variables, step=1, force=True)

    previews = [e for e in hook.events if e.get("event_type") == "validation.preview"]
    assert len(previews) == 2  # 4 steps, every 2nd
    assert previews[0]["sampling_step"] == 0 and previews[1]["sampling_step"] == 2
    assert previews[0]["image"]["src"].startswith("data:image/png;base64,")
    assert os.path.exists(os.path.join(str(tmp_path), "validation", "preview_0.png"))


def test_adapter_sweep(tmp_path):
    """validation_adapters renders one extra labeled pass per adapter file."""
    from simpletuner_tpu.training.lora import save_lora_safetensors

    cfg = TrainingConfig(
        {
            "model_family": "sd1x",
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            "validation_prompt": "a cat",
            "validation_num_inference_steps": 2,
            "validation_resolution": 64,
            "validation_steps": 1,
            "validation_adapters": [
                {"path": str(tmp_path / "extra.safetensors"), "strength": 0.5, "label": "style"}
            ],
        }
    )
    model = SD1x(cfg)
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    batch = model.example_batch(batch_size=1, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    save_lora_safetensors(model, variables["lora"], str(tmp_path / "extra.safetensors"))

    validation = Validation(model, cfg, output_dir=str(tmp_path))
    validation.precompute_embeds()
    paths = validation.run_validations(variables, step=1, force=True)
    names = [os.path.basename(p) for p in paths]
    assert "step_1_0.png" in names
    assert "step_1_0_style.png" in names

def test_external_script_validation(tmp_path):
    """validation_method=external-script shells out with placeholders resolved."""
    marker = tmp_path / "ran.txt"
    ckpt = tmp_path / "out" / "checkpoint-5"
    ckpt.mkdir(parents=True)
    cfg = TrainingConfig(
        {
            "model_family": "sd1x",
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            "validation_prompt": "a cat",
            "validation_steps": 1,
            "validation_method": "external-script",
            "validation_external_script": f"echo {{global_step}} {{local_checkpoint_path}} > {marker}",
        }
    )
    model = SD1x(cfg)
    validation = Validation(model, cfg, output_dir=str(tmp_path / "out"))
    validation.prompts = ["a cat"]
    validation._embeds = [{}]
    validation.disabled = False
    paths = validation.run_validations({}, step=5, force=True)
    assert paths == []
    content = marker.read_text().strip()
    assert content.startswith("5 ") and content.endswith("checkpoint-5")

def test_skip_layer_guidance_sd3(tmp_path):
    """SD3.5 skip-layer guidance (reference validation.py:4469): the skipped
    forward differs from the full one, SLG renders change the output inside
    the window, and unsupported families fail loudly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.sd3.model import SD3
    from simpletuner_tpu.models.sd3.transformer import SD3Config
    from simpletuner_tpu.training.validation import Validation

    arch = SD3Config.tiny()
    cfg = TrainingConfig({
        "model_family": "sd3", "model_type": "lora", "lora_rank": 2,
        "optimizer": "adamw", "learning_rate": 1e-4, "max_train_steps": 1,
        "validation_prompt": "x", "validation_num_inference_steps": 4,
        "validation_resolution": 32, "validation_guidance": 3.0,
        "validation_guidance_skip_layers": [1],
        "validation_guidance_skip_layers_start": 0.0,
        "validation_guidance_skip_layers_stop": 1.0,
        "validation_guidance_skip_scale": 2.8,
        "output_dir": str(tmp_path),
    })
    model = SD3(cfg, arch=arch)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    # freshly-initialized AdaLN gates are zero (blocks contribute nothing);
    # perturb so skipping a block is observable
    variables["params"] = jax.tree_util.tree_map(
        lambda p: p + 0.03, variables["params"])

    # skipped forward differs from the full forward
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    cond = model.inference_conditioning({k: v for k, v in batch.items() if k != "latents"}
                                        | {"latents": batch["latents"]})
    full = model.denoise_fn(variables, cond)(batch["latents"], jnp.float32(0.5))
    skipped = model.denoise_fn_skip_layers(variables, cond, (1,))(
        batch["latents"], jnp.float32(0.5))
    assert not np.allclose(np.asarray(full), np.asarray(skipped))

    # unsupported family raises at validation setup
    flux_cfg = TrainingConfig({
        "model_family": "flux", "model_type": "lora", "lora_rank": 2,
        "optimizer": "adamw", "learning_rate": 1e-4, "max_train_steps": 1,
        "validation_prompt": "x", "validation_guidance_skip_layers": [1],
        "output_dir": str(tmp_path),
    })
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig

    flux = Flux(flux_cfg, arch=FluxConfig.tiny())
    v = Validation(flux, flux_cfg, output_dir=str(tmp_path))

    class FakeSched:
        num_steps = 4
        def timestep(self, i):
            return jnp.float32(1.0 - i / 4)

    with pytest.raises(ValueError, match="skip_layers"):
        v._slg_params(FakeSched())


def test_sd3_uncond_zero_behaviour():
    """sd3_clip/t5_uncond_behaviour=zero zeroes the empty-prompt embeds
    (reference sd3 uncond handling) while real prompts stay intact."""
    import numpy as np

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.registry import get_model_family
    from simpletuner_tpu.models.text_encoders import load_text_encoders

    def embeds(**over):
        cfg = TrainingConfig({
            "model_family": "sd3", "model_type": "lora", "lora_rank": 2,
            "model_arch_preset": "tiny", "optimizer": "adamw",
            "learning_rate": 1e-4, "max_train_steps": 1, **over,
        })
        model = get_model_family(cfg)
        model.attach_text_encoders(
            load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, None, tiny=True))
        return model.encode_text(["a cat", ""])

    default = embeds()
    assert np.abs(default[1]["text_embeds"]).max() > 0  # "" encodes normally

    zeroed = embeds(sd3_clip_uncond_behaviour="zero", sd3_t5_uncond_behaviour="zero")
    assert np.abs(zeroed[1]["text_embeds"]).max() == 0
    assert np.abs(zeroed[1]["pooled_embeds"]).max() == 0
    assert np.abs(zeroed[0]["text_embeds"]).max() > 0  # real prompt untouched


def test_sana_complex_human_instruction_changes_embeds():
    import numpy as np

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.registry import get_model_family
    from simpletuner_tpu.models.text_encoders import load_text_encoders

    def one(chi):
        cfg = TrainingConfig({
            "model_family": "sana", "model_type": "lora", "lora_rank": 2,
            "model_arch_preset": "tiny", "optimizer": "adamw",
            "learning_rate": 1e-4, "max_train_steps": 1,
            "sana_complex_human_instruction": chi,
        })
        model = get_model_family(cfg)
        model.attach_text_encoders(
            load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, None, tiny=True))
        return model.encode_text(["a cat"])[0]["text_embeds"]

    assert not np.allclose(one(False), one(True))
