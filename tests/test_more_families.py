"""PixArt-Sigma and AuraFlow family smoke tests (registry, forward, train step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.registry import ModelRegistry
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

def make_model(family):
    cfg = TrainingConfig(
        {
            "model_family": family,
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
        }
    )
    return ModelRegistry.create(family, cfg)

@pytest.mark.parametrize("family", ["pixart_sigma", "auraflow"])
class TestFamilies:
    def test_forward_and_step(self, family):
        model = make_model(family)
        batch = model.example_batch(batch_size=2, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
        assert pred.shape == batch["latents"].shape

        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        state = create_train_state(model, variables, tx)
        step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))

    def test_registry_alias(self, family):
        assert ModelRegistry.get(family) is type(make_model(family))

def test_pixart_is_epsilon():
    model = make_model("pixart_sigma")
    batch = model.example_batch(batch_size=2, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    np.testing.assert_array_equal(np.asarray(prepared["target"]), np.asarray(prepared["noise"]))
    assert prepared["timesteps"].dtype in (jnp.int32, jnp.int64)

def test_auraflow_is_flow():
    model = make_model("auraflow")
    batch = model.example_batch(batch_size=1, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    assert "sigmas" in prepared

@pytest.mark.parametrize("family", ["chroma", "kolors"])
def test_derived_families_forward(family):
    model = make_model(family)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape

def test_chroma_has_no_guidance_embed():
    model = make_model("chroma")
    assert not model.arch.guidance_embed

def test_kolors_chatglm_dims():
    model = make_model("kolors")
    embeds = None
    from simpletuner_tpu.models.text_encoders import load_text_encoders

    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    embeds = model.encode_text(["a kolors prompt"])
    assert embeds[0]["text_embeds"].shape[-1] == model.arch.cross_attention_dim

@pytest.mark.parametrize("family", ["flux2", "lumina2", "sana"])
def test_new_wave_families(family):
    model = make_model(family)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert "sigmas" in prepared  # all three are flow families

def test_sana_linear_attention_math():
    import jax.numpy as jnp

    from simpletuner_tpu.models.sana.model import relu_linear_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 2, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 2, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 2, 8))
    out = relu_linear_attention(q, k, v)
    assert out.shape == (1, 6, 2, 8)
    # mixes tokens: perturbing token 5 changes token 0's output
    out2 = relu_linear_attention(q, k.at[:, 5].add(2.0), v.at[:, 5].add(2.0))
    assert float(jnp.abs(out[:, 0] - out2[:, 0]).max()) > 1e-6

def test_deepfloyd_pixel_space():
    model = make_model("deepfloyd")
    assert not model.REQUIRES_VAE
    batch = model.example_batch(batch_size=1, resolution=32)
    assert batch["latents"].shape == (1, 32, 32, 3)  # pixels, not latents
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape

@pytest.mark.parametrize("family", ["mageflow", "z_image", "cosmos3"])
def test_latest_wave_families(family):
    model = make_model(family)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape

def test_family_aliases():
    assert ModelRegistry.get("ltxvideo2").__name__ == "LTXVideo2"  # distinct 19B AV family
    assert ModelRegistry.get("krea2").__name__ == "Krea2"  # own GQA MMDiT family now

@pytest.mark.parametrize("family", [
    "qwen_image", "longcat_image", "longcat_video", "anima", "ideogram",
    "kandinsky5_image", "kandinsky5_video", "sanavideo",
    "boogu_image", "ernie", "stable_cascade", "krea2",
])
def test_extended_families(family):
    model = make_model(family)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape

def test_extended_aliases():
    assert ModelRegistry.get("cosmos").__name__ == "Cosmos2Image"
    assert ModelRegistry.get("z_image_omni").__name__ == "ZImageOmni"
    assert ModelRegistry.get("zlab_i1").__name__ == "ZlabI1"

def test_wan_s2v_audio_context():
    import jax.numpy as jnp

    model = make_model("wan_s2v")
    batch = model.example_batch(batch_size=1, resolution=32)
    assert "audio_embeds" in batch
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    # audio actually reaches the context axis
    inputs = model.get_model_inputs(prepared)
    assert inputs["context"].shape[1] == batch["text_embeds"].shape[1] + batch["audio_embeds"].shape[1]

def test_waveform_features():
    import numpy as np

    from simpletuner_tpu.data.audio import waveform_features

    wave = np.random.default_rng(0).standard_normal((16000, 1)).astype(np.float32) * 0.1
    feats = waveform_features(wave, sample_rate=16000)
    assert feats.ndim == 2 and feats.shape[1] == 64
    assert np.all(np.isfinite(feats))