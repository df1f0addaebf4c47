"""Audio pipeline: WAV decode, duration bucketing, 1-D VAE, ACE-Step DiT,

end-to-end tiny audio training."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.data.audio import duration_bucket, load_audio, probe_audio
from simpletuner_tpu.models.ace_step import ACEStep
from simpletuner_tpu.models.audio_vae import AudioAutoencoderKL, AudioVAEConfig

pytestmark = pytest.mark.slow

def _write_wav(path, seconds=2.0, rate=8000, seed=0):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    data = (rng.standard_normal(int(seconds * rate)) * 0.1 * 32767).astype(np.int16)
    wavfile.write(str(path), rate, data)
    return str(path)

@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("audio")
    for i in range(4):
        _write_wav(root / f"track_{i}.wav", seconds=2.0, seed=i)
        (root / f"track_{i}.txt").write_text(f"a song number {i}")
    return str(root)

class TestDecode:
    def test_duration_bucket(self):
        assert duration_bucket(2.4) == "2s"
        assert duration_bucket(0.3) == "1s"
        assert duration_bucket(10.0, bucket_seconds=5.0) == "10s"

    def test_probe_and_load(self, audio_dir):
        from simpletuner_tpu.data.backends.local import LocalDataBackend

        backend = LocalDataBackend("a", audio_dir)
        path = os.path.join(audio_dir, "track_0.wav")
        info = probe_audio(backend, path)
        assert info["sample_rate"] == 8000
        assert abs(info["duration"] - 2.0) < 0.01
        wave = load_audio(backend, path, sample_rate=4000, duration_seconds=1.0)
        assert wave.shape == (4000, 1)
        assert wave.dtype == np.float32

class TestAudioVAE:
    def test_roundtrip_shapes(self):
        vae = AudioAutoencoderKL(AudioVAEConfig.tiny())
        x = jnp.zeros((1, 256, 1))
        params = vae.init(jax.random.PRNGKey(0), x)
        z = vae.apply(params, x, method=AudioAutoencoderKL.encode)
        assert z.shape == (1, 16, 4)  # 16x compression
        out = vae.apply(params, z, method=AudioAutoencoderKL.decode)
        assert out.shape == (1, 256, 1)

class TestACEStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = TrainingConfig(
            {
                "model_family": "ace_step",
                "model_type": "lora",
                "model_arch_preset": "tiny",
                "lora_rank": 4,
                "optimizer": "adamw",
                "learning_rate": 1e-3,
                "max_train_steps": 10,
            }
        )
        model = ACEStep(cfg)
        batch = model.example_batch(batch_size=2)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        return model, batch, variables

    def test_forward_shape(self, setup):
        model, batch, variables = setup
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
        assert pred.shape == batch["latents"].shape

    def test_lyrics_context(self, setup):
        model, batch, variables = setup
        b = dict(batch)
        # lyric token ids ride the batch like the reference's lyric_token_idx
        b["lyrics_tokens"] = jnp.ones((2, 8), jnp.int32)
        b["lyrics_mask"] = jnp.asarray([[1] * 8, [1] * 5 + [0] * 3], jnp.float32)
        prepared = model.prepare_batch(jax.random.PRNGKey(1), b)
        pred = model.model_predict(variables, prepared)
        assert pred.shape == batch["latents"].shape

class TestAudioTrainerE2E:
    def test_end_to_end(self, audio_dir, tmp_path_factory):
        from simpletuner_tpu.training.trainer import Trainer

        workdir = str(tmp_path_factory.mktemp("ace_run"))
        cache_root = os.path.join(workdir, "cache")
        mdb = [
            {
                "id": "tracks",
                "dataset_type": "audio",
                "type": "local",
                "instance_data_dir": audio_dir,
                "caption_strategy": "textfile",
                "cache_dir_vae": os.path.join(cache_root, "vae"),
                "text_embeds": "embeds",
                "repeats": 7,
                "audio": {"max_duration": 2.0},
            },
            {
                "id": "embeds",
                "dataset_type": "text_embeds",
                "type": "local",
                "default": True,
                "cache_dir": os.path.join(cache_root, "text"),
            },
        ]
        config = TrainingConfig(
            {
                "model_family": "ace_step",
                "model_type": "lora",
                "model_arch_preset": "tiny",
                "lora_rank": 4,
                "train_batch_size": 1,
                "max_train_steps": 2,
                "cache_dir": cache_root,
                "output_dir": os.path.join(workdir, "output"),
                "data_backend_config": mdb,
                "optimizer": "adamw",
                "learning_rate": 1e-3,
                "seed": 7,
                "report_to": "none",
            }
        )
        trainer = Trainer(config=config)
        trainer.run()
        assert trainer.global_step == 2

def test_lyrics_embedder_sidecar_trains():
    """--lyrics_embedder_train: the conformer lyric encoder + projection move
    from the frozen base into a sidecar optimizer group at lyrics_embedder_lr
    while the LoRA adapter trains normally (reference trainer.py:3292)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.registry import get_model_family
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    cfg = TrainingConfig({
        "model_family": "ace_step", "model_type": "lora", "lora_rank": 2,
        "model_arch_preset": "tiny", "optimizer": "adamw", "learning_rate": 1e-3,
        "lyrics_embedder_train": True, "lyrics_embedder_lr": 1e-3,
        "max_train_steps": 2, "mixed_precision": "fp32",
    })
    model = get_model_family(cfg)
    batch = model.example_batch(batch_size=1)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    rng = np.random.default_rng(0)
    batch["latents"] = jnp.asarray(rng.normal(0, 1, batch["latents"].shape), jnp.float32)
    schedule = get_lr_schedule(cfg, 2)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    assert "lyrics_params" in state.trainable
    assert set(state.trainable["lyrics_params"]) == {"lyric_encoder", "lyric_proj"}
    assert "lyric_encoder" not in state.frozen["params"]

    step = jax.jit(build_train_step(model, tx, schedule))
    before = jax.device_get(state.trainable["lyrics_params"])
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    moved = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(state.trainable["lyrics_params"]),
                        jax.tree_util.tree_leaves(before)))
    assert moved > 0, "lyric encoder did not train"

    # export/validation surfaces see the merged tree
    merged = state.variables()
    assert "lyric_encoder" in merged["params"]

    # unsupported family fails loudly
    import pytest

    with pytest.raises(ValueError, match="lyrics_embedder_train"):
        get_model_family(TrainingConfig({
            "model_family": "flux", "model_type": "lora", "lora_rank": 2,
            "optimizer": "adamw", "learning_rate": 1e-4, "max_train_steps": 1,
            "lyrics_embedder_train": True,
        }))
