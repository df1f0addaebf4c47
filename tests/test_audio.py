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