"""Video pipeline: decode, bucketing, causal 3D VAE, Wan DiT, and an

end-to-end tiny video training run."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.data.video import align_frame_count, load_video_frames, prepare_video, probe_video
from simpletuner_tpu.data.buckets import BucketConfig
from simpletuner_tpu.models.video_vae import VideoAutoencoderKL, VideoVAEConfig
from simpletuner_tpu.models.wan import Wan, WanConfig

pytestmark = pytest.mark.slow

def _write_video(path, frames=12, w=96, h=64, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, (w, h))
    for _ in range(frames):
        writer.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    writer.release()
    return str(path)

@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    for i in range(4):
        _write_video(root / f"clip_{i}.mp4", frames=12, seed=i)
        (root / f"clip_{i}.txt").write_text(f"a video clip {i}")
    return str(root)

class TestDecode:
    def test_align_frame_count(self):
        assert align_frame_count(12) == 9
        assert align_frame_count(9) == 9
        assert align_frame_count(4) == 1
        assert align_frame_count(1) == 1

    def test_probe(self, video_dir):
        from simpletuner_tpu.data.backends.local import LocalDataBackend

        backend = LocalDataBackend("test", video_dir)
        path = os.path.join(video_dir, "clip_0.mp4")
        info = probe_video(backend, path)
        assert info["width"] == 96 and info["height"] == 64
        assert info["frames"] == 12

    def test_load_and_prepare(self, video_dir):
        from simpletuner_tpu.data.backends.local import LocalDataBackend

        backend = LocalDataBackend("test", video_dir)
        path = os.path.join(video_dir, "clip_0.mp4")
        frames = load_video_frames(backend, path, 9)
        assert frames.shape == (9, 64, 96, 3)
        cfg = BucketConfig(resolution=64, resolution_type="pixel_area", crop=True, crop_aspect="square")
        prepared, meta = prepare_video(frames, cfg, "center")
        assert prepared.shape == (9, 64, 64, 3)
        assert meta["num_frames"] == 9

class TestVideoVAE:
    def test_roundtrip_shapes(self):
        vae = VideoAutoencoderKL(VideoVAEConfig.tiny())
        x = jnp.zeros((1, 9, 32, 32, 3))
        params = vae.init(jax.random.PRNGKey(0), x)
        z = vae.apply(params, x, method=VideoAutoencoderKL.encode)
        # tiny: temporal 4x (9 -> 3), spatial 2x (one inter-level downsample)
        assert z.shape == (1, 3, 16, 16, 4)
        out = vae.apply(params, z, method=VideoAutoencoderKL.decode)
        assert out.shape == (1, 9, 32, 32, 3)

    def test_wan_config_factors(self):
        cfg = VideoVAEConfig.wan()
        assert cfg.spatial_factor == 8
        assert cfg.temporal_factor == 4

class TestWanModel:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = TrainingConfig(
            {
                "model_family": "wan",
                "model_type": "lora",
                "model_arch_preset": "tiny",
                "lora_rank": 4,
                "optimizer": "adamw",
                "learning_rate": 1e-3,
                "max_train_steps": 10,
            }
        )
        model = Wan(cfg)
        batch = model.example_batch(batch_size=2, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        return model, batch, variables

    def test_forward_shape(self, setup):
        model, batch, variables = setup
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
        assert pred.shape == batch["latents"].shape

    def test_train_step(self, setup):
        from simpletuner_tpu.training.optimizers import get_optimizer
        from simpletuner_tpu.training.schedules import get_lr_schedule
        from simpletuner_tpu.training.train_state import build_train_step, create_train_state

        model, batch, variables = setup
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        state = create_train_state(model, variables, tx)
        step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

class TestVideoTrainerE2E:
    def test_end_to_end(self, video_dir, tmp_path_factory):
        from simpletuner_tpu.training.trainer import Trainer

        workdir = str(tmp_path_factory.mktemp("wan_run"))
        cache_root = os.path.join(workdir, "cache")
        mdb = [
            {
                "id": "clips",
                "dataset_type": "video",
                "type": "local",
                "instance_data_dir": video_dir,
                "crop": True,
                "crop_style": "center",
                "crop_aspect": "square",
                "resolution": 32,
                "resolution_type": "pixel_area",
                "caption_strategy": "textfile",
                "cache_dir_vae": os.path.join(cache_root, "vae"),
                "text_embeds": "embeds",
                "repeats": 7,
                "video": {"num_frames": 9},
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
                "model_family": "wan",
                "model_type": "lora",
                "model_arch_preset": "tiny",
                "lora_rank": 4,
                "train_batch_size": 1,
                "resolution": 32,
                "resolution_type": "pixel_area",
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
        ckpts = trainer.checkpoint_manager.list_checkpoints()
        assert ckpts