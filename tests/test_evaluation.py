"""Eval-loss and CLIP-score evaluator tests."""

import numpy as np
import pytest

from simpletuner_tpu.training.evaluation import CLIPScoreEvaluator, EvalLoss

pytestmark = pytest.mark.slow

class TestCLIPScore:
    @pytest.fixture(scope="class")
    def evaluator(self):
        return CLIPScoreEvaluator(tiny=True)

    def test_score_returns_scalar(self, evaluator):
        images = [np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)]
        score = evaluator.score(images, ["a photo of a cat"])
        assert isinstance(score, float)
        assert -100.0 <= score <= 100.0

    def test_batch_of_pairs(self, evaluator):
        rng = np.random.default_rng(1)
        images = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(3)]
        score = evaluator.score(images, ["cat", "dog", "tree"])
        assert np.isfinite(score)

class TestEvalLoss:
    def test_disabled_without_eval_datasets(self):
        class FakeBundle:
            class config:
                dataset_type = "image"

        ev = EvalLoss(model=None, bundles=[FakeBundle()])
        assert not ev.enabled
        assert ev.execute_eval(None) is None

    def test_eval_dataset_id_carves_training_dataset(self):
        """--eval_dataset_id marks a plain image dataset as the eval split
        (reference trainer.py:6432-6437)."""

        class FakeBundle:
            def __init__(self, id, dataset_type="image"):
                self.id = id
                self.config = type("C", (), {"dataset_type": dataset_type})()

        bundles = [FakeBundle("train"), FakeBundle("holdout")]
        ev = EvalLoss(model=None, bundles=bundles, eval_dataset_ids="holdout")
        assert ev.enabled
        assert [b.id for b in ev.bundles] == ["holdout"]
        ev_list = EvalLoss(model=None, bundles=bundles, eval_dataset_ids=["holdout"])
        assert [b.id for b in ev_list.bundles] == ["holdout"]


def test_eval_dataset_id_excluded_from_train_iterator(tmp_path):
    """End-to-end: the carved dataset never appears in training batches but
    produces a finite eval loss."""
    import os

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.data.factory import configure_multi_databackend
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig
    from simpletuner_tpu.models.text_encoders import load_text_encoders

    rng = np.random.default_rng(0)
    train_dir = tmp_path / "train"
    holdout_dir = tmp_path / "holdout"
    for d in (train_dir, holdout_dir):
        d.mkdir()
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
                d / f"{d.name}_{i}.png"
            )
            (d / f"{d.name}_{i}.txt").write_text(f"{d.name} pic {i}")
    cache_root = str(tmp_path / "cache")

    def ds(id, path):
        return {
            "id": id, "type": "local", "instance_data_dir": str(path),
            "crop": True, "crop_style": "center", "crop_aspect": "square",
            "resolution": 64, "resolution_type": "pixel_area",
            "caption_strategy": "textfile",
            "cache_dir_vae": os.path.join(cache_root, f"vae_{id}"),
            "text_embeds": "embeds", "repeats": 3,
        }

    args = TrainingConfig(
        {
            "model_family": "flux", "model_type": "lora", "lora_rank": 4,
            "train_batch_size": 1, "resolution": 64, "max_train_steps": 4,
            "cache_dir": cache_root, "optimizer": "adamw", "learning_rate": 1e-3,
            "eval_dataset_id": "holdout",
            "data_backend_config": [
                ds("train", train_dir), ds("holdout", holdout_dir),
                {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
                 "default": True, "cache_dir": os.path.join(cache_root, "text")},
            ],
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
    # holdout excluded from training draws
    for _ in range(6):
        batch = plane.iterator.next_batch()
        assert batch["dataset_id"] == "train"
    # eval loss over the carved split is finite
    ev = EvalLoss(model, list(plane.bundles.values()), eval_dataset_ids="holdout")
    assert ev.enabled
    variables = model.init_params(jax.random.PRNGKey(0))
    value = ev.execute_eval(variables)
    assert value is not None and np.isfinite(value)

    # unknown id fails loudly at factory time
    bad = TrainingConfig({**args.to_dict(), "eval_dataset_id": "nope"})
    with pytest.raises(ValueError, match="nope"):
        configure_multi_databackend(
            bad, model, vae_encode_fn=lambda imgs, n: np.asarray(encode(jnp.asarray(imgs)))
        )