"""SDXL refiner micro-conditioning (reference collate.py:74-77: refiner time
ids are (orig H W, crop top left, --data_aesthetic_score) — 5 floats instead
of the base model's 6)."""

import jax
import jax.numpy as jnp
import numpy as np

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.sdxl.model import SDXL


def _model(**extra):
    return SDXL(
        TrainingConfig(
            {"model_family": "sdxl", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny", "max_train_steps": 10, **extra}
        )
    )


def test_refiner_time_ids_use_aesthetic_score():
    model = _model(model_flavour="refiner-1.0", data_aesthetic_score=5.5)
    assert model._is_refiner and model._num_time_ids == 5
    prepared = {
        "original_sizes": jnp.asarray([[512, 512]], jnp.int32),
        "crop_coordinates": jnp.asarray([[7, 9]], jnp.int32),
        "target_sizes": jnp.asarray([[256, 256]], jnp.int32),
    }
    ids = np.asarray(model._time_ids(prepared, 1))
    np.testing.assert_allclose(ids, [[512, 512, 7, 9, 5.5]])
    # default fallback also 5 floats
    ids2 = np.asarray(model._time_ids({}, 2))
    assert ids2.shape == (2, 5) and ids2[0, -1] == 5.5


def test_base_keeps_six_ids_and_refiner_forward_runs():
    base = _model()
    assert base._num_time_ids == 6
    ids = np.asarray(base._time_ids({}, 1))
    assert ids.shape == (1, 6)

    refiner = _model(model_flavour="refiner-1.0")
    batch = refiner.example_batch(batch_size=1, resolution=64)
    assert batch["time_ids"].shape == (1, 5)
    variables = refiner.init_params(jax.random.PRNGKey(0), batch)
    prepared = refiner.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = refiner.model_predict(variables, prepared)
    assert np.isfinite(np.asarray(pred)).all()
