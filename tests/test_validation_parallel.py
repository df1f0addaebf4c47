"""Parallel validation: batched multi-prompt rendering sharded over the mesh
(reference validation.py:2038-2061 context-parallel validation — TPU-shape:
one jitted pass, batch over data/fsdp, attention over the context axis)."""

import os

import jax
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.sd1x.model import SD1x
from simpletuner_tpu.models.text_encoders import load_text_encoders
from simpletuner_tpu.parallel.mesh import MeshConfig, build_mesh
from simpletuner_tpu.training.validation import Validation

pytestmark = pytest.mark.slow


def _setup(tmp_path, parallel: bool):
    cfg = TrainingConfig(
        {
            "model_family": "sd1x",
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            "validation_prompt": ["a cat", "a dog", "a ship"],
            "validation_num_inference_steps": 2,
            "validation_resolution": 64,
            "validation_parallel": parallel,
            "validation_seed": 7,
        }
    )
    model = SD1x(cfg)
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    mesh = build_mesh(MeshConfig(fsdp_size=2, context_size=1)) if parallel else None  # data=4 on the 8-device CPU mesh
    validation = Validation(model, cfg, output_dir=str(tmp_path), mesh=mesh)
    validation.precompute_embeds()
    return model, validation


def test_parallel_matches_sequential(tmp_path):
    model, seq_val = _setup(tmp_path / "seq", parallel=False)
    variables = model.init_params(
        jax.random.PRNGKey(0), model.example_batch(batch_size=1, resolution=64)
    )
    seq_paths = seq_val.run_validations(variables, step=1, force=True)

    model2, par_val = _setup(tmp_path / "par", parallel=True)
    assert par_val._parallel_eligible()
    par_paths = par_val.run_validations(variables, step=1, force=True)

    assert len(seq_paths) == len(par_paths) == 3
    for a, b in zip(seq_paths, par_paths):
        from PIL import Image

        ia = np.asarray(Image.open(a), dtype=np.float32)
        ib = np.asarray(Image.open(b), dtype=np.float32)
        # same math, same per-prompt noise (fold_in by index) -> near-bitwise;
        # uint8 quantization allows off-by-one
        assert np.mean(np.abs(ia - ib)) < 1.0
        assert np.max(np.abs(ia - ib)) <= 2.0


def test_parallel_ineligible_on_nonuniform_embeds(tmp_path):
    model, validation = _setup(tmp_path, parallel=True)
    # force a shape mismatch between prompts
    key = next(k for k, v in validation._embeds[0].items() if hasattr(v, "shape"))
    emb = validation._embeds[1][key]
    validation._embeds[1][key] = np.concatenate([emb, emb[:1]], axis=0)
    assert not validation._parallel_eligible()
