"""Checkpoint inference runtime (reference: simpletuner/inference.py:53
``CheckpointInferenceRuntime`` — load a training checkpoint + validation
pipeline and render prompts to disk)."""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def run_inference(
    checkpoint: str,
    prompt: str,
    config_path: Optional[str] = None,
    output: str = "inference_output",
    steps: int = 20,
    resolution: Optional[int] = None,
    seed: int = 42,
) -> int:
    import jax

    from .configuration import TrainingConfig
    from .training.trainer import Trainer

    config = TrainingConfig.from_file(config_path)
    overrides = {
        "resume_from_checkpoint": checkpoint,
        "validation_prompt": prompt,
        "validation_num_inference_steps": steps,
        "validation_seed": seed,
        "max_train_steps": 0,  # no training; lifecycle stops before the loop
        "output_dir": output,
        "report_to": "none",
    }
    if resolution:
        overrides["validation_resolution"] = resolution
    for key, value in overrides.items():
        setattr(config, key, value)

    trainer = Trainer(config=config)
    trainer.configure_webhook()
    trainer.init_seed()
    trainer.init_preprocessing_models()
    if config.get("data_backend_config"):
        trainer.init_data_backend()
    trainer.init_validations()
    trainer.init_unload_text_encoder()
    trainer.init_load_base_model()
    trainer.init_trainable_peft_adapter()
    trainer.init_ema_model()
    trainer.resume_and_prepare()
    paths = trainer.validation.run_validations(
        trainer._state.variables(), trainer.global_step, force=True
    )
    for path in paths:
        print(path)
    return 0 if paths else 1
