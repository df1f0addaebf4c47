"""Checkpoint inference runtime (reference: simpletuner/inference.py:53
``CheckpointInferenceRuntime`` — load a training checkpoint + validation
pipeline and render prompts to disk)."""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


class CheckpointInferenceRuntime:
    """Own one loaded checkpoint and render many prompts against it
    (reference simpletuner/inference.py:53 ``CheckpointInferenceRuntime`` —
    the SDK's interactive-generation runtime keeps the model resident instead
    of reloading per request)."""

    def __init__(
        self,
        checkpoint: str,
        config_path: Optional[str] = None,
        output: str = "inference_output",
        config_overrides: Optional[dict] = None,
    ) -> None:
        from .configuration import TrainingConfig
        from .training.trainer import Trainer

        config = TrainingConfig.from_file(config_path)
        overrides = {
            "resume_from_checkpoint": checkpoint,
            "max_train_steps": 0,
            "output_dir": output,
            "report_to": "none",
            "push_to_hub": False,
            "gradient_checkpointing": False,
        }
        overrides.update(config_overrides or {})
        for key, value in overrides.items():
            setattr(config, key, value)
        self.config = config
        self.output_dir = output

        trainer = Trainer(config=config)
        trainer.configure_webhook()
        trainer.init_seed()
        trainer.init_preprocessing_models()
        # no data plane at inference time — the runtime only renders
        trainer.init_load_base_model()
        trainer.init_trainable_peft_adapter()
        trainer.init_ema_model()
        trainer.resume_and_prepare()
        self.trainer = trainer
        # text encoders stay attached: each render() encodes a fresh prompt
        self._decode_fn = trainer.vae_decode_fn()

    def render(
        self,
        prompt: str,
        steps: int = 20,
        resolution: Optional[int] = None,
        seed: Optional[int] = None,
        negative_prompt: Optional[str] = None,
        guidance: Optional[float] = None,
    ):
        """Render one prompt; returns the output file paths."""
        from .training.validation import Validation

        config = self.config
        config.validation_prompt = prompt
        config.validation_num_inference_steps = steps
        if resolution:
            config.validation_resolution = resolution
        if seed is not None:
            config.validation_seed = seed
        if negative_prompt is not None:
            config.validation_negative_prompt = negative_prompt
        if guidance is not None:
            config.validation_guidance = guidance
        validation = Validation(
            self.trainer.model,
            config,
            decode_fn=self._decode_fn,
            output_dir=self.output_dir,
            webhook_handler=getattr(self.trainer, "webhook_handler", None),
        )
        validation.precompute_embeds()
        return validation.run_validations(
            self.trainer._state.variables(), self.trainer.global_step, force=True
        )


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
