from .common import ModelFoundation, TextEncoderSpec
from .registry import ModelRegistry, get_model_family

__all__ = ["ModelFoundation", "TextEncoderSpec", "ModelRegistry", "get_model_family"]
