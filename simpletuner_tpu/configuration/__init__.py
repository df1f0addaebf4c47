from .args import TrainingConfig, build_arg_parser
from .dataloader import (
    DataloaderConfigError,
    DatasetConfig,
    get_default_text_embed_id,
    load_dataloader_config,
    sort_by_dependencies,
)
from .fields import REGISTRY, ConfigField, FieldRegistry, FieldType
from .loader import find_config_file, load_config

__all__ = [
    "TrainingConfig",
    "build_arg_parser",
    "DataloaderConfigError",
    "DatasetConfig",
    "get_default_text_embed_id",
    "load_dataloader_config",
    "sort_by_dependencies",
    "REGISTRY",
    "ConfigField",
    "FieldRegistry",
    "FieldType",
    "find_config_file",
    "load_config",
]
