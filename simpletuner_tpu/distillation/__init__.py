from .common import DistillationBase
from .registry import available_methods, get_distillation_method, init_distillation

__all__ = [
    "DistillationBase",
    "available_methods",
    "get_distillation_method",
    "init_distillation",
]
