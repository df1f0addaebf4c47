"""Distillation method registry + factory (reference:
helpers/distillation/{registry,factory}.py)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Type

from .common import DistillationBase

_METHODS: Dict[str, Any] = {}
# reference sub-features not ported fail loudly inside their method classes
# (e.g. DCM "fine" adversarial mode); every reference method name is registered
_PLANNED = ()


def register(cls: Type[DistillationBase]) -> Type[DistillationBase]:
    _METHODS[cls.name] = cls
    return cls


def _ensure_builtin():
    if "lcm" not in _METHODS:
        from .anyflow import AnyFlowDistillation
        from .dcm import DCMDistillation
        from .dmd import DMDDistillation
        from .flow_dpo import FlowDPODistillation
        from .lcm import LCMDistillation
        from .perflow import PerFlowDistillation
        from .self_forcing import SelfForcingDistillation
        from .teacher_matching import TeacherMatchingDistillation

        _METHODS["lcm"] = LCMDistillation
        _METHODS["teacher_matching"] = TeacherMatchingDistillation
        _METHODS["dmd"] = DMDDistillation
        _METHODS["perflow"] = PerFlowDistillation
        _METHODS["dcm"] = DCMDistillation
        _METHODS["flow_dpo"] = FlowDPODistillation
        _METHODS["self_forcing"] = SelfForcingDistillation
        _METHODS["anyflow"] = AnyFlowDistillation


def available_methods():
    _ensure_builtin()
    return sorted(_METHODS)


def get_distillation_method(name: str) -> Type[DistillationBase]:
    _ensure_builtin()
    if name in _METHODS:
        return _METHODS[name]
    if name in _PLANNED:
        raise NotImplementedError(
            f"distillation method {name!r} is not implemented yet in the TPU build; "
            f"available: {available_methods()}"
        )
    raise KeyError(f"unknown distillation method {name!r}; available: {available_methods()}")


def init_distillation(config: Any) -> Optional[DistillationBase]:
    """Build from config (reference --distillation_method / --distillation_config)."""
    method = getattr(config, "distillation_method", None)
    if not method:
        return None
    method_config = getattr(config, "distillation_config", None) or {}
    return get_distillation_method(method)(config, method_config)
