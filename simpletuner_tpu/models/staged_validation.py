"""Two-stage (base/refiner, eDiff stage1/stage2) validation plumbing.

Reference behavior: SDXL and PixArt validation can chain the split pipeline —
stage 1 denoises [0, boundary) of the ladder, stage 2 finishes [boundary, N)
on its own weights (reference helpers/models/sdxl/model.py:352-530
run_multistage_validation with denoising_end/denoising_start at
``1 - refiner_training_strength``; pixart/model.py:454-620 is the same shape
for the eDiffi v0.7 split).

TPU-native shape: no diffusers pipelines — the stage plan hands the generic
staged sampler in training/validation.py a (model, variables) pair per stage
plus the step boundary; both stages share one jitted denoise ladder and the
handoff is a latent tensor, not a pipeline object.  The fixed (non-trained)
stage loads from a LOCAL diffusers directory through the family's own weight
importer (this build has no hub egress; the reference's from_pretrained
download is replaced by an explicit local path requirement).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)

VALIDATION_PIPELINE_MODES = {"trained-stage", "full-pipeline"}


class _StageConfig:
    """Read-through config wrapper with per-stage overrides (the fixed stage
    shares the run config but points at its own checkpoint and never carries
    adapters)."""

    def __init__(self, base: Any, overrides: Dict[str, Any]):
        self._base = base
        self._overrides = dict(overrides)

    def __getattr__(self, name: str):
        if name in ("_base", "_overrides"):
            raise AttributeError(name)
        if name in self._overrides:
            return self._overrides[name]
        return getattr(self._base, name)

    def get(self, name: str, default: Any = None):
        if name in self._overrides:
            return self._overrides[name]
        getter = getattr(self._base, "get", None)
        if callable(getter):
            return getter(name, default)
        return getattr(self._base, name, default)


class TwoStageValidationMixin:
    """Adds reference pipeline-mode semantics to a family.

    Subclasses set ``STAGED_VALIDATION_PREFIX`` (the config-field prefix:
    "sdxl" or "pixart") and may override ``_stage_arch`` to resolve a
    different architecture for the fixed stage (SDXL's refiner)."""

    STAGED_VALIDATION_PREFIX: str = ""

    # ---- mode / stage detection (reference sdxl/model.py:352-390) ---------------------
    def _staged_validation_mode(self) -> str:
        field = f"{self.STAGED_VALIDATION_PREFIX}_validation_pipeline_mode"
        mode = str(getattr(self.config, field, None) or "trained-stage").strip().lower()
        if mode not in VALIDATION_PIPELINE_MODES:
            raise ValueError(
                f"{field} must be one of: {', '.join(sorted(VALIDATION_PIPELINE_MODES))}"
            )
        return mode

    def supports_multistage_validation(self) -> bool:
        if self._staged_validation_mode() != "full-pipeline":
            return False
        if getattr(self.config, "validation_using_datasets", False):
            return False
        if getattr(self.config, "controlnet", False) or getattr(self.config, "control", False):
            return False
        return True

    def _staged_current_stage(self) -> int:
        flavour = str(getattr(self.config, "model_flavour", "") or "").lower()
        path = str(getattr(self.config, "pretrained_model_name_or_path", "") or "").lower()
        for token, stage in (("stage2", 2), ("refiner", 2), ("stage1", 1)):
            if token in flavour or token in path:
                return stage
        if getattr(self.config, "refiner_training", False) and not getattr(
            self.config, "refiner_training_invert_schedule", False
        ):
            return 2
        return 1

    def _staged_split_boundary(self) -> float:
        strength = float(getattr(self.config, "refiner_training_strength", 0.2) or 0.0)
        if strength <= 0.0 or strength >= 1.0:
            raise ValueError(
                "refiner_training_strength must be in (0, 1) for full-pipeline validation"
            )
        return 1.0 - strength

    # ---- fixed-stage loading ----------------------------------------------------------
    def _staged_stage_model_path(self, stage: int) -> str:
        field = f"{self.STAGED_VALIDATION_PREFIX}_validation_stage{stage}_model"
        configured = getattr(self.config, field, None)
        if not configured:
            raise ValueError(
                f"{field} must point at a LOCAL diffusers directory for the "
                f"fixed stage-{stage} model (this build cannot download the "
                "reference default from the hub)"
            )
        path = str(configured)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"{field}={path!r} is not a directory; full-pipeline "
                "validation needs the fixed stage checkpoint on disk"
            )
        return path

    def _stage_arch(self, stage: int, path: str):
        """Architecture for the fixed stage.  Default: reconstruct this
        family's arch dataclass from the component config.json when its keys
        match (our exporter layout), else keep the trained arch."""
        cfg = self._read_stage_component_config(path)
        if cfg is None:
            return self.arch
        fields = {f.name for f in dataclasses.fields(type(self.arch))}
        keys = {k for k in cfg if not k.startswith("_")}
        if keys <= fields:
            kwargs = {
                k: tuple(v) if isinstance(v, list) else v
                for k, v in cfg.items() if not k.startswith("_")
            }
            return type(self.arch)(**kwargs)
        return self.arch

    def _read_stage_component_config(self, path: str) -> Optional[Dict[str, Any]]:
        component = "unet" if getattr(self, "MODEL_TYPE", "") == "unet" else "transformer"
        for candidate in (os.path.join(path, component, "config.json"),
                          os.path.join(path, "config.json")):
            if os.path.isfile(candidate):
                with open(candidate) as fh:
                    return json.load(fh)
        return None

    def _load_validation_stage(self, stage: int) -> Tuple[Any, Dict[str, Any]]:
        cache = getattr(self, "_staged_validation_cache", None)
        if cache is None:
            cache = {}
            self._staged_validation_cache = cache
        if stage in cache:
            return cache[stage]
        path = self._staged_stage_model_path(stage)
        from .weight_import import load_transformer_params

        overrides = {
            "pretrained_model_name_or_path": path,
            "model_type": "full",
            "lora_rank": 0,
            # the fixed stage renders as-is: no adapters, no controlnet
            "controlnet": False,
            "model_flavour": getattr(self.config, "model_flavour", None),
        }
        stage_model = type(self)(
            _StageConfig(self.config, overrides),
            arch=self._stage_arch(stage, path),
        )
        variables = load_transformer_params(stage_model, path)
        # constructing the stage model installed ITS trace globals (lora
        # target/dropout, int8 mode); restore the trained model's before the
        # next trace of the trained stage
        self.apply_trace_globals()
        logger.info(
            "loaded fixed validation stage %d for %s from %s", stage, self.NAME, path
        )
        cache[stage] = (stage_model, variables)
        return cache[stage]

    # ---- the plan consumed by Validation._render_staged --------------------------------
    def validation_stage_plan(self, variables) -> Optional[List[Dict[str, Any]]]:
        if not self.supports_multistage_validation():
            return None
        trained = self._staged_current_stage()
        boundary = self._staged_split_boundary()
        plan: List[Dict[str, Any]] = []
        for stage, until in ((1, boundary), (2, 1.0)):
            if stage == trained:
                plan.append({"model": self, "variables": variables, "until": until})
            else:
                stage_model, stage_vars = self._load_validation_stage(stage)
                plan.append({"model": stage_model, "variables": stage_vars, "until": until})
        return plan
