"""Example training configs (reference: simpletuner/examples/*/config.json —
100+ complete runnable recipes; these cover the headline ones)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict

EXAMPLES: Dict[str, Dict[str, Any]] = {
    "flux.peft-lora": {
        "description": "Flux.1-dev rank-16 LoRA @1024px, bf16 base",
        "config": {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 16,
            "pretrained_model_name_or_path": "black-forest-labs/FLUX.1-dev",
            "resolution": 1024,
            "resolution_type": "pixel_area",
            "train_batch_size": 1,
            "max_train_steps": 5000,
            "optimizer": "adamw_bf16",
            "learning_rate": 1e-4,
            "lr_scheduler": "constant_with_warmup",
            "lr_warmup_steps": 100,
            "gradient_checkpointing": True,
            "checkpointing_steps": 500,
            "validation_steps": 250,
            "validation_prompt": "a photo of a sks person",
            "validation_num_inference_steps": 20,
            "flux_guidance_value": 1.0,
            "report_to": "tensorboard",
            "data_backend_config": "config/multidatabackend.json",
            "output_dir": "output/flux-lora",
        },
    },
    "sdxl.full-ema": {
        "description": "SDXL full-rank fine-tune with EMA @1024px",
        "config": {
            "model_family": "sdxl",
            "model_type": "full",
            "pretrained_model_name_or_path": "stabilityai/stable-diffusion-xl-base-1.0",
            "resolution": 1024,
            "resolution_type": "pixel_area",
            "train_batch_size": 4,
            "max_train_steps": 30000,
            "optimizer": "adamw",
            "learning_rate": 1e-5,
            "lr_scheduler": "cosine",
            "use_ema": True,
            "ema_decay": 0.9999,
            "gradient_checkpointing": True,
            "checkpointing_steps": 1000,
            "snr_gamma": 5.0,
            "report_to": "tensorboard",
            "data_backend_config": "config/multidatabackend.json",
            "output_dir": "output/sdxl-full",
        },
    },
    "sd15.lora": {
        "description": "SD 1.5 rank-16 LoRA @512px",
        "config": {
            "model_family": "sd1x",
            "model_type": "lora",
            "lora_rank": 16,
            "pretrained_model_name_or_path": "stable-diffusion-v1-5/stable-diffusion-v1-5",
            "resolution": 512,
            "resolution_type": "pixel_area",
            "train_batch_size": 4,
            "max_train_steps": 3000,
            "optimizer": "adamw",
            "learning_rate": 1e-4,
            "lr_scheduler": "constant",
            "checkpointing_steps": 500,
            "data_backend_config": "config/multidatabackend.json",
            "output_dir": "output/sd15-lora",
        },
    },
    "flux.tread": {
        "description": "Flux LoRA with TREAD token dropout (20-40% speedup)",
        "config": {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 16,
            "pretrained_model_name_or_path": "black-forest-labs/FLUX.1-dev",
            "resolution": 1024,
            "train_batch_size": 1,
            "max_train_steps": 5000,
            "optimizer": "adamw_bf16",
            "learning_rate": 1e-4,
            "gradient_checkpointing": True,
            "tread_config": {"routes": [{"selection_ratio": 0.5, "start_layer": 2, "end_layer": -2}]},
            "data_backend_config": "config/multidatabackend.json",
            "output_dir": "output/flux-tread",
        },
    },
    "multidatabackend": {
        "description": "dataloader config template (multidatabackend.json)",
        "config": [
            {
                "id": "my-images",
                "type": "local",
                "instance_data_dir": "/data/images",
                "crop": True,
                "crop_style": "center",
                "crop_aspect": "square",
                "resolution": 1024,
                "resolution_type": "pixel_area",
                "caption_strategy": "textfile",
                "cache_dir_vae": "cache/vae/my-images",
                "text_embeds": "embeds",
            },
            {
                "id": "embeds",
                "dataset_type": "text_embeds",
                "type": "local",
                "default": True,
                "cache_dir": "cache/text",
            },
        ],
    },
}


def _family_example(family: str, meta: Dict[str, Any]) -> Dict[str, Any]:
    """Baseline LoRA recipe for a family (reference: one examples/ dir per
    family with a runnable config)."""
    modality = meta.get("modality", "image")
    resolution = {"image": 1024, "video": 480, "audio": 0}[modality]
    config: Dict[str, Any] = {
        "model_family": family,
        "model_type": "lora",
        "lora_rank": 16,
        "train_batch_size": 1,
        "max_train_steps": 5000,
        "optimizer": "adamw_bf16",
        "learning_rate": 1e-4,
        "lr_scheduler": "constant_with_warmup",
        "lr_warmup_steps": 100,
        "gradient_checkpointing": True,
        "checkpointing_steps": 500,
        "report_to": "tensorboard",
        "data_backend_config": "config/multidatabackend.json",
        "output_dir": f"output/{family}-lora",
    }
    if resolution:
        config["resolution"] = resolution
        config["resolution_type"] = "pixel_area"
    return {"description": f"{family} rank-16 LoRA baseline ({modality})", "config": config}


def _register_family_examples() -> None:
    from ..models.registry import ModelRegistry

    for family in ModelRegistry.families():
        key = f"{family}.lora"
        if key not in EXAMPLES and not any(n.startswith(family + ".") for n in EXAMPLES):
            EXAMPLES[key] = _family_example(family, ModelRegistry.metadata(family))


_register_family_examples()


def write_example(name: str, output_dir: str) -> str:
    if name not in EXAMPLES:
        raise SystemExit(f"unknown example {name!r}; run `simpletuner-tpu examples` to list")
    os.makedirs(output_dir, exist_ok=True)
    filename = "multidatabackend.json" if name == "multidatabackend" else "config.json"
    path = os.path.join(output_dir, filename)
    with open(path, "w") as handle:
        json.dump(EXAMPLES[name]["config"], handle, indent=2)
    return path
