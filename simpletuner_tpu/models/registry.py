"""Model family registry with lazy imports (reference: helpers/models/registry.py:54
``ModelRegistry`` backed by model_metadata.json — here a plain lazy table)."""

from __future__ import annotations

import importlib
from typing import Any, Dict, List, Optional, Type

# family name -> (module path, class name, metadata)
_FAMILIES: Dict[str, tuple] = {
    "flux": ("simpletuner_tpu.models.flux.model", "Flux", {"modality": "image", "prediction": "flow_matching"}),
    "sd1x": ("simpletuner_tpu.models.sd1x.model", "SD1x", {"modality": "image", "prediction": "epsilon"}),
    "sd2x": ("simpletuner_tpu.models.sd1x.model", "SD2x", {"modality": "image", "prediction": "v_prediction"}),
    "sdxl": ("simpletuner_tpu.models.sdxl.model", "SDXL", {"modality": "image", "prediction": "epsilon"}),
    "sd3": ("simpletuner_tpu.models.sd3.model", "SD3", {"modality": "image", "prediction": "flow_matching"}),
    "pixart_sigma": ("simpletuner_tpu.models.pixart.model", "PixartSigma", {"modality": "image", "prediction": "epsilon"}),
    "auraflow": ("simpletuner_tpu.models.auraflow.model", "AuraFlow", {"modality": "image", "prediction": "flow_matching"}),
    "wan": ("simpletuner_tpu.models.wan.model", "Wan", {"modality": "video", "prediction": "flow_matching"}),
    "ltxvideo": ("simpletuner_tpu.models.ltxvideo.model", "LTXVideo", {"modality": "video", "prediction": "flow_matching"}),
    "ltxvideo2": ("simpletuner_tpu.models.ltxvideo2.model", "LTXVideo2", {"modality": "video", "prediction": "flow_matching"}),
    "ace_step": ("simpletuner_tpu.models.ace_step.model", "ACEStep", {"modality": "audio", "prediction": "flow_matching"}),
    "chroma": ("simpletuner_tpu.models.chroma.model", "Chroma", {"modality": "image", "prediction": "flow_matching"}),
    "krea2": ("simpletuner_tpu.models.krea2.model", "Krea2", {"modality": "image", "prediction": "flow_matching"}),
    "kolors": ("simpletuner_tpu.models.kolors.model", "Kolors", {"modality": "image", "prediction": "epsilon"}),
    "hunyuanvideo": ("simpletuner_tpu.models.hunyuanvideo.model", "HunyuanVideo", {"modality": "video", "prediction": "flow_matching"}),
    "flux2": ("simpletuner_tpu.models.flux2.model", "Flux2", {"modality": "image", "prediction": "flow_matching"}),
    "lumina2": ("simpletuner_tpu.models.lumina2.model", "Lumina2", {"modality": "image", "prediction": "flow_matching"}),
    "sana": ("simpletuner_tpu.models.sana.model", "Sana", {"modality": "image", "prediction": "flow_matching"}),
    "deepfloyd": ("simpletuner_tpu.models.deepfloyd.model", "DeepFloyd", {"modality": "image", "prediction": "epsilon"}),
    "mageflow": ("simpletuner_tpu.models.mageflow.model", "MageFlow", {"modality": "image", "prediction": "flow_matching"}),
    "z_image": ("simpletuner_tpu.models.mageflow.model", "ZImage", {"modality": "image", "prediction": "flow_matching"}),
    "cosmos3": ("simpletuner_tpu.models.cosmos3.model", "Cosmos3", {"modality": "video", "prediction": "flow_matching"}),
    "cosmos": ("simpletuner_tpu.models.cosmos2.model", "Cosmos2Image", {"modality": "image", "prediction": "sample"}),
    "hidream": ("simpletuner_tpu.models.hidream.model", "HiDream", {"modality": "image", "prediction": "flow_matching"}),
    "qwen_image": ("simpletuner_tpu.models.qwen_image.model", "QwenImage", {"modality": "image", "prediction": "flow_matching"}),
    "longcat_image": ("simpletuner_tpu.models.longcat_image.model", "LongcatImage", {"modality": "image", "prediction": "flow_matching"}),
    "longcat_video": ("simpletuner_tpu.models.longcat_video.model", "LongcatVideo", {"modality": "video", "prediction": "flow_matching"}),
    "anima": ("simpletuner_tpu.models.anima.model", "Anima", {"modality": "image", "prediction": "flow_matching"}),
    "ideogram": ("simpletuner_tpu.models.ideogram.model", "Ideogram", {"modality": "image", "prediction": "flow_matching"}),
    "kandinsky5_image": ("simpletuner_tpu.models.kandinsky5.model", "Kandinsky5Image", {"modality": "image", "prediction": "flow_matching"}),
    "kandinsky5_video": ("simpletuner_tpu.models.kandinsky5.model", "Kandinsky5Video", {"modality": "video", "prediction": "flow_matching"}),
    "sanavideo": ("simpletuner_tpu.models.sanavideo.model", "SanaVideo", {"modality": "video", "prediction": "flow_matching"}),
    "boogu_image": ("simpletuner_tpu.models.extended.model", "BooguImage", {"modality": "image", "prediction": "flow_matching"}),
    "ernie": ("simpletuner_tpu.models.ernie.model", "Ernie", {"modality": "image", "prediction": "flow_matching"}),
    "stable_cascade": ("simpletuner_tpu.models.stable_cascade.model", "StableCascade", {"modality": "image", "prediction": "epsilon"}),
    "wan_s2v": ("simpletuner_tpu.models.extended.model", "WanS2V", {"modality": "video", "prediction": "flow_matching"}),
    "heartmula": ("simpletuner_tpu.models.heartmula.model", "HeartMuLa", {"modality": "audio", "prediction": "autoregressive"}),
    "omnigen": ("simpletuner_tpu.models.omnigen.model", "OmniGen", {"modality": "image", "prediction": "flow_matching"}),
    "z_image_omni": ("simpletuner_tpu.models.z_image_omni.model", "ZImageOmni", {"modality": "image", "prediction": "flow_matching"}),
    "zlab_i1": ("simpletuner_tpu.models.zlab_i1.model", "ZlabI1", {"modality": "image", "prediction": "flow_matching"}),
}

_ALIASES = {
    "sd15": "sd1x",
    "sd21": "sd2x",
    "pixart": "pixart_sigma",
    "ltx2": "ltxvideo2",
    "kandinsky5-image": "kandinsky5_image",  # examples use the dashed spelling
}


class ModelRegistry:
    @staticmethod
    def families() -> List[str]:
        return list(_FAMILIES)

    @staticmethod
    def metadata(name: str) -> Dict[str, Any]:
        name = _ALIASES.get(name, name)
        if name not in _FAMILIES:
            raise KeyError(f"unknown model family {name!r}; known: {list(_FAMILIES)}")
        return dict(_FAMILIES[name][2])

    @staticmethod
    def get(name: str) -> Type:
        name = _ALIASES.get(name, name)
        if name not in _FAMILIES:
            raise KeyError(f"unknown model family {name!r}; known: {list(_FAMILIES)}")
        module_path, class_name, _ = _FAMILIES[name]
        module = importlib.import_module(module_path)
        return getattr(module, class_name)

    @staticmethod
    def create(name: str, config: Any):
        return ModelRegistry.get(name)(config)

    @staticmethod
    def register(name: str, module_path: str, class_name: str, metadata: Optional[Dict] = None) -> None:
        _FAMILIES[name] = (module_path, class_name, metadata or {})


def get_model_family(config: Any):
    family = getattr(config, "model_family", None)
    if not family:
        raise ValueError("config.model_family is required")
    model = ModelRegistry.create(family, config)
    model.check_user_config()
    if getattr(config, "train_text_encoder", False):
        # framework-level invariant (families override check_user_config
        # without chaining): accept-and-ignore is banned, so unsupported
        # combinations fail here (reference trainer.py:2711 gates the same)
        if not model.SUPPORTS_TEXT_ENCODER_TRAINING:
            raise ValueError(
                f"train_text_encoder is not supported for model_family="
                f"{model.NAME!r} (supported: sd1x, sd2x, sdxl, sd3)"
            )
        model_type = getattr(config, "model_type", "lora")
        if model_type == "full" and not model.SUPPORTS_FULL_TEXT_ENCODER_TRAINING:
            raise NotImplementedError(
                f"train_text_encoder with model_type=full is not supported for "
                f"{model.NAME!r} (supported: sd1x, sd2x, sdxl); use "
                "model_type=lora for text-encoder LoRA (reference "
                "trainer.py:4307)"
            )
        if model_type == "controlnet":
            raise ValueError("train_text_encoder is incompatible with model_type=controlnet")
    if getattr(config, "lyrics_embedder_train", False) and not model.sidecar_param_keys():
        raise ValueError(
            f"lyrics_embedder_train is not supported for model_family="
            f"{model.NAME!r} (ACE-Step only)"
        )
    return model
