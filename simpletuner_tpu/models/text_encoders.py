"""Text encoder wrappers (CLIP-L/G, T5) behind one interface.

The reference loads HF transformers text encoders per family
(TEXT_ENCODER_CONFIGURATION, reference helpers/models/common.py) and caches
their outputs.  We use the Flax variants from ``transformers`` (already JAX) and
jit the encode; families declare which encoders they need via
``TextEncoderSpec``.  For tests, ``tiny=True`` builds small random models with
no network access.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .common import TextEncoderSpec

warnings.filterwarnings("ignore", message=".*deprecated.*")


class TextEncoder:
    """One tokenizer + Flax encoder; ``encode`` returns numpy arrays."""

    def __init__(self, spec: TextEncoderSpec, model, tokenizer):
        self.spec = spec
        self.model = model
        self.tokenizer = tokenizer
        self._encode_jit = jax.jit(self._encode_raw)

    def _encode_raw(self, input_ids, attention_mask):
        # the HF wrapper fills position_ids etc. and is jit-traceable
        return self.model(input_ids=input_ids, attention_mask=attention_mask)

    def tokenize(self, prompts: Sequence[str]):
        return self.tokenizer(
            list(prompts),
            padding="max_length",
            max_length=self.spec.max_length,
            truncation=True,
            return_tensors="np",
        )

    def encode(self, prompts: Sequence[str]) -> Dict[str, np.ndarray]:
        tokens = self.tokenize(prompts)
        out = self._encode_jit(
            jnp.asarray(tokens["input_ids"]), jnp.asarray(tokens["attention_mask"])
        )
        result: Dict[str, np.ndarray] = {
            "last_hidden_state": np.asarray(out.last_hidden_state, np.float32),
            "attention_mask": np.asarray(tokens["attention_mask"]),
        }
        pooled = getattr(out, "pooler_output", None)
        if pooled is None and getattr(out, "text_embeds", None) is not None:
            pooled = out.text_embeds
        if pooled is not None:
            result["pooled"] = np.asarray(pooled, np.float32)
        return result


def _build_clip(spec: TextEncoderSpec, path: Optional[str], tiny: bool):
    from transformers import CLIPTextConfig, CLIPTokenizer, FlaxCLIPTextModel

    if tiny or path is None:
        config = CLIPTextConfig(
            vocab_size=1000,
            hidden_size=32 if spec.family == "clip-l" else 64,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            max_position_embeddings=max(spec.max_length, 77),
        )
        model = FlaxCLIPTextModel(config, seed=0)
        tokenizer = _tiny_tokenizer(spec.max_length)
    else:
        model = FlaxCLIPTextModel.from_pretrained(path, subfolder=spec.subfolder or "")
        tokenizer = CLIPTokenizer.from_pretrained(path, subfolder=spec.tokenizer_subfolder or "tokenizer")
    return TextEncoder(spec, model, tokenizer)


def _build_t5(spec: TextEncoderSpec, path: Optional[str], tiny: bool):
    from transformers import FlaxT5EncoderModel, T5Config, T5TokenizerFast

    if tiny or path is None:
        config = T5Config(vocab_size=1000, d_model=32, d_ff=64, num_layers=2, num_heads=2, d_kv=16)
        model = FlaxT5EncoderModel(config, seed=0)
        tokenizer = _tiny_tokenizer(spec.max_length)
    else:
        model = FlaxT5EncoderModel.from_pretrained(path, subfolder=spec.subfolder or "")
        tokenizer = T5TokenizerFast.from_pretrained(path, subfolder=spec.tokenizer_subfolder or "tokenizer_2")
    return TextEncoder(spec, model, tokenizer)


class _TinyTokenizer:
    """Deterministic hash tokenizer for tests (no downloads)."""

    def __init__(self, max_length: int):
        self.max_length = max_length

    def __call__(self, prompts, padding=None, max_length=None, truncation=True, return_tensors="np"):
        max_length = max_length or self.max_length
        ids = np.zeros((len(prompts), max_length), np.int32)
        mask = np.zeros((len(prompts), max_length), np.int32)
        for row, prompt in enumerate(prompts):
            words = str(prompt).split()[: max_length - 1]
            for col, word in enumerate(words):
                ids[row, col] = (hash(word) % 900) + 10
                mask[row, col] = 1
            ids[row, len(words)] = 1  # eos
            mask[row, len(words)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _tiny_tokenizer(max_length: int) -> _TinyTokenizer:
    return _TinyTokenizer(max_length)


class LLMTextEncoder:
    """Decoder-LLM hidden-state encoder (gemma/qwen/llama/mistral/chatglm)
    behind the same ``encode`` interface as the CLIP/T5 wrappers."""

    def __init__(self, spec: TextEncoderSpec, config, params, tokenizer):
        from .llm_encoder import LLMEncoder

        self.spec = spec
        self.config = config
        self.module = LLMEncoder(config)
        self.params = params
        self.tokenizer = tokenizer
        self._encode_jit = jax.jit(
            lambda ids, mask: self.module.apply({"params": self.params}, ids, mask)
        )

    def tokenize(self, prompts: Sequence[str]):
        return self.tokenizer(
            list(prompts),
            padding="max_length",
            max_length=self.spec.max_length,
            truncation=True,
            return_tensors="np",
        )

    def encode(self, prompts: Sequence[str]) -> Dict[str, np.ndarray]:
        tokens = self.tokenize(prompts)
        hidden = self._encode_jit(
            jnp.asarray(tokens["input_ids"]), jnp.asarray(tokens["attention_mask"])
        )
        hidden = np.asarray(hidden, np.float32)
        mask = np.asarray(tokens["attention_mask"])
        # pooled = last non-padding token's hidden state (causal LM convention)
        last = np.maximum(mask.sum(axis=1) - 1, 0)
        pooled = hidden[np.arange(hidden.shape[0]), last]
        return {"last_hidden_state": hidden, "attention_mask": mask, "pooled": pooled}

    def encode_with_hidden_states(self, prompts: Sequence[str]) -> Dict[str, Any]:
        """Per-layer hidden-state taps (embeddings first, transformers
        ``output_hidden_states`` convention) for families that stack tapped
        layers (krea2 text fusion; reference krea2/pipeline.py:271-273)."""
        tokens = self.tokenize(prompts)
        if not hasattr(self, "_encode_taps_jit"):
            self._encode_taps_jit = jax.jit(
                lambda ids, mask: self.module.apply(
                    {"params": self.params}, ids, mask, output_hidden_states=True
                )
            )
        final, taps = self._encode_taps_jit(
            jnp.asarray(tokens["input_ids"]), jnp.asarray(tokens["attention_mask"])
        )
        return {
            "last_hidden_state": np.asarray(final, np.float32),
            "hidden_states": tuple(np.asarray(t, np.float32) for t in taps),
            "attention_mask": np.asarray(tokens["attention_mask"]),
        }


_LLM_ARCHES = {
    "gemma": "gemma2",
    "gemma-2": "gemma2",
    "qwen": "qwen2",
    "qwen2": "qwen2",
    "qwen2.5": "qwen2",
    "qwen2.5-vl": "qwen2",
    "llama": "llama",
    "llama-3": "llama",
    "mistral": "mistral",
    "mistral-3": "mistral",
    "chatglm": "chatglm",
}

_LLM_PRESETS = {
    "gemma2": "gemma2_2b",
    "qwen2": "qwen25_7b",
    "llama": "llama3_8b",
    "mistral": "mistral3_24b",
    "chatglm": "chatglm3_6b",
}


def _llm_config_from_hf_dir(arch: str, path: str):
    """Map an HF config.json onto LLMEncoderConfig (local dirs only)."""
    import json
    import os

    from .llm_encoder import LLMEncoderConfig

    cfg_path = os.path.join(path, "config.json")
    with open(cfg_path) as fh:
        hf = json.load(fh)
    preset = getattr(LLMEncoderConfig, _LLM_PRESETS[arch])()
    heads = hf.get("num_attention_heads", preset.num_heads)
    return dataclasses_replace(
        preset,
        vocab_size=hf.get("vocab_size", preset.vocab_size),
        hidden_size=hf.get("hidden_size", preset.hidden_size),
        intermediate_size=hf.get("intermediate_size", hf.get("ffn_hidden_size", preset.intermediate_size)),
        num_layers=hf.get("num_hidden_layers", hf.get("num_layers", preset.num_layers)),
        num_heads=heads,
        num_kv_heads=hf.get("num_key_value_heads", hf.get("multi_query_group_num", preset.num_kv_heads)),
        head_dim=hf.get("head_dim", hf.get("hidden_size", preset.hidden_size) // heads),
        rope_theta=hf.get("rope_theta", preset.rope_theta),
        rms_eps=hf.get("rms_norm_eps", hf.get("layernorm_epsilon", preset.rms_eps)),
    )


def dataclasses_replace(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)


def _build_llm(spec: TextEncoderSpec, path: Optional[str], tiny: bool):
    import os

    from .llm_encoder import LLMEncoderConfig, llm_params_from_hf

    arch = _LLM_ARCHES[spec.family]
    if tiny or path is None:
        config = LLMEncoderConfig.tiny(arch)
        import jax.numpy as _jnp

        from .llm_encoder import LLMEncoder

        params = LLMEncoder(config).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
        )["params"]
        tokenizer = _tiny_tokenizer(spec.max_length)
        return LLMTextEncoder(spec, config, params, tokenizer)

    sub = os.path.join(path, spec.subfolder) if spec.subfolder else path
    sub = sub if os.path.isdir(sub) else path
    config = _llm_config_from_hf_dir(arch, sub)
    from .weight_import import read_safetensors

    weights = read_safetensors(sub)
    params = jax.tree_util.tree_map(jnp.asarray, llm_params_from_hf(weights, config))
    from transformers import AutoTokenizer

    tok_dir = os.path.join(path, spec.tokenizer_subfolder or "tokenizer")
    tokenizer = AutoTokenizer.from_pretrained(tok_dir if os.path.isdir(tok_dir) else sub)
    return LLMTextEncoder(spec, config, params, tokenizer)


_BUILDERS = {
    "clip-l": _build_clip,
    "clip-g": _build_clip,
    "t5-xxl": _build_t5,
    "t5": _build_t5,
}
for _family in _LLM_ARCHES:
    _BUILDERS[_family] = _build_llm


def load_text_encoders(
    specs: Sequence[TextEncoderSpec],
    pretrained_path: Optional[str] = None,
    tiny: bool = False,
) -> List[TextEncoder]:
    encoders = []
    for spec in specs:
        builder = _BUILDERS.get(spec.family)
        if builder is None:
            raise ValueError(f"unknown text encoder family {spec.family!r}")
        encoders.append(builder(spec, pretrained_path, tiny))
    return encoders
