"""Ideogram prompt upsampling: turn a short idea into a structured JSON caption.

Reference: helpers/models/ideogram/prompt_enhancer.py (an LM head that makes
the head-less Qwen3-VL text encoder generative) + pipeline.py:605-643
upsample_prompt (chat-templated generation at temperature 1.0, the result then
canonicalized through the auto-json path).

TPU-native shape: the family's text encoder is already a flax decoder LLM
(models/llm_encoder.py), so generation is a host-side sampling loop over a
jitted full-forward + LM-head logits call — no KV cache, O(n²) in generated
length, which is fine for a validation-time path that runs a handful of
prompts.  The reference optionally constrains decoding with `outlines`; here
the output always passes through maybe_convert_prompt_to_ideogram_json, which
canonicalizes valid JSON and degrades invalid JSON to a plain-text caption
the same way the reference's unconstrained fallback does.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import numpy as np

logger = logging.getLogger(__name__)

PROMPT_UPSAMPLE_TEMPERATURE = 1.0
DEFAULT_MAX_NEW_TOKENS = 1024

# Functional restatement of the reference's caption system message (the exact
# upstream prompt ships with the enhancer head repo; pass system_message to
# override when byte-exact conditioning matters).
CAPTION_SYSTEM_MESSAGE = (
    "Rewrite the user's idea as ONE minified single-line JSON caption for an "
    "image renderer and output NOTHING else. Schema, keys in this order: "
    '{"high_level_description":"...","compositional_deconstruction":'
    '{"background":"...","elements":[{"type":"obj","desc":"..."} or '
    '{"type":"text","text":"VERBATIM","desc":"..."}]}}. '
    "The core subject must appear as the first obj element; descriptions are "
    "concrete and 25-55 words; quoted text becomes its own verbatim text "
    "element; use double quotes and no trailing commas."
)

CAPTION_USER_TEMPLATE = (
    "TARGET IMAGE ASPECT RATIO: {aspect_ratio} (width:height).\nUser idea: {original_prompt}"
)


def load_enhancer_head(head_id: str, hidden_size: Optional[int] = None) -> np.ndarray:
    """Load the LM-head kernel (hidden, vocab) from a local safetensors file,
    a local directory, or an HF repo id.  The reference head stores
    ``lm_head.weight`` as (vocab, hidden) (prompt_enhancer.py:19)."""
    candidates = []
    if os.path.isfile(head_id):
        candidates.append(head_id)
    elif os.path.isdir(head_id):
        for name in sorted(os.listdir(head_id)):
            if name.endswith(".safetensors"):
                candidates.append(os.path.join(head_id, name))
    else:
        try:
            from huggingface_hub import hf_hub_download

            candidates.append(
                hf_hub_download(head_id, "diffusion_pytorch_model.safetensors")
            )
        except Exception as exc:
            raise RuntimeError(
                f"--ideogram_prompt_upsample needs the enhancer head {head_id!r}, "
                f"which could not be downloaded ({exc}).  Pre-download it and pass "
                "a local path via --ideogram_prompt_enhancer_head_id."
            ) from exc
    if not candidates:
        raise FileNotFoundError(
            f"no .safetensors found for ideogram prompt enhancer head at {head_id!r}"
        )
    from safetensors.numpy import load_file

    weights = load_file(candidates[0])
    for key in ("lm_head.weight", "weight"):
        if key in weights:
            kernel = np.asarray(weights[key], np.float32).T  # -> (hidden, vocab)
            if hidden_size is not None and kernel.shape[0] != hidden_size:
                raise ValueError(
                    f"enhancer head hidden size {kernel.shape[0]} does not match "
                    f"the text encoder ({hidden_size})"
                )
            return kernel
    raise KeyError(
        f"enhancer head {candidates[0]!r} has no lm_head.weight (keys: {sorted(weights)[:8]})"
    )


def _chat_tokens(tokenizer, prompt: str, aspect_ratio: str) -> np.ndarray:
    user = CAPTION_USER_TEMPLATE.format(aspect_ratio=aspect_ratio, original_prompt=prompt)
    if hasattr(tokenizer, "apply_chat_template") and getattr(tokenizer, "chat_template", None):
        text = tokenizer.apply_chat_template(
            [
                {"role": "system", "content": CAPTION_SYSTEM_MESSAGE},
                {"role": "user", "content": user},
            ],
            add_generation_prompt=True,
            tokenize=False,
        )
        encoded = tokenizer(text, return_tensors="np", add_special_tokens=False)
    else:
        encoded = tokenizer(
            f"{CAPTION_SYSTEM_MESSAGE}\n\n{user}\n", return_tensors="np"
        )
    return np.asarray(encoded["input_ids"][0], np.int32)


def upsample_prompt(
    text_encoder: Any,
    head_kernel: np.ndarray,
    prompt: str,
    height: int = 1024,
    width: int = 1024,
    temperature: float = PROMPT_UPSAMPLE_TEMPERATURE,
    max_new_tokens: int = DEFAULT_MAX_NEW_TOKENS,
    seed: int = 0,
) -> str:
    """Generate the upsampled caption text for one prompt."""
    import jax
    import jax.numpy as jnp

    tokenizer = text_encoder.tokenizer
    import math

    g = math.gcd(int(width), int(height)) or 1
    ids = _chat_tokens(tokenizer, prompt, f"{int(width)//g}:{int(height)//g}")

    module, params = text_encoder.module, text_encoder.params
    head = jnp.asarray(head_kernel)

    @jax.jit
    def next_logits(token_ids):
        hidden = module.apply(
            {"params": params}, token_ids[None], jnp.ones_like(token_ids)[None]
        )
        return hidden[0, -1].astype(jnp.float32) @ head

    eos = tokenizer.eos_token_id
    rng = jax.random.PRNGKey(seed)
    out_ids = []
    current = jnp.asarray(ids)
    for step in range(int(max_new_tokens)):
        logits = next_logits(current)
        if temperature and temperature > 0:
            rng, sub = jax.random.split(rng)
            token = int(jax.random.categorical(sub, logits / float(temperature)))
        else:
            token = int(jnp.argmax(logits))
        if eos is not None and token == eos:
            break
        out_ids.append(token)
        current = jnp.concatenate([current, jnp.asarray([token], current.dtype)])
    text = tokenizer.decode(out_ids, skip_special_tokens=True)
    logger.info("ideogram prompt upsample: %r -> %r", prompt[:60], text[:120])
    return text.strip()
