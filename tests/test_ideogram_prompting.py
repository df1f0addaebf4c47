"""Ideogram auto-json captions + prompt upsampling (reference
helpers/models/ideogram/prompting.py + prompt_enhancer.py/pipeline.py:605)."""

import json

import numpy as np
import pytest

from simpletuner_tpu.models.ideogram.prompting import (
    canonicalize_ideogram_json_caption,
    maybe_convert_prompt_to_ideogram_json,
    prompt_to_ideogram_json_caption,
    serialize_ideogram_caption,
)


def test_plain_prompt_becomes_schema_caption():
    out = maybe_convert_prompt_to_ideogram_json("a red fox in the snow")
    parsed = json.loads(out)
    assert list(parsed) == [
        "high_level_description", "style_description", "compositional_deconstruction",
    ]
    assert parsed["high_level_description"] == "a red fox in the snow"
    assert parsed["style_description"]["medium"] == "illustration"
    assert parsed["style_description"]["art_style"] == "detailed digital illustration"
    elements = parsed["compositional_deconstruction"]["elements"]
    assert elements[0]["type"] == "obj" and elements[0]["desc"] == "a red fox in the snow"
    # minified serialization (compact separators, non-ASCII preserved)
    assert out == json.dumps(parsed, separators=(",", ":"), ensure_ascii=False)


def test_photo_terms_flip_medium_and_palette_extraction():
    out = json.loads(maybe_convert_prompt_to_ideogram_json(
        "35mm photo of a boat, colors #aabbcc and #AABBCC and #112233"
    ))
    style = out["style_description"]
    assert style["medium"] == "photograph"
    assert style["photo"] == "natural perspective, sharp focus"
    # uppercased + deduped
    assert style["color_palette"] == ["#AABBCC", "#112233"]
    # photo key ordering: photo before medium (reference _ordered_style)
    keys = list(style)
    assert keys.index("photo") < keys.index("medium")


def test_json_prompt_is_canonicalized_not_rewritten():
    raw = json.dumps({
        "compositional_deconstruction": {
            "elements": [
                {"type": "text", "text": "OPEN", "label": "neon sign",
                 "colour_palette": ["#FF0000", "bad", "#00ff00"]},
                {"type": "weird", "description": "a dog", "bbox": [1.0, 2, 3, 4]},
            ],
            "background": "  a   brick wall ",
        },
        "description": "storefront at night",
    })
    parsed = json.loads(maybe_convert_prompt_to_ideogram_json(raw))
    comp = parsed["compositional_deconstruction"]
    assert comp["background"] == "a brick wall"
    el0, el1 = comp["elements"]
    assert el0["type"] == "text" and el0["text"] == "OPEN" and el0["desc"] == "neon sign"
    assert el0["color_palette"] == ["#FF0000", "#00FF00"]  # validated + uppercased
    assert el1["type"] == "obj" and el1["desc"] == "a dog" and el1["bbox"] == [1, 2, 3, 4]
    assert parsed["high_level_description"] == "storefront at night"

    # invalid JSON degrades to plain-text conversion
    broken = maybe_convert_prompt_to_ideogram_json("{not json")
    assert json.loads(broken)["high_level_description"] == "{not json"

    # disabled passes through untouched
    assert maybe_convert_prompt_to_ideogram_json("hi", enabled=False) == "hi"


def test_caption_always_has_an_element():
    caption = canonicalize_ideogram_json_caption({}, source_prompt="just a cat")
    elements = caption["compositional_deconstruction"]["elements"]
    assert elements and elements[0]["desc"] == "just a cat"


def test_upsample_prompt_generates_text(tmp_path):
    """Tiny flax LLM + random LM head: the generation loop produces decodable
    tokens, respects max_new_tokens, and stops at EOS."""
    import jax

    from simpletuner_tpu.models.ideogram.prompt_enhancer import (
        load_enhancer_head,
        upsample_prompt,
    )
    from simpletuner_tpu.models.llm_encoder import LLMEncoder, LLMEncoderConfig

    class _Tok:
        eos_token_id = 1
        chat_template = None

        def __call__(self, text, return_tensors=None, add_special_tokens=True):
            ids = np.asarray([(3 + (ord(c) % 29)) for c in text[:32]], np.int32)
            return {"input_ids": ids[None]}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{i}" for i in ids)

    cfg = LLMEncoderConfig.tiny()
    module = LLMEncoder(cfg)
    ids = np.zeros((1, 8), np.int32)
    params = module.init(jax.random.PRNGKey(0), ids, np.ones_like(ids))["params"]

    class _Enc:
        pass

    enc = _Enc()
    enc.module, enc.params, enc.tokenizer = module, params, _Tok()

    # head saved in the reference's (vocab, hidden) layout
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    head = rng.normal(0, 0.1, (cfg.vocab_size, cfg.hidden_size)).astype(np.float32)
    save_file({"lm_head.weight": head}, str(tmp_path / "head.safetensors"))
    kernel = load_enhancer_head(str(tmp_path / "head.safetensors"), hidden_size=cfg.hidden_size)
    assert kernel.shape == (cfg.hidden_size, cfg.vocab_size)

    text = upsample_prompt(enc, kernel, "a cat", max_new_tokens=6, seed=3)
    assert isinstance(text, str)
    assert 0 < len(text.split()) <= 6

    with pytest.raises((RuntimeError, FileNotFoundError)):
        load_enhancer_head(str(tmp_path / "missing"))
