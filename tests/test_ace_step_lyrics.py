"""ACE-Step lyric tokenization (reference helpers/models/ace_step/model.py:
1416-1457 _tokenize_lyrics_batch + lyrics_utils/lyric_tokenizer.py
VoiceBpeTokenizer) and the validation_lyrics knob (validation.py:4589)."""

import json
import os

import numpy as np
import pytest

from simpletuner_tpu.models.ace_step.lyrics import (
    LINE_BREAK_TOKEN,
    START_TOKEN,
    LyricsTokenizer,
)


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    from tokenizers import Tokenizer, models

    vocab = {"[UNK]": 0, "[STOP]": 1, "x": 2, "[en]": 3, "[SPACE]": 4,
             "h": 5, "e": 6, "l": 7, "o": 8, "he": 9, "ll": 10,
             "hell": 11, "hello": 12, "[verse]": 13}
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")]
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges, unk_token="[UNK]"))
    tok.add_special_tokens(["[en]", "[SPACE]", "[verse]"])
    path = tmp_path_factory.mktemp("vocab") / "vocab.json"
    tok.save(str(path))
    return str(path)


def test_tokenize_structure(vocab_file):
    tok = LyricsTokenizer(vocab_file=vocab_file)
    ids = tok.tokenize("hello hello\n\nhello")
    # [261] + [en] hello [SPACE] hello + [2] + [2](blank line) + [en] hello + [2]
    assert ids[0] == START_TOKEN
    assert ids[1:6] == [3, 12, 4, 12, LINE_BREAK_TOKEN]
    assert ids[6] == LINE_BREAK_TOKEN  # blank line
    assert ids[7:] == [3, 12, LINE_BREAK_TOKEN]
    # structure markers tokenize as English lines (pipeline.py:76)
    ids2 = tok.tokenize("[verse]")
    assert ids2 == [START_TOKEN, 3, 13, LINE_BREAK_TOKEN]


def test_cleaning_and_language(vocab_file):
    tok = LyricsTokenizer(vocab_file=vocab_file)
    # lowercase + quote strip + whitespace collapse (lyric_tokenizer.py:557)
    assert tok.tokenize('HELLO   "hello"') == tok.tokenize("hello hello")
    assert LyricsTokenizer.detect_language("hello") == "en"
    assert LyricsTokenizer.detect_language("你好") == "zh"
    assert LyricsTokenizer.detect_language("こんにちは") == "ja"
    assert LyricsTokenizer.detect_language("안녕") == "ko"
    # unromanized CJK fails loudly (no transliteration libs in this build)
    with pytest.raises(NotImplementedError, match="transliteration"):
        tok.tokenize("你好")


def test_tokenize_batch_padding(vocab_file):
    tok = LyricsTokenizer(vocab_file=vocab_file)
    ids, mask = tok.tokenize_batch(["hello", None, "hello\nhello"], pad_multiple=8)
    assert ids.shape == mask.shape and ids.shape[1] % 8 == 0
    # empty lyrics -> single masked 0 (reference model.py:1421-1424)
    assert mask[1].sum() == 0 and ids[1].max() == 0
    assert mask[0].sum() == 4  # [261] [en] hello [2]
    np.testing.assert_array_equal(ids[0][:4], [START_TOKEN, 3, 12, LINE_BREAK_TOKEN])


def test_missing_vocab_fails_loudly(tmp_path):
    tok = LyricsTokenizer(model_path=str(tmp_path))
    with pytest.raises(FileNotFoundError, match="vocab.json"):
        tok.tokenize("hello")


def test_collate_and_validation_lyrics(vocab_file, monkeypatch):
    """collate_batch_extras reads parquet-row / sidecar lyrics and
    inference_conditioning injects --validation_lyrics."""
    import jax.numpy as jnp

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.ace_step.model import ACEStep

    monkeypatch.setenv("SIMPLETUNER_LYRICS_VOCAB", vocab_file)
    model = ACEStep(
        TrainingConfig(
            {"model_family": "ace_step", "model_type": "lora",
             "model_arch_preset": "tiny", "max_train_steps": 10,
             "validation_lyrics": "hello"}
        )
    )

    class _Backend:
        def __init__(self):
            self.files = {"b.lyrics.txt": b"hello"}

        def exists(self, p):
            return p in self.files

        def read(self, p):
            return self.files[p]

    class _Meta:
        image_metadata = {}

    class _Bundle:
        data_backend = _Backend()
        metadata_backend = _Meta()

    samples = [
        {"image_path": "a.wav", "metadata": {"row": {"lyrics": "hello hello"}}},
        {"image_path": "b.wav", "metadata": {}},
    ]
    batch = {}
    model.collate_batch_extras(samples, _Bundle(), batch)
    assert batch["lyrics_tokens"].shape == batch["lyrics_mask"].shape
    assert batch["lyrics_mask"][0].sum() > batch["lyrics_mask"][1].sum() > 0

    # no lyrics anywhere -> no keys (tags-only training)
    batch2 = {}
    model.collate_batch_extras(
        [{"image_path": "c.wav", "metadata": {}}], _Bundle(), batch2
    )
    assert "lyrics_tokens" not in batch2

    cond = model.inference_conditioning({"text_embeds": jnp.zeros((2, 4, 8))})
    assert cond["lyrics_tokens"].shape[0] == 2
    assert np.asarray(cond["lyrics_tokens"])[0, 0] == START_TOKEN
