"""Tokenizer tests (mirrors + extends reference TokenizerTests.swift)."""

import json

import pytest

from qwen3_tts_tpu.frontend.tokenizer import Qwen3Tokenizer, normalize_quotes


def make_manual():
    vocab = {
        "Ġhello": 1,
        "Ġworld": 2,
        "hello": 3,
        "h": 4,
        "e": 5,
        "l": 6,
        "o": 7,
        "Ġ": 8,
        "he": 9,
        "ll": 10,
        "hell": 11,
        "<|im_start|>": 100,
        "<|im_end|>": 101,
    }
    merges = ["h e", "l l", "he ll", "hell o"]
    return Qwen3Tokenizer(vocab=vocab, merges=merges)


def test_manual_decode():
    tok = make_manual()
    assert tok.decode([1, 2]) == " hello world"


def test_empty():
    tok = make_manual()
    assert tok.encode("") == []
    assert tok.decode([]) == ""


def test_bpe_merging():
    tok = make_manual()
    ids = tok.encode("hello")
    assert ids == [3]  # merged h+e, l+l, hell, hello -> exact vocab hit


def test_special_tokens_greedy():
    tok = make_manual()
    ids = tok.encode("<|im_start|>hello<|im_end|>")
    assert ids[0] == 100
    assert ids[-1] == 101
    assert 3 in ids


def test_quote_normalization():
    assert normalize_quotes("’‘“”") == "''\"\""
    tok = make_manual()
    assert tok.encode("hello’") == tok.encode("hello'")


def test_unloaded_fallback_utf8():
    tok = Qwen3Tokenizer()
    assert not tok.loaded
    assert tok.encode("AB") == [65, 66]
    assert tok.decode([65]) == ""


def test_byte_fallback():
    vocab = {"<0x41>": 1, "<0xE2>": 2, "<0x82>": 3, "<0xAC>": 4}
    tok = Qwen3Tokenizer(vocab=vocab, merges=[])
    # "A" not in vocab as char -> falls back to <0x41>
    assert tok.encode("A") == [1]
    # euro sign is 3 UTF-8 bytes
    assert tok.encode("€") == [2, 3, 4]


def test_load_tokenizer_json(tmp_path):
    data = {
        "model": {
            "vocab": {"a": 0, "b": 1, "ab": 2, "Ġ": 3},
            "merges": [["a", "b"]],
        },
        "added_tokens": [
            {"id": 10, "content": "<|sp|>", "special": True},
        ],
    }
    (tmp_path / "tokenizer.json").write_text(json.dumps(data))
    tok = Qwen3Tokenizer(tmp_path)
    assert tok.loaded
    assert tok.encode("ab") == [2]
    assert tok.encode("<|sp|>ab") == [10, 2]
    assert tok.decode([2, 3]) == "ab "


def test_load_vocab_merges_fallback(tmp_path):
    (tmp_path / "vocab.json").write_text(json.dumps({"a": 0, "b": 1, "ab": 2}))
    (tmp_path / "merges.txt").write_text("a b\n")
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"added_tokens_decoder": {"7": {"content": "<|x|>", "special": True}}})
    )
    tok = Qwen3Tokenizer(tmp_path)
    assert tok.loaded
    assert tok.encode("ab") == [2]
    assert tok.encode("<|x|>") == [7]


def test_split_regex_contractions():
    vocab = {"I": 1, "'m": 2, "Ġfine": 3, "Ġ": 4, "f": 5, "i": 6, "n": 7, "e": 8,
             "'": 9, "m": 10, "Ġf": 11, "Ġfi": 12, "Ġfin": 13}
    tok = Qwen3Tokenizer(
        vocab=vocab, merges=["' m", "Ġ f", "Ġf i", "Ġfi n", "Ġfin e"]
    )
    ids = tok.encode("I'm fine")
    assert ids == [1, 2, 3]


def test_concurrent_bpe_cache_eviction():
    """TTSService.submit tokenizes on the caller's thread, so encode() runs
    concurrently; racing cache evictions with overlapping key snapshots must
    not raise (deletion tolerates already-evicted keys)."""
    import threading

    tok = make_manual()
    tok._MAX_CACHE = 8  # force constant eviction
    words = [f"w{i}" for i in range(64)]
    errors = []

    def hammer(seed):
        try:
            for i in range(300):
                tok._bpe(words[(seed * 7 + i) % len(words)])
        except Exception as e:  # pragma: no cover - the bug under test
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
