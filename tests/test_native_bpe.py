"""Native C++ BPE core tests: build, parity with the pure-Python path, and
fallback behavior."""

import numpy as np
import pytest

from qwen3_tts_tpu.frontend import native_bpe
from qwen3_tts_tpu.frontend.tokenizer import Qwen3Tokenizer

VOCAB = {"<0x%02X>" % b: b for b in range(256)}
VOCAB.update({"Ġ": 256, "Ċ": 257})
for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz.,!?"):
    VOCAB[ch] = 258 + i
VOCAB.update({"he": 300, "llo": 301, "hello": 302, "Ġw": 303, "Ġwo": 304})
MERGES = ["h e", "l l", "ll o", "he llo", "Ġ w", "Ġw o"]


@pytest.fixture(scope="module")
def lib_available():
    return native_bpe.build_library() is not None


def test_build_library(lib_available):
    assert lib_available, "g++ build of native/qbpe.cpp failed"


def test_native_matches_python(lib_available):
    if not lib_available:
        pytest.skip("no native lib")
    tok_native = Qwen3Tokenizer(vocab=VOCAB, merges=MERGES)
    assert tok_native._native is not None

    tok_py = Qwen3Tokenizer(vocab=VOCAB, merges=MERGES)
    tok_py._native = None

    texts = [
        "hello world",
        "hello, world!",
        "a b c\nnew line",
        "unicode: ünïcodé test",  # exercises byte fallback
        "  double  spaces  ",
        "",
    ]
    for t in texts:
        assert tok_native.encode(t) == tok_py.encode(t), t


def test_native_disabled_by_env(monkeypatch):
    monkeypatch.setenv("QWEN3TTS_NATIVE_BPE", "0")
    monkeypatch.setattr(native_bpe, "_lib", None)
    assert native_bpe.load_library() is None
    tok = Qwen3Tokenizer(vocab=VOCAB, merges=MERGES)
    assert tok._native is None
    assert tok.encode("hello world")  # python path still works


def test_native_buffer_overflow_falls_back_to_python(lib_available, monkeypatch):
    """A word whose id count exceeds the native output buffer must not crash:
    encode_word returns None and the tokenizer takes the Python path, producing
    identical ids."""
    if not lib_available:
        pytest.skip("no native lib")
    monkeypatch.setattr(native_bpe.NativeBpe, "MAX_OUT", 8)
    tok_native = Qwen3Tokenizer(vocab=VOCAB, merges=MERGES)
    assert tok_native._native is not None
    assert tok_native._native.MAX_OUT == 8

    tok_py = Qwen3Tokenizer(vocab=VOCAB, merges=MERGES)
    tok_py._native = None

    long_word = "zq" * 50  # no merges apply -> 100 ids > MAX_OUT
    text = f"hello {long_word} world"
    assert tok_native._native.encode_word(long_word) is None
    assert tok_native.encode(text) == tok_py.encode(text)


def test_native_encode_word_direct(lib_available):
    if not lib_available:
        pytest.skip("no native lib")
    nb = native_bpe.NativeBpe(VOCAB, {m: i for i, m in enumerate(MERGES)})
    assert nb.encode_word("hello") == [302]
    assert nb.encode_word("Ġwo") == [304]
    # byte fallback for unknown codepoint
    ids = nb.encode_word("é")
    assert ids == [0xC3, 0xA9]
