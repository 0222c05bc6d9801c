"""Cross-validation of the BPE tokenizer against the HuggingFace `tokenizers`
library: train a small byte-level-free BPE, save tokenizer.json, and compare
encodes. This pins our merge-loop + special-token behavior to an independent
implementation (the reference has no such test)."""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from qwen3_tts_tpu.frontend.tokenizer import Qwen3Tokenizer  # noqa: E402

CORPUS = [
    "hello world this is a tokenizer parity test",
    "the quick brown fox jumps over the lazy dog",
    "speech synthesis turns text into audio waveforms",
    "numbers 123 456 and punctuation, with commas. and periods!",
    "repeated repeated repeated words words words",
]

TEST_TEXTS = [
    "hello world",
    "the quick brown fox",
    "speech synthesis test",
    "hello, world! 123",
    "words words words",
    "<|im_start|>assistant\nhello world<|im_end|>\n",
]


@pytest.fixture(scope="module")
def hf_tokenizer_dir(tmp_path_factory):
    """Train a GPT-2-style BPE (ByteLevel pre-tokenizer emits Ġ-prefixed
    tokens like the real Qwen tokenizer.json)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        special_tokens=["<|im_start|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS, trainer)
    d = tmp_path_factory.mktemp("hf_tok")
    tok.save(str(d / "tokenizer.json"))

    # our loader expects added_tokens entries for specials; the trainer puts
    # them in the vocab — synthesize the added_tokens block
    with open(d / "tokenizer.json") as f:
        data = json.load(f)
    vocab = data["model"]["vocab"]
    data["added_tokens"] = [
        {
            "content": s, "id": vocab[s], "special": True,
            "single_word": False, "lstrip": False, "rstrip": False,
            "normalized": False,
        }
        for s in ("<|im_start|>", "<|im_end|>")
        if s in vocab
    ]
    with open(d / "tokenizer.json", "w") as f:
        json.dump(data, f)
    return d


def test_encode_matches_hf(hf_tokenizer_dir):
    from tokenizers import Tokenizer

    hf = Tokenizer.from_file(str(hf_tokenizer_dir / "tokenizer.json"))
    ours = Qwen3Tokenizer(hf_tokenizer_dir)
    assert ours.loaded

    for text in TEST_TEXTS:
        expected = hf.encode(text).ids
        got = ours.encode(text)
        assert got == expected, (text, got, expected)


def test_encode_matches_hf_python_path(hf_tokenizer_dir):
    """Same parity with the native C++ BPE disabled (pure-Python path)."""
    from tokenizers import Tokenizer

    hf = Tokenizer.from_file(str(hf_tokenizer_dir / "tokenizer.json"))
    ours = Qwen3Tokenizer(hf_tokenizer_dir)
    ours._native = None
    for text in TEST_TEXTS:
        assert ours.encode(text) == hf.encode(text).ids, text
