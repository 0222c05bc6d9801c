"""Text chunker tests (mirrors reference TextChunkerTests.swift)."""

from qwen3_tts_tpu.frontend import chunker


def test_empty_and_whitespace():
    assert chunker.chunk("") == []
    assert chunker.chunk("   \n  ") == []


def test_short_passthrough():
    text = "Hello world."
    assert chunker.chunk(text) == [text]


def test_sentence_boundary():
    text = (
        "This is the first sentence and it has quite a few words to say here. "
        "This is the second sentence which also contains a number of words in it. "
        "And a third one to push us over the limit for sure."
    )
    chunks = chunker.chunk(text, max_words=20)
    assert len(chunks) > 1
    assert chunks[0].endswith(".")


def test_comma_split():
    words = ["word%d" % i for i in range(18)]
    text = " ".join(words[:10]) + ", " + " ".join(words[10:])
    chunks = chunker.chunk(text, max_words=12)
    assert len(chunks) == 2
    assert chunks[0].endswith(",")


def test_estimate_tokens():
    assert chunker.estimate_tokens("short") == 50  # min 50
    text = " ".join(["w"] * 30)
    assert chunker.estimate_tokens(text) == 150  # 5 per word


def test_max_words_invariant():
    text = " ".join(["word%d" % i for i in range(200)])
    chunks = chunker.chunk(text, max_words=35)
    for c in chunks:
        assert len(c.split()) <= 35
    # No text lost
    assert " ".join(chunks).split() == text.split()


def test_min_words():
    text = "Hi. " + " ".join(["word%d" % i for i in range(40)])
    chunks = chunker.chunk(text, max_words=35)
    # "Hi." alone is below MIN_WORDS so the break must not land right after it
    assert chunks[0] != "Hi."
