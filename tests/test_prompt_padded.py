"""assemble_prompt_padded: the serving submit fast path (one jitted
dispatch). Its rows match the eager assemble_prompt to jit-fusion
tolerance (~1 ulp; XLA fuses the projection differently under jit), and it
is DETERMINISTIC — the service's greedy-parity invariant compares two runs
of this same assembly (service submit vs the test's expected side), so
determinism, not eager-bitwise-equality, is the load-bearing property."""

import numpy as np
import pytest

from qwen3_tts_tpu.models import prompt as P
from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_models

PB, TB = 64, 128


@pytest.fixture(scope="module")
def models():
    cfg, params, _ = tiny_models()
    return cfg, params


def _compare(cfg, params, text, **kw):
    tok = FakeByteTokenizer()
    eager = P.assemble_prompt(params, cfg, tok, text, **kw)
    padded = P.assemble_prompt_padded(
        params, cfg, tok, text, prompt_bucket=PB, trailing_bucket=TB, **kw
    )
    if eager is None:
        assert padded is None
        return
    p = int(eager.input_embeds.shape[1])
    t = int(eager.trailing_hidden.shape[1])
    assert (padded.p, padded.t) == (p, t)
    assert padded.input_embeds.shape[1] == PB
    assert padded.trailing_hidden.shape[1] == TB
    # jit-fusion tolerance (observed max ~1.5e-8 abs / 2e-5 rel in f32)
    np.testing.assert_allclose(
        np.asarray(padded.input_embeds[:, :p]),
        np.asarray(eager.input_embeds), rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(padded.trailing_hidden[:, :t]),
        np.asarray(eager.trailing_hidden), rtol=1e-4, atol=1e-6,
    )
    # beyond-length rows are zero (prefill masks by length; keep them clean)
    assert not np.asarray(padded.input_embeds[:, p:]).any()
    assert not np.asarray(padded.trailing_hidden[:, t:]).any()
    np.testing.assert_allclose(
        np.asarray(padded.tts_pad_embed),
        np.asarray(eager.tts_pad_embed), rtol=1e-4, atol=1e-6,
    )
    # determinism: two invocations are bitwise identical (the property the
    # service greedy-parity tests stand on)
    again = P.assemble_prompt_padded(
        params, cfg, FakeByteTokenizer(), text,
        prompt_bucket=PB, trailing_bucket=TB, **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(padded.input_embeds), np.asarray(again.input_embeds)
    )
    np.testing.assert_array_equal(
        np.asarray(padded.trailing_hidden), np.asarray(again.trailing_hidden)
    )


def test_named_speaker_fast_path(models):
    cfg, params = models
    _compare(cfg, params, "padded assembly must match the eager prompt",
             speaker="aiden")


def test_no_speaker_fast_path(models):
    cfg, params = models
    _compare(cfg, params, "no speaker plain path parity text here")


def test_very_short_text(models):
    cfg, params = models
    _compare(cfg, params, "hi", speaker="aiden")


def test_min_length_boundary(models):
    cfg, params = models
    # shortest text that clears MIN_PROMPT_TOKENS for the byte tokenizer
    _compare(cfg, params, "x", speaker="aiden")
    _compare(cfg, params, "xy zw", speaker="aiden")


def test_instruct_falls_back_to_eager(models):
    cfg, params = models
    _compare(cfg, params, "instruct requests take the eager fallback",
             speaker="aiden", instruct="speak brightly")


def test_freeform_speaker_falls_back(models):
    cfg, params = models
    # unknown speaker string = instruct backward-compat path
    _compare(cfg, params, "freeform speaker string goes the eager way",
             speaker="a calm narrator")


def test_over_bucket_returns_exact_lengths(models):
    cfg, params = models
    tok = FakeByteTokenizer()
    text = "words " * 80  # trailing far beyond TB
    padded = P.assemble_prompt_padded(
        params, cfg, tok, text, prompt_bucket=PB, trailing_bucket=TB,
        speaker="aiden",
    )
    # over-bucket: exact-length arrays so the service's bucket check can
    # report the real numbers
    p, t = P.pd_lengths(padded)
    assert t > TB
    assert padded.trailing_hidden.shape[1] == t
