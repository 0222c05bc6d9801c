"""End-to-end pipeline tests over a tiny on-disk model directory: every
generation mode, streaming mechanics, long-text crossfade, file output, and
the capability surface."""

import numpy as np
import pytest

from qwen3_tts_tpu.io.wav import read_wav
from qwen3_tts_tpu.pipeline import (
    AudioChunk,
    Qwen3TTSError,
    Qwen3TTSPipeline,
    Qwen3TTSPipelineConfiguration,
)
from qwen3_tts_tpu.testing import write_tiny_model_dir

pytestmark = pytest.mark.slow

TEXT = "Hello world, this is a longer test sentence for synthesis."


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_model")
    write_tiny_model_dir(path)
    return path


@pytest.fixture(scope="module")
def pipeline(model_dir):
    import jax.numpy as jnp

    return Qwen3TTSPipeline(model_dir, dtype=jnp.float32)


def test_load_and_capabilities(pipeline):
    assert "aiden" in pipeline.available_speakers
    assert pipeline.model_type is None
    assert not pipeline.supports_voice_design
    assert not pipeline.supports_custom_voice
    # tiny fixture has no speaker-encoder / audio-encoder weights
    assert not pipeline.supports_voice_cloning
    assert not pipeline.supports_icl
    assert pipeline.extract_speaker_embedding(np.zeros(100)) is None
    assert pipeline.encode_reference_audio(np.zeros(100)) is None


def test_missing_dir_raises(tmp_path):
    with pytest.raises(Qwen3TTSError):
        Qwen3TTSPipeline(tmp_path / "nope")


def test_generate_basic(pipeline):
    samples = pipeline.generate(TEXT, "aiden", max_tokens=12, seed=1)
    spf = pipeline._samples_per_frame
    assert len(samples) % spf == 0
    assert len(samples) > 0
    assert samples.dtype == np.float32
    assert np.all(np.isfinite(samples))
    assert np.abs(samples).max() <= 1.0


def test_generate_seeded_reproducible(pipeline):
    a = pipeline.generate(TEXT, "aiden", max_tokens=8, seed=7)
    b = pipeline.generate(TEXT, "aiden", max_tokens=8, seed=7)
    np.testing.assert_array_equal(a, b)


def test_generate_speaker_embedding(pipeline):
    emb = np.random.default_rng(0).normal(size=(64,)).astype(np.float32)
    samples = pipeline.generate(TEXT, speaker_embedding=emb, max_tokens=6, seed=2)
    assert np.all(np.isfinite(samples))


def test_generate_voice_design_and_custom_voice(pipeline):
    vd = pipeline.generate_voice_design(
        TEXT, "a deep calm voice", max_tokens=6, seed=3
    )
    cv = pipeline.generate_custom_voice(
        TEXT, "aiden", "say it cheerfully", max_tokens=6, seed=3
    )
    assert np.all(np.isfinite(vd)) and np.all(np.isfinite(cv))


def test_generate_icl(pipeline):
    ref_codes = [[1, 2, 3, 4]] + [[0] * 4] * 15
    out = pipeline.generate_icl(
        TEXT, "reference transcript", ref_codes, max_tokens=6, seed=4
    )
    assert np.all(np.isfinite(out))


def test_generate_stream_mechanics(pipeline):
    spf = pipeline._samples_per_frame
    chunks = list(
        pipeline.generate_stream(TEXT, "aiden", max_tokens=40, chunk_size=10, seed=5)
    )
    assert len(chunks) >= 2
    assert all(isinstance(c, AudioChunk) for c in chunks)
    # last chunk is the empty final sentinel (reference :607)
    assert chunks[-1].is_final and len(chunks[-1].samples) == 0
    body = chunks[:-1]
    # non-final chunks carry exactly DECODE_CHUNK_SIZE frames of audio
    from qwen3_tts_tpu.pipeline import DECODE_CHUNK_SIZE

    for c in body[:-1]:
        assert not c.is_final
        assert len(c.samples) == DECODE_CHUNK_SIZE * spf
    # token ranges are contiguous
    starts = [c.token_range[0] for c in body]
    ends = [c.token_range[1] for c in body]
    assert starts[0] == 0
    assert all(s == e for s, e in zip(starts[1:], ends[:-1]))
    # stream total equals blocking generate total for same seed/settings
    total_stream = sum(len(c.samples) for c in body)
    assert total_stream == ends[-1] * spf


def test_generate_batch_long_text(pipeline):
    long_text = " ".join(["This is sentence number %d." % i for i in range(12)])
    progress = []
    samples = pipeline.generate_batch(
        long_text, "aiden", temperature=0.8, on_progress=progress.append, seed=6
    )
    assert np.all(np.isfinite(samples))
    assert progress[0] == 0.0 and progress[-1] == 1.0
    assert len(samples) > 0


def test_generate_to_file(pipeline, tmp_path):
    out = tmp_path / "out.wav"
    progress = []
    count = pipeline.generate_to_file(
        TEXT, out, "aiden", on_progress=progress.append, seed=8
    )
    assert count > 0
    samples, sr = read_wav(out)
    assert sr == 24000
    assert len(samples) == count
    assert progress[-1] == 1.0


def test_short_prompt_guard(pipeline):
    # < 9 prompt tokens -> no generation (reference Qwen3Talker.swift:348-352).
    # The chat wrapper alone is >= 9 tokens with a real tokenizer, so exercise
    # the guard with a degenerate tokenizer that emits a single id.
    from qwen3_tts_tpu.models import prompt as prompt_mod

    class OneTokenTokenizer:
        def encode(self, text):
            return [1]

    pd = prompt_mod.assemble_prompt(
        pipeline.params, pipeline.config, OneTokenTokenizer(), "hi", speaker="aiden"
    )
    assert pd is None


def test_runtime_quantization_config(model_dir):
    import jax.numpy as jnp

    pl = Qwen3TTSPipeline(
        model_dir,
        Qwen3TTSPipelineConfiguration(
            apply_runtime_quantization=True,
            runtime_quantization_mode="mixed_4_6",  # reference 4/6-bit scheme
        ),
        dtype=jnp.float32,
    )
    assert "wq" in pl.params["layers"]["qkv_proj"]
    samples = pl.generate(TEXT, "aiden", max_tokens=4, seed=1)
    assert np.all(np.isfinite(samples))


def test_runtime_quantization_int8(model_dir):
    import jax.numpy as jnp

    pl = Qwen3TTSPipeline(
        model_dir,
        Qwen3TTSPipelineConfiguration(
            apply_runtime_quantization=True, runtime_quantization_mode="int8"
        ),
        dtype=jnp.float32,
    )
    assert "w8" in pl.params["layers"]["qkv_proj"]
    # tiny cp hidden (48) is not divisible by group 64 -> left dense by design
    assert "w" in pl.cp_params["layers"]["qkv_proj"]
    samples = pl.generate(TEXT, "aiden", max_tokens=4, seed=1)
    assert np.all(np.isfinite(samples))


def test_cli_smoke(model_dir, tmp_path, capsys, monkeypatch):
    from qwen3_tts_tpu import cli

    monkeypatch.setenv("QWEN3TTS_MAX_TOKENS", "6")
    out = tmp_path / "cli_out.wav"
    rc = cli.main([str(model_dir), str(out), "aiden", "CLI smoke test sentence."])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "Real-time factor" in captured or "Generated" in captured
    assert out.exists()


def test_generate_batch_single_chunk_honors_instruct(pipeline, monkeypatch):
    """A single-chunk generate_batch must pass instruct / reference_transcript
    through to code generation — the reference's single-chunk shortcut drops
    them (Qwen3TTSPipeline.swift:791-796), silently flipping behavior on
    input length; this pins the deliberate fix."""
    captured = {}
    real = pipeline._generate_codes

    def spy(text, **kw):
        captured.update(kw, text=text)
        return real(text, **kw)

    monkeypatch.setattr(pipeline, "_generate_codes", spy)
    from qwen3_tts_tpu.frontend.chunker import chunk

    assert len(chunk(TEXT)) == 1
    out = pipeline.generate_batch(TEXT, "someone_unknown",
                                  instruct="Say it warmly", seed=3)
    assert captured["instruct"] == "Say it warmly"
    assert np.all(np.isfinite(out))


def test_generate_batch_flushes_crossfade_tail(pipeline, monkeypatch):
    """When every chunk after the first yields no frames, the held-back
    crossfade tail must still be emitted — output equals the full decode of
    chunk 0, not a version cut `crossfade` samples short."""
    long_text = " ".join("This is sentence number %d." % i for i in range(12))
    real = pipeline._generate_codes
    calls = []

    def first_only(text, **kw):
        calls.append(text)
        if len(calls) == 1:
            return real(text, **kw)
        return np.zeros((0, 16), np.int32)

    monkeypatch.setattr(pipeline, "_generate_codes", first_only)
    out = pipeline.generate_batch(long_text, "aiden", seed=11)
    assert len(calls) > 1  # the text really did chunk
    frames = real(calls[0], speaker="aiden", instruct=None,
                  speaker_embedding=None, reference_transcript=None,
                  temperature=None, max_tokens=600, seed=11)
    expected = pipeline._decode_chunked(frames, decode_chunk_size=24)
    assert len(out) == len(expected)
    np.testing.assert_allclose(out, expected, rtol=0, atol=0)


def test_max_tokens_zero_means_no_audio(pipeline):
    """max_tokens=0 is a literal zero-audio budget on EVERY path — the
    service path already honors it; the pipeline (the server's degraded /
    lock fallback) must not coerce 0 to default_max_tokens via falsy-or and
    synthesize a full utterance."""
    out = pipeline.generate(TEXT, "aiden", max_tokens=0, seed=0)
    assert out.shape == (0,)
    chunks = list(pipeline.generate_stream(TEXT, "aiden", max_tokens=0))
    assert all(len(c.samples) == 0 for c in chunks)
    assert chunks[-1].is_final
    many = pipeline.generate_many([TEXT, TEXT], "aiden", max_tokens=0)
    assert [len(m) for m in many] == [0, 0]


def test_generate_unified_kwargs_match_wrappers(pipeline):
    """generate() accepts the full prompt kwarg set (one entry point for
    every mode — the HTTP server uses it); each mode must produce exactly
    what the dedicated reference-parity wrapper produces."""
    vd = pipeline.generate_voice_design(
        TEXT, "a deep calm voice", temperature=0.0, max_tokens=6, seed=3
    )
    np.testing.assert_array_equal(
        pipeline.generate(TEXT, instruct="a deep calm voice",
                          temperature=0.0, max_tokens=6, seed=3),
        vd,
    )
    cv = pipeline.generate_custom_voice(
        TEXT, "aiden", "say it cheerfully", temperature=0.0, max_tokens=6,
        seed=3,
    )
    np.testing.assert_array_equal(
        pipeline.generate(TEXT, "aiden", instruct="say it cheerfully",
                          temperature=0.0, max_tokens=6, seed=3),
        cv,
    )
    ref_codes = [[1, 2, 3, 4]] + [[0] * 4] * 15
    icl = pipeline.generate_icl(
        TEXT, "reference transcript", ref_codes, temperature=0.0,
        max_tokens=6, seed=4,
    )
    np.testing.assert_array_equal(
        pipeline.generate(TEXT, reference_transcript="reference transcript",
                          reference_audio_codes=ref_codes,
                          temperature=0.0, max_tokens=6, seed=4),
        icl,
    )


def test_warmup_compiles_and_generation_unchanged(pipeline):
    """warmup() runs both dummy paths and does not perturb seeded results
    (jit cache warming must be numerics-neutral)."""
    before = pipeline.generate(TEXT, "aiden", temperature=0.0, max_tokens=6,
                               seed=11)
    pipeline.warmup(max_tokens=8)
    after = pipeline.generate(TEXT, "aiden", temperature=0.0, max_tokens=6,
                              seed=11)
    np.testing.assert_array_equal(before, after)
