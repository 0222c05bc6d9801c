"""Vocoder decoder tests: RVQ decode math, full decode shapes/range,
batch-consistency of decode, and chunked-decode mechanics."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.testing import tiny_decoder_config
import pytest

pytestmark = pytest.mark.slow


def _setup(seed=0):
    cfg = tiny_decoder_config()
    params = voc.init_vocoder_params(cfg, jax.random.PRNGKey(seed))
    return cfg, params


def test_rvq_decode_manual():
    """RVQ decode = sum of gathered codebook rows, projected, halves added
    (reference SpeechTokenizer.swift:566-691)."""
    rng = np.random.default_rng(0)
    v, d, dout = 8, 4, 6
    sem_cb = rng.normal(size=(1, v, d)).astype(np.float32)
    aco_cb = rng.normal(size=(3, v, d)).astype(np.float32)
    ws = rng.normal(size=(dout, d)).astype(np.float32)
    wa = rng.normal(size=(dout, d)).astype(np.float32)
    params = {
        "semantic": {"codebooks": jnp.asarray(sem_cb), "out_proj": {"w": jnp.asarray(ws)}},
        "acoustic": {"codebooks": jnp.asarray(aco_cb), "out_proj": {"w": jnp.asarray(wa)}},
    }
    codes = rng.integers(0, v, size=(2, 4, 5)).astype(np.int32)  # [B, nq=4, T]
    out = np.asarray(voc.rvq_decode(params, jnp.asarray(codes)))

    expected = np.zeros((2, 5, dout), np.float32)
    for b in range(2):
        for t in range(5):
            sem_sum = sem_cb[0, codes[b, 0, t]]
            aco_sum = sum(aco_cb[q, codes[b, 1 + q, t]] for q in range(3))
            expected[b, t] = sem_sum @ ws.T + aco_sum @ wa.T
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_decode_frames_shape_and_range():
    cfg, params = _setup()
    codes = jax.random.randint(
        jax.random.PRNGKey(1), (2, cfg.num_quantizers, 7), 0, cfg.codebook_size
    )
    wav = voc.decode_frames(params, codes, cfg)
    assert wav.shape == (2, 7 * cfg.total_upsample)
    assert wav.dtype == jnp.float32
    w = np.asarray(wav)
    assert np.all(np.isfinite(w))
    assert w.min() >= -1.0 and w.max() <= 1.0


def test_decode_batch_consistency():
    """Decoding a batch equals decoding each element separately (required for
    the chunk-batching trick in chunked_decode)."""
    cfg, params = _setup()
    codes = np.asarray(
        jax.random.randint(
            jax.random.PRNGKey(2), (3, cfg.num_quantizers, 5), 0, cfg.codebook_size
        )
    )
    full = np.asarray(voc.decode_frames(params, jnp.asarray(codes), cfg))
    for i in range(3):
        single = np.asarray(voc.decode_frames(params, jnp.asarray(codes[i : i + 1]), cfg))
        np.testing.assert_allclose(full[i], single[0], rtol=1e-4, atol=1e-5)


def test_chunked_decode_matches_reference_mechanics():
    """chunked_decode == manual pad/slice/batch/trim per the reference
    algorithm (SpeechTokenizer.swift:954-987)."""
    cfg, params = _setup()
    t, chunk, ctx = 11, 4, 2
    codes = np.asarray(
        jax.random.randint(
            jax.random.PRNGKey(3), (1, cfg.num_quantizers, t), 0, cfg.codebook_size
        )
    )
    out = voc.chunked_decode(params, codes, cfg, chunk_size=chunk, left_context=ctx)
    assert out.shape == (1, t * cfg.total_upsample)

    # manual reference computation
    num_chunks = (t + chunk - 1) // chunk
    padded = np.pad(codes, ((0, 0), (0, 0), (ctx, num_chunks * chunk - t)))
    pieces = []
    for i in range(num_chunks):
        c = padded[:, :, i * chunk : i * chunk + chunk + ctx]
        w = np.asarray(voc.decode_frames(params, jnp.asarray(c), cfg))
        pieces.append(w[:, ctx * cfg.total_upsample :])
    manual = np.concatenate(pieces, axis=1)[:, : t * cfg.total_upsample]
    np.testing.assert_allclose(out, manual, rtol=1e-4, atol=1e-5)


def test_chunked_decode_multi_batch():
    cfg, params = _setup()
    codes = np.asarray(
        jax.random.randint(
            jax.random.PRNGKey(4), (2, cfg.num_quantizers, 9), 0, cfg.codebook_size
        )
    )
    out = voc.chunked_decode(params, codes, cfg, chunk_size=4, left_context=2)
    assert out.shape == (2, 9 * cfg.total_upsample)
    # batch row i must equal chunked decode of just that row
    for i in range(2):
        single = voc.chunked_decode(
            params, codes[i : i + 1], cfg, chunk_size=4, left_context=2
        )
        np.testing.assert_allclose(out[i : i + 1], single, rtol=1e-4, atol=1e-5)


def test_empty_codes():
    cfg, params = _setup()
    out = voc.chunked_decode(
        params, np.zeros((1, cfg.num_quantizers, 0), np.int32), cfg
    )
    assert out.shape == (1, 0)


def test_speech_tokenizer_decode_lengths():
    """(wav, audio_lengths) wrapper parity (reference
    SpeechTokenizer.swift:1012-1022: lengths count frames with code0 > 0)."""
    cfg, params = _setup()
    t = 6
    codes = np.array(
        jax.random.randint(
            jax.random.PRNGKey(9), (2, t, cfg.num_quantizers), 1, cfg.codebook_size
        )
    )
    codes[0, 4:, 0] = 0  # stream 0: only 4 "valid" frames
    wav, lengths = voc.speech_tokenizer_decode(
        params, codes, cfg, chunk_size=4, left_context=2
    )
    assert wav.shape == (2, t * cfg.total_upsample)
    assert lengths.tolist() == [4 * cfg.total_upsample, t * cfg.total_upsample]


def test_vocoder_kernel_batch_flags_default_and_knob(monkeypatch):
    """The serving-batch gate defaults to kernels-at-any-B (the polynomial
    SnakeBeta flipped the measured verdict: B=32 T=48 fused 137 ms vs plain
    189 on v5e); =0/plain restores the B=1-only baseline arm; =pt keeps only
    the pre-transformer at B>1; =1 is the explicit all-kernels form."""
    monkeypatch.delenv("QWEN3TTS_VOCODER_KERNEL_BATCH", raising=False)
    assert voc.vocoder_kernel_batch_flags(1) == (True, True)
    assert voc.vocoder_kernel_batch_flags(32) == (True, True)
    for off in ("0", "plain"):
        monkeypatch.setenv("QWEN3TTS_VOCODER_KERNEL_BATCH", off)
        assert voc.vocoder_kernel_batch_flags(1) == (True, True)
        assert voc.vocoder_kernel_batch_flags(32) == (False, False)
    monkeypatch.setenv("QWEN3TTS_VOCODER_KERNEL_BATCH", "pt")
    assert voc.vocoder_kernel_batch_flags(32) == (False, True)
    assert voc.vocoder_kernel_batch_flags(1) == (True, True)
    monkeypatch.setenv("QWEN3TTS_VOCODER_KERNEL_BATCH", "1")
    assert voc.vocoder_kernel_batch_flags(32) == (True, True)
