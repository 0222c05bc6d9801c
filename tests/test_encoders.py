"""Speaker-encoder and audio-encoder tests: mel frontend properties, ECAPA
shapes, RVQ encode math, checkpoint round trips, and pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.models import audio_encoder as aenc
from qwen3_tts_tpu.models import speaker_encoder as spk
from qwen3_tts_tpu.testing import (
    export_audio_encoder_checkpoint,
    export_speaker_encoder_checkpoint,
    tiny_encoder_config,
    tiny_speaker_config,
)

import pytest

pytestmark = pytest.mark.slow


# -- mel frontend ----------------------------------------------------------


def test_mel_filterbank_shape_and_norm():
    fb = spk.mel_filterbank(24000, 1024, 128, 0.0, 12000.0)
    assert fb.shape == (513, 128)
    assert np.all(fb >= 0)
    # every filter has some support
    assert np.all(fb.sum(axis=0) > 0)


def test_mel_spectrogram_shapes():
    audio = np.random.default_rng(0).normal(size=(4800,)).astype(np.float32) * 0.1
    mels = spk.mel_spectrogram(jnp.asarray(audio))
    # frames = (L + 2*(nfft/2) - nfft)/hop + 1 = L/hop + 1
    assert mels.shape == (1, 4800 // 256 + 1, 128)
    assert np.all(np.isfinite(np.asarray(mels)))
    # log-clip floor
    assert np.asarray(mels).min() >= np.log(1e-5) - 1e-5


def test_mel_spectrogram_matches_manual_stft():
    """Framing+window+rfft+mel must equal an explicit numpy computation
    (the reference builds frames on host, SpeakerEncoder.swift:169-209)."""
    rng = np.random.default_rng(1)
    audio = rng.normal(size=(2000,)).astype(np.float32)
    n_fft, hop = 64, 16
    fb = spk.mel_filterbank(24000, n_fft, 8, 0.0, 12000.0)
    out = np.asarray(
        spk.mel_spectrogram(
            jnp.asarray(audio), n_fft=n_fft, hop_size=hop, win_size=n_fft, num_mels=8
        )
    )[0]

    padded = np.pad(audio, n_fft // 2, mode="reflect")
    window = spk.hann_window(n_fft)
    frames = []
    for start in range(0, len(padded) - n_fft + 1, hop):
        frames.append(padded[start : start + n_fft] * window)
    spec = np.abs(np.fft.rfft(np.stack(frames), axis=1))
    expected = np.log(np.clip(spec @ fb, 1e-5, None))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


# -- speaker encoder -------------------------------------------------------


def test_speaker_encoder_embedding_shape():
    cfg = tiny_speaker_config()
    params = spk.init_speaker_encoder_params(cfg, jax.random.PRNGKey(0))
    enc = spk.SpeakerEncoder(params, cfg)
    audio = np.random.default_rng(2).normal(size=(4800,)).astype(np.float32) * 0.1
    emb = enc.extract_embedding(audio)
    assert emb.shape == (cfg.enc_dim,)
    assert np.all(np.isfinite(emb))


def test_speaker_encoder_checkpoint_round_trip():
    cfg = tiny_speaker_config()
    params = spk.init_speaker_encoder_params(cfg, jax.random.PRNGKey(0))
    weights = export_speaker_encoder_checkpoint(params)
    enc = spk.SpeakerEncoder.from_weights(weights, cfg)
    audio = np.random.default_rng(3).normal(size=(2400,)).astype(np.float32) * 0.1
    e1 = spk.SpeakerEncoder(params, cfg).extract_embedding(audio)
    e2 = enc.extract_embedding(audio)
    np.testing.assert_allclose(e1, e2, rtol=1e-4, atol=1e-5)


def test_res2net_manual():
    """Res2Net chunk-and-accumulate wiring (reference SpeakerEncoder.swift:282-300)."""
    cfg = tiny_speaker_config()
    scale = cfg.enc_res2net_scale
    c = 16
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 6, c)).astype(np.float32)
    blocks = [
        {
            "w": jnp.asarray(rng.normal(size=(3, c // scale, c // scale)).astype(np.float32)),
            "b": jnp.zeros((c // scale,)),
        }
        for _ in range(scale - 1)
    ]
    out = np.asarray(
        spk.res2net_block({"blocks": blocks}, jnp.asarray(x), scale, dilation=1)
    )
    assert out.shape == x.shape
    # chunk 0 passes through untouched
    np.testing.assert_allclose(out[..., : c // scale], x[..., : c // scale])


# -- audio encoder ---------------------------------------------------------


def test_nearest_codes_exact():
    cb = jnp.asarray(np.eye(4, dtype=np.float32) * 2.0)  # 4 codes in R^4
    x = jnp.asarray(
        np.stack([np.eye(4, dtype=np.float32)[i] * 2.0 + 0.01 for i in (2, 0, 3)])[None]
    )
    idx = np.asarray(aenc._nearest_codes(cb, x))
    np.testing.assert_array_equal(idx[0], [2, 0, 3])


def test_rvq_encode_residual_subtraction():
    """Two-codebook RVQ: the second codebook must quantize the residual."""
    rng = np.random.default_rng(5)
    d = 4
    cb1 = rng.normal(size=(8, d)).astype(np.float32)
    cb2 = rng.normal(size=(8, d)).astype(np.float32) * 0.1
    params = {
        "input_proj": {"w": np.eye(d, dtype=np.float32)},
        "codebooks": [jnp.asarray(cb1), jnp.asarray(cb2)],
    }
    x = rng.normal(size=(1, 3, d)).astype(np.float32)
    codes = np.asarray(aenc.rvq_encode_half(params, jnp.asarray(x)))
    assert codes.shape == (2, 1, 3)
    # manual
    for t in range(3):
        r = x[0, t]
        i1 = np.argmin(((r - cb1) ** 2).sum(-1))
        assert codes[0, 0, t] == i1
        r2 = r - cb1[i1]
        i2 = np.argmin(((r2 - cb2) ** 2).sum(-1))
        assert codes[1, 0, t] == i2


def test_audio_encoder_shapes_and_downsample_rate():
    cfg = tiny_encoder_config()
    params = aenc.init_audio_encoder_params(cfg, jax.random.PRNGKey(0))
    total_down = int(np.prod(cfg.upsampling_ratios)) * cfg.compress
    L = total_down * 5
    audio = np.random.default_rng(6).normal(size=(L,)).astype(np.float32) * 0.1
    codes = aenc.audio_encode(params, jnp.asarray(audio), cfg, valid_num_quantizers=16)
    assert codes.shape == (1, 16, 5)
    c = np.asarray(codes)
    assert c.min() >= 0 and c.max() < cfg.codebook_size


def test_audio_encoder_checkpoint_round_trip():
    cfg = tiny_encoder_config()
    params = aenc.init_audio_encoder_params(cfg, jax.random.PRNGKey(1))
    weights = export_audio_encoder_checkpoint(params, cfg)
    loaded = aenc.load_audio_encoder_params(weights, cfg)
    total_down = int(np.prod(cfg.upsampling_ratios)) * cfg.compress
    audio = (
        np.random.default_rng(7).normal(size=(total_down * 3,)).astype(np.float32) * 0.1
    )
    c1 = np.asarray(aenc.audio_encode(params, jnp.asarray(audio), cfg))
    c2 = np.asarray(
        aenc.audio_encode(jax.tree.map(jnp.asarray, loaded), jnp.asarray(audio), cfg)
    )
    np.testing.assert_array_equal(c1, c2)


# -- pipeline integration --------------------------------------------------


def test_pipeline_with_encoders(tmp_path):
    import jax.numpy as jnp

    from qwen3_tts_tpu.pipeline import Qwen3TTSPipeline
    from qwen3_tts_tpu.testing import write_tiny_model_dir

    write_tiny_model_dir(tmp_path, with_encoders=True)
    pl = Qwen3TTSPipeline(tmp_path, dtype=jnp.float32)
    assert pl.supports_voice_cloning
    assert pl.supports_icl

    audio = np.random.default_rng(8).normal(size=(4800,)).astype(np.float32) * 0.1
    emb = pl.extract_speaker_embedding(audio)
    assert emb is not None and np.all(np.isfinite(emb))

    codes = pl.encode_reference_audio(audio)
    assert codes is not None
    assert len(codes) == pl.speech_config.encoder_valid_num_quantizers
