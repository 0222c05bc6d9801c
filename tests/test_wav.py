"""parse_wav: the strict RIFF parser guarding the HTTP reference-audio
boundary (io/wav.py). wav_to_float_samples keeps the reference's blind
44-byte skip for parity (Qwen3TTSPipeline.swift:1006-1020); parse_wav must
instead handle real-world files — extra chunks, stereo, odd sizes — and
reject anything that is not 16-bit integer PCM."""

import struct

import numpy as np
import pytest

from qwen3_tts_tpu.io.wav import (
    parse_wav,
    pcm16_bytes,
    streaming_wav_header,
    wav_data,
)


def _chunks(*parts: bytes) -> bytes:
    body = b"WAVE" + b"".join(parts)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fmt(audio_format=1, channels=1, rate=24000, bits=16) -> bytes:
    block = channels * bits // 8
    payload = struct.pack(
        "<HHIIHH", audio_format, channels, rate, rate * block, block, bits
    )
    return b"fmt " + struct.pack("<I", len(payload)) + payload


def _data(pcm: np.ndarray) -> bytes:
    raw = pcm.astype("<i2").tobytes()
    return b"data" + struct.pack("<I", len(raw)) + raw


def test_roundtrip_own_writer():
    samples = np.linspace(-0.5, 0.5, 480).astype(np.float32)
    got, rate, ch = parse_wav(wav_data(samples, 24000))
    assert (rate, ch) == (24000, 1)
    np.testing.assert_allclose(got, samples, atol=1 / 32767)


def test_list_chunk_between_fmt_and_data():
    """ffmpeg/Audacity emit LIST/INFO after fmt — PCM does not start at
    byte 44; a blind skip reads chunk framing as audio."""
    pcm = (np.arange(-8, 8) * 1000).astype(np.int16)
    info = b"LIST" + struct.pack("<I", 10) + b"INFOisft\x00\x00"
    wav = _chunks(_fmt(), info, _data(pcm))
    got, rate, ch = parse_wav(wav)
    assert (rate, ch) == (24000, 1)
    np.testing.assert_allclose(got, pcm.astype(np.float32) / 32767.0)


def test_odd_sized_chunk_is_word_aligned():
    """An odd-sized chunk is padded to a word boundary; the walker must skip
    the pad byte or every later chunk id is misread."""
    pcm = np.asarray([1000, -1000, 500], np.int16)
    odd = b"note" + struct.pack("<I", 3) + b"abc\x00"  # 3 bytes + pad
    wav = _chunks(_fmt(), odd, _data(pcm))
    got, rate, ch = parse_wav(wav)
    assert len(got) == 3 and rate == 24000


def test_stereo_and_rates_reported():
    pcm = np.asarray([100, 200, 300, 400], np.int16)  # 2 frames x 2 ch
    wav = _chunks(_fmt(channels=2, rate=44100), _data(pcm))
    got, rate, ch = parse_wav(wav)
    assert (rate, ch) == (44100, 2) and len(got) == 4


def test_streaming_header_sentinel_reads_to_eof():
    pcm = np.asarray([123, -456], np.int16)
    wav = streaming_wav_header(24000) + pcm16_bytes(
        pcm.astype(np.float32) / 32767.0
    )
    got, rate, ch = parse_wav(wav)
    assert rate == 24000 and len(got) == 2


def test_rejects_non_wav_and_wrong_formats():
    with pytest.raises(ValueError):
        parse_wav(b"not a wav at all, nope")
    with pytest.raises(ValueError):  # float32 PCM
        parse_wav(_chunks(_fmt(audio_format=3, bits=32), _data(np.zeros(4, np.int16))))
    with pytest.raises(ValueError):  # 8-bit
        parse_wav(_chunks(_fmt(bits=8), _data(np.zeros(4, np.int16))))
    with pytest.raises(ValueError):  # missing data chunk
        parse_wav(_chunks(_fmt()))
    with pytest.raises(ValueError):  # missing fmt chunk
        parse_wav(_chunks(_data(np.zeros(4, np.int16))))
