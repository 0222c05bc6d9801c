"""16-bit PCM mono WAV writing/reading.

Parity with the reference AudioSampleWriter (reference
Utilities/AudioSampleWriter.swift:3-106): one-shot `wav_data`/`write_wav` and a
`StreamingWAVWriter` that writes a placeholder 44-byte header, appends int16
little-endian samples, and rewrites the header on finalize. Also the
`wav_to_float_samples` helper (reference Qwen3TTSPipeline.swift:1006-1020).
"""

from __future__ import annotations

import os
import struct

import numpy as np


def _pcm16(samples: np.ndarray) -> np.ndarray:
    clamped = np.clip(np.asarray(samples, dtype=np.float32), -1.0, 1.0)
    return (clamped * 32767.0).astype(np.int16)


def _header(num_samples: int, sample_rate: int) -> bytes:
    num_channels = 1
    bits_per_sample = 16
    byte_rate = sample_rate * num_channels * bits_per_sample // 8
    block_align = num_channels * bits_per_sample // 8
    data_size = num_samples * 2
    file_size = 36 + data_size
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", file_size),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, 1, num_channels, sample_rate, byte_rate,
                        block_align, bits_per_sample),
            b"data",
            struct.pack("<I", data_size),
        ]
    )


def wav_data(samples: np.ndarray, sample_rate: int = 24000) -> bytes:
    samples = np.asarray(samples).reshape(-1)
    return _header(len(samples), sample_rate) + _pcm16(samples).tobytes()


def streaming_wav_header(sample_rate: int = 24000) -> bytes:
    """WAV header for a stream of unknown length: the RIFF/data sizes carry
    the 0xFFFFFFFF sentinel players treat as 'read until EOF' (the common
    convention for live WAV streams; a finite rewrite needs seekability,
    which an HTTP chunked response does not have)."""
    h = bytearray(_header(0, sample_rate))
    h[4:8] = struct.pack("<I", 0xFFFFFFFF)
    h[40:44] = struct.pack("<I", 0xFFFFFFFF - 36)
    return bytes(h)


def pcm16_bytes(samples: np.ndarray) -> bytes:
    """Raw 16-bit little-endian PCM for appending to a streamed WAV."""
    return _pcm16(np.asarray(samples).reshape(-1)).tobytes()


def write_wav(samples: np.ndarray, path: str | os.PathLike, sample_rate: int = 24000) -> None:
    with open(path, "wb") as f:
        f.write(wav_data(samples, sample_rate))


def wav_to_float_samples(data: bytes) -> np.ndarray:
    """16-bit PCM WAV bytes -> float32 samples in [-1, 1]
    (reference Qwen3TTSPipeline.swift:1006-1020: fixed 44-byte header assumed)."""
    if len(data) <= 44:
        return np.zeros(0, dtype=np.float32)
    pcm = np.frombuffer(data[44: 44 + (len(data) - 44) // 2 * 2], dtype="<i2")
    return pcm.astype(np.float32) / 32767.0


def read_wav(path: str | os.PathLike) -> tuple[np.ndarray, int]:
    """Read a 16-bit PCM mono WAV produced by this module."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 44 or data[:4] != b"RIFF":
        raise ValueError("not a WAV file")
    sample_rate = struct.unpack("<I", data[24:28])[0]
    return wav_to_float_samples(data), sample_rate


class StreamingWAVWriter:
    """Incremental WAV writer (reference AudioSampleWriter.swift:44-106)."""

    def __init__(self, path: str | os.PathLike, sample_rate: int = 24000):
        self.path = os.fspath(path)
        self.sample_rate = sample_rate
        self.sample_count = 0
        self._f = open(self.path, "wb")
        self._f.write(b"\x00" * 44)

    def write(self, samples: np.ndarray) -> None:
        samples = np.asarray(samples).reshape(-1)
        self._f.write(_pcm16(samples).tobytes())
        self.sample_count += len(samples)

    def finalize(self) -> int:
        self._f.seek(0)
        self._f.write(_header(self.sample_count, self.sample_rate))
        self._f.close()
        return self.sample_count

    def __enter__(self) -> "StreamingWAVWriter":
        return self

    def __exit__(self, *exc) -> None:
        if not self._f.closed:
            self.finalize()
