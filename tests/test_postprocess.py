"""Audio postprocessor tests: noise gate with hold, boost-only peak
normalization, and WAV in-place rewrite."""

import numpy as np

from qwen3_tts_tpu.io.wav import read_wav, write_wav
from qwen3_tts_tpu.utils import postprocess as pp


def test_gate_silences_low_rms_regions():
    sr_window = pp.WINDOW_SIZE
    # 10 windows of loud signal, 20 windows of quiet noise
    loud = np.sin(np.linspace(0, 200, 10 * sr_window)).astype(np.float32) * 0.5
    quiet = np.random.default_rng(0).normal(size=20 * sr_window).astype(np.float32) * 0.001
    x = np.concatenate([loud, quiet])
    y = pp.apply_noise_gate(x)
    # loud region mostly preserved
    np.testing.assert_allclose(y[: 8 * sr_window], x[: 8 * sr_window], atol=1e-6)
    # far tail (beyond the 6-window hold + crossfade) fully gated
    assert np.abs(y[-8 * sr_window :]).max() == 0.0


def test_gate_hold_keeps_short_gaps_open():
    w = pp.WINDOW_SIZE
    loud = np.ones(2 * w, np.float32) * 0.5
    gap = np.zeros(3 * w, np.float32)  # 3 windows < 6-window hold
    x = np.concatenate([loud, gap, loud, gap])
    y = pp.apply_noise_gate(x)
    # the short gap stays open (hold), so the second loud region is untouched
    start = 5 * w + w  # skip crossfade boundary
    np.testing.assert_allclose(y[start : 6 * w], x[start : 6 * w], atol=1e-6)


def test_peak_normalize_boost_only():
    quiet = np.full(100, 0.1, np.float32)
    boosted = pp.peak_normalize(quiet)
    np.testing.assert_allclose(boosted.max(), pp.TARGET_PEAK, rtol=1e-5)

    loud = np.full(100, 0.95, np.float32)
    np.testing.assert_array_equal(pp.peak_normalize(loud), loud)

    silent = np.full(100, 0.005, np.float32)
    np.testing.assert_array_equal(pp.peak_normalize(silent), silent)


def test_postprocess_wav_in_place(tmp_path):
    w = pp.WINDOW_SIZE
    x = np.concatenate(
        [
            np.sin(np.linspace(0, 100, 10 * w)).astype(np.float32) * 0.2,
            np.random.default_rng(1).normal(size=20 * w).astype(np.float32) * 0.001,
        ]
    )
    path = tmp_path / "x.wav"
    write_wav(x, path)
    pp.postprocess_wav_file_in_place(str(path))
    y, sr = read_wav(path)
    assert sr == 24000
    assert len(y) == len(x)
    # normalized up and gated tail
    assert np.abs(y).max() > 0.8
    assert np.abs(y[-5 * w :]).max() < 1e-3
