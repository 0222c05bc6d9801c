"""Utility subsystem tests: phase timers, debug gating, trace no-op, device
resolution."""

import os

import numpy as np

from qwen3_tts_tpu.utils import device as dev
from qwen3_tts_tpu.utils import profiling as prof


def test_phase_timer_accumulates():
    t = prof.PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b", sync=np.zeros(3)):
        pass
    assert t.counts["a"] == 2
    assert t.counts["b"] == 1
    assert "a:" in t.summary() and "ms/call" in t.summary()


def test_debug_gating(capsys, monkeypatch):
    monkeypatch.delenv(prof.DEBUG_ENV, raising=False)
    prof.debug("hidden")
    monkeypatch.setenv(prof.DEBUG_ENV, "1")
    prof.debug("shown", 42)
    err = capsys.readouterr().err
    assert "hidden" not in err
    assert "shown 42" in err


def test_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv(prof.PROFILE_ENV, raising=False)
    with prof.trace():
        x = 1 + 1
    assert x == 2


def test_trace_writes_profile(tmp_path):
    with prof.trace(str(tmp_path)):
        np.dot(np.ones((4, 4)), np.ones((4, 4)))
    # jax profiler creates a plugins/profile dir inside the log dir
    assert any(tmp_path.rglob("*")), "trace produced no files"


def test_resolve_device_cached():
    d1 = dev.resolve_device()
    d2 = dev.resolve_device()
    assert d1 == d2
    assert d1 in ("cpu", "tpu", "gpu")
    dev.synchronize()  # must not raise
