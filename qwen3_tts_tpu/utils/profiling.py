"""Tracing / profiling / debug instrumentation.

The reference has only wall-clock prints and a debug env flag (SURVEY.md §5;
reference Examples main.swift:30-54, DUPER_DEBUG_GENERATION
Qwen3Talker.swift:341). This module provides the TPU-native equivalents:

  - PhaseTimer: accumulates per-phase wall time (prefill / decode / vocoder /
    total) with block_until_ready-aware timing, printable as a summary
  - trace(): context manager around jax.profiler.trace emitting
    TensorBoard/Perfetto traces; enabled globally via QWEN3TTS_PROFILE=<dir>
  - debug(): stderr logging gated by QWEN3TTS_DEBUG_GENERATION=1 (the
    reference's DUPER_DEBUG_GENERATION equivalent)
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict

import jax

DEBUG_ENV = "QWEN3TTS_DEBUG_GENERATION"
PROFILE_ENV = "QWEN3TTS_PROFILE"


def debug_enabled() -> bool:
    return os.environ.get(DEBUG_ENV) == "1"


def debug(*args) -> None:
    if debug_enabled():
        print("[qwen3-tts]", *args, file=sys.stderr, flush=True)


class PhaseTimer:
    """Accumulates wall time per named phase.

    with timer.phase("prefill", sync=state):   # sync: pytree to block on
        ...
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name}: {self.totals[name] * 1e3:.1f} ms"
                f" ({self.counts[name]} calls,"
                f" {self.totals[name] / max(self.counts[name], 1) * 1e3:.2f} ms/call)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """jax.profiler trace window. Uses QWEN3TTS_PROFILE when log_dir is None;
    a no-op when neither is set."""
    log_dir = log_dir or os.environ.get(PROFILE_ENV)
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
