"""Device selection (reference Utilities/DeviceSelector.swift:4-51).

The reference resolves `MLX_DEVICE=cpu|gpu`; the TPU-native equivalent honors
`QWEN3TTS_DEVICE=cpu|tpu` by forcing the JAX platform (effective only before
the backend initializes — same constraint as jax_platforms itself). The
resolved platform is cached, mirroring the reference's cached Device.
"""

from __future__ import annotations

import os

import jax

DEVICE_ENV = "QWEN3TTS_DEVICE"
_resolved: str | None = None


def resolve_device() -> str:
    """Returns the active platform name ("tpu" / "cpu" / ...), applying the
    QWEN3TTS_DEVICE override on first call when possible."""
    global _resolved
    if _resolved is not None:
        return _resolved
    want = os.environ.get(DEVICE_ENV, "").lower()
    if want in ("cpu", "tpu", "gpu"):
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backend already initialized; keep whatever is active
    _resolved = jax.default_backend()
    return _resolved


def synchronize() -> None:
    """Block until all dispatched device work completes (the reference's
    Stream.synchronize equivalent; rarely needed — block_until_ready on
    results is the normal pattern)."""
    (jax.device_put(0.0) + 0).block_until_ready()
