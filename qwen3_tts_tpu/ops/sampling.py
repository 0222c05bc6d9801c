"""On-device token sampling.

Mirrors the reference `sampleToken` (reference Qwen3Talker.swift:274-322),
but runs entirely on device so the decode loop never syncs to host:
  1. repetition penalty: divide logits of previously-seen tokens by `penalty`
     (the reference divides raw logits, regardless of sign — kept as-is)
  2. temperature divide, or pure argmax when temperature == 0
  3. optional top-k mask
  4. optional validity mask (codebook<2048 | pad 2148 | eos 2150 for the
     talker head — reference cachedValidMask, Qwen3Talker.swift:19-33)
  5. categorical sample via Gumbel (jax.random.categorical)

The "seen set" is carried as a boolean vector over the vocab, which is
equivalent to the reference's Set<Int32> + penalty array construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# np, not jnp: a module-level jnp scalar would initialize the JAX backend at
# IMPORT time — on a hung TPU tunnel that blocks `import qwen3_tts_tpu`
# itself, before any failure containment (bench.py) can run
NEG_INF = np.float32(-1e30)


def talker_valid_mask(vocab_size: int, codebook_size: int = 2048,
                      pad_id: int = 2148, eos_id: int = 2150) -> jax.Array:
    """Boolean [vocab] mask of sampleable talker tokens
    (reference Qwen3Talker.swift:19-33 — ids are hardcoded there too)."""
    idx = jnp.arange(vocab_size)
    return (idx < codebook_size) | (idx == pad_id) | (idx == eos_id)


def sample_token(
    logits: jax.Array,
    key: jax.Array,
    temperature: jax.Array,
    *,
    seen_mask: jax.Array | None = None,
    repetition_penalty: float = 1.05,
    valid_mask: jax.Array | None = None,
    top_k: int = 0,
) -> jax.Array:
    """Sample one token id (int32, shape []) from logits [V] (float32).

    `temperature` is a traced scalar; 0 selects greedy argmax via lax.cond so a
    single compiled function serves both modes.
    """
    logits = logits.astype(jnp.float32)

    if seen_mask is not None and repetition_penalty != 1.0:
        # UNCONDITIONAL division, exactly the reference's formula
        # (Qwen3Talker.swift:288-298: logits / penaltyArray). Note this is
        # NOT the standard CTRL-style penalty (multiply when negative,
        # divide when positive): seen tokens with negative logits get
        # slightly BOOSTED. Deliberate — token-stream parity with the
        # reference beats textbook correctness here.
        penalty = jnp.where(seen_mask, jnp.float32(repetition_penalty), 1.0)
        logits = logits / penalty

    def _greedy(lg: jax.Array) -> jax.Array:
        if valid_mask is not None:
            lg = jnp.where(valid_mask, lg, NEG_INF)
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)

    def _sample(lg: jax.Array) -> jax.Array:
        lg = lg / jnp.maximum(temperature, 1e-6)
        if 0 < top_k < lg.shape[-1]:
            kth = jax.lax.top_k(lg, top_k)[0][..., -1]
            lg = jnp.where(lg < kth, NEG_INF, lg)
        if valid_mask is not None:
            lg = jnp.where(valid_mask, lg, NEG_INF)
        return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)

    return jax.lax.cond(temperature > 0, _sample, _greedy, logits)
