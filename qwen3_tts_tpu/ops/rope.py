"""Rotary position embeddings: standard RoPE and interleaved MRoPE.

Parity with the reference rotary implementations:
  - Qwen3RotaryEmbedding incl. interleaved 3-section MRoPE
    (reference Qwen3Layers.swift:30-101; default mrope_section [24, 20, 20])
  - CodePredictorRotaryEmbedding (reference Qwen3CodePredictor.swift:8-28)
  - vocoder DecoderRotaryEmbedding (reference SpeechTokenizer.swift:275-300)

All cos/sin math is float32; rotate_half splits the head dim in halves
(NOT interleaved pairs), matching the reference's rotateHalf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def inv_freq(dim: int, base: float) -> np.ndarray:
    """1 / base^(2i/dim) for i in [0, dim/2) — float32 host constant."""
    return (
        1.0 / np.power(base, np.arange(0, dim, 2, dtype=np.float32) / dim)
    ).astype(np.float32)


def rope_cos_sin(
    positions: jax.Array, inv_freq_arr: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Standard RoPE angles.

    positions: [..., L] int/float; returns cos/sin of shape [..., L, dim]
    where dim = 2 * len(inv_freq_arr), layout [angles, angles].
    """
    pos = positions.astype(jnp.float32)
    freqs = pos[..., None] * inv_freq_arr[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def mrope_cos_sin(
    positions: jax.Array,
    inv_freq_arr: jax.Array,
    mrope_section: tuple[int, int, int],
) -> tuple[jax.Array, jax.Array]:
    """Interleaved MRoPE angles (reference Qwen3Layers.swift:50-91).

    positions: [B, L] (used for all three of t/h/w, as the reference does when
    given 2-D positionIds) or [3, B, L] explicit t/h/w positions.
    Returns cos/sin [B, L, dim].
    """
    if positions.ndim == 2:
        pos3 = jnp.stack([positions, positions, positions], axis=0)
    else:
        pos3 = positions
    pos3 = pos3.astype(jnp.float32)

    # freqs[s, b, l, k] = pos3[s, b, l] * inv_freq[k]
    freqs = pos3[..., None] * inv_freq_arr[None, None, None, :]
    freqs_t, freqs_h, freqs_w = freqs[0], freqs[1], freqs[2]

    half = inv_freq_arr.shape[0]
    idx = jnp.arange(half)
    h_len = mrope_section[1] * 3
    w_len = mrope_section[2] * 3
    h_mask = (idx % 3 == 1) & (idx < h_len)
    w_mask = (idx % 3 == 2) & (idx < w_len)

    combined = jnp.where(h_mask[None, None, :], freqs_h, freqs_t)
    combined = jnp.where(w_mask[None, None, :], freqs_w, combined)

    emb = jnp.concatenate([combined, combined], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding. x: [..., L, D]; cos/sin broadcastable to x."""
    c = cos.astype(x.dtype)
    s = sin.astype(x.dtype)
    return x * c + rotate_half(x) * s
