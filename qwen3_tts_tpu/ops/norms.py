"""Normalization layers (functional).

RMSNorm matches the reference's float32 island semantics
(reference Qwen3Layers.swift:18-25, SpeechTokenizer.swift:250-255): the input
is upcast to float32, normalized, scaled by the weight, and cast back to the
input dtype. Note the subtle reference difference between the talker RMSNorm
(x * rsqrt * w, then cast) and the vocoder DecoderRMSNorm ((w * x_normed),
cast) — both are the same arithmetic; we keep one implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean_sq = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(mean_sq + eps) * weight.astype(jnp.float32)
    return normed.astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """Standard LayerNorm (used by ConvNeXt blocks and the audio encoder,
    reference SpeechTokenizer.swift:217, Qwen3TTSAudioEncoder.swift:272-273)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    normed = (x32 - mu) * jax.lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)
