"""Attention primitives: full (prefill) GQA, single-token (decode) GQA over a
preallocated windowed KV cache, and plain SDPA for the vocoder transformers.

TPU-first design notes:
  - The reference concatenates K/V every step and slices the cache every 15
    steps (reference Qwen3Layers.swift:111-124, 197-206). Here the cache is a
    fixed-capacity ring buffer in HBM written with dynamic_update_slice; the
    reference's trim-to-192-every-15-steps schedule is reproduced *exactly* by
    masking on absolute positions (window_start is advanced by the caller at
    trim points), so greedy token streams match while shapes stay static.
  - Scores/softmax accumulate in float32 (preferred_element_type), matching
    the reference's float32 additive mask + softmax behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import NEG_INF


def gqa_attention_full(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Full-sequence grouped-query attention.

    q: [B, Hq, L, D]; k, v: [B, Hkv, L, D]; mask: additive [.., L, L] or None.
    Returns [B, Hq, L, D].
    """
    b, hq, l, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qg = q.reshape(b, hkv, g, l, d)
    scores = jnp.einsum(
        "bkgld,bkmd->bkglm", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkglm,bkmd->bkgld", probs, v)
    return out.reshape(b, hq, l, d)


def causal_mask(l: int, valid_len: jax.Array | None = None) -> jax.Array:
    """Additive float32 causal mask [L, L]; positions >= valid_len masked out."""
    i = jnp.arange(l)[:, None]
    j = jnp.arange(l)[None, :]
    m = jnp.where(j <= i, 0.0, NEG_INF)
    if valid_len is not None:
        m = jnp.where(j < valid_len, m, NEG_INF)
    return m


def gqa_attention_decode(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_pos: jax.Array,
    window_start: jax.Array,
    scale: float,
) -> jax.Array:
    """Single-token GQA over the ring cache.

    q: [B, Hq, 1, D]; k_cache/v_cache: [B, Hkv, C, D]; cache_pos: [C] absolute
    positions per slot (-1 = empty). Valid keys: window_start <= pos (the
    current token has already been written, so pos <= t holds by construction).
    Returns [B, Hq, 1, D].
    """
    b, hq, _, d = q.shape
    hkv = k_cache.shape[1]
    g = hq // hkv
    qg = q.reshape(b, hkv, g, d)
    scores = jnp.einsum(
        "bkgd,bkcd->bkgc", qg, k_cache, preferred_element_type=jnp.float32
    ) * scale
    valid = (cache_pos >= 0) & (cache_pos >= window_start)
    scores = jnp.where(valid[None, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("bkgc,bkcd->bkgd", probs, v_cache)
    return out.reshape(b, hq, 1, d)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Plain multi-head SDPA (Hq == Hkv) for the vocoder / audio-encoder
    transformers (reference MLXFast.scaledDotProductAttention call sites,
    SpeechTokenizer.swift:364-370, Qwen3TTSAudioEncoder.swift:230-236)."""
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bhmd->bhld", probs, v)
