"""Qwen3-TTS Talker: 28-layer autoregressive decoder over summed text+codec
embeddings (reference Model/Qwen3Talker.swift:8-110, Model/Qwen3Layers.swift).

TPU-first structure:
  - all decoder layers' weights are STACKED on a leading layer axis and the
    forward pass is a single `lax.scan` over layers (one traced layer body,
    fast compiles, XLA-friendly)
  - KV cache is a preallocated ring buffer ({"k","v": [L,B,Hkv,C,D],
    "pos": [C]}) written via dynamic_update_slice; window masking in
    ops/attention.py reproduces the reference's 192-token trim schedule
  - RMSNorm runs in float32 (reference Qwen3Layers.swift:18-25); q/k per-head
    RMSNorm before RoPE (reference Qwen3Layers.swift:174-175)
  - rotary embedding: interleaved MRoPE when config.mrope_section is set
    (reference Qwen3Layers.swift:50-91), else standard RoPE
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Qwen3TTSConfig
from ..ops.attention import causal_mask, gqa_attention_decode, gqa_attention_full
from ..ops.linear import linear
from ..ops.norms import rms_norm
from ..ops import rope as rope_ops


# ---------------------------------------------------------------------------
# Parameter initialization (tests / random checkpoints)
# ---------------------------------------------------------------------------


def _dense(key, out_dim, in_dim, dtype, bias=False, scale=0.02):
    k1, k2 = jax.random.split(key)
    p = {"w": (jax.random.normal(k1, (out_dim, in_dim)) * scale).astype(dtype)}
    if bias:
        p["b"] = (jax.random.normal(k2, (out_dim,)) * scale).astype(dtype)
    return p


def init_talker_params(config: Qwen3TTSConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-init talker params (layer-stacked). For tests and golden fixtures."""
    h = config.hidden_size
    th = config.text_hidden_size
    nl = config.num_hidden_layers
    hd = config.head_dim
    nq = config.num_attention_heads
    nkv = config.num_key_value_heads
    keys = jax.random.split(key, 16)

    def stack(fn, k):
        ks = jax.random.split(k, nl)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[fn(kk) for kk in ks])

    params = {
        "text_embedding": {
            "w": (jax.random.normal(keys[0], (config.text_vocab_size, th)) * 0.02).astype(dtype)
        },
        "codec_embedding": {
            "w": (jax.random.normal(keys[1], (config.vocab_size, h)) * 0.02).astype(dtype)
        },
        "text_projection": {
            "fc1": _dense(keys[2], th, th, dtype, bias=True),
            "fc2": _dense(keys[3], h, th, dtype, bias=True),
        },
        "codec_head": _dense(keys[4], config.vocab_size, h, dtype),
        "norm": {"w": jnp.ones((h,), dtype)},
        "layers": {
            "input_layernorm": {"w": jnp.ones((nl, h), dtype)},
            "post_attention_layernorm": {"w": jnp.ones((nl, h), dtype)},
            "q_norm": {"w": jnp.ones((nl, hd), dtype)},
            "k_norm": {"w": jnp.ones((nl, hd), dtype)},
            # q/k/v and gate/up are FUSED on the output axis: one matmul each
            # instead of three/two — bitwise-identical outputs (independent
            # rows), far fewer tiny ops in the decode loop (profiled: decode
            # is per-op-latency-bound on v5e).
            "qkv_proj": stack(lambda k: _dense(k, (nq + 2 * nkv) * hd, h, dtype), keys[5]),
            "o_proj": stack(lambda k: _dense(k, h, nq * hd, dtype), keys[8]),
            "gateup_proj": stack(
                lambda k: _dense(k, 2 * config.intermediate_size, h, dtype), keys[9]
            ),
            "down_proj": stack(lambda k: _dense(k, h, config.intermediate_size, dtype), keys[11]),
        },
    }
    return params


# ---------------------------------------------------------------------------
# Embedding / projection helpers
# ---------------------------------------------------------------------------


def text_projection(params: dict, x: jax.Array) -> jax.Array:
    """2-layer SiLU text projection (reference Qwen3Layers.swift:266-280)."""
    h = jax.nn.silu(linear(params["text_projection"]["fc1"], x))
    return linear(params["text_projection"]["fc2"], h)


def encode_text(params: dict, ids: jax.Array) -> jax.Array:
    """text_embedding -> text_projection (reference Qwen3Talker.swift:103-106).
    Quantized tables (runtime or pre-quantized checkpoints) gather-dequantize
    just the requested rows."""
    from ..ops.linear import embedding_lookup

    dtype = params["norm"]["w"].dtype
    emb = embedding_lookup(params["text_embedding"], ids, dtype=dtype)
    return text_projection(params, emb)


def encode_audio(params: dict, ids: jax.Array) -> jax.Array:
    """codec_embedding lookup (reference Qwen3Talker.swift:108-110)."""
    from ..ops.linear import embedding_lookup

    dtype = params["norm"]["w"].dtype
    return embedding_lookup(params["codec_embedding"], ids, dtype=dtype)


def codec_head(params: dict, h: jax.Array) -> jax.Array:
    return linear(params["codec_head"], h).astype(jnp.float32)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(
    config: Qwen3TTSConfig, capacity: int, batch: int = 1, dtype=jnp.float32
) -> dict:
    nl = config.num_hidden_layers
    shape = (nl, batch, config.num_key_value_heads, capacity, config.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "pos": jnp.full((capacity,), -1, jnp.int32),
    }


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def _rope_cos_sin(config: Qwen3TTSConfig, positions: jax.Array):
    """cos/sin [B, L, head_dim] for given absolute positions [B, L]."""
    inv = jnp.asarray(rope_ops.inv_freq(config.head_dim, config.rope_theta))
    if config.mrope_section is not None:
        return rope_ops.mrope_cos_sin(positions, inv, config.mrope_section)
    return rope_ops.rope_cos_sin(positions, inv)


def _layer_qkv(layer_p: dict, x: jax.Array, cos, sin, config: Qwen3TTSConfig):
    """Shared q/k/v computation for one layer. x: [B, L, H].

    Two weight structures are accepted:
      fused   {"qkv_proj": {"w"/"w8"/...: [(q+2kv)*hd, H]}} — one matmul,
              the single-chip default (fewer dispatches)
      unfused {"qkv_proj": {"q": entry, "k": entry, "v": entry}} — the
              TENSOR-PARALLEL layout (parallel/sharding.py): each section
              shards on its own output axis, so a tp split never cuts across
              the q/k/v boundary and XLA inserts only the Megatron-canonical
              collectives (no per-layer reshard of a fused output).
    """
    b, l, _ = x.shape
    hd = config.head_dim
    nq = config.num_attention_heads
    nkv = config.num_key_value_heads

    qp = layer_p["qkv_proj"]
    if "q" in qp:
        q = linear(qp["q"], x).reshape(b, l, nq, hd)
        k = linear(qp["k"], x).reshape(b, l, nkv, hd)
        v = linear(qp["v"], x).reshape(b, l, nkv, hd)
    else:
        qkv = linear(qp, x)
        q = qkv[..., : nq * hd].reshape(b, l, nq, hd)
        k = qkv[..., nq * hd : (nq + nkv) * hd].reshape(b, l, nkv, hd)
        v = qkv[..., (nq + nkv) * hd :].reshape(b, l, nkv, hd)

    q = rms_norm(q, layer_p["q_norm"]["w"], config.rms_norm_eps)
    k = rms_norm(k, layer_p["k_norm"]["w"], config.rms_norm_eps)

    q = q.transpose(0, 2, 1, 3)  # [B, Hq, L, D]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    c = cos[:, None, :, :]  # [B, 1, L, D]
    s = sin[:, None, :, :]
    q = rope_ops.apply_rope(q, c, s)
    k = rope_ops.apply_rope(k, c, s)
    return q, k, v


def _swiglu(lp: dict, x: jax.Array, intermediate: int) -> jax.Array:
    """SwiGLU: fused gate/up ({"gateup_proj": entry}, one matmul + split) or
    the unfused tensor-parallel layout ({"gateup_proj": {"gate","up"}},
    section-aligned tp sharding — see _layer_qkv)."""
    gp = lp["gateup_proj"]
    if "gate" in gp:
        return jax.nn.silu(linear(gp["gate"], x)) * linear(gp["up"], x)
    gu = linear(gp, x)
    return jax.nn.silu(gu[..., :intermediate]) * gu[..., intermediate:]


def talker_prefill(
    params: dict,
    embeds: jax.Array,
    length: jax.Array,
    cache: dict,
    config: Qwen3TTSConfig,
) -> tuple[jax.Array, dict]:
    """Prefill over padded embeds [B, P_pad, H]; real length `length` (traced).

    Writes K/V for positions [0, length) into cache slots [0, P_pad) (capacity
    must exceed P_pad; ring wrap never occurs during prefill). Returns
    (h_last [B, 1, H] — the hidden at position length-1 — and updated cache).
    """
    b, p_pad, _ = embeds.shape
    scale = 1.0 / float(config.head_dim) ** 0.5
    positions = jnp.broadcast_to(jnp.arange(p_pad)[None, :], (b, p_pad))
    cos, sin = _rope_cos_sin(config, positions)
    mask = causal_mask(p_pad, valid_len=length)

    layer_params = params["layers"]

    def body(h, lp):
        x = rms_norm(h, lp["input_layernorm"]["w"], config.rms_norm_eps)
        q, k, v = _layer_qkv(lp, x, cos, sin, config)
        attn = gqa_attention_full(q, k, v, scale, mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, p_pad, -1)
        h = h + linear(lp["o_proj"], attn)
        x2 = rms_norm(h, lp["post_attention_layernorm"]["w"], config.rms_norm_eps)
        m = linear(lp["down_proj"], _swiglu(lp, x2, config.intermediate_size))
        return h + m, (k, v)

    h, (k_all, v_all) = jax.lax.scan(body, embeds, layer_params)
    h = rms_norm(h, params["norm"]["w"], config.rms_norm_eps)

    # Write prefill K/V into the ring cache (slots 0..P_pad-1).
    capacity = cache["pos"].shape[0]
    assert capacity >= p_pad, "cache capacity must exceed padded prompt length"
    new_k = jax.lax.dynamic_update_slice(cache["k"], k_all, (0, 0, 0, 0, 0))
    new_v = jax.lax.dynamic_update_slice(cache["v"], v_all, (0, 0, 0, 0, 0))
    slot_pos = jnp.where(jnp.arange(p_pad) < length, jnp.arange(p_pad), -1)
    new_pos = jax.lax.dynamic_update_slice(
        cache["pos"], slot_pos.astype(jnp.int32), (0,)
    )

    h_last = jax.lax.dynamic_slice(h, (0, length - 1, 0), (b, 1, h.shape[-1]))
    return h_last, {"k": new_k, "v": new_v, "pos": new_pos}


def talker_decode_step(
    params: dict,
    embed: jax.Array,
    cache: dict,
    position: jax.Array,
    window_start: jax.Array,
    config: Qwen3TTSConfig,
) -> tuple[jax.Array, dict]:
    """One decode step. embed: [B, 1, H]; position: absolute int32 scalar.

    Writes this token's K/V at ring slot position % capacity, attends over the
    window [window_start, position], returns (h_last [B,1,H], new cache).
    """
    b = embed.shape[0]
    scale = 1.0 / float(config.head_dim) ** 0.5
    capacity = cache["pos"].shape[0]
    slot = (position % capacity).astype(jnp.int32)

    positions = jnp.broadcast_to(position[None, None], (b, 1))
    cos, sin = _rope_cos_sin(config, positions)

    new_pos = jax.lax.dynamic_update_slice(
        cache["pos"], position[None].astype(jnp.int32), (slot,)
    )

    # Unrolled layer loop with in-place dynamic-update-slice on the stacked
    # cache: inside a lax.while_loop XLA performs these updates in place, so
    # per-step cache traffic is one slot write + one windowed read per layer
    # (vs the reference's concat-and-reslice, Qwen3Layers.swift:197-200).
    k_cache, v_cache = cache["k"], cache["v"]
    h = embed
    zero = jnp.int32(0)
    for i in range(config.num_hidden_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        x = rms_norm(h, lp["input_layernorm"]["w"], config.rms_norm_eps)
        q, k, v = _layer_qkv(lp, x, cos, sin, config)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None], (jnp.int32(i), zero, zero, slot, zero)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None], (jnp.int32(i), zero, zero, slot, zero)
        )
        attn = gqa_attention_decode(
            q, k_cache[i], v_cache[i], new_pos, window_start, scale
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, -1)
        h = h + linear(lp["o_proj"], attn)
        x2 = rms_norm(h, lp["post_attention_layernorm"]["w"], config.rms_norm_eps)
        h = h + linear(lp["down_proj"], _swiglu(lp, x2, config.intermediate_size))
    h = rms_norm(h, params["norm"]["w"], config.rms_norm_eps)
    return h, {"k": k_cache, "v": v_cache, "pos": new_pos}
