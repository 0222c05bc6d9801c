"""Unit tests for core ops: RMSNorm, RoPE/MRoPE, sampling, attention + ring cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.ops import attention, norms, rope, sampling
from qwen3_tts_tpu.ops.linear import linear


def test_rms_norm_fp32_island():
    x = (jnp.arange(8, dtype=jnp.bfloat16) / 8).reshape(1, 8)
    w = jnp.ones((8,), jnp.bfloat16) * 2
    out = norms.rms_norm(x, w, 1e-6)
    assert out.dtype == jnp.bfloat16
    x32 = np.asarray(x, np.float32)
    expect = x32 / np.sqrt((x32**2).mean() + 1e-6) * 2
    np.testing.assert_allclose(np.asarray(out, np.float32), expect, rtol=2e-2)


def test_rope_rotation_preserves_norm():
    inv = jnp.asarray(rope.inv_freq(16, 10000.0))
    cos, sin = rope.rope_cos_sin(jnp.arange(5)[None], inv)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 5, 16))
    out = rope.apply_rope(x, cos[:, None], sin[:, None])
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_position_zero_identity():
    inv = jnp.asarray(rope.inv_freq(8, 10000.0))
    cos, sin = rope.rope_cos_sin(jnp.zeros((1, 1)), inv)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 8))
    out = rope.apply_rope(x, cos[:, None], sin[:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_mrope_equals_rope_for_equal_positions():
    """With t=h=w positions the interleaved MRoPE collapses to plain RoPE."""
    inv = jnp.asarray(rope.inv_freq(16, 1e6))
    pos = jnp.arange(7)[None]
    c1, s1 = rope.rope_cos_sin(pos, inv)
    c2, s2 = rope.mrope_cos_sin(pos, inv, (3, 3, 2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_mrope_sections_select_axes():
    inv = jnp.asarray(rope.inv_freq(12, 1e4))
    pos3 = jnp.stack([
        jnp.arange(4)[None], jnp.arange(4)[None] * 2, jnp.arange(4)[None] * 3
    ])
    c, s = rope.mrope_cos_sin(pos3, inv, (2, 2, 2))
    half = 6
    # index 1 (%3==1, <6) uses h positions; index 2 (%3==2, <6) uses w
    t_only, _ = rope.rope_cos_sin(jnp.arange(4)[None], inv)
    assert not np.allclose(np.asarray(c)[..., 1], np.asarray(t_only)[..., 1])


def test_sample_token_greedy():
    logits = jnp.asarray([0.1, 5.0, -1.0, 2.0])
    tok = sampling.sample_token(logits, jax.random.PRNGKey(0), jnp.float32(0.0))
    assert int(tok) == 1


def test_sample_token_valid_mask():
    vm = sampling.talker_valid_mask(3072)
    logits = jnp.zeros((3072,)).at[2151].set(100.0).at[7].set(1.0)
    tok = sampling.sample_token(
        logits, jax.random.PRNGKey(0), jnp.float32(0.0), valid_mask=vm
    )
    assert int(tok) == 7  # 2151 is not sampleable
    # pad/eos are sampleable
    logits2 = jnp.zeros((3072,)).at[2150].set(10.0)
    assert int(sampling.sample_token(
        logits2, jax.random.PRNGKey(0), jnp.float32(0.0), valid_mask=vm)) == 2150


def test_sample_token_repetition_penalty():
    logits = jnp.asarray([2.0, 1.9])
    seen = jnp.asarray([True, False])
    tok = sampling.sample_token(
        logits, jax.random.PRNGKey(0), jnp.float32(0.0),
        seen_mask=seen, repetition_penalty=1.5,
    )
    assert int(tok) == 1  # 2.0/1.5 < 1.9


def test_sample_token_distribution():
    logits = jnp.log(jnp.asarray([0.7, 0.2, 0.1]))
    keys = jax.random.split(jax.random.PRNGKey(0), 3000)
    toks = jax.vmap(
        lambda k: sampling.sample_token(logits, k, jnp.float32(1.0))
    )(keys)
    counts = np.bincount(np.asarray(toks), minlength=3) / 3000
    np.testing.assert_allclose(counts, [0.7, 0.2, 0.1], atol=0.05)


def test_gqa_full_matches_naive():
    key = jax.random.PRNGKey(0)
    b, hq, hkv, l, d = 1, 4, 2, 6, 8
    q = jax.random.normal(key, (b, hq, l, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, l, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, hkv, l, d))
    mask = attention.causal_mask(l)
    out = attention.gqa_attention_full(q, k, v, d**-0.5, mask)

    k_rep = jnp.repeat(k, hq // hkv, axis=1)
    v_rep = jnp.repeat(v, hq // hkv, axis=1)
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k_rep) * d**-0.5 + mask
    ref = jnp.einsum("bhlm,bhmd->bhld", jax.nn.softmax(scores, -1), v_rep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_decode_attention_window_masking():
    """Keys outside [window_start, t] must not contribute."""
    b, hq, hkv, c, d = 1, 2, 2, 8, 4
    q = jnp.ones((b, hq, 1, d))
    k_cache = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, c, d))
    v_cache = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, c, d))
    pos = jnp.asarray([0, 1, 2, 3, 4, -1, -1, -1])

    out_all = attention.gqa_attention_decode(
        q, k_cache, v_cache, pos, jnp.int32(0), d**-0.5)
    out_win = attention.gqa_attention_decode(
        q, k_cache, v_cache, pos, jnp.int32(3), d**-0.5)

    # windowed result == full attention over only slots 3..4
    k_sub = k_cache[:, :, 3:5]
    v_sub = v_cache[:, :, 3:5]
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k_sub) * d**-0.5
    ref = jnp.einsum("bhlm,bhmd->bhld", jax.nn.softmax(scores, -1), v_sub)
    np.testing.assert_allclose(np.asarray(out_win), np.asarray(ref), rtol=1e-5)
    assert not np.allclose(np.asarray(out_all), np.asarray(out_win))


def test_linear_dense_and_bias():
    p = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": jnp.asarray([1.0, -1.0])}
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    out = linear(p, x)
    np.testing.assert_allclose(np.asarray(out), [[1*0+2*1+3*2 + 1, 1*3+2*4+3*5 - 1]])


def test_linear_quantized_matches_dequant():
    from qwen3_tts_tpu.ops import quant
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 64)).astype(np.float32)
    packed, scales, biases = quant.quantize_np(w, bits=4, group_size=64)
    p = {"wq": jnp.asarray(packed), "scales": jnp.asarray(scales),
         "biases": jnp.asarray(biases)}
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    out = linear(p, x)
    wdq = quant.dequantize_np(packed, scales, biases, 4, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) @ wdq.T, rtol=1e-4, atol=1e-4)
