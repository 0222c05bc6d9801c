"""Code-predictor mega-kernel tests (interpret mode on CPU).

Parity chain: pallas kernel (interpret) == jnp W8A8 mirror (bit-exact greedy)
~= dense fp32 code predictor (loose, quantization noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.config import CodePredictorConfig
from qwen3_tts_tpu.models import code_predictor as cp_mod
from qwen3_tts_tpu.ops.pallas.cp_megakernel import (
    build_cp_kernel_params,
    predict_frame_kernel,
    predict_frame_w8a8_ref,
)
from qwen3_tts_tpu.ops.quant import (
    quantize_rowwise_int8_np,
    w8a8_linear_ref,
)

TINY = CodePredictorConfig(
    hidden_size=256,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=1,
    head_dim=128,
    intermediate_size=512,
    vocab_size=256,
    num_code_groups=4,
)


def _setup(config=TINY, talker_hidden=None, seed=0):
    th = talker_hidden or config.hidden_size
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = cp_mod.init_cp_params(config, th, k1, dtype=jnp.float32)
    kp = jax.device_put(build_cp_kernel_params(params, config))
    code_hidden = jax.random.normal(k2, (1, 1, th), jnp.float32) * 0.5
    code0_embed = jax.random.normal(k3, (1, 1, th), jnp.float32) * 0.5
    return params, kp, code_hidden, code0_embed


def test_rowwise_int8_roundtrip():
    w = np.random.RandomState(0).randn(64, 256).astype(np.float32)
    q, s, m = quantize_rowwise_int8_np(w)
    w2 = s[:, None] * q.astype(np.float32) + m[:, None]
    assert np.abs(w2 - w).max() < np.abs(w).max() / 100


def test_w8a8_linear_close_to_dense():
    rs = np.random.RandomState(1)
    w = rs.randn(128, 256).astype(np.float32)
    x = jnp.asarray(rs.randn(4, 256).astype(np.float32))
    q, s, m = quantize_rowwise_int8_np(w)
    y = w8a8_linear_ref(x, jnp.asarray(q), jnp.asarray(s), jnp.asarray(m))
    y_ref = x @ w.T
    rel = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.03, rel


@pytest.mark.parametrize("talker_hidden", [None, 320])
def test_kernel_matches_mirror_greedy(talker_hidden):
    params, kp, ch, c0 = _setup(talker_hidden=talker_hidden)
    ng = TINY.num_code_groups - 1
    seen = jnp.zeros((ng, TINY.vocab_size), jnp.bool_)
    key = jax.random.PRNGKey(7)
    t0 = jnp.float32(0.0)

    codes_k, esum_k, seen_k = predict_frame_kernel(
        kp, ch, c0, key, t0, seen, TINY, interpret=True
    )
    codes_m, esum_m, seen_m = predict_frame_w8a8_ref(
        kp, ch, c0, key, t0, seen, TINY
    )
    assert codes_k.shape == (ng,)
    np.testing.assert_array_equal(np.asarray(codes_k), np.asarray(codes_m))
    np.testing.assert_allclose(
        np.asarray(esum_k), np.asarray(esum_m), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(seen_k), np.asarray(seen_m))


def test_kernel_respects_preseen_penalty():
    """Pre-seen codes get penalized identically in kernel and mirror."""
    params, kp, ch, c0 = _setup(seed=3)
    ng = TINY.num_code_groups - 1
    key = jax.random.PRNGKey(9)
    t0 = jnp.float32(0.0)
    base, _, _ = predict_frame_w8a8_ref(
        kp, ch, c0, key, t0, jnp.zeros((ng, TINY.vocab_size), jnp.bool_), TINY
    )
    # mark the greedy winners as seen with a big penalty -> choices change
    seen = jnp.zeros((ng, TINY.vocab_size), jnp.bool_)
    for k in range(ng):
        seen = seen.at[k, base[k]].set(True)
    codes_k, _, seen_k = predict_frame_kernel(
        kp, ch, c0, key, t0, seen, TINY, repetition_penalty=1e6, interpret=True
    )
    codes_m, _, seen_m = predict_frame_w8a8_ref(
        kp, ch, c0, key, t0, seen, TINY, repetition_penalty=1e6
    )
    np.testing.assert_array_equal(np.asarray(codes_k), np.asarray(codes_m))
    np.testing.assert_array_equal(np.asarray(seen_k), np.asarray(seen_m))
    assert not np.array_equal(np.asarray(codes_k), np.asarray(base))


def test_kernel_no_tracking_mode():
    """seen_cp=None (generate_stream mode): no penalty, seen returns None."""
    params, kp, ch, c0 = _setup(seed=5)
    codes, esum, seen = predict_frame_kernel(
        kp, ch, c0, jax.random.PRNGKey(0), jnp.float32(0.0), None, TINY,
        interpret=True,
    )
    codes_m, esum_m, seen_m = predict_frame_w8a8_ref(
        kp, ch, c0, jax.random.PRNGKey(0), jnp.float32(0.0), None, TINY
    )
    assert seen is None and seen_m is None
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_m))


def test_kernel_sampling_path_runs():
    """T>0 exercises the gumbel path. The interpreter's prng_random_bits
    returns all zeros (constant gumbel), so noise/seed variation is only
    verifiable on hardware — scripts/exp_cp_kernel.py asserts seed-to-seed
    variation on the real chip. Here: valid codes and no NaN poisoning."""
    params, kp, ch, c0 = _setup(seed=11)
    ng = TINY.num_code_groups - 1
    seen = jnp.zeros((ng, TINY.vocab_size), jnp.bool_)
    hot, esum, _ = predict_frame_kernel(
        kp, ch, c0, jax.random.PRNGKey(0), jnp.float32(20.0), seen, TINY,
        interpret=True,
    )
    c = np.asarray(hot)
    assert (c >= 0).all() and (c < TINY.vocab_size).all()
    assert np.isfinite(np.asarray(esum)).all()


def test_decode_loop_with_kernel_attached():
    """End-to-end: stream_codes with the kernel subtree attached (interpret
    mode on CPU) emits valid deterministic frames, and the batched path
    silently strips the kernel."""
    from qwen3_tts_tpu.models import generate as G
    from qwen3_tts_tpu.models import prompt as P
    from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_models
    from qwen3_tts_tpu.ops.pallas.cp_megakernel import build_cp_kernel_params

    cfg, params, cp_params = tiny_models()
    kp = jax.device_put(
        build_cp_kernel_params(cp_params, cfg.code_predictor_config)
    )
    cp_k = dict(cp_params)
    cp_k["kernel"] = kp
    pd = P.assemble_prompt(params, cfg, FakeByteTokenizer(), "hi", speaker="aiden")

    def run():
        return G.generate_codes(
            params, cp_k, cfg, pd, temperature=0.0, max_tokens=6, chunk_steps=3
        )

    frames = run()
    assert frames.shape[1] == cfg.code_predictor_config.num_code_groups
    assert frames.shape[0] >= 1
    assert (frames[:, 1:] >= 0).all()
    assert (frames[:, 1:] < cfg.code_predictor_config.vocab_size).all()
    np.testing.assert_array_equal(frames, run())  # greedy deterministic


def test_mirror_close_to_dense_fp32():
    """W8A8 logits track the dense fp32 code predictor: greedy codes mostly
    agree on random weights (quantization noise can flip near-ties)."""
    params, kp, ch, c0 = _setup(seed=2)
    ng = TINY.num_code_groups - 1
    key = jax.random.PRNGKey(21)
    t0 = jnp.float32(0.0)
    seen = jnp.zeros((ng, TINY.vocab_size), jnp.bool_)
    codes_d, esum_d, _ = cp_mod.predict_frame(
        params, ch, c0, key, t0, seen, TINY
    )
    codes_m, esum_m, _ = predict_frame_w8a8_ref(
        kp, ch, c0, key, t0, seen, TINY
    )
    # embed sums only diverge through code disagreements; require most codes equal
    agree = (np.asarray(codes_d) == np.asarray(codes_m)).mean()
    assert agree >= 0.65, (codes_d, codes_m)
