"""Group-affine quantization tests: pack/unpack round-trip, quantize error
bounds, numpy/jnp consistency, quantized matmul."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.ops import quant


@pytest.mark.parametrize("bits", [2, 4, 6, 8])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(0)
    n = 128
    q = rng.integers(0, 2**bits, size=(4, n), dtype=np.uint32)
    packed = quant.pack_bits_np(q, bits)
    assert packed.shape == (4, n * bits // 32)
    out = quant.unpack_bits_np(packed, bits, n)
    np.testing.assert_array_equal(out, q)


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_quantize_dequantize_error(bits):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 128)).astype(np.float32)
    packed, scales, biases = quant.quantize_np(w, bits=bits, group_size=64)
    w2 = quant.dequantize_np(packed, scales, biases, bits=bits, group_size=64)
    # max error is half a quantization step per group
    step = scales.max()
    assert np.abs(w - w2).max() <= step * 0.51 + 1e-6


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_jnp_unpack_matches_numpy(bits):
    rng = np.random.default_rng(2)
    n = 192 if bits == 6 else 128
    q = rng.integers(0, 2**bits, size=(3, n), dtype=np.uint32)
    packed = quant.pack_bits_np(q, bits)
    out = np.asarray(quant.unpack_bits_jnp(jnp.asarray(packed), bits, n))
    np.testing.assert_array_equal(out, q)


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_quantized_matmul_close(bits):
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.1
    x = rng.standard_normal((5, 128)).astype(np.float32)
    packed, scales, biases = quant.quantize_np(w, bits=bits, group_size=64)
    y_ref = x @ quant.dequantize_np(packed, scales, biases, bits, 64).T
    y = np.asarray(
        quant.quantized_matmul_ref(
            jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scales),
            jnp.asarray(biases), bits=bits, group_size=64,
        )
    )
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_constant_group_quantization():
    w = np.full((2, 64), 3.25, dtype=np.float32)
    packed, scales, biases = quant.quantize_np(w, bits=4, group_size=64)
    w2 = quant.dequantize_np(packed, scales, biases, bits=4, group_size=64)
    np.testing.assert_allclose(w2, w, atol=1e-6)


# ---------------------------------------------------------------------------
# Quantized embeddings / stacked tables (reference quantizes Embedding too,
# Qwen3TTSPipeline.swift:961-980)
# ---------------------------------------------------------------------------

from qwen3_tts_tpu.ops import linear as linear_ops


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_embedding_lookup_packed_matches_dense(bits):
    rng = np.random.default_rng(5)
    w = rng.standard_normal((32, 128)).astype(np.float32) * 0.1
    packed, scales, biases = quant.quantize_np(w, bits=bits, group_size=64)
    entry = {
        "wq": jnp.asarray(packed),
        "scales": jnp.asarray(scales),
        "biases": jnp.asarray(biases),
    }
    ids = jnp.asarray([0, 5, 31, 5])
    out = np.asarray(linear_ops.embedding_lookup(entry, ids))
    dense = quant.dequantize_np(packed, scales, biases, bits, 64)
    np.testing.assert_allclose(out, dense[np.asarray(ids)], rtol=1e-5, atol=1e-6)


def test_embedding_lookup_int8_matches_dense():
    rng = np.random.default_rng(6)
    w = rng.standard_normal((16, 128)).astype(np.float32)
    q, scales, biases = quant.quantize_int8_np(w, group_size=64)
    entry = {
        "w8": jnp.asarray(q),
        "scales": jnp.asarray(scales),
        "biases": jnp.asarray(biases),
    }
    ids = jnp.asarray([3, 0, 15])
    out = np.asarray(linear_ops.embedding_lookup(entry, ids))
    g = w.reshape(16, 2, 64)
    dense = (q.reshape(16, 2, 64).astype(np.float32) * scales[..., None]
             + biases[..., None]).reshape(16, 128)
    np.testing.assert_allclose(out, dense[np.asarray(ids)], rtol=1e-5, atol=1e-6)


def test_table_row_and_matmul_packed():
    rng = np.random.default_rng(7)
    tables = rng.standard_normal((3, 32, 128)).astype(np.float32) * 0.1
    packed = [quant.quantize_np(t, bits=4, group_size=64) for t in tables]
    entry = {
        "wq": jnp.asarray(np.stack([p[0] for p in packed])),
        "scales": jnp.asarray(np.stack([p[1] for p in packed])),
        "biases": jnp.asarray(np.stack([p[2] for p in packed])),
    }
    dense = np.stack([
        quant.dequantize_np(p[0], p[1], p[2], 4, 64) for p in packed
    ])
    row = np.asarray(linear_ops.table_row(entry, jnp.int32(1), jnp.int32(7)))
    np.testing.assert_allclose(row, dense[1, 7], rtol=1e-5, atol=1e-6)
    # batched codes
    rows = np.asarray(
        linear_ops.table_row(entry, jnp.int32(2), jnp.asarray([0, 9]))
    )
    np.testing.assert_allclose(rows, dense[2, [0, 9]], rtol=1e-5, atol=1e-6)
    x = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
    y = np.asarray(linear_ops.table_matmul(entry, jnp.int32(0), x))
    np.testing.assert_allclose(y, np.asarray(x) @ dense[0].T, rtol=1e-4, atol=1e-4)


def test_mixed_quantization_covers_embeddings():
    rng = np.random.default_rng(8)
    tree = {
        "text_embedding": {"w": rng.standard_normal((64, 128)).astype(np.float32)},
        "codec_embedding": {"w": rng.standard_normal((32, 128)).astype(np.float32)},
        "lm_head": {"w": rng.standard_normal((3, 32, 128)).astype(np.float32)},
        "norm": {"w": np.ones((128,), np.float32)},
    }
    out = quant.apply_mixed_quantization(tree, kernel_layout=False)
    for name in ("text_embedding", "codec_embedding", "lm_head"):
        assert "wq" in out[name], name
        assert "w" not in out[name]
    assert "w" in out["norm"]
    # 4x+ memory reduction for the 4-bit tables
    dense_bytes = tree["text_embedding"]["w"].nbytes
    q_bytes = sum(np.asarray(v).nbytes for v in out["text_embedding"].values())
    assert q_bytes < dense_bytes / 3


def test_derive_packed_dims_roundtrip():
    from qwen3_tts_tpu.ops.linear import derive_packed_dims
    rng = np.random.default_rng(9)
    for bits in (4, 6, 8):
        w = rng.standard_normal((8, 192)).astype(np.float32)
        packed, scales, biases = quant.quantize_np(w, bits=bits, group_size=64)
        b2, g2, in2 = derive_packed_dims({"wq": packed, "scales": scales})
        assert (b2, g2, in2) == (bits, 64, 192)


def test_predict_frame_with_quantized_tables():
    """The jnp cp path runs with packed codec_embedding/lm_head stacks."""
    import jax
    from qwen3_tts_tpu.config import CodePredictorConfig
    from qwen3_tts_tpu.models import code_predictor as cp_mod

    cfg = CodePredictorConfig(
        hidden_size=128, num_hidden_layers=1, num_attention_heads=1,
        num_key_value_heads=1, head_dim=128, intermediate_size=128,
        vocab_size=64, num_code_groups=4,
    )
    params = cp_mod.init_cp_params(cfg, 128, jax.random.PRNGKey(0), jnp.float32)
    qparams = quant.apply_mixed_quantization(params, kernel_layout=False)
    assert "wq" in qparams["lm_head"] and "wq" in qparams["codec_embedding"]
    ch = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 128), jnp.float32)
    c0 = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 128), jnp.float32)
    codes, esum, seen = cp_mod.predict_frame(
        qparams, ch, c0, jax.random.PRNGKey(3), jnp.float32(0.0),
        jnp.zeros((3, 64), bool), cfg,
    )
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < 64).all()
    assert np.isfinite(np.asarray(esum)).all()
