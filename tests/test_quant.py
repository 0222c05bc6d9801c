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
