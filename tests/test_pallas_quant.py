"""Pallas quantized-matmul kernel tests (interpret mode on CPU) against the
jnp reference path and full-precision ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.ops.pallas.quant_matmul import (
    add_kernel_layout,
    kernel_lane_order,
    permute_activations,
    quantized_matmul,
    quantized_matmul_pallas,
    repack_for_kernel,
)
from qwen3_tts_tpu.ops.quant import (
    dequantize_np,
    quantize_np,
    quantized_matmul_ref,
    unpack_bits_np,
)


def test_kernel_lane_order_is_permutation():
    perm = kernel_lane_order(256, 64)
    assert sorted(perm.tolist()) == list(range(256))
    # lane j = i*G + g maps back to original g*64 + i
    g_count = 256 // 64
    assert perm[0] == 0
    assert perm[1] == 64  # j=1 -> i=0, g=1 -> orig 64


def test_repack_round_trip():
    """Unpacking the kernel layout column-major reproduces the permuted q."""
    rng = np.random.default_rng(0)
    k, o, g, bits = 256, 8, 64, 4
    w = rng.normal(size=(o, k)).astype(np.float32)
    packed, scales, biases = quantize_np(w, bits=bits, group_size=g)
    q = unpack_bits_np(packed, bits, k)
    kl = repack_for_kernel(packed, bits, g)
    per = 32 // bits
    w_words = k // per
    # word w, bits p -> lane p*W + w; lane j corresponds to original perm[j]
    perm = kernel_lane_order(k, g)
    for p in range(per):
        vals = (kl >> np.uint32(p * bits)) & np.uint32((1 << bits) - 1)
        lanes = p * w_words + np.arange(w_words)
        np.testing.assert_array_equal(vals, q[:, perm[lanes]])


def test_permute_activations_matches_lane_order():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 256)).astype(np.float32)
    perm = kernel_lane_order(256, 64)
    xp = np.asarray(permute_activations(jnp.asarray(x), 64))
    np.testing.assert_array_equal(xp, x[:, perm])


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("m", [1, 7])
def test_pallas_kernel_matches_reference(bits, m):
    rng = np.random.default_rng(0)
    k, o, g = 256, 512, 64
    w = rng.normal(size=(o, k)).astype(np.float32)
    x = rng.normal(size=(m, k)).astype(np.float32)
    packed, scales, biases = quantize_np(w, bits=bits, group_size=g)
    kl = repack_for_kernel(packed, bits, g)

    ref = quantized_matmul_ref(
        jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(biases),
        bits=bits, group_size=g,
    )
    out = quantized_matmul_pallas(
        jnp.asarray(x), jnp.asarray(kl), jnp.asarray(scales), jnp.asarray(biases),
        bits=bits, group_size=g, tile_out=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    wd = dequantize_np(packed, scales, biases, bits=bits, group_size=g)
    np.testing.assert_allclose(np.asarray(ref), x @ wd.T, rtol=1e-4, atol=1e-4)


def test_add_kernel_layout_stacked():
    rng = np.random.default_rng(2)
    nl, o, k, g = 3, 64, 128, 64
    entries = [quantize_np(rng.normal(size=(o, k)).astype(np.float32), 4, g) for _ in range(nl)]
    stacked = {
        "wq": np.stack([e[0] for e in entries]),
        "scales": np.stack([e[1] for e in entries]),
        "biases": np.stack([e[2] for e in entries]),
    }
    out = add_kernel_layout(stacked, 4, g)
    assert out["wq_kl"].shape == stacked["wq"].shape
    for i in range(nl):
        np.testing.assert_array_equal(
            out["wq_kl"][i], repack_for_kernel(entries[i][0], 4, g)
        )
    # 6-bit: no kernel layout
    assert "wq_kl" not in add_kernel_layout({"wq": stacked["wq"]}, 6, g)


def test_dispatch_falls_back_off_tpu():
    """On the CPU backend the dispatcher must use the jnp path (incl. 6-bit)."""
    rng = np.random.default_rng(2)
    k, o, g = 128, 64, 64
    w = rng.normal(size=(o, k)).astype(np.float32)
    x = rng.normal(size=(2, 5, k)).astype(np.float32)  # leading batch dims
    for bits in (4, 6):
        packed, scales, biases = quantize_np(w, bits=bits, group_size=g)
        params = {
            "wq": jnp.asarray(packed),
            "scales": jnp.asarray(scales),
            "biases": jnp.asarray(biases),
        }
        out = quantized_matmul(jnp.asarray(x), params, bits=bits, group_size=g)
        wd = dequantize_np(packed, scales, biases, bits=bits, group_size=g)
        assert out.shape == (2, 5, o)
        np.testing.assert_allclose(np.asarray(out), x @ wd.T, rtol=1e-4, atol=1e-4)


def test_linear_quantized_path():
    """ops.linear.linear with packed params equals dense linear within
    quantization error."""
    from qwen3_tts_tpu.ops.linear import linear

    rng = np.random.default_rng(3)
    k, o = 128, 64
    w = rng.normal(size=(o, k)).astype(np.float32)
    x = rng.normal(size=(1, 4, k)).astype(np.float32)
    packed, scales, biases = quantize_np(w, bits=8, group_size=64)
    qp = {
        "wq": jnp.asarray(packed),
        "scales": jnp.asarray(scales),
        "biases": jnp.asarray(biases),
    }
    yq = np.asarray(linear(qp, jnp.asarray(x)))
    yd = np.asarray(linear({"w": jnp.asarray(w)}, jnp.asarray(x)))
    assert np.max(np.abs(yq - yd)) < 0.2


def test_int8_kernel_matches_jnp_path():
    from qwen3_tts_tpu.ops.pallas.quant_matmul import (
        int8_matmul,
        quantized_matmul_int8_pallas,
        repack_int8_for_kernel,
    )
    from qwen3_tts_tpu.ops.quant import quantize_int8_np

    rng = np.random.default_rng(4)
    k, o, g = 256, 512, 64
    w = rng.normal(size=(o, k)).astype(np.float32)
    x = rng.normal(size=(3, k)).astype(np.float32)
    w8, scales, biases = quantize_int8_np(w, g)

    # dequantized ground truth (8-bit error << 1e-2 for this range)
    wf = (w8.reshape(o, k // g, g).astype(np.float32) * scales[..., None]
          + biases[..., None]).reshape(o, k)
    expected = x @ wf.T

    params = {
        "w8": jnp.asarray(w8),
        "scales": jnp.asarray(scales),
        "biases": jnp.asarray(biases),
    }
    y_jnp = np.asarray(int8_matmul(jnp.asarray(x), params))
    np.testing.assert_allclose(y_jnp, expected, rtol=1e-4, atol=1e-4)

    kl = repack_int8_for_kernel(w8, g)
    y_k = np.asarray(
        quantized_matmul_int8_pallas(
            jnp.asarray(x), jnp.asarray(kl), jnp.asarray(scales),
            jnp.asarray(biases), group_size=g, tile_out=128, interpret=True,
        )
    )
    np.testing.assert_allclose(y_k, expected, rtol=1e-4, atol=1e-4)


def test_apply_int8_quantization_tree():
    import jax

    from qwen3_tts_tpu.models import talker as talker_mod
    from qwen3_tts_tpu.ops.quant import apply_int8_quantization
    from qwen3_tts_tpu.testing import tiny_talker_config

    config = tiny_talker_config()
    params = jax.tree.map(
        np.asarray, talker_mod.init_talker_params(config, jax.random.PRNGKey(0))
    )
    q = apply_int8_quantization(params, kernel_layout=False)
    assert "w8" in q["layers"]["qkv_proj"]
    assert q["layers"]["qkv_proj"]["w8"].dtype == np.uint8
    assert "w8" in q["codec_head"]
    # forward still works and is close to dense
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.linear import linear

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, config.hidden_size)), jnp.float32
    )
    yd = np.asarray(linear(jax.tree.map(jnp.asarray, params["codec_head"]), x))
    yq = np.asarray(linear(jax.tree.map(jnp.asarray, q["codec_head"]), x))
    assert np.max(np.abs(yd - yq)) < 0.1
