"""Parity tests for the fused SEANet decoder-block Pallas kernel
(ops/pallas/vocoder_kernels.py) against the jnp path it replaces
(ops/conv.py composition used by models/vocoder.py decode_frames)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.ops.conv import (
    causal_transpose_conv1d,
    snake_beta,
)
from qwen3_tts_tpu.models.vocoder import _residual_unit
from qwen3_tts_tpu.ops.pallas.vocoder_kernels import (
    DILATIONS,
    build_seanet_block_kernel_params,
    build_vocoder_kernel_params,
    seanet_block_fused,
)


def make_block(key, cin, cout, rate, dtype=jnp.float32):
    ks = jax.random.split(key, 16)

    def conv(k, width, ci, co):
        k1, k2 = jax.random.split(k)
        return {
            "w": (jax.random.normal(k1, (width, ci, co)) * 0.1).astype(dtype),
            "b": (jax.random.normal(k2, (co,)) * 0.1).astype(dtype),
        }

    def snake(k, c):
        k1, k2 = jax.random.split(k)
        return {
            "alpha": (jax.random.normal(k1, (c,)) * 0.2).astype(dtype),
            "beta": (jax.random.normal(k2, (c,)) * 0.2).astype(dtype),
        }

    units = [
        {
            "act1": snake(ks[4 + 3 * j], cout),
            "conv1": conv(ks[5 + 3 * j], 7, cout, cout),
            "act2": snake(jax.random.fold_in(ks[4 + 3 * j], 7), cout),
            "conv2": conv(ks[6 + 3 * j], 1, cout, cout),
        }
        for j in range(3)
    ]
    return {"snake": snake(ks[0], cin), "up": conv(ks[1], 2 * rate, cin, cout), "units": units}


def ref_block(block, x, rate):
    w = snake_beta(block["snake"], x)
    w = causal_transpose_conv1d(block["up"], w, stride=rate)
    for unit, dil in zip(block["units"], DILATIONS):
        w = _residual_unit(unit, w, dil)
    return w


@pytest.mark.parametrize("rate,cin,cout,t,b", [(4, 16, 8, 50, 1), (3, 8, 8, 37, 2)])
def test_fused_block_matches_jnp(rate, cin, cout, t, b):
    key = jax.random.PRNGKey(0)
    block = make_block(key, cin, cout, rate)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, cin), jnp.float32)

    ref = ref_block(block, x, rate)
    kp = jax.tree.map(jnp.asarray, build_seanet_block_kernel_params(block, rate))
    got = seanet_block_fused(
        kp, x, rate=rate, cout=cout, compute_dtype=jnp.float32, interpret=True
    )
    assert got.shape == ref.shape == (b, t * rate, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_block_bf16_polynomial_snake_close():
    """The production (bf16 compute) kernel path swaps jnp.sin for the
    range-reduced polynomial snake (_snake_fast — Mosaic's sin lowering was
    57% of the units kernel on v5e, scripts/exp_units_variants.py). It must
    stay within the bf16 production tier of the exact jnp block: the
    on-chip bench gate is 5% rel RMS; assert 2% here."""
    rate, cin, cout, t = 4, 16, 8, 50
    key = jax.random.PRNGKey(5)
    block = make_block(key, cin, cout, rate)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, t, cin), jnp.float32)
    ref = np.asarray(ref_block(block, x, rate), np.float64)
    kp = jax.tree.map(jnp.asarray, build_seanet_block_kernel_params(block, rate))
    got = np.asarray(
        seanet_block_fused(
            kp, x, rate=rate, cout=cout, compute_dtype=jnp.bfloat16,
            interpret=True,
        ),
        np.float64,
    )
    rel = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) or 1)
    assert rel < 0.02, rel


def test_fast_snake_accuracy():
    """_snake_fast vs the exact snake over a wide argument range: ~3e-4 abs
    (f32 range reduction + the polynomial's ~1e-5), far inside bf16
    resolution."""
    from qwen3_tts_tpu.ops.pallas.vocoder_kernels import _snake, _snake_fast

    x = jnp.asarray(np.linspace(-200, 200, 200001), jnp.float32)
    a = jnp.float32(1.7)
    binv = jnp.float32(0.8)
    d = np.abs(np.asarray(_snake(x, a, binv) - _snake_fast(x, a, binv)))
    assert d.max() < 1e-3, d.max()


def test_fused_block_tiled_matches_untiled():
    """Multi-tile halo recompute must be exact: small forced tile == one tile."""
    rate, cin, cout, t = 5, 8, 16, 64
    key = jax.random.PRNGKey(3)
    block = make_block(key, cin, cout, rate)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, t, cin), jnp.float32)
    kp = jax.tree.map(jnp.asarray, build_seanet_block_kernel_params(block, rate))
    one = seanet_block_fused(
        kp, x, rate=rate, cout=cout, compute_dtype=jnp.float32, tile=64, interpret=True
    )
    tiled = seanet_block_fused(
        kp, x, rate=rate, cout=cout, compute_dtype=jnp.float32, tile=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(one), atol=1e-6, rtol=1e-6)
    ref = ref_block(block, x, rate)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_decode_frames_kernel_path_matches_jnp():
    """decode_frames with params['kernel'] matches the plain path (fp32)."""
    from qwen3_tts_tpu.config import TokenizerDecoderConfig
    from qwen3_tts_tpu.models import vocoder as voc

    cfg = TokenizerDecoderConfig(
        codebook_size=32,
        codebook_dim=16,
        num_quantizers=4,
        num_semantic_quantizers=1,
        latent_dim=16,
        decoder_dim=32,
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        head_dim=8,
        intermediate_size=32,
        upsample_rates=(8, 5, 4, 3),
        upsampling_ratios=(2, 2),
    )
    params = voc.init_vocoder_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    codes = jax.random.randint(
        jax.random.PRNGKey(1), (1, cfg.num_quantizers, 7), 0, cfg.codebook_size
    )
    ref = voc.decode_frames(params, codes, cfg)

    kparams = dict(params)
    kparams["kernel"] = jax.tree.map(
        jnp.asarray,
        build_vocoder_kernel_params(params, cfg, weight_dtype=np.float32),
    )
    got = voc.decode_frames(
        kparams, codes, cfg, kernel_compute_dtype=jnp.float32, kernel_interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_device_builder_matches_host():
    """build_seanet_block_kernel_params_device (jnp) == host numpy builder."""
    from qwen3_tts_tpu.ops.pallas.vocoder_kernels import (
        build_seanet_block_kernel_params_device,
    )

    block = make_block(jax.random.PRNGKey(5), 16, 8, 4)
    host = build_seanet_block_kernel_params(block, 4, np.float32)
    dev = jax.jit(
        lambda b: build_seanet_block_kernel_params_device(b, 4, jnp.float32)
    )(block)
    assert set(host) == set(dev)
    for k in host:
        np.testing.assert_allclose(
            np.asarray(dev[k]), host[k], atol=1e-6, rtol=1e-6, err_msg=k
        )
