"""Parity tests for the fused ConvNeXt-upsample Pallas kernel
(ops/pallas/upsample_kernel.py) against the jnp path it replaces
(causal_transpose_conv1d + convnext_block, the models/vocoder.py
decode_frames upsample loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.ops.conv import causal_transpose_conv1d, convnext_block
from qwen3_tts_tpu.ops.pallas.upsample_kernel import (
    build_upsample_stage_params,
    upsample_stage_fused,
)


def make_stage(key, c, dtype=jnp.float32):
    ks = jax.random.split(key, 6)

    def dense(k, o, i):
        k1, k2 = jax.random.split(k)
        return {
            "w": (jax.random.normal(k1, (o, i)) * 0.1).astype(dtype),
            "b": (jax.random.normal(k2, (o,)) * 0.1).astype(dtype),
        }

    return {
        "tconv": {
            "w": (jax.random.normal(ks[0], (2, c, c)) * 0.1).astype(dtype),
            "b": (jax.random.normal(ks[1], (c,)) * 0.1).astype(dtype),
        },
        "convnext": {
            "dwconv": {
                "w": (jax.random.normal(ks[2], (7, 1, c)) * 0.2).astype(dtype),
                "b": (jax.random.normal(ks[3], (c,)) * 0.1).astype(dtype),
            },
            "norm": {
                "w": 1.0 + 0.1 * jax.random.normal(ks[4], (c,)).astype(dtype),
                "b": (jax.random.normal(ks[5], (c,)) * 0.1).astype(dtype),
            },
            "pwconv1": dense(jax.random.fold_in(key, 1), 4 * c, c),
            "pwconv2": dense(jax.random.fold_in(key, 2), c, 4 * c),
            "gamma": (jnp.full((c,), 0.01, dtype)),
        },
    }


def ref_stage(stage, x):
    h = causal_transpose_conv1d(stage["tconv"], x, stride=2)
    return convnext_block(stage["convnext"], h)


@pytest.mark.parametrize(
    "c,t,b",
    [(128, 26, 1), (256, 53, 2), (128, 8, 1),
     # near-instant EOS utterances: T <= 3 shifts every row out of some
     # taps — sh() must truncate to T rows, not emit a (k, C) block
     (128, 1, 1), (128, 2, 1), (128, 3, 1)],
)
def test_upsample_stage_parity(c, t, b):
    key = jax.random.PRNGKey(c + t)
    stage = make_stage(key, c)
    x = jax.random.normal(jax.random.fold_in(key, 9), (b, t, c), jnp.float32)

    want = ref_stage(stage, x)
    kp = build_upsample_stage_params(stage, weight_dtype=np.float32)
    got = upsample_stage_fused(
        kp, x, compute_dtype=jnp.float32, interpret=True
    )

    assert got.shape == want.shape == (b, 2 * t, c)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_two_stage_chain_matches_decode_loop():
    """Chaining two fused stages == the decode_frames upsample loop."""
    c = 128
    key = jax.random.PRNGKey(3)
    stages = [make_stage(jax.random.fold_in(key, i), c) for i in range(2)]
    x = jax.random.normal(jax.random.fold_in(key, 7), (1, 19, c), jnp.float32)

    want = x
    for s in stages:
        want = ref_stage(s, want)

    got = x
    for s in stages:
        kp = build_upsample_stage_params(s, weight_dtype=np.float32)
        got = upsample_stage_fused(
            kp, got, compute_dtype=jnp.float32, interpret=True
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )


def test_initial_conv_fold_parity():
    """The last stage's kernel with folded initial_conv == jnp stage +
    left_pad_conv1d."""
    from qwen3_tts_tpu.ops.conv import left_pad_conv1d

    c, cic, t = 128, 256, 23
    key = jax.random.PRNGKey(11)
    stage = make_stage(key, c)
    k1, k2 = jax.random.split(jax.random.fold_in(key, 5))
    ic = {
        "w": (jax.random.normal(k1, (7, c, cic)) * 0.1).astype(jnp.float32),
        "b": (jax.random.normal(k2, (cic,)) * 0.1).astype(jnp.float32),
    }
    x = jax.random.normal(jax.random.fold_in(key, 9), (1, t, c), jnp.float32)

    want = left_pad_conv1d(ic, ref_stage(stage, x))
    kp = build_upsample_stage_params(
        stage, weight_dtype=np.float32, initial_conv=ic
    )
    got = upsample_stage_fused(kp, x, compute_dtype=jnp.float32, interpret=True)

    assert got.shape == want.shape == (1, 2 * t, cic)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )


def test_batch_lifted_kernel_path_parity(monkeypatch):
    """QWEN3TTS_VOCODER_KERNEL_BATCH=1 lifts the B=1 gate on the upsample +
    SEANet kernels (the serving-batch A/B knob); decode_frames stays
    parity-correct at B>1 with every kernel engaged."""
    import dataclasses

    from qwen3_tts_tpu.config import TokenizerDecoderConfig
    from qwen3_tts_tpu.models import vocoder as voc
    from qwen3_tts_tpu.ops.pallas.vocoder_kernels import (
        build_vocoder_kernel_params,
    )

    monkeypatch.setenv("QWEN3TTS_VOCODER_KERNEL_BATCH", "1")
    cfg = dataclasses.replace(
        TokenizerDecoderConfig(), num_hidden_layers=2, latent_dim=128,
        codebook_dim=64, decoder_dim=192, hidden_size=64,
        intermediate_size=128, num_attention_heads=2, head_dim=32,
        upsample_rates=(2, 2), upsampling_ratios=(2, 2),
    )
    params = voc.init_vocoder_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    kp = build_vocoder_kernel_params(params, cfg, weight_dtype=np.float32)
    assert kp["upsample"] is not None and "ic_w" in kp["upsample"][-1]
    codes = jax.random.randint(
        jax.random.PRNGKey(1), (2, cfg.num_quantizers, 11), 0,
        cfg.codebook_size, jnp.int32,
    )
    fused = voc.decode_frames(
        dict(params, kernel=kp), codes, cfg,
        kernel_compute_dtype=jnp.float32, kernel_interpret=True,
    )
    plain = voc.decode_frames(params, codes, cfg)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), rtol=5e-4, atol=5e-5
    )


def test_rvq_onehot_formulation_exact(monkeypatch):
    """QWEN3TTS_RVQ_ONEHOT=1 (MXU one-hot matmul form of the RVQ decode) is
    bitwise-exact vs the gather form for in-range codes."""
    from qwen3_tts_tpu.config import TokenizerDecoderConfig
    from qwen3_tts_tpu.models import vocoder as voc

    cfg = TokenizerDecoderConfig()
    params = voc.init_vocoder_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    codes = jax.random.randint(
        jax.random.PRNGKey(1), (2, cfg.num_quantizers, 9), 0,
        cfg.codebook_size, jnp.int32,
    )
    a = voc.rvq_decode(params["quantizer"], codes)
    monkeypatch.setenv("QWEN3TTS_RVQ_ONEHOT", "1")
    b = voc.rvq_decode(params["quantizer"], codes)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_builder_rejects_unexpected_layout():
    stage = make_stage(jax.random.PRNGKey(0), 64)
    stage["tconv"]["w"] = jnp.zeros((3, 64, 64))  # k != stride
    with pytest.raises(ValueError):
        build_upsample_stage_params(stage)
