"""Parity tests for the pre-transformer mega-kernel
(ops/pallas/pretransformer_kernel.py) against the jnp path it replaces
(models/vocoder.py::pre_transformer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.config import TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.ops.pallas.pretransformer_kernel import (
    build_pretransformer_kernel_params_device,
    pre_transformer_fused,
)

CFG = TokenizerDecoderConfig(
    codebook_size=32,
    codebook_dim=16,
    num_quantizers=4,
    num_semantic_quantizers=1,
    latent_dim=24,
    decoder_dim=32,
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=2,
    head_dim=16,
    intermediate_size=48,
    upsample_rates=(8, 5, 4, 3),
    upsampling_ratios=(2, 2),
)


def _params():
    return voc.init_vocoder_params(CFG, jax.random.PRNGKey(0), jnp.float32)


@pytest.mark.parametrize("t,b", [(7, 1), (26, 2), (1, 1)])
def test_fused_matches_jnp(t, b):
    params = _params()
    pt = params["pre_transformer"]
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, CFG.latent_dim))
    ref = voc.pre_transformer(pt, x, CFG)
    kp = build_pretransformer_kernel_params_device(
        pt, CFG, weight_dtype=jnp.float32
    )
    got = pre_transformer_fused(
        kp, x,
        nl=CFG.num_hidden_layers, nh=CFG.num_attention_heads,
        hd=CFG.head_dim, eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        compute_dtype=jnp.float32, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_decode_frames_uses_fused_pretransformer():
    """decode_frames with the full kernel subtree (blocks + pre-transformer)
    matches the plain path at fp32."""
    from qwen3_tts_tpu.ops.pallas.vocoder_kernels import (
        build_vocoder_kernel_params,
    )

    params = _params()
    codes = jax.random.randint(
        jax.random.PRNGKey(2), (1, CFG.num_quantizers, 5), 0, CFG.codebook_size
    )
    ref = voc.decode_frames(params, codes, CFG)
    from qwen3_tts_tpu.ops.pallas.pretransformer_kernel import (
        build_pretransformer_packed_params_device,
    )

    kparams = dict(params)
    kparams["kernel"] = build_vocoder_kernel_params(
        params, CFG, weight_dtype=np.float32
    )
    # decode_frames now runs the head-packed variant; rebuild at fp32
    kparams["kernel"]["pre_transformer"] = (
        build_pretransformer_packed_params_device(
            params["pre_transformer"], CFG, weight_dtype=jnp.float32
        )
    )
    got = voc.decode_frames(
        kparams, codes, CFG, kernel_compute_dtype=jnp.float32,
        kernel_interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_biased_attention_falls_back():
    """A pre-transformer with attention biases is refused by the builder and
    the subtree builder degrades to None (jnp path)."""
    from qwen3_tts_tpu.ops.pallas.vocoder_kernels import _pretransformer_subtree

    params = _params()
    pt = jax.tree.map(lambda x: x, params["pre_transformer"])
    ql = dict(pt["layers"]["q_proj"])
    ql["b"] = jnp.zeros(
        (CFG.num_hidden_layers, CFG.num_attention_heads * CFG.head_dim)
    )
    pt["layers"] = dict(pt["layers"], q_proj=ql)
    assert _pretransformer_subtree(dict(params, pre_transformer=pt), CFG) is None


def test_packed_strip_tiling_matches_jnp(monkeypatch):
    """Multi-strip scores (the T>128 regime at real dims) match the jnp
    path. The tiny config only strips at huge T, so shrink the strip budget
    to force 2 strips (256 + 16 rows) at T=136; a fresh (unseen) shape
    guarantees a retrace under the patched budget."""
    from qwen3_tts_tpu.ops.pallas import pretransformer_kernel as ptk

    monkeypatch.setattr(ptk, "_STRIP_BYTES", 1)
    params = _params()
    pt = params["pre_transformer"]
    t = 136  # nrows = nh*t = 272 > the 256-row floor -> 2 strips
    x = jax.random.normal(jax.random.PRNGKey(3), (1, t, CFG.latent_dim))
    ref = voc.pre_transformer(pt, x, CFG)
    kp = ptk.build_pretransformer_packed_params_device(
        pt, CFG, weight_dtype=jnp.float32
    )
    got = ptk.pre_transformer_packed(
        kp, x,
        nl=CFG.num_hidden_layers, nh=CFG.num_attention_heads,
        hd=CFG.head_dim, eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        compute_dtype=jnp.float32, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_decode_frames_packed_gate():
    """decode_frames keeps the packed kernel through PACKED_T_CAP and warns
    (once) + falls back past it."""
    import warnings

    from qwen3_tts_tpu.ops.pallas.pretransformer_kernel import PACKED_T_CAP

    assert PACKED_T_CAP == 512
    voc._warn_pretransformer_fallback.cache_clear()
    params = _params()
    codes = jax.random.randint(
        jax.random.PRNGKey(4),
        (1, CFG.num_quantizers, PACKED_T_CAP + 1),
        0,
        CFG.codebook_size,
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        # no kernel subtree -> no warn (nothing was dropped)
        voc.decode_frames(params, codes, CFG)
        assert not [w for w in rec if "pre-transformer" in str(w.message)]
        kparams = dict(params, kernel={"pre_transformer": object()})
        try:
            voc.decode_frames(kparams, codes, CFG, kernel_interpret=True)
        except Exception:
            pass  # fake subtree never reaches the kernel; the warn already fired
        assert [w for w in rec if f"> {PACKED_T_CAP}" in str(w.message)]

    # the B*T_pad rows cap must ALSO warn (not silently drop the kernel):
    # B=9 x T_pad 512 = 4608 > 4096 while T stays within the cap
    voc._warn_pretransformer_fallback.cache_clear()
    assert not voc.pt_kernel_shape_ok(9, PACKED_T_CAP)
    wide = jax.random.randint(
        jax.random.PRNGKey(6), (9, CFG.num_quantizers, PACKED_T_CAP), 0,
        CFG.codebook_size,
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        monkeypatch_env = __import__("os").environ
        monkeypatch_env["QWEN3TTS_VOCODER_KERNEL_BATCH"] = "pt"
        try:
            voc.decode_frames(
                dict(params, kernel={"pre_transformer": object()}), wide, CFG,
                kernel_interpret=True,
            )
        except Exception:
            pass
        finally:
            monkeypatch_env.pop("QWEN3TTS_VOCODER_KERNEL_BATCH", None)
        assert [w for w in rec if "residual-scratch cap" in str(w.message)]


def test_decode_frames_batched_packed_routing(monkeypatch):
    """With QWEN3TTS_VOCODER_KERNEL_BATCH=1 a B>1 decode routes the
    pre-transformer through the packed kernel (layer-outer grid, weights
    fetched once per layer) and matches the jnp path."""
    from qwen3_tts_tpu.ops.pallas.pretransformer_kernel import (
        build_pretransformer_packed_params_device,
    )

    monkeypatch.setenv("QWEN3TTS_VOCODER_KERNEL_BATCH", "1")
    params = _params()
    codes = jax.random.randint(
        jax.random.PRNGKey(5), (3, CFG.num_quantizers, 11), 0, CFG.codebook_size
    )
    ref = voc.decode_frames(params, codes, CFG)
    kern = {"pre_transformer": build_pretransformer_packed_params_device(
        params["pre_transformer"], CFG, weight_dtype=jnp.float32)}
    got = voc.decode_frames(
        dict(params, kernel=kern), codes, CFG,
        kernel_compute_dtype=jnp.float32, kernel_interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-5
    )


@pytest.mark.parametrize("t,b", [(7, 1), (26, 2), (96, 1), (1, 1)])
def test_packed_matches_jnp(t, b):
    """Head-packed variant (two big stacked matmuls for scores/AV) matches
    the jnp pre-transformer at fp32, including T past the old T<=64 gate."""
    from qwen3_tts_tpu.ops.pallas.pretransformer_kernel import (
        build_pretransformer_packed_params_device,
        pre_transformer_packed,
    )

    params = _params()
    pt = params["pre_transformer"]
    x = jax.random.normal(jax.random.PRNGKey(2), (b, t, CFG.latent_dim))
    ref = voc.pre_transformer(pt, x, CFG)
    kp = build_pretransformer_packed_params_device(
        pt, CFG, weight_dtype=jnp.float32
    )
    got = pre_transformer_packed(
        kp, x,
        nl=CFG.num_hidden_layers, nh=CFG.num_attention_heads,
        hd=CFG.head_dim, eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        compute_dtype=jnp.float32, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-5)
