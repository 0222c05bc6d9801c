"""Checkpoint loader tests: reference-format round trips for the talker,
code predictor, and vocoder, plus dequantize-on-load and safetensors I/O."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.config import QuantizationSettings
from qwen3_tts_tpu.io import checkpoint as ckpt
from qwen3_tts_tpu.io import safetensors_io
from qwen3_tts_tpu.models import code_predictor as cp_mod
from qwen3_tts_tpu.models import talker as talker_mod
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.ops.quant import quantize_np
from qwen3_tts_tpu.testing import (
    export_talker_checkpoint,
    export_vocoder_checkpoint,
    tiny_decoder_config,
    tiny_talker_config,
)


def _trees_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _trees_equal(a[k], b[k], f"{path}.{k}")
        elif isinstance(a[k], list):
            for i, (x, y) in enumerate(zip(a[k], b[k])):
                _trees_equal(x, y, f"{path}.{k}[{i}]")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32),
                np.asarray(b[k], np.float32),
                rtol=1e-5,
                atol=1e-6,
                err_msg=f"{path}.{k}",
            )


@pytest.mark.slow
def test_talker_checkpoint_round_trip():
    config = tiny_talker_config()
    params = talker_mod.init_talker_params(config, jax.random.PRNGKey(0))
    cp_params = cp_mod.init_cp_params(
        config.code_predictor_config, config.hidden_size, jax.random.PRNGKey(1)
    )
    weights = export_talker_checkpoint(params, cp_params, config)
    loaded, loaded_cp = ckpt.load_talker_checkpoint(weights, config)
    _trees_equal(jax.tree.map(np.asarray, params), loaded)
    _trees_equal(jax.tree.map(np.asarray, cp_params), loaded_cp)


def test_talker_checkpoint_with_mtp_projection():
    config = tiny_talker_config(
        code_predictor_config=tiny_talker_config().code_predictor_config
    )
    # force hidden mismatch so small_to_mtp_projection exists
    cpc = config.code_predictor_config
    assert cpc.hidden_size != config.hidden_size
    cp_params = cp_mod.init_cp_params(cpc, config.hidden_size, jax.random.PRNGKey(2))
    assert "small_to_mtp_projection" in cp_params
    params = talker_mod.init_talker_params(config, jax.random.PRNGKey(3))
    weights = export_talker_checkpoint(params, cp_params, config)
    _, loaded_cp = ckpt.load_talker_checkpoint(weights, config)
    assert "small_to_mtp_projection" in loaded_cp


def test_dequantize_on_load():
    """uint32-packed .weight/.scales/.biases triples are expanded to fp16
    (reference Qwen3Talker.swift:141-175)."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(16, 64)).astype(np.float32)
    packed, scales, biases = quantize_np(w, bits=4, group_size=64)
    weights = {
        "talker.model.layers.0.self_attn.q_proj.weight": packed,
        "talker.model.layers.0.self_attn.q_proj.scales": scales,
        "talker.model.layers.0.self_attn.q_proj.biases": biases,
    }
    remapped = ckpt.remap_talker_keys(weights)
    dq = ckpt.dequantize_weights(
        remapped, QuantizationSettings(enabled=True, bits=4, group_size=64)
    )
    assert set(dq) == {"layers.0.self_attn.q_proj.weight"}
    assert dq["layers.0.self_attn.q_proj.weight"].dtype == np.float16
    from qwen3_tts_tpu.ops.quant import dequantize_np

    expected = dequantize_np(packed, scales, biases, bits=4, group_size=64)
    np.testing.assert_allclose(
        dq["layers.0.self_attn.q_proj.weight"].astype(np.float32),
        expected,
        rtol=2e-3,
        atol=1e-3,
    )
    # and the dequantized weight approximates the original within half a step
    step = (w.reshape(16, 1, 64).max(-1) - w.reshape(16, 1, 64).min(-1)) / 15
    assert np.all(
        np.abs(dq["layers.0.self_attn.q_proj.weight"].astype(np.float32) - w)
        <= step + 1e-3
    )


def test_prequantized_checkpoint_keeps_packed():
    """With config.quantization set, Linear layers stay packed (wq/scales)."""
    config = tiny_talker_config(
        quantization=QuantizationSettings(enabled=True, bits=4, group_size=64)
    )
    params = talker_mod.init_talker_params(config, jax.random.PRNGKey(0))
    cp_params = cp_mod.init_cp_params(
        config.code_predictor_config, config.hidden_size, jax.random.PRNGKey(1)
    )
    weights = export_talker_checkpoint(params, cp_params, config)
    # all layers must share structure for stacking -> quantize attention
    # projections in every layer to simulate a pre-quantized checkpoint
    for i in range(config.num_hidden_layers):
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            k = f"talker.model.layers.{i}.self_attn.{name}.weight"
            p, s, b = quantize_np(np.asarray(weights[k], np.float32), 4, 64)
            weights[k] = p
            weights[k.replace(".weight", ".scales")] = s
            weights[k.replace(".weight", ".biases")] = b
    loaded, _ = ckpt.load_talker_checkpoint(weights, config)
    assert "wq" in loaded["layers"]["qkv_proj"]
    assert loaded["layers"]["qkv_proj"]["wq"].shape[0] == config.num_hidden_layers


def test_heterogeneous_per_layer_quantization_loads():
    """Per-layer MIXED quantization (layer 0 qkv at 4-bit, layer 1 at 8-bit)
    loads via exact dense materialization — the reference loads these because
    each layer is its own module (Qwen3Talker.swift:141-175)."""
    from qwen3_tts_tpu.ops.quant import dequantize_np

    config = tiny_talker_config(
        quantization=QuantizationSettings(enabled=True, bits=4, group_size=64)
    )
    params = talker_mod.init_talker_params(config, jax.random.PRNGKey(0))
    cp_params = cp_mod.init_cp_params(
        config.code_predictor_config, config.hidden_size, jax.random.PRNGKey(1)
    )
    weights = export_talker_checkpoint(params, cp_params, config)
    expected = {}
    for i, bits in enumerate([4, 8][: config.num_hidden_layers]):
        for name in ("q_proj", "k_proj", "v_proj"):
            k = f"talker.model.layers.{i}.self_attn.{name}.weight"
            p, s, b = quantize_np(np.asarray(weights[k], np.float32), bits, 64)
            weights[k] = p
            weights[k.replace(".weight", ".scales")] = s
            weights[k.replace(".weight", ".biases")] = b
            expected[(i, name)] = dequantize_np(p, s, b, bits, 64)
    loaded, _ = ckpt.load_talker_checkpoint(weights, config)
    qkv = loaded["layers"]["qkv_proj"]
    assert "w" in qkv and "wq" not in qkv  # dense materialization
    nq = config.num_attention_heads * config.head_dim
    nkv = config.num_key_value_heads * config.head_dim
    for i in (0, 1):
        np.testing.assert_allclose(
            np.asarray(qkv["w"][i][:nq]), expected[(i, "q_proj")],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(qkv["w"][i][nq:nq + nkv]), expected[(i, "k_proj")],
            rtol=1e-5, atol=1e-6,
        )


def test_mixed_quantization_within_layer_fuses_dense():
    """q at 4-bit, k dense, v at 8-bit within ONE layer -> exact dense fuse."""
    config = tiny_talker_config(
        quantization=QuantizationSettings(enabled=True, bits=4, group_size=64)
    )
    params = talker_mod.init_talker_params(config, jax.random.PRNGKey(2))
    cp_params = cp_mod.init_cp_params(
        config.code_predictor_config, config.hidden_size, jax.random.PRNGKey(3)
    )
    weights = export_talker_checkpoint(params, cp_params, config)
    for name, bits in (("q_proj", 4), ("v_proj", 8)):
        for i in range(config.num_hidden_layers):
            k = f"talker.model.layers.{i}.self_attn.{name}.weight"
            p, s, b = quantize_np(np.asarray(weights[k], np.float32), bits, 64)
            weights[k] = p
            weights[k.replace(".weight", ".scales")] = s
            weights[k.replace(".weight", ".biases")] = b
    loaded, _ = ckpt.load_talker_checkpoint(weights, config)
    qkv = loaded["layers"]["qkv_proj"]
    assert "w" in qkv and "wq" not in qkv
    # k_proj stayed dense in the checkpoint -> values exact
    nq = config.num_attention_heads * config.head_dim
    nkv = config.num_key_value_heads * config.head_dim
    k_orig = np.asarray(
        weights["talker.model.layers.0.self_attn.k_proj.weight"], np.float32
    )
    np.testing.assert_allclose(
        np.asarray(qkv["w"][0][nq:nq + nkv]), k_orig, rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_vocoder_checkpoint_round_trip():
    cfg = tiny_decoder_config()
    params = voc.init_vocoder_params(cfg, jax.random.PRNGKey(0))
    weights = export_vocoder_checkpoint(params, cfg)
    # audio_decoder. prefix variant must also load (AudioDecoder.swift:205-207)
    weights = {f"audio_decoder.{k}": v for k, v in weights.items()}
    loaded = ckpt.load_vocoder_checkpoint(weights, cfg)
    _trees_equal(jax.tree.map(np.asarray, params), loaded)


@pytest.mark.slow
def test_vocoder_loaded_decode_matches():
    """Functional: decode with loaded params == decode with original params."""
    cfg = tiny_decoder_config()
    params = voc.init_vocoder_params(cfg, jax.random.PRNGKey(0))
    weights = export_vocoder_checkpoint(params, cfg)
    loaded = jax.tree.map(jnp.asarray, ckpt.load_vocoder_checkpoint(weights, cfg))
    codes = jax.random.randint(
        jax.random.PRNGKey(5), (1, cfg.num_quantizers, 4), 0, cfg.codebook_size
    )
    w1 = np.asarray(voc.decode_frames(params, codes, cfg))
    w2 = np.asarray(voc.decode_frames(loaded, codes, cfg))
    np.testing.assert_allclose(w1, w2, rtol=1e-5, atol=1e-6)


def test_vocoder_encoder_keys_skipped():
    cfg = tiny_decoder_config()
    params = voc.init_vocoder_params(cfg, jax.random.PRNGKey(0))
    weights = export_vocoder_checkpoint(params, cfg)
    weights["encoder.layers.0.conv.weight"] = np.zeros((3, 2, 1), np.float32)
    weights["foo.encoder.bar.weight"] = np.zeros((3,), np.float32)
    loaded = ckpt.load_vocoder_checkpoint(weights, cfg)  # must not crash
    assert "quantizer" in loaded


def test_safetensors_round_trip_via_file(tmp_path):
    config = tiny_talker_config()
    params = talker_mod.init_talker_params(config, jax.random.PRNGKey(0))
    cp_params = cp_mod.init_cp_params(
        config.code_predictor_config, config.hidden_size, jax.random.PRNGKey(1)
    )
    weights = export_talker_checkpoint(params, cp_params, config)
    path = tmp_path / "model.safetensors"
    safetensors_io.save_file(weights, str(path))
    re_read = safetensors_io.load_file(str(path))
    loaded, loaded_cp = ckpt.load_talker_checkpoint(re_read, config)
    _trees_equal(jax.tree.map(np.asarray, params), loaded)
