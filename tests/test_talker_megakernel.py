"""Talker-step mega-kernel tests (interpret mode on CPU).

Parity chain: pallas kernel (interpret) == jnp W8A8 mirror (bit-exact)
~= dense fp32 talker_decode_step (loose, quantization noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import talker as talker_mod
from qwen3_tts_tpu.ops.pallas.talker_megakernel import (
    build_talker_kernel_params,
    cache_to_kernel_layout,
    talker_step_kernel,
    talker_step_w8a8_ref,
)
from qwen3_tts_tpu.testing import tiny_talker_config

CFG = tiny_talker_config(mrope_section=None)  # plain RoPE for direct cos/sin
CAP = 64
PREFILL = 20


def _setup(seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = talker_mod.init_talker_params(CFG, k1, jnp.float32)
    tkp = jax.device_put(build_talker_kernel_params(params, CFG))

    cache = talker_mod.init_kv_cache(CFG, CAP, batch=1, dtype=jnp.float32)
    kv_shape = cache["k"].shape
    cache = {
        "k": jax.random.normal(k2, kv_shape, jnp.float32) * 0.3,
        "v": jax.random.normal(k3, kv_shape, jnp.float32) * 0.3,
        "pos": jnp.where(
            jnp.arange(CAP) < PREFILL, jnp.arange(CAP), -1
        ).astype(jnp.int32),
    }
    embed = jax.random.normal(k4, (1, 1, CFG.hidden_size), jnp.float32) * 0.5
    return params, tkp, cache, embed


def _cos_sin(position):
    pos = jnp.full((1, 1), position, jnp.int32)
    cos, sin = talker_mod._rope_cos_sin(CFG, pos)
    return cos[0], sin[0]  # (1, hd)


def test_kernel_matches_mirror():
    params, tkp, cache, embed = _setup()
    cache2 = cache_to_kernel_layout(cache, CFG)
    position = jnp.int32(PREFILL)
    ws = jnp.int32(0)
    cos, sin = _cos_sin(position)

    h_k, lg_k, c_k = talker_step_kernel(
        tkp, embed, cache2, position, ws, cos, sin, CFG, interpret=True
    )
    h_m, lg_m, c_m = talker_step_w8a8_ref(
        tkp, embed, cache2, position, ws, cos, sin, CFG
    )
    np.testing.assert_allclose(
        np.asarray(h_k), np.asarray(h_m), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lg_k), np.asarray(lg_m), rtol=1e-4, atol=1e-4
    )
    assert int(jnp.argmax(lg_k)) == int(jnp.argmax(lg_m))
    for key in ("k2", "v2", "pos"):
        np.testing.assert_allclose(
            np.asarray(c_k[key]), np.asarray(c_m[key]), rtol=1e-5, atol=1e-5
        )


def test_kernel_window_masking():
    """Raising window_start changes the output (old slots masked), matching
    the mirror in both cases."""
    params, tkp, cache, embed = _setup(seed=3)
    cache2 = cache_to_kernel_layout(cache, CFG)
    position = jnp.int32(PREFILL)
    cos, sin = _cos_sin(position)

    outs = []
    for ws in (0, PREFILL - 4):
        h_k, lg_k, _ = talker_step_kernel(
            tkp, embed, cache2, position, jnp.int32(ws), cos, sin, CFG,
            interpret=True,
        )
        h_m, lg_m, _ = talker_step_w8a8_ref(
            tkp, embed, cache2, position, jnp.int32(ws), cos, sin, CFG
        )
        np.testing.assert_allclose(
            np.asarray(h_k), np.asarray(h_m), rtol=1e-5, atol=1e-5
        )
        outs.append(np.asarray(h_k))
    assert not np.allclose(outs[0], outs[1])


def test_ring_write_and_wraparound():
    """The slot write lands at position % capacity with the position recorded,
    identically in kernel and mirror."""
    params, tkp, cache, embed = _setup(seed=5)
    cache2 = cache_to_kernel_layout(cache, CFG)
    position = jnp.int32(CAP + 3)  # wraps to slot 3
    cos, sin = _cos_sin(position)
    _, _, c_k = talker_step_kernel(
        tkp, embed, cache2, position, jnp.int32(0), cos, sin, CFG,
        interpret=True,
    )
    assert int(c_k["pos"][3]) == CAP + 3
    assert not np.allclose(
        np.asarray(c_k["k2"][3]), np.asarray(cache2["k2"][3])
    )
    # untouched slots identical
    np.testing.assert_array_equal(
        np.asarray(c_k["k2"][4:]), np.asarray(cache2["k2"][4:])
    )


def test_mirror_close_to_dense():
    """W8A8 talker step tracks the dense fp32 step (quantization noise only)."""
    params, tkp, cache, embed = _setup(seed=7)
    cache2 = cache_to_kernel_layout(cache, CFG)
    position = jnp.int32(PREFILL)
    ws = jnp.int32(0)
    cos, sin = _cos_sin(position)

    h_m, lg_m, _ = talker_step_w8a8_ref(
        tkp, embed, cache2, position, ws, cos, sin, CFG
    )
    h_d, cache_d = talker_mod.talker_decode_step(
        params, embed, cache, position, ws, CFG
    )
    lg_d = talker_mod.codec_head(params, h_d)[0, 0]
    hm = np.asarray(h_m).ravel()
    hd = np.asarray(h_d).ravel()
    cos_sim = float(hm @ hd / (np.linalg.norm(hm) * np.linalg.norm(hd)))
    assert cos_sim > 0.99, cos_sim
    lm = np.asarray(lg_m)
    ld = np.asarray(lg_d)
    lsim = float(lm @ ld / (np.linalg.norm(lm) * np.linalg.norm(ld)))
    assert lsim > 0.98, lsim


def test_decode_loop_with_both_kernels():
    """stream_codes with talker + cp mega-kernels attached (interpret mode)
    emits valid deterministic frames end to end."""
    from qwen3_tts_tpu.models import generate as G
    from qwen3_tts_tpu.models import prompt as P
    from qwen3_tts_tpu.ops.pallas.cp_megakernel import build_cp_kernel_params
    from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_models

    cfg, params, cp_params = tiny_models()
    params = dict(params)
    params["kernel"] = jax.device_put(build_talker_kernel_params(params, cfg))
    cp_k = dict(cp_params)
    cp_k["kernel"] = jax.device_put(
        build_cp_kernel_params(cp_params, cfg.code_predictor_config)
    )
    pd = P.assemble_prompt(params, cfg, FakeByteTokenizer(), "hi", speaker="aiden")

    def run():
        return G.generate_codes(
            params, cp_k, cfg, pd, temperature=0.0, max_tokens=6, chunk_steps=3
        )

    frames = run()
    assert frames.shape == (6, cfg.code_predictor_config.num_code_groups) or (
        frames.shape[0] >= 1
    )
    assert (frames[:, 1:] >= 0).all()
    assert (frames[:, 1:] < cfg.code_predictor_config.vocab_size).all()
    np.testing.assert_array_equal(frames, run())


def test_decode_loop_kernel_mirror_matches_kernel():
    """GenStatics.kernel_mirror routes the decode loop through the jnp W8A8
    mirrors; greedy frames must equal the (interpret-mode) kernel path
    bit-for-bit — this is the arithmetic-identity the bench's on-chip
    parity gate relies on (bench.py kernel_parity_check)."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.models import generate as G
    from qwen3_tts_tpu.models import prompt as P
    from qwen3_tts_tpu.ops.pallas.cp_megakernel import build_cp_kernel_params
    from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_models

    cfg, params, cp_params = tiny_models()
    params = dict(params)
    params["kernel"] = jax.device_put(build_talker_kernel_params(params, cfg))
    cp_k = dict(cp_params)
    cp_k["kernel"] = jax.device_put(
        build_cp_kernel_params(cp_params, cfg.code_predictor_config)
    )
    pd = P.assemble_prompt(
        params, cfg, FakeByteTokenizer(), "mirror parity text", speaker="aiden"
    )
    p = int(pd.input_embeds.shape[1])
    t = int(pd.trailing_hidden.shape[1])
    pb = G.pick_bucket(p)
    tb = G.pick_bucket(t, G.TRAILING_BUCKETS)
    h = cfg.hidden_size
    embeds = jnp.zeros((1, pb, h), jnp.float32).at[:, :p].set(pd.input_embeds)
    trailing = (
        jnp.zeros((1, tb, h), jnp.float32).at[:, :t].set(pd.trailing_hidden)
    )
    args = (
        embeds, jnp.int32(p), trailing, jnp.int32(t), pd.tts_pad_embed,
        jax.random.PRNGKey(42),
    )
    temp = jnp.float32(0.0)

    def run(mirror):
        st = G.GenStatics(
            config=cfg, capacity=pb + G.RING_SLACK, chunk_steps=4,
            track_cp_penalty=True, kernel_mirror=mirror,
        )
        state = G.prefill(params, *args, st)
        frames, _, _, _ = G.decode_chunk(params, cp_k, state, temp, st)
        return np.asarray(frames)

    np.testing.assert_array_equal(run(False), run(True))


def test_cache_layout_roundtrip():
    params, tkp, cache, _ = _setup()
    cache2 = cache_to_kernel_layout(cache, CFG)
    nl, _, nkv, c, d = cache["k"].shape
    back = (
        cache2["k2"].reshape(c, nl, nkv, d).transpose(1, 2, 0, 3)[:, None]
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(cache["k"]))
