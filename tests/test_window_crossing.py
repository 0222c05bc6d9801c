"""Window-crossing / ring-wraparound decode tests (VERDICT r2 item 6).

The highest-risk untested interaction was ring wraparound x 192-window
masking x mega-kernel cache layout: production decodes run thousands of
steps, so positions wrap the ring capacity and window_start advances far
past the prompt, but the tiny-model tests never left window_start == 0.

These tests shrink the window (module constant KV_WINDOW is read at trace
time by both the jnp and kernel decode paths) and use small explicit ring
capacities so all three mechanisms engage within a few dozen steps:

1. jnp path: a wrapping ring (capacity 96) must produce bit-identical
   frames to a non-wrapping ring (capacity 512) — wraparound must never
   corrupt a live window slot (reference trim semantics,
   Qwen3Layers.swift:108-124 + Qwen3Talker.swift:556-561).
2. kernel vs jnp-W8A8 mirror: stepwise parity of hidden/logits/cache
   through 80 steps that wrap a 64-slot ring under an advancing window.
3. kernel-in-loop greedy chunk invariance after the window has advanced
   past the prompt.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import generate as G
from qwen3_tts_tpu.models import prompt as P
from qwen3_tts_tpu.models import talker as talker_mod
from qwen3_tts_tpu.ops.pallas.talker_megakernel import (
    build_talker_kernel_params,
    cache_to_kernel_layout,
    talker_step_kernel,
    talker_step_w8a8_ref,
)
from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_models, tiny_talker_config

pytestmark = pytest.mark.slow

TEXT = "Crossing the window."


def _force_continue(state):
    """Clear the stop flags so decode keeps stepping past EOS/pad stops —
    the mechanism under test is the cache schedule, not stopping."""
    state = dict(state)
    state["eos"] = jnp.bool_(False)
    state["consecutive_pad"] = jnp.int32(0)
    return state


def _decode_forced(params, cp_params, state, statics, n_chunks):
    outs = []
    for _ in range(n_chunks):
        out, _count, _eos, state = G.decode_chunk(
            params, cp_params, state, jnp.float32(0.0), statics
        )
        outs.append(np.asarray(out))
        state = _force_continue(state)
    return np.concatenate(outs), state


def test_jnp_ring_wraparound_equivalence(monkeypatch):
    """A ring that wraps (capacity 96) decodes identically to one that does
    not (capacity 512): live slots (window + trim slack) are never clobbered."""
    monkeypatch.setattr(G, "KV_WINDOW", 24)
    cfg, params, cp_params = tiny_models()
    pd = P.assemble_prompt(params, cfg, FakeByteTokenizer(), TEXT, speaker="aiden")
    p = int(pd.input_embeds.shape[1])
    t = int(pd.trailing_hidden.shape[1])
    pb = G.pick_bucket(p)
    tb = G.pick_bucket(t, G.TRAILING_BUCKETS)
    e = jnp.zeros((1, pb, cfg.hidden_size)).at[:, :p].set(pd.input_embeds)
    tr = jnp.zeros((1, tb, cfg.hidden_size)).at[:, :t].set(pd.trailing_hidden)

    results = {}
    for cap in (96, 512):
        statics = G.GenStatics(
            config=cfg, capacity=cap, chunk_steps=12, track_cp_penalty=True
        )
        state = G.prefill(
            params, e, jnp.int32(p), tr, jnp.int32(t), pd.tts_pad_embed,
            jax.random.PRNGKey(0), statics,
        )
        frames, state = _decode_forced(params, cp_params, state, statics, 9)
        results[cap] = (frames, state)

    f96, s96 = results[96]
    f512, s512 = results[512]
    # 108 steps from prompt p: positions reached p+108 > 96 -> ring wrapped
    assert int(s96["total_len"]) == p + 108 > 96
    # window advanced past the prompt (the untested regime)
    assert int(s96["window_start"]) > p
    assert int(s96["window_start"]) == int(s512["window_start"])
    np.testing.assert_array_equal(f96, f512)


CFG_K = tiny_talker_config(mrope_section=None)  # plain RoPE: direct cos/sin
CAP_K = 64
PREFILL_K = 20
WINDOW_K = 40


def test_kernel_mirror_parity_through_wraparound(monkeypatch):
    """80 sequential kernel steps (interpret) stay bit-close to the jnp W8A8
    mirror while positions wrap the 64-slot ring and window_start advances
    on the 15-step trim schedule."""
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = talker_mod.init_talker_params(CFG_K, k1, jnp.float32)
    tkp = jax.device_put(build_talker_kernel_params(params, CFG_K))

    cache = talker_mod.init_kv_cache(CFG_K, CAP_K, batch=1, dtype=jnp.float32)
    kv_shape = cache["k"].shape
    cache = {
        "k": jax.random.normal(k2, kv_shape, jnp.float32) * 0.3,
        "v": jax.random.normal(k3, kv_shape, jnp.float32) * 0.3,
        "pos": jnp.where(
            jnp.arange(CAP_K) < PREFILL_K, jnp.arange(CAP_K), -1
        ).astype(jnp.int32),
    }
    cache_k = cache_to_kernel_layout(cache, CFG_K)
    cache_m = jax.tree.map(jnp.array, cache_k)
    embed = jax.random.normal(k4, (1, 1, CFG_K.hidden_size), jnp.float32) * 0.5

    ws = 0
    wrapped = False
    for step in range(80):
        pos = PREFILL_K + step
        pos2d = jnp.full((1, 1), pos, jnp.int32)
        cos, sin = talker_mod._rope_cos_sin(CFG_K, pos2d)
        cos, sin = cos[0], sin[0]
        h_k, lg_k, cache_k = talker_step_kernel(
            tkp, embed, cache_k, jnp.int32(pos), jnp.int32(ws), cos, sin,
            CFG_K, interpret=True,
        )
        h_m, lg_m, cache_m = talker_step_w8a8_ref(
            tkp, embed, cache_m, jnp.int32(pos), jnp.int32(ws), cos, sin, CFG_K
        )
        np.testing.assert_allclose(
            np.asarray(h_k), np.asarray(h_m), rtol=1e-4, atol=1e-4,
            err_msg=f"hidden diverged at step {step} (pos {pos}, ws {ws})",
        )
        np.testing.assert_allclose(
            np.asarray(lg_k), np.asarray(lg_m), rtol=1e-3, atol=1e-3,
            err_msg=f"logits diverged at step {step}",
        )
        # both paths feed the same next embed so the caches stay comparable
        embed = 0.3 * jnp.tanh(h_k)
        if (step + 1) % G.TRIM_INTERVAL == 0:
            ws = max(ws, pos + 1 - WINDOW_K)
        wrapped = wrapped or pos >= CAP_K
    assert wrapped and ws > PREFILL_K  # both mechanisms actually engaged
    for key_ in ("k2", "v2", "pos"):
        np.testing.assert_allclose(
            np.asarray(cache_k[key_]), np.asarray(cache_m[key_]),
            rtol=1e-4, atol=1e-4,
        )


def test_kernel_loop_greedy_invariance_past_window(monkeypatch):
    """generate_codes with both mega-kernels attached (interpret mode) is
    chunk-size invariant at temperature 0 after the (shrunken) window has
    advanced past the prompt."""
    from qwen3_tts_tpu.ops.pallas.cp_megakernel import build_cp_kernel_params

    monkeypatch.setattr(G, "KV_WINDOW", 24)
    cfg, params, cp_params = tiny_models()
    params = dict(params)
    params["kernel"] = jax.device_put(build_talker_kernel_params(params, cfg))
    cp_k = dict(cp_params)
    cp_k["kernel"] = jax.device_put(
        build_cp_kernel_params(cp_params, cfg.code_predictor_config)
    )
    pd = P.assemble_prompt(params, cfg, FakeByteTokenizer(), TEXT, speaker="aiden")

    f1 = G.generate_codes(params, cp_k, cfg, pd, temperature=0.0,
                          max_tokens=42, chunk_steps=14)
    f2 = G.generate_codes(params, cp_k, cfg, pd, temperature=0.0,
                          max_tokens=42, chunk_steps=42)
    np.testing.assert_array_equal(f1, f2)
