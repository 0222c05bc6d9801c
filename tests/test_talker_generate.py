"""End-to-end talker generation tests on tiny random models (CPU backend).

Covers the invariants the reference never tests (SURVEY.md §4): greedy
determinism across chunk boundaries, seeded-sampling reproducibility, EOS /
pad stopping, window-trim schedule equivalence, prompt-mode layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import generate as G
from qwen3_tts_tpu.models import prompt as P
from qwen3_tts_tpu.models import talker as T
from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_models

pytestmark = pytest.mark.slow

TEXT = "Hello world, this is a test."


@pytest.fixture(scope="module")
def models():
    return tiny_models()


@pytest.fixture(scope="module")
def tok():
    return FakeByteTokenizer()


def _prompt(models, tok, **kw):
    cfg, params, _ = models
    return P.assemble_prompt(params, cfg, tok, TEXT, **kw)


def test_prompt_shapes(models, tok):
    cfg, params, _ = models
    pd = _prompt(models, tok, speaker="aiden")
    # role(3) + combined(len(codecEmbed)-1 = 5) + first_text(1) = 9
    assert pd.input_embeds.shape == (1, 9, cfg.hidden_size)
    n = len(tok.encode(f"<|im_start|>assistant\n{TEXT}<|im_end|>\n<|im_start|>assistant\n"))
    assert pd.trailing_hidden.shape[1] == (n - 9) + 1
    assert not bool(jnp.isnan(pd.input_embeds).any())


def test_prompt_without_speaker_uses_instruct_path(models, tok):
    pd_spk = _prompt(models, tok, speaker="aiden")
    pd_unknown = _prompt(models, tok, speaker="someone_unknown")
    # Unknown speaker becomes an instruct prefix -> longer prompt,
    # and codecEmbed is 5 long instead of 6 (no speaker row)
    assert pd_unknown.input_embeds.shape[1] > pd_spk.input_embeds.shape[1]


def test_prompt_instruct_and_icl(models, tok):
    pd_i = _prompt(models, tok, speaker="aiden", instruct="Say it warmly")
    assert pd_i.input_embeds.shape[1] > 9
    ref_codes = [[1, 2, 3, 4]] + [[0] * 4] * 15
    pd_icl = _prompt(
        models, tok, reference_transcript="hi there",
        reference_audio_codes=ref_codes,
    )
    assert pd_icl.input_embeds.shape[1] > 9


def test_prompt_speaker_embedding(models, tok):
    cfg, params, _ = models
    emb = np.random.default_rng(0).standard_normal(cfg.hidden_size).astype(np.float32)
    pd = P.assemble_prompt(params, cfg, tok, TEXT, speaker_embedding=emb)
    assert pd.input_embeds.shape == (1, 9, cfg.hidden_size)


def test_too_short_prompt_returns_none(models):
    cfg, params, _ = models

    class OneTok:
        def encode(self, text):
            return [1, 2, 3]

    assert P.assemble_prompt(params, cfg, OneTok(), "x") is None


def test_generate_basic(models, tok):
    cfg, params, cp_params = models
    pd = _prompt(models, tok, speaker="aiden")
    frames = G.generate_codes(
        params, cp_params, cfg, pd, temperature=0.9, max_tokens=30,
        chunk_steps=16, seed=0,
    )
    assert frames.shape[1] == 16
    assert 0 < len(frames) <= 30
    assert frames[:, 1:].max() < cfg.code_predictor_config.vocab_size
    assert frames.min() >= 0


def test_greedy_chunk_invariance(models, tok):
    cfg, params, cp_params = models
    pd = _prompt(models, tok, speaker="aiden")
    f1 = G.generate_codes(params, cp_params, cfg, pd, temperature=0.0,
                          max_tokens=24, chunk_steps=6)
    f2 = G.generate_codes(params, cp_params, cfg, pd, temperature=0.0,
                          max_tokens=24, chunk_steps=24)
    np.testing.assert_array_equal(f1, f2)


def test_sampling_seed_reproducible(models, tok):
    cfg, params, cp_params = models
    pd = _prompt(models, tok, speaker="aiden")
    f1 = G.generate_codes(params, cp_params, cfg, pd, temperature=0.9,
                          max_tokens=16, chunk_steps=8, seed=42)
    f2 = G.generate_codes(params, cp_params, cfg, pd, temperature=0.9,
                          max_tokens=16, chunk_steps=8, seed=42)
    np.testing.assert_array_equal(f1, f2)
    f3 = G.generate_codes(params, cp_params, cfg, pd, temperature=0.9,
                          max_tokens=16, chunk_steps=8, seed=43)
    assert not np.array_equal(f1, f3)


def test_max_tokens_cap(models, tok):
    cfg, params, cp_params = models
    pd = _prompt(models, tok, speaker="aiden")
    frames = G.generate_codes(params, cp_params, cfg, pd, temperature=0.9,
                              max_tokens=7, chunk_steps=16)
    assert len(frames) <= 7


def test_filter_valid_frames():
    frames = np.asarray([
        [5] + [0] * 15,
        [2148] + [0] * 15,   # pad frame -> filtered
        [2047] + [0] * 15,
        [2150] + [0] * 15,   # should never appear, but filtered anyway
    ], dtype=np.int32)
    valid = G.filter_valid_frames(frames)
    assert valid[:, 0].tolist() == [5, 2047]


def test_streaming_on_chunk_callback(models, tok):
    cfg, params, cp_params = models
    pd = _prompt(models, tok, speaker="aiden")
    seen = []
    frames = G.generate_codes(params, cp_params, cfg, pd, temperature=0.0,
                              max_tokens=20, chunk_steps=5,
                              on_chunk=lambda c: seen.append(c))
    assert sum(len(c) for c in seen) == len(frames)
    np.testing.assert_array_equal(np.concatenate(seen), frames)


def test_decode_window_trim_schedule(models, tok):
    """After many steps the window start must advance (192-token window with
    tiny prompts is far away, so test the mechanism directly via statics)."""
    cfg, params, cp_params = models
    pd = _prompt(models, tok, speaker="aiden")
    p = int(pd.input_embeds.shape[1])
    t = int(pd.trailing_hidden.shape[1])
    p_b = G.pick_bucket(p)
    t_b = G.pick_bucket(t, G.TRAILING_BUCKETS)
    ep = jnp.zeros((1, p_b, cfg.hidden_size)).at[:, :p].set(pd.input_embeds)
    tp = jnp.zeros((1, t_b, cfg.hidden_size)).at[:, :t].set(pd.trailing_hidden)
    statics = G.GenStatics(config=cfg, capacity=p_b + G.RING_SLACK,
                           chunk_steps=16, track_cp_penalty=True)
    state = G.prefill(params, ep, jnp.int32(p), tp, jnp.int32(t),
                      pd.tts_pad_embed, jax.random.PRNGKey(0), statics)
    assert int(state["total_len"]) == p
    assert int(state["window_start"]) == 0
    _, count, _eos, state = G.decode_chunk(params, cp_params, state,
                                           jnp.float32(0.9), statics)
    # after 16 steps one trim boundary (step 15) passed; window_start =
    # max(0, p+15-192) which is 0 for tiny prompts — check step counter advanced
    expected = int(count) if bool(state["eos"]) else 16
    assert int(state["step"]) == expected


def test_max_tokens_non_multiple_of_chunk(models, tok):
    """Prefetch loop must cap exactly at max_tokens when it is not a multiple
    of chunk_steps (one speculative chunk's tail is dropped)."""
    cfg, params, cp_params = models
    pd = P.assemble_prompt(params, cfg, tok, "Edge case text for capping.",
                           speaker="aiden")
    frames = G.generate_codes(params, cp_params, cfg, pd,
                              temperature=0.9, max_tokens=13, chunk_steps=8)
    assert len(frames) == 13


def test_stream_chunks_cover_exactly_max_tokens(models, tok):
    cfg, params, cp_params = models
    pd = P.assemble_prompt(params, cfg, tok, "Streaming cap text here.",
                           speaker="aiden")
    chunks = list(G.stream_codes(params, cp_params, cfg, pd,
                                 temperature=0.9, max_tokens=20, chunk_steps=8))
    total = sum(len(c) for c in chunks)
    assert total == 20
    assert [len(c) for c in chunks] == [8, 8, 4]


def test_prefill_statics_normalization(models, tok):
    """prefill_statics pins every decode-side knob so distinct generation
    modes share ONE compiled prefill — and the normalized statics must
    produce an identical prefill state (prefill reads only config/capacity)."""
    cfg, params, _ = models
    a = G.GenStatics(config=cfg, capacity=160, chunk_steps=48,
                     track_cp_penalty=True, repetition_penalty=1.05)
    b = G.GenStatics(config=cfg, capacity=160, chunk_steps=16,
                     track_cp_penalty=False, repetition_penalty=1.10)
    # same jit cache key for every knob combination at one (config, capacity)
    assert G.prefill_statics(a) == G.prefill_statics(b)
    assert hash(G.prefill_statics(a)) == hash(G.prefill_statics(b))

    pd = _prompt(models, tok, speaker="aiden")
    p = int(pd.input_embeds.shape[1])
    t = int(pd.trailing_hidden.shape[1])
    p_b = G.pick_bucket(p)
    t_b = G.pick_bucket(t, G.TRAILING_BUCKETS)
    ep = jnp.zeros((1, p_b, cfg.hidden_size)).at[:, :p].set(pd.input_embeds)
    tp = jnp.zeros((1, t_b, cfg.hidden_size)).at[:, :t].set(pd.trailing_hidden)
    full = G.GenStatics(config=cfg, capacity=p_b + G.RING_SLACK,
                        chunk_steps=48, track_cp_penalty=True)
    s_full = G.prefill(params, ep, jnp.int32(p), tp, jnp.int32(t),
                       pd.tts_pad_embed, jax.random.PRNGKey(7), full)
    s_norm = G.prefill(params, ep, jnp.int32(p), tp, jnp.int32(t),
                       pd.tts_pad_embed, jax.random.PRNGKey(7),
                       G.prefill_statics(full))
    lf, tf = jax.tree_util.tree_flatten_with_path(s_full)
    ln, tn = jax.tree_util.tree_flatten_with_path(s_norm)
    assert tf == tn
    for (pf, xf), (_, xn) in zip(lf, ln):
        np.testing.assert_array_equal(
            np.asarray(xf), np.asarray(xn),
            err_msg=jax.tree_util.keystr(pf))
