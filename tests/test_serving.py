"""Batched lockstep serving tests: greedy parity with the single-stream path,
ragged prompt lengths, EOS freezing, and orchestration."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.models import generate as G
from qwen3_tts_tpu.models import prompt as P
from qwen3_tts_tpu.models import serving as S
from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_models
import pytest

pytestmark = pytest.mark.slow

TEXTS = [
    "First stream text for batched serving.",
    "A different and somewhat longer second stream with extra words at the end.",
    "Short third one here.",
]


def _single_greedy(cfg, params, cp_params, text, max_tokens=16, chunk=8):
    pd = P.assemble_prompt(params, cfg, FakeByteTokenizer(), text, speaker="aiden")
    frames = G.generate_codes(
        params, cp_params, cfg, pd,
        temperature=0.0, max_tokens=max_tokens, chunk_steps=chunk,
        track_cp_penalty=False,
    )
    return G.filter_valid_frames(frames)


def test_serving_greedy_matches_single():
    cfg, params, cp_params = tiny_models()
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in TEXTS
    ]
    batched = S.generate_codes_batched(
        params, cp_params, cfg, pds, temperature=0.0, max_tokens=16, chunk_steps=8
    )
    for i, text in enumerate(TEXTS):
        single = _single_greedy(cfg, params, cp_params, text)
        got = G.filter_valid_frames(batched[i])
        n = min(len(single), len(got))
        assert n > 0
        np.testing.assert_array_equal(got[:n], single[:n], err_msg=f"stream {i}")
        assert len(got) == len(single)


def test_serving_sampled_runs_and_validates():
    cfg, params, cp_params = tiny_models()
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in TEXTS[:2]
    ]
    out = S.generate_codes_batched(
        params, cp_params, cfg, pds, temperature=0.9, max_tokens=12, chunk_steps=6,
        seed=3,
    )
    assert len(out) == 2
    for frames in out:
        assert frames.shape[1] == 16
        valid = G.filter_valid_frames(frames)
        assert np.all(valid >= 0)


def test_serving_seeded_reproducible():
    cfg, params, cp_params = tiny_models()
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in TEXTS[:2]
    ]
    a = S.generate_codes_batched(
        params, cp_params, cfg, pds, temperature=0.8, max_tokens=8, seed=5
    )
    b = S.generate_codes_batched(
        params, cp_params, cfg, pds, temperature=0.8, max_tokens=8, seed=5
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_pipeline_generate_many(tmp_path):
    import jax.numpy as jnp

    from qwen3_tts_tpu.pipeline import Qwen3TTSPipeline
    from qwen3_tts_tpu.testing import write_tiny_model_dir

    write_tiny_model_dir(tmp_path)
    pl = Qwen3TTSPipeline(tmp_path, dtype=jnp.float32)
    texts = [
        "Batched pipeline first utterance.",
        "Second utterance with different words entirely.",
    ]
    outs = pl.generate_many(texts, "aiden", temperature=0.0, max_tokens=8, seed=1)
    assert len(outs) == 2
    for o in outs:
        assert len(o) > 0 and np.all(np.isfinite(o))
    # greedy parity with single-stream generate (which uses cp penalty=True by
    # default -> compare against the no-penalty single path via serving's own
    # parity test; here check shape consistency and determinism)
    outs2 = pl.generate_many(texts, "aiden", temperature=0.0, max_tokens=8, seed=1)
    for a, b in zip(outs, outs2):
        np.testing.assert_array_equal(a, b)


def test_stream_first_decode_chunk(tmp_path):
    import jax.numpy as jnp

    from qwen3_tts_tpu.pipeline import Qwen3TTSPipeline
    from qwen3_tts_tpu.testing import write_tiny_model_dir

    write_tiny_model_dir(tmp_path)
    pl = Qwen3TTSPipeline(tmp_path, dtype=jnp.float32)
    spf = pl._samples_per_frame
    chunks = list(
        pl.generate_stream(
            "Low latency streaming test sentence here.", "aiden",
            max_tokens=40, chunk_size=10, first_decode_chunk=9, seed=5,
        )
    )
    body = [c for c in chunks if len(c.samples)]
    assert len(body[0].samples) == 9 * spf  # early first chunk
    from qwen3_tts_tpu.pipeline import DECODE_CHUNK_SIZE

    if len(body) > 2:
        assert len(body[1].samples) == DECODE_CHUNK_SIZE * spf
    # audio equals the default-path audio for the same codes
    full = list(
        pl.generate_stream(
            "Low latency streaming test sentence here.", "aiden",
            max_tokens=40, chunk_size=10, seed=5,
        )
    )
    a = np.concatenate([c.samples for c in body])
    b = np.concatenate([c.samples for c in full if len(c.samples)])
    # same codes; vocoder context boundaries differ -> compare lengths only
    assert len(a) == len(b)


def test_serving_ring_wrap_long_generation():
    """Generations longer than RING_SLACK must wrap the shared ring slot and
    keep matching the single-stream path (which wraps via position % capacity).
    Regression test: the slot previously grew unbounded and clamped."""
    cfg, params, cp_params = tiny_models()
    text = "Ring wrap parity test sentence for long generation."
    pd = P.assemble_prompt(params, cfg, FakeByteTokenizer(), text, speaker="aiden")
    n = G.RING_SLACK + 40  # force a wrap (capacity = bucket + RING_SLACK)
    single = G.filter_valid_frames(
        G.generate_codes(params, cp_params, cfg, pd, temperature=0.0,
                         max_tokens=n, chunk_steps=64, track_cp_penalty=False)
    )
    batched = S.generate_codes_batched(
        params, cp_params, cfg, [pd, pd], temperature=0.0,
        max_tokens=n, chunk_steps=64,
    )
    for i in range(2):
        got = G.filter_valid_frames(batched[i])
        assert len(got) == len(single)
        np.testing.assert_array_equal(got, single, err_msg=f"stream {i}")


def test_continuous_batching_admit():
    """Admitting a fresh utterance into a running batch slot must reproduce
    that utterance's single-stream greedy output exactly (slot-roll + position
    rebase + per-stream trim schedule), while the other stream continues as
    if uninterrupted."""
    import jax.numpy as jnp

    cfg, params, cp_params = tiny_models()
    text_a = "Stream A keeps going through the admission event."
    text_b = "Stream B gets admitted later with fresh content."
    pd_a = P.assemble_prompt(params, cfg, FakeByteTokenizer(), text_a, speaker="aiden")
    pd_b = P.assemble_prompt(params, cfg, FakeByteTokenizer(), text_b, speaker="aiden")

    p_bucket = G.pick_bucket(
        max(int(pd_a.input_embeds.shape[1]), int(pd_b.input_embeds.shape[1]))
    )
    statics = G.GenStatics(config=cfg, capacity=p_bucket + G.RING_SLACK,
                           chunk_steps=10, track_cp_penalty=False)

    def one_stream_state(pd, rng_seed):
        p = int(pd.input_embeds.shape[1])
        t = int(pd.trailing_hidden.shape[1])
        t_bucket = G.pick_bucket(t, G.TRAILING_BUCKETS)
        e = jnp.zeros((1, p_bucket, cfg.hidden_size)).at[:, :p].set(pd.input_embeds)
        tr = jnp.zeros((1, t_bucket, cfg.hidden_size)).at[:, :t].set(pd.trailing_hidden)
        return S.prefill_batched(
            params, e, jnp.full((1,), p, jnp.int32), tr,
            jnp.full((1,), t, jnp.int32), pd.tts_pad_embed,
            jax.vmap(jax.random.PRNGKey)(jnp.asarray([rng_seed])), statics,
        )

    # batch of two copies of A; decode 2 chunks; admit B into slot 1; 3 more
    state_a0 = one_stream_state(pd_a, 0)
    state_a1 = one_stream_state(pd_a, 1)
    batched = S.concat_states([state_a0, state_a1])
    temp = jnp.float32(0.0)
    frames_a = []
    st = batched
    for _ in range(2):
        f, c, e, st = S.decode_chunk_serving(params, cp_params, st, temp, statics)
        frames_a.append(np.asarray(f)[0])
    fresh_b = one_stream_state(pd_b, 7)
    st = S.admit_stream(st, jnp.int32(1), fresh_b, statics)
    frames_b = []
    for _ in range(3):
        f, c, e, st = S.decode_chunk_serving(params, cp_params, st, temp, statics)
        frames_a.append(np.asarray(f)[0])
        frames_b.append(np.asarray(f)[1])

    got_a = G.filter_valid_frames(np.concatenate(frames_a))
    got_b = G.filter_valid_frames(np.concatenate(frames_b))

    single_a = G.filter_valid_frames(G.generate_codes(
        params, cp_params, cfg, pd_a, temperature=0.0, max_tokens=50,
        chunk_steps=10, track_cp_penalty=False))
    single_b = G.filter_valid_frames(G.generate_codes(
        params, cp_params, cfg, pd_b, temperature=0.0, max_tokens=30,
        chunk_steps=10, track_cp_penalty=False))

    np.testing.assert_array_equal(got_a, single_a[: len(got_a)])
    assert len(got_a) == 50
    np.testing.assert_array_equal(got_b, single_b[: len(got_b)])
    assert len(got_b) == 30


def test_admit_stream_src_row_matches_b1_admit():
    """admit_stream(src=k) from a BATCHED fresh prefill must produce the
    bitwise-identical state to admitting a B=1 fresh prefill of the same
    prompt (the service's batched mid-flight admission path: one full-B
    prefill for an arrival burst, each row admitted by src index)."""
    import jax.numpy as jnp

    cfg, params, cp_params = tiny_models()
    texts = [
        "Row zero filler prompt for the batched fresh state.",
        "The actually admitted prompt sits at row one.",
        "Row two filler prompt, never admitted anywhere.",
    ]
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in texts
    ]
    p_bucket = G.pick_bucket(max(int(pd.input_embeds.shape[1]) for pd in pds))
    t_bucket = G.pick_bucket(
        max(int(pd.trailing_hidden.shape[1]) for pd in pds),
        G.TRAILING_BUCKETS,
    )
    statics = G.GenStatics(config=cfg, capacity=p_bucket + G.RING_SLACK,
                           chunk_steps=4, track_cp_penalty=False)

    def b1_state(pd, seed):
        p = int(pd.input_embeds.shape[1])
        t = int(pd.trailing_hidden.shape[1])
        e = jnp.zeros((1, p_bucket, cfg.hidden_size)).at[:, :p].set(
            pd.input_embeds
        )
        tr = jnp.zeros((1, t_bucket, cfg.hidden_size)).at[:, :t].set(
            pd.trailing_hidden
        )
        return S.prefill_batched(
            params, e, jnp.full((1,), p, jnp.int32), tr,
            jnp.full((1,), t, jnp.int32), pd.tts_pad_embed,
            jax.vmap(jax.random.PRNGKey)(jnp.asarray([seed])), statics,
        )

    # running batch of two streams, advanced one chunk
    running = S.concat_states([b1_state(pds[0], 0), b1_state(pds[0], 1)])
    temp = jnp.float32(0.0)
    _f, _c, _e, running = S.decode_chunk_serving(
        params, cp_params, running, temp, statics
    )

    # fresh prefills: batched (rows 0..2, target at row 1) vs B=1 of row 1's
    # prompt — per-row prefill independence makes row 1 identical in both
    fresh_rows = [b1_state(pds[i], seed=7 if i == 1 else 90 + i)
                  for i in range(3)]
    fresh_b3 = S.concat_states(fresh_rows)
    fresh_b1 = b1_state(pds[1], seed=7)

    run_a = jax.tree.map(jnp.copy, running)
    run_b = jax.tree.map(jnp.copy, running)
    st_src = S.admit_stream(run_a, jnp.int32(1), fresh_b3, statics,
                            src=jnp.int32(1))
    st_b1 = S.admit_stream(run_b, jnp.int32(1), fresh_b1, statics)
    leaves_a = jax.tree_util.tree_leaves_with_path(st_src)
    leaves_b = jax.tree_util.tree_leaves_with_path(st_b1)
    assert len(leaves_a) == len(leaves_b)
    for (path_a, val_a), (path_b, val_b) in zip(leaves_a, leaves_b):
        path = jax.tree_util.keystr(path_a)
        assert path == jax.tree_util.keystr(path_b)
        np.testing.assert_array_equal(
            np.asarray(val_a), np.asarray(val_b),
            err_msg=f"state leaf {path} differs between src-admit and B=1",
        )


def test_continuous_server_many_requests():
    """5 requests through a 2-slot server: every request's greedy output must
    match its single-stream run; finished slots admit queued prompts."""
    cfg, params, cp_params = tiny_models()
    texts = [
        "Server request number one text.",
        "Second request with different content entirely.",
        "Third utterance to be queued behind the others.",
        "Fourth sentence joins when a slot frees up.",
        "Fifth and final request in the queue.",
    ]
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in texts
    ]
    server = S.ContinuousServer(
        params, cp_params, cfg, batch_size=2, chunk_steps=8, seed=0
    )
    out = server.run(pds, temperature=0.0, max_tokens=12)
    assert len(out) == 5
    for i, pd in enumerate(pds):
        single = G.filter_valid_frames(
            G.generate_codes(params, cp_params, cfg, pd, temperature=0.0,
                             max_tokens=12, chunk_steps=8, track_cp_penalty=False)
        )
        np.testing.assert_array_equal(out[i], single[: len(out[i])],
                                      err_msg=f"request {i}")
        assert len(out[i]) == len(single) == 12
