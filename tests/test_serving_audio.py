"""Streaming-audio continuous serving tests (ContinuousServer.serve_audio).

The invariant: serving audio chunks, concatenated per request, must equal the
canonical single-stream buffer-and-batch decode (18-frame chunks, 8 frames of
re-decoded left context, reference Qwen3TTSPipeline.swift:484-624) of the same
greedy code stream — the fixed-width zero-padded vocoder batching must be
transparent because the vocoder is causal end to end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import generate as G
from qwen3_tts_tpu.models import prompt as P
from qwen3_tts_tpu.models import serving as S
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_decoder_config, tiny_models

pytestmark = pytest.mark.slow

TEXTS = [
    "Streaming audio request number one.",
    "The second request has different words in it.",
    "Third request queued behind the first two slots.",
]
DC, CTX = 6, 3  # small decode chunk / left context so tiny runs cross chunks


def _setup():
    cfg, params, cp_params = tiny_models()
    dec = tiny_decoder_config(codebook_size=cfg.code_predictor_config.vocab_size)
    vparams = voc.init_vocoder_params(dec, __import__("jax").random.PRNGKey(7))
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in TEXTS
    ]
    return cfg, params, cp_params, dec, vparams, pds


def _reference_stream_decode(frames: np.ndarray, vparams, dec) -> np.ndarray:
    """Canonical variable-shape streaming decode: 18-chunks with re-decoded
    left context, NO zero padding (the semantics serve_audio must match)."""
    spf = dec.total_upsample
    out = []
    ctx = None
    pos = 0
    while pos < len(frames):
        batch = frames[pos: pos + DC]
        pos += len(batch)
        inp = np.concatenate([ctx, batch]) if ctx is not None else batch
        drop = (len(inp) - len(batch)) * spf
        wav = np.asarray(
            voc.decode_frames_jit(vparams, jnp.asarray(inp.T[None]), dec)
        )[0]
        out.append(wav[drop:])
        ctx = inp[-CTX:]
    return np.concatenate(out) if out else np.zeros(0, np.float32)


def test_serve_audio_matches_canonical_stream_decode():
    cfg, params, cp_params, dec, vparams, pds = _setup()
    max_tokens = 14
    server = S.ContinuousServer(
        params, cp_params, cfg, batch_size=2, chunk_steps=5, seed=0
    )
    got: dict[int, list[np.ndarray]] = {i: [] for i in range(len(pds))}
    finals: dict[int, int] = {i: 0 for i in range(len(pds))}
    ranges: dict[int, list[tuple[int, int]]] = {i: [] for i in range(len(pds))}
    for chunk in server.serve_audio(
        pds, vparams, dec, temperature=0.0, max_tokens=max_tokens,
        decode_chunk=DC, left_context=CTX,
    ):
        got[chunk.request].append(chunk.samples)
        ranges[chunk.request].append(chunk.token_range)
        if chunk.is_final:
            finals[chunk.request] += 1

    spf = dec.total_upsample
    for i, pd in enumerate(pds):
        single = G.filter_valid_frames(
            G.generate_codes(
                params, cp_params, cfg, pd, temperature=0.0,
                max_tokens=max_tokens, chunk_steps=5, track_cp_penalty=False,
            )
        )
        expected = _reference_stream_decode(single, vparams, dec)
        streamed = (
            np.concatenate(got[i]) if got[i] else np.zeros(0, np.float32)
        )
        assert len(streamed) == len(single) * spf, f"request {i} length"
        np.testing.assert_allclose(
            streamed, expected, rtol=1e-4, atol=1e-5,
            err_msg=f"request {i} audio mismatch",
        )
        assert finals[i] == 1, f"request {i} must get exactly one final chunk"
        # token ranges tile [0, n_frames) contiguously
        spans = [r for r in ranges[i] if r[1] > r[0]]
        assert [s for s, _ in spans] == [0] + [e for _, e in spans][:-1]
        assert spans[-1][1] == len(single)


def test_serve_audio_sampled_structure():
    """Sampled mode: every live request produces finite audio and one final."""
    cfg, params, cp_params, dec, vparams, pds = _setup()
    server = S.ContinuousServer(
        params, cp_params, cfg, batch_size=2, chunk_steps=4, seed=1
    )
    n_final = 0
    total = {i: 0 for i in range(len(pds))}
    for chunk in server.serve_audio(
        pds, vparams, dec, temperature=0.9, max_tokens=9,
        decode_chunk=DC, left_context=CTX,
    ):
        assert np.all(np.isfinite(chunk.samples))
        assert np.all(np.abs(chunk.samples) <= 1.0)
        total[chunk.request] += len(chunk.samples)
        n_final += int(chunk.is_final)
    assert n_final == len(pds)


def test_run_greedy_parity_survives_prefetch_refactor():
    """The depth-1-prefetch / deferred-admission rewrite must keep every
    request's greedy codes identical to its single-stream run (5 requests
    through 2 slots forces two admission waves)."""
    cfg, params, cp_params = tiny_models()
    texts = TEXTS + [
        "Fourth request appears after a slot frees.",
        "Fifth request drains the queue.",
    ]
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in texts
    ]
    server = S.ContinuousServer(
        params, cp_params, cfg, batch_size=2, chunk_steps=7, seed=0
    )
    out = server.run(pds, temperature=0.0, max_tokens=11)
    for i, pd in enumerate(pds):
        single = G.filter_valid_frames(
            G.generate_codes(params, cp_params, cfg, pd, temperature=0.0,
                             max_tokens=11, chunk_steps=7,
                             track_cp_penalty=False)
        )
        np.testing.assert_array_equal(out[i], single, err_msg=f"request {i}")


# -- first_decode_chunk: early first audio -------------------------------


def test_rowpacker_first_chunk_schedule():
    """Pure host logic: with first_chunk set, a stream's FIRST row ships as
    soon as that many frames are buffered (shorter than decode_chunk);
    afterwards rows pop on the normal decode_chunk cadence with carried
    left context."""
    ng = 4
    packer = S._RowPacker(ng, 6, 3, first_chunk=2)
    frames = np.arange(20 * ng, dtype=np.int32).reshape(20, ng)

    # one frame buffered: below first_chunk, nothing ships
    rows, ef = packer.feed("k", frames[0:1], False)
    assert rows == [] and not ef
    # second frame arrives: early first row of 2, no left context
    rows, ef = packer.feed("k", frames[1:2], False)
    assert len(rows) == 1
    _, row, drop, n, trange, final = rows[0]
    assert (drop, n, trange, final) == (0, 2, (0, 2), False)
    np.testing.assert_array_equal(row[:2], frames[:2])
    assert not row[2:].any(), "end padding must be zeros"
    # next 6 frames: a full decode_chunk row with ctx = the 2 sent frames
    rows, _ = packer.feed("k", frames[2:8], False)
    assert len(rows) == 1
    _, row, drop, n, trange, final = rows[0]
    assert (drop, n, trange, final) == (2, 6, (2, 8), False)
    np.testing.assert_array_equal(row[: drop + n], frames[:8])
    # early emission is first-row-only: 2 more frames just buffer
    rows, _ = packer.feed("k", frames[8:10], False)
    assert rows == []
    # finishing flushes the remainder as a short final row with full ctx
    rows, ef = packer.feed("k", frames[10:11], True)
    assert len(rows) == 1 and not ef
    _, row, drop, n, trange, final = rows[0]
    assert (drop, n, trange, final) == (3, 3, (8, 11), True)
    np.testing.assert_array_equal(row[: drop + n], frames[5:11])


def test_rowpacker_first_chunk_validation():
    with pytest.raises(ValueError):
        S._RowPacker(4, 6, 3, first_chunk=0)
    with pytest.raises(ValueError):
        S._RowPacker(4, 6, 3, first_chunk=7)


def test_serve_audio_first_decode_chunk_early_audio():
    """With first_decode_chunk + a fine chunk cadence, each stream's first
    audio chunk covers fewer than decode_chunk frames, total audio length is
    unchanged, and every chunk's samples equal the variable-shape decode of
    the packer's own row schedule (the fixed-width zero-padded batch must
    stay transparent for SHORT rows too)."""
    cfg, params, cp_params, dec, vparams, pds = _setup()
    max_tokens = 14
    cs, first = 2, 2
    ng = cfg.code_predictor_config.num_code_groups
    spf = dec.total_upsample
    server = S.ContinuousServer(
        params, cp_params, cfg, batch_size=2, chunk_steps=cs, seed=0
    )
    got: dict[int, list[np.ndarray]] = {i: [] for i in range(len(pds))}
    ranges: dict[int, list[tuple[int, int]]] = {i: [] for i in range(len(pds))}
    for chunk in server.serve_audio(
        pds, vparams, dec, temperature=0.0, max_tokens=max_tokens,
        decode_chunk=DC, left_context=CTX, first_decode_chunk=first,
    ):
        got[chunk.request].append(chunk.samples)
        ranges[chunk.request].append(chunk.token_range)

    for i, pd in enumerate(pds):
        single = G.filter_valid_frames(
            G.generate_codes(
                params, cp_params, cfg, pd, temperature=0.0,
                max_tokens=max_tokens, chunk_steps=cs, track_cp_penalty=False,
            )
        )
        spans = [r for r in ranges[i] if r[1] > r[0]]
        assert spans[0][1] - spans[0][0] < DC, (
            f"request {i}: first chunk must ship early (got {spans[0]})"
        )
        assert spans[-1][1] == len(single)
        streamed = (
            np.concatenate(got[i]) if got[i] else np.zeros(0, np.float32)
        )
        assert len(streamed) == len(single) * spf

        # expected: decode the packer's own schedule variable-shape (no
        # padding); the schedule itself is pinned by the unit test above
        packer = S._RowPacker(ng, DC, CTX, first_chunk=first)
        expected = []
        for pos in range(0, len(single), cs):
            feed = single[pos: pos + cs]
            rows, _ = packer.feed(i, feed, pos + cs >= len(single))
            for _, row, drop, n, _tr, _f in rows:
                wav = np.asarray(voc.decode_frames_jit(
                    vparams, jnp.asarray(row[: drop + n].T[None]), dec
                ))[0]
                expected.append(wav[drop * spf:])
        expected = (
            np.concatenate(expected) if expected else np.zeros(0, np.float32)
        )
        np.testing.assert_allclose(
            streamed, expected, rtol=1e-4, atol=1e-5,
            err_msg=f"request {i} early-first-chunk audio mismatch",
        )
