"""TTSService tests: independently arriving requests served by one always-on
continuous-batching worker (qwen3_tts_tpu/service.py).

The service invariant extends ContinuousServer's: every request's audio must
equal the canonical single-stream buffer-and-batch decode of its own greedy
code stream (reference consumer semantics Qwen3TTSPipeline.swift:484-624) —
now under ARBITRARY arrival order: concurrent submitters, staggered arrivals
into a running batch, arrivals into an idle (parked) batch, cancellation, and
per-request temperatures in the same lockstep chunk.
"""

import threading
import time
from types import SimpleNamespace

import jax
import numpy as np
import pytest

from qwen3_tts_tpu.models import generate as G
from qwen3_tts_tpu.models import prompt as P
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.service import ServiceClosed, TTSService
from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_decoder_config, tiny_models

pytestmark = pytest.mark.slow

TEXTS = [
    "Independent request number one arrives first.",
    "A second request shows up while the first is decoding.",
    "Third request lands after a pause, batch already running.",
    "Fourth request fills the last open slot in the batch.",
    "Fifth request has to wait for a slot to free up.",
]
DC, CTX = 6, 3  # decode chunk / left context small enough to cross chunks


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg, params, cp_params = tiny_models()
    dec = tiny_decoder_config(codebook_size=cfg.code_predictor_config.vocab_size)
    vparams = voc.init_vocoder_params(dec, jax.random.PRNGKey(7))
    return SimpleNamespace(
        config=cfg,
        params=params,
        cp_params=cp_params,
        tokenizer=FakeByteTokenizer(),
        speech_config=SimpleNamespace(decoder_config=dec),
        vocoder_params=vparams,
        pipeline_config=SimpleNamespace(
            default_temperature=0.0, default_max_tokens=12
        ),
    )


def _expected_audio(pl, text: str, max_tokens: int) -> np.ndarray:
    """Canonical single-stream greedy codes -> variable-shape streaming
    decode with re-decoded left context (same scheme test_serving_audio
    proves for serve_audio)."""
    import jax.numpy as jnp

    # the SAME bucket-padded assembly the service's submit() uses — jit
    # fusion makes its rows differ from the eager builder by ~1 ulp, so the
    # bit-for-bit invariant holds between runs of the same assembly
    pd = P.assemble_prompt_padded(
        pl.params, pl.config, pl.tokenizer, text, speaker="aiden",
        prompt_bucket=G.PROMPT_BUCKETS[2], trailing_bucket=128,
    )
    frames = G.filter_valid_frames(
        G.generate_codes(
            pl.params, pl.cp_params, pl.config, pd, temperature=0.0,
            max_tokens=max_tokens, chunk_steps=5, track_cp_penalty=False,
        )
    )
    dec = pl.speech_config.decoder_config
    spf = dec.total_upsample
    out, ctx, pos = [], None, 0
    while pos < len(frames):
        batch = frames[pos: pos + DC]
        pos += len(batch)
        inp = np.concatenate([ctx, batch]) if ctx is not None else batch
        drop = (len(inp) - len(batch)) * spf
        wav = np.asarray(
            voc.decode_frames_jit(pl.vocoder_params, jnp.asarray(inp.T[None]), dec)
        )[0]
        out.append(wav[drop:])
        ctx = inp[-CTX:]
    return np.concatenate(out) if out else np.zeros(0, np.float32)


def _mk_service(pl, batch_size=2) -> TTSService:
    return TTSService(
        pl, batch_size=batch_size, chunk_steps=5,
        decode_chunk=DC, left_context=CTX, trailing_bucket=128,
    )


def _collect(req):
    chunks = list(req.chunks())
    assert sum(c.is_final for c in chunks) == 1
    assert chunks[-1].is_final
    parts = [c.samples for c in chunks if len(c.samples)]
    audio = np.concatenate(parts) if parts else np.zeros(0, np.float32)
    spans = [c.token_range for c in chunks if c.token_range[1] > c.token_range[0]]
    # token ranges tile [0, n) contiguously
    assert [s for s, _ in spans] == [0] + [e for _, e in spans][:-1]
    return audio, chunks


def test_burst_midflight_admission_greedy_parity(tiny_pipeline):
    """A SIMULTANEOUS burst of arrivals into a running batch takes the
    batched-admission path (one full-B prefill, admit_stream src=slot);
    every stream must still equal its canonical single-stream decode."""
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=4)
    try:
        first = [
            service.submit(TEXTS[i], "aiden", temperature=0.0, max_tokens=12)
            for i in range(2)
        ]
        # wait until the batch is provably decoding (first audio out)
        gens = [r.chunks() for r in first]
        heads = [next(g) for g in gens]
        # burst: 3 arrivals at once -> 2 free slots admitted in ONE batched
        # prefill, 1 waits in the backlog for a freed slot
        burst = [
            service.submit(TEXTS[2 + i], "aiden", temperature=0.0,
                           max_tokens=12)
            for i in range(3)
        ]
        for text, req in zip(TEXTS[2:], burst):
            audio, _ = _collect(req)
            expected = _expected_audio(pl, text, max_tokens=12)
            assert len(audio) == len(expected), text
            np.testing.assert_allclose(audio, expected, rtol=1e-4, atol=1e-5,
                                       err_msg=text)
        for i, (g, head) in enumerate(zip(gens, heads)):
            tail = [c for c in g]
            parts = [c.samples for c in [head] + tail if len(c.samples)]
            audio = np.concatenate(parts)
            expected = _expected_audio(pl, TEXTS[i], max_tokens=12)
            np.testing.assert_allclose(audio, expected, rtol=1e-4, atol=1e-5,
                                       err_msg=TEXTS[i])
    finally:
        service.close()


def test_staggered_arrivals_greedy_parity(tiny_pipeline):
    """5 requests arrive over time into a 2-slot batch (forces waiting in the
    backlog AND mid-flight admission); each stream must equal its canonical
    single-stream decode bit for bit."""
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    try:
        reqs = []
        for i, text in enumerate(TEXTS):
            reqs.append(service.submit(text, "aiden", temperature=0.0, max_tokens=12))
            time.sleep(0.05 if i % 2 else 0.0)  # stagger some arrivals
        for text, req in zip(TEXTS, reqs):
            audio, _ = _collect(req)
            expected = _expected_audio(pl, text, max_tokens=12)
            assert len(audio) == len(expected), text
            np.testing.assert_allclose(audio, expected, rtol=1e-4, atol=1e-5,
                                       err_msg=text)
    finally:
        service.close()


def test_concurrent_submitters_and_idle_reuse(tiny_pipeline):
    """Requests submitted from N threads at once, then — after the batch goes
    fully idle (parked slots) — a late request must still be served."""
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    try:
        results: dict[int, np.ndarray] = {}
        errors: list[Exception] = []

        def client(i: int):
            try:
                req = service.submit(TEXTS[i], "aiden", temperature=0.0,
                                     max_tokens=10)
                results[i] = req.audio()
            except Exception as e:  # surface in main thread
                errors.append(e)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        for i in range(3):
            np.testing.assert_allclose(
                results[i], _expected_audio(pl, TEXTS[i], max_tokens=10),
                rtol=1e-4, atol=1e-5, err_msg=TEXTS[i],
            )

        # batch is now idle (all slots parked); a late arrival must be served
        late = service.submit(TEXTS[3], "aiden", temperature=0.0, max_tokens=10)
        np.testing.assert_allclose(
            late.audio(), _expected_audio(pl, TEXTS[3], max_tokens=10),
            rtol=1e-4, atol=1e-5,
        )
    finally:
        service.close()


def test_per_request_temperature(tiny_pipeline):
    """A sampled request and a greedy request share one lockstep batch; the
    greedy stream must STILL match its single-stream run exactly (per-stream
    temperature vector, serving.py::decode_chunk_serving)."""
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    try:
        sampled = service.submit(TEXTS[0], "aiden", temperature=0.9,
                                 max_tokens=10, seed=3)
        greedy = service.submit(TEXTS[1], "aiden", temperature=0.0,
                                max_tokens=10)
        s_audio = sampled.audio()
        g_audio, _ = _collect(greedy)
        assert np.all(np.isfinite(s_audio)) and np.all(np.abs(s_audio) <= 1.0)
        np.testing.assert_allclose(
            g_audio, _expected_audio(pl, TEXTS[1], max_tokens=10),
            rtol=1e-4, atol=1e-5,
        )
    finally:
        service.close()


def test_cancel_terminates_stream(tiny_pipeline):
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    try:
        req = service.submit(TEXTS[0], "aiden", temperature=0.0, max_tokens=64)
        req.cancel()
        chunks = list(req.chunks())  # must terminate, not hang
        assert chunks[-1].is_final
        # a cancelled slot must be reusable
        nxt = service.submit(TEXTS[1], "aiden", temperature=0.0, max_tokens=8)
        np.testing.assert_allclose(
            nxt.audio(), _expected_audio(pl, TEXTS[1], max_tokens=8),
            rtol=1e-4, atol=1e-5,
        )
    finally:
        service.close()


def test_close_fails_pending_requests(tiny_pipeline):
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    req = service.submit(TEXTS[0], "aiden", temperature=0.0, max_tokens=400)
    service.close()
    # in-flight request must terminate promptly: either ServiceClosed (worker
    # saw the stop first) or a completed stream (it finished just before) —
    # never a hang
    try:
        chunks = list(req.chunks())
        assert chunks[-1].is_final
    except ServiceClosed:
        pass
    with pytest.raises(ServiceClosed):
        service.submit(TEXTS[1], "aiden")


def test_worker_restarts_after_crash(tiny_pipeline, monkeypatch):
    """An unexpected worker crash (injected XLA-style RuntimeError) fails the
    in-flight request but the service RESTARTS with a fresh batch: the next
    submission is served normally and still matches the canonical audio.
    Exhausting max_worker_restarts shuts the service down for good."""
    from qwen3_tts_tpu.models import serving as srv_mod

    real = srv_mod.decode_chunk_serving
    crash = threading.Event()
    crash.set()

    def flaky(*args, **kwargs):
        if crash.is_set():
            crash.clear()
            raise RuntimeError("injected device failure")
        return real(*args, **kwargs)

    monkeypatch.setattr(srv_mod, "decode_chunk_serving", flaky)
    svc = _mk_service(tiny_pipeline)
    try:
        doomed = svc.submit(TEXTS[0], "aiden", max_tokens=8, seed=0)
        with pytest.raises(ServiceClosed):
            doomed.audio()
        assert svc.worker_restarts == 1

        ok = svc.submit(TEXTS[1], "aiden", max_tokens=8, seed=1)
        audio, _ = _collect(ok)
        np.testing.assert_allclose(
            audio, _expected_audio(tiny_pipeline, TEXTS[1], 8),
            rtol=1e-5, atol=1e-6,
        )

        # exhaust the restart budget -> permanently closed
        svc.max_worker_restarts = svc.worker_restarts
        crash.set()
        dead = svc.submit(TEXTS[2], "aiden", max_tokens=8, seed=2)
        with pytest.raises(ServiceClosed):
            dead.audio()
        with pytest.raises(ServiceClosed):
            svc.submit(TEXTS[3], "aiden")
    finally:
        svc.close()


def test_submit_rejects_oversized_prompt(tiny_pipeline):
    pl = tiny_pipeline
    service = TTSService(pl, batch_size=2, chunk_steps=5, prompt_bucket=64,
                         trailing_bucket=32, decode_chunk=DC, left_context=CTX)
    try:
        with pytest.raises(ValueError, match="exceeds service buckets"):
            service.submit("word " * 500, "aiden")
    finally:
        service.close()


def test_packer_releases_completed_requests(tiny_pipeline):
    """The worker's lifetime _RowPacker must forget every request once its
    final chunk is out — completed/cancelled TTSRequests (and the device
    prompt embeddings they pin via req.pd) must not accumulate in the
    packer's sent-token map for the life of the service."""
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    try:
        # completed requests (both real-final-row and empty-final shapes)
        for i in range(3):
            service.submit(TEXTS[i], "aiden", temperature=0.0,
                           max_tokens=10).audio()
        # a cancelled one
        req = service.submit(TEXTS[3], "aiden", temperature=0.0,
                             max_tokens=64)
        req.cancel()
        list(req.chunks())
        # one more served request guarantees the worker has gone around the
        # loop past every release point before we inspect
        service.submit(TEXTS[4], "aiden", temperature=0.0,
                       max_tokens=6).audio()
        packer = service._packer
        assert packer._buf == {}
        assert packer._ctx == {}
        assert packer._sent == {}
    finally:
        service.close()


def test_stats_counters(tiny_pipeline):
    """stats() tracks the request lifecycle: submitted/completed/cancelled
    counters, frame and chunk counts, and live gauges — and a closed
    service reports closed=True with nothing left active."""
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    try:
        s0 = service.stats()
        assert s0["requests_submitted"] == 0 and not s0["closed"]
        assert s0["batch_size"] == 2

        done = service.submit(TEXTS[0], "aiden", temperature=0.0, max_tokens=8)
        audio, _ = _collect(done)
        assert len(audio)

        cancelled = service.submit(
            TEXTS[1], "aiden", temperature=0.0, max_tokens=64
        )
        cancelled.cancel()
        list(cancelled.chunks())

        # empty-text requests complete immediately without a slot
        empty = service.submit("", "aiden", temperature=0.0, max_tokens=8)
        list(empty.chunks())

        s = service.stats()
        assert s["requests_submitted"] == 3
        assert s["requests_completed"] == 2  # done + empty
        assert s["requests_cancelled"] == 1
        assert s["requests_failed"] == 0
        assert s["audio_chunks_emitted"] >= 1
        assert s["frames_decoded"] >= 1
        assert s["decode_chunks"] >= 1
        assert s["uptime_s"] >= 0
    finally:
        service.close()
    s = service.stats()
    assert s["closed"] and s["active_slots"] == 0


def test_stats_counts_failures(tiny_pipeline):
    """A request failed by close() lands in requests_failed, not
    requests_completed."""
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    req = service.submit(TEXTS[0], "aiden", temperature=0.0, max_tokens=400)
    service.close()
    failed = False
    try:
        list(req.chunks())
    except ServiceClosed:
        failed = True
    s = service.stats()
    if failed:
        assert s["requests_failed"] == 1 and s["requests_completed"] == 0
    else:  # the stream won the race and finished before the stop landed
        assert s["requests_completed"] == 1 and s["requests_failed"] == 0


def test_warmup_compiles_all_paths(tiny_pipeline):
    """warmup() must return (both dummy streams complete) and leave the
    service healthy: a real request afterwards still matches the canonical
    single-stream audio, and the warmup requests show up in stats."""
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    try:
        service.warmup(max_tokens=9)
        s = service.stats()
        assert s["requests_submitted"] == 2
        assert s["requests_completed"] == 2 and s["requests_failed"] == 0
        req = service.submit(TEXTS[0], "aiden", temperature=0.0, max_tokens=8)
        np.testing.assert_allclose(
            req.audio(), _expected_audio(pl, TEXTS[0], max_tokens=8),
            rtol=1e-4, atol=1e-5,
        )
    finally:
        service.close()


def test_backpressure_max_queue(tiny_pipeline):
    """With max_queue=1, a burst beyond (slots + 1 waiting) raises
    ServiceBusy without costing device work; once the queue drains, submits
    are accepted again."""
    from qwen3_tts_tpu.service import ServiceBusy

    pl = tiny_pipeline
    service = TTSService(
        pl, batch_size=1, chunk_steps=5, decode_chunk=DC, left_context=CTX,
        trailing_bucket=128, max_queue=1,
    )
    try:
        reqs = [
            service.submit(TEXTS[0], "aiden", temperature=0.0, max_tokens=24)
        ]
        # fill the waiting queue (the worker may claim the first instantly,
        # so saturation can take a second submit)
        rejected = None
        for text in (TEXTS[1], TEXTS[2], TEXTS[3]):
            try:
                reqs.append(service.submit(
                    text, "aiden", temperature=0.0, max_tokens=24))
            except ServiceBusy as e:
                rejected = e
                break
        assert rejected is not None, "burst of 4 into (1 slot + 1 queue) must reject"
        s = service.stats()
        assert s["requests_rejected_busy"] == 1
        # rejected submissions are not counted as submitted
        assert s["requests_submitted"] == len(reqs)
        for r in reqs:
            assert len(r.audio())  # accepted work still completes
        # queue drained: accepted again
        late = service.submit(TEXTS[4], "aiden", temperature=0.0, max_tokens=6)
        assert len(late.audio())
    finally:
        service.close()


def test_close_drain_finishes_inflight(tiny_pipeline):
    """close(drain=True) lets in-flight requests finish: the stream ends
    with a final chunk, never ServiceClosed."""
    pl = tiny_pipeline
    service = _mk_service(pl, batch_size=2)
    req = service.submit(TEXTS[0], "aiden", temperature=0.0, max_tokens=12)
    service.close(drain=True, timeout=300.0)
    audio, chunks = _collect(req)  # must NOT raise
    np.testing.assert_allclose(
        audio, _expected_audio(pl, TEXTS[0], max_tokens=12),
        rtol=1e-4, atol=1e-5,
    )
    with pytest.raises(ServiceClosed):
        service.submit(TEXTS[1], "aiden")


def test_drain_identity_survives_rejected_submits(tiny_pipeline):
    """Validation failures and busy rejections must not count as submitted,
    or close(drain=True) would spin its full timeout on an idle service
    (review finding: submitted was incremented before validation raised)."""
    from qwen3_tts_tpu.service import ServiceBusy

    pl = tiny_pipeline
    service = TTSService(
        pl, batch_size=1, chunk_steps=5, decode_chunk=DC, left_context=CTX,
        trailing_bucket=128, max_queue=0,
    )
    try:
        with pytest.raises(ValueError):
            service.submit(TEXTS[0], "aiden", max_tokens=-1,
                           _bypass_queue_bound=True)
        with pytest.raises(ValueError):  # exceeds the 128 trailing bucket
            service.submit("word " * 400, "aiden", max_tokens=4,
                           _bypass_queue_bound=True)
        with pytest.raises(ServiceBusy):  # max_queue=0 rejects
            service.submit(TEXTS[0], "aiden", max_tokens=4)
        ok = service.submit(TEXTS[1], "aiden", temperature=0.0, max_tokens=6,
                            _bypass_queue_bound=True)
        assert len(ok.audio())
        s = service.stats()
        assert s["requests_submitted"] == 1  # only the served one
        assert s["requests_rejected_busy"] == 1
        assert s["queued"] == 0  # every reserve was released
        t0 = time.monotonic()
        service.close(drain=True, timeout=60.0)
        # drain returns promptly: identity holds, no timeout spin
        assert time.monotonic() - t0 < 30.0
    finally:
        service.close()


def test_first_decode_chunk_ships_early_audio(tiny_pipeline):
    """A service built with first_decode_chunk + a fine chunk cadence must
    ship each request's first audio covering fewer than decode_chunk frames,
    while total audio still matches the canonical stream decode LENGTH (the
    early boundary shifts later window boundaries, so samples match the
    packer-schedule decode — proven in test_serving_audio — not the 18-frame
    canonical stream's exact bytes)."""
    svc = TTSService(
        tiny_pipeline, batch_size=2, chunk_steps=2,
        decode_chunk=DC, left_context=CTX, first_decode_chunk=2,
        trailing_bucket=128,
    )
    try:
        req = svc.submit(TEXTS[0], speaker="aiden", max_tokens=12, seed=0)
        audio, chunks = _collect(req)
        spans = [c.token_range for c in chunks if c.token_range[1] > c.token_range[0]]
        assert spans[0][1] - spans[0][0] < DC, f"first span {spans[0]}"
        n_frames = spans[-1][1]
        spf = tiny_pipeline.speech_config.decoder_config.total_upsample
        assert len(audio) == n_frames * spf
        assert np.all(np.isfinite(audio))
    finally:
        svc.close()


def test_first_decode_chunk_validation(tiny_pipeline):
    with pytest.raises(ValueError):
        TTSService(tiny_pipeline, first_decode_chunk=0)
    with pytest.raises(ValueError):
        TTSService(tiny_pipeline, decode_chunk=6, first_decode_chunk=7)
