"""Always-on continuous-batching TTS service for INDEPENDENTLY arriving
requests.

`ContinuousServer` (models/serving.py) serves a list of prompts known up
front; this module turns the same machinery into a long-lived service: one
background worker owns one running lockstep batch, requests submitted from
any thread at any time are prefilled behind the in-flight decode chunk and
admitted into free slots mid-flight (models/serving.py::admit_stream), and
each request streams its own audio chunks through its own queue while other
requests keep decoding. The only cross-request serialization is slot
admission bookkeeping — there is no global "one generation at a time" lock
(the reference library is strictly one-at-a-time, its pipeline object holds
one generation, Qwen3TTSPipeline.swift:63-956; this is the TPU-native
serving surface it lacks).

Scheduling per worker iteration (chunk `it` in flight):
  1. drain arrivals; place them into free slots — each placement dispatches
     a B=1 prefill that queues BEHIND the in-flight chunk on the device and
     schedules a deferred admission (applied when chunk `it` returns)
  2. when chunk `it`'s state comes back: apply deferred admissions/parks,
     dispatch chunk `it+1` (depth-1 prefetch — before any host blocking)
  3. block on chunk `it`'s frames; route per-slot frames to their requests,
     vocode ready 18-frame windows batched across streams (one fixed
     [B, nq, left+chunk] jit signature), push audio into request queues
  4. requests that finish (EOS / max_tokens / cancel) free their slot; a
     non-EOS finish parks the row on the next boundary so an idle batch
     stops costing decode work

Greedy outputs per request are bitwise-identical to a fresh single-stream
run — the same admission-parity invariant ContinuousServer proves, now under
arbitrary arrival order (tests/test_service.py).

Failure containment: an unexpected worker crash fails the in-flight requests
(their streams raise ServiceClosed) and the worker RESTARTS with a fresh
lockstep batch, up to `max_worker_restarts` times — one bad generation or
transient device error never leaves a permanently dead service behind a
healthy HTTP daemon.
"""

from __future__ import annotations

import itertools
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .models import generate as gen_mod
from .models import prompt as prompt_mod
from .models import serving as srv
from .pipeline import AudioChunk


class ServiceClosed(RuntimeError):
    """The service was shut down before/while serving this request."""


class ServiceBusy(RuntimeError):
    """Backpressure: the waiting queue is at max_queue; retry later (the
    HTTP layer maps this to 503 + Retry-After rather than letting the
    queue — and every client's latency — grow without bound)."""


class _Stats:
    """Thread-safe counters + gauges for service observability (the
    reference has no serving surface at all, so no counterpart exists;
    this backs the HTTP server's GET /stats). Counters are monotonic;
    gauges are last-written-wins snapshots from the worker loop."""

    def __init__(self):
        self._lock = threading.Lock()
        self._c: dict[str, int] = {}

    def inc(self, name: str, by: int = 1) -> None:
        with self._lock:
            self._c[name] = self._c.get(name, 0) + by

    def add_get(self, name: str, by: int = 1) -> int:
        """Atomic increment-and-read — the admission reserve must be a
        single operation or concurrent submits all pass a stale check."""
        with self._lock:
            v = self._c.get(name, 0) + by
            self._c[name] = v
            return v

    def set(self, name: str, value: int) -> None:
        with self._lock:
            self._c[name] = int(value)

    def snapshot(self) -> dict:
        with self._lock:
            return dict(self._c)


@dataclass
class _SlotView:
    """Host-side bookkeeping for one batch slot."""

    req: "TTSRequest | None" = None
    active_from: int = 0


class TTSRequest:
    """Handle for one submitted utterance: a thread-safe stream of
    AudioChunks (exactly one chunk has is_final=True; an Exception in the
    stream aborts it)."""

    def __init__(
        self, pd, temperature: float, max_tokens: int, seed: int, stats=None
    ):
        self.pd = pd
        self.temperature = float(temperature)
        self.max_tokens = int(max_tokens)
        self.seed = int(seed)
        self._q: queue.Queue = queue.Queue()
        self._cancel = threading.Event()
        self._stats = stats
        self._done = False  # first terminal push wins the stats count
        self._done_lock = threading.Lock()
        # worker-private state (single worker thread; no locking needed);
        # buffered frames / left context / sent counts live in the worker's
        # shared _RowPacker (models/serving.py), keyed by this object
        self.emitted = 0

    def cancel(self) -> None:
        """Stop generating for this request; the stream terminates with an
        empty final chunk at the next chunk boundary."""
        self._cancel.set()

    @property
    def cancelled(self) -> bool:
        return self._cancel.is_set()

    def chunks(self):
        """Iterate audio chunks as they are synthesized (blocking). Raises
        if the service failed this request."""
        while True:
            item = self._q.get()
            if isinstance(item, Exception):
                raise item
            yield item
            if item.is_final:
                return

    def audio(self) -> np.ndarray:
        """Block until completion; the full concatenated waveform."""
        parts = [c.samples for c in self.chunks() if len(c.samples)]
        return np.concatenate(parts) if parts else np.zeros(0, np.float32)

    # worker-side helpers -------------------------------------------------
    def _first_terminal(self) -> bool:
        """Atomically claim the single terminal stats count (close() can
        race the worker's shutdown drain, both pushing errors on the same
        request — only one may count, or the drain identity breaks)."""
        with self._done_lock:
            if self._done:
                return False
            self._done = True
            return True

    def _push(self, item) -> None:
        if self._stats is not None:
            if isinstance(item, Exception):
                if self._first_terminal():
                    self._stats.inc(
                        "requests_cancelled"
                        if self.cancelled
                        else "requests_failed"
                    )
            else:
                if len(item.samples):
                    self._stats.inc("audio_chunks_emitted")
                if item.is_final and self._first_terminal():
                    self._stats.inc(
                        "requests_cancelled"
                        if self.cancelled
                        else "requests_completed"
                    )
        self._q.put(item)


class TTSService:
    """A running continuous-batching TTS worker on top of a loaded
    Qwen3TTSPipeline. Submit from any number of threads; close() to stop.

    One fixed jit signature set: (batch_size, prompt_bucket,
    trailing_bucket, chunk_steps) are chosen at construction — a request
    whose prompt exceeds the buckets is rejected at submit()."""

    def __init__(
        self,
        pipeline,
        *,
        batch_size: int = 8,
        chunk_steps: int = 6,
        decode_chunk: int = 18,
        left_context: int = 8,
        first_decode_chunk: int | None = None,
        prompt_bucket: int | None = None,
        trailing_bucket: int | None = None,
        max_worker_restarts: int = 2,
        max_queue: int | None = -1,
    ):
        if first_decode_chunk is None:
            # deploy default: the measured-best point on the TTFA ladder
            # (docs/SERVING.md — chunk_steps 6 + early first chunk at 6
            # frames). first_decode_chunk == decode_chunk disables early
            # shipping (first audio waits for a full window).
            first_decode_chunk = min(6, decode_chunk)
        if max_queue == -1:
            # bounded BY DEFAULT: each queued request holds bucket-padded
            # device buffers (~1 MB at 1.7B defaults — the price of the
            # one-dispatch submit), so an unbounded backlog under a load
            # spike would grow device memory without limit. 4 batches of
            # headroom keeps the worker fed through bursts; pass
            # max_queue=None for the old unbounded behavior.
            max_queue = 4 * batch_size
        if not (1 <= first_decode_chunk <= decode_chunk):
            # validate HERE: the packer is built on the worker thread, where
            # a bad value would kill the worker instead of raising to the
            # constructor's caller
            raise ValueError(
                "first_decode_chunk must be in [1, decode_chunk], got "
                f"{first_decode_chunk}"
            )
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.chunk_steps = chunk_steps
        self.decode_chunk = decode_chunk
        self.left_context = left_context
        self.first_decode_chunk = first_decode_chunk
        self.prompt_bucket = prompt_bucket or gen_mod.PROMPT_BUCKETS[2]
        self.trailing_bucket = trailing_bucket or gen_mod.TRAILING_BUCKETS[1]
        self.statics = gen_mod.GenStatics(
            config=pipeline.config,
            capacity=self.prompt_bucket + gen_mod.RING_SLACK,
            chunk_steps=chunk_steps,
            track_cp_penalty=False,
        )
        self._inbox: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._stats = _Stats()
        self._t0 = time.monotonic()
        self.max_queue = max_queue
        self._seq = itertools.count()
        self.max_worker_restarts = max_worker_restarts
        self.worker_restarts = 0
        self._worker = threading.Thread(
            target=self._run, name="tts-service", daemon=True
        )
        self._worker.start()

    # -- public API --------------------------------------------------------

    def submit(
        self,
        text: str,
        speaker: str = "",
        *,
        temperature: float | None = None,
        max_tokens: int | None = None,
        seed: int | None = None,
        _bypass_queue_bound: bool = False,
        **prompt_kwargs,
    ) -> TTSRequest:
        """Queue one utterance; returns immediately with its chunk stream.
        prompt_kwargs pass through to assemble_prompt (instruct,
        speaker_embedding, reference_transcript, reference_audio_codes).
        _bypass_queue_bound is internal (warmup must run even on a service
        configured with max_queue=0)."""
        if self._stop.is_set():
            raise ServiceClosed("service is shut down")
        # Admission reserve, ATOMIC (add_get): concurrent submits each claim
        # a waiting slot or reject — a snapshot check-then-act would let a
        # burst of N threads all pass on the stale count, defeating the
        # bound exactly under the load it exists for. The reserve happens
        # BEFORE prompt assembly so a rejected request costs no device
        # work. Every non-enqueue exit below must release the reserve
        # (the `ok` finally); the worker releases it for enqueued requests
        # when it claims them.
        waiting = self._stats.add_get("waiting")
        if (
            not _bypass_queue_bound
            and self.max_queue is not None
            and waiting > self.max_queue
        ):
            self._stats.inc("waiting", -1)
            self._stats.inc("requests_rejected_busy")
            raise ServiceBusy(
                f"waiting queue is full ({self.max_queue}); retry later"
            )
        enqueued = False
        try:
            if max_tokens is not None and max_tokens < 0:
                # negative budgets would slice frames as valid[:negative]
                # and emit audio; 0 means "no audio", served without a slot
                raise ValueError("max_tokens must be >= 0")
            pl = self.pipeline
            if max_tokens == 0:
                req = TTSRequest(None, temperature=0.0, max_tokens=0, seed=0,
                                 stats=self._stats)
                self._stats.inc("requests_submitted")
                req._push(
                    AudioChunk(
                        samples=np.zeros(0, np.float32),
                        token_range=(0, 0),
                        is_final=True,
                    )
                )
                return req
            # bucket-padded one-dispatch assembly (the eager path's ~40
            # small dispatches per submit dominated the r4 burst TTFA)
            pd = prompt_mod.assemble_prompt_padded(
                pl.params, pl.config, pl.tokenizer, text, speaker=speaker,
                prompt_bucket=self.prompt_bucket,
                trailing_bucket=self.trailing_bucket,
                **prompt_kwargs,
            )
            if pd is None:
                # too-short text: the reference returns no audio rather than
                # an error (Qwen3Talker.swift:348-352; pipeline's
                # _generate_codes mirrors it) — complete immediately with an
                # empty stream
                req = TTSRequest(None, temperature=0.0, max_tokens=0, seed=0,
                                 stats=self._stats)
                self._stats.inc("requests_submitted")
                req._push(
                    AudioChunk(
                        samples=np.zeros(0, np.float32),
                        token_range=(0, 0),
                        is_final=True,
                    )
                )
                return req
            p, t = prompt_mod.pd_lengths(pd)
            if p > self.prompt_bucket or t > self.trailing_bucket:
                raise ValueError(
                    f"prompt ({p} embeds / {t} trailing) exceeds service "
                    f"buckets ({self.prompt_bucket}/{self.trailing_bucket}); "
                    "shorten the text or run a service with larger buckets"
                )
            n = next(self._seq)
            req = TTSRequest(
                pd,
                stats=self._stats,
                temperature=(
                    temperature
                    if temperature is not None
                    else pl.pipeline_config.default_temperature
                ),
                max_tokens=(
                    max_tokens
                    if max_tokens is not None
                    else pl.pipeline_config.default_max_tokens
                ),
                seed=seed if seed is not None else n,
            )
            # count submitted only once validation passed: a rejected or
            # invalid submit never produces a terminal count, and
            # close(drain=True) relies on submitted == completed+failed+
            # cancelled holding exactly
            self._stats.inc("requests_submitted")
            self._inbox.put(req)
            enqueued = True
            if self._stop.is_set():
                # close() raced the put: the worker may already have done
                # its final inbox drain, so nobody would ever consume this
                # request. Push the error directly — if the worker's drain
                # ALSO sees it, the duplicate queue item is harmless
                # (consumers stop at the first one) and the terminal stats
                # count stays single (TTSRequest._push's _done latch).
                req._push(ServiceClosed("service is shut down"))
            return req
        finally:
            if not enqueued:
                # reserve released: the request never reached the inbox
                # (immediate completion or a validation error)
                self._stats.inc("waiting", -1)

    def close(self, timeout: float = 30.0, drain: bool = False) -> None:
        """Stop the worker; in-flight and queued requests get ServiceClosed.
        drain=True refuses new submissions implicitly (callers should stop
        submitting) and waits — up to `timeout` — for the in-flight and
        queued work to finish BEFORE stopping, so a deploy rollover does not
        cut streams mid-utterance."""
        if drain:
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                s = self.stats()
                # counter identity, not gauges: every submitted request ends
                # in exactly one terminal count, so this is race-free
                if s["requests_submitted"] == (
                    s["requests_completed"]
                    + s["requests_failed"]
                    + s["requests_cancelled"]
                ):
                    break
                time.sleep(0.05)
        self._stop.set()
        self._worker.join(timeout=timeout)

    @property
    def busy(self) -> bool:
        """True when a submit would currently be rejected by the queue
        bound. Advisory (the atomic reserve inside submit is authoritative);
        lets the HTTP layer 503 BEFORE paying for reference-audio encoding
        on a saturated service."""
        return (
            self.max_queue is not None
            and self._stats.snapshot().get("waiting", 0) >= self.max_queue
        )

    def try_reject_busy(self) -> bool:
        """busy, counted: True means the caller is about to shed this
        request — record it in requests_rejected_busy like submit() would."""
        if self.busy:
            self._stats.inc("requests_rejected_busy")
            return True
        return False

    def warmup(self, max_tokens: int = 24) -> None:
        """Compile every serving jit signature BEFORE real traffic: two
        overlapping dummy requests cover the bootstrap prefill, the lockstep
        decode chunk, the batched vocode, AND the mid-flight admit_stream /
        park paths (which only compile once a request arrives while the
        batch is running). On a cold compile cache TPU signatures take
        60-300 s each — without this the first user requests absorb them.
        Warmup requests count in stats() like any others."""
        first = self.submit(
            "Warm up the serving path with a long enough sentence.",
            temperature=0.0, max_tokens=max_tokens, seed=0,
            _bypass_queue_bound=True,
        )
        # admit mid-flight: wait for the first request's first audio so the
        # batch is provably running, then overlap a second request
        it = first.chunks()
        head = next(it)
        second = self.submit(
            "Second warmup request joins mid-flight.",
            temperature=0.0, max_tokens=max(1, max_tokens // 3), seed=1,
            _bypass_queue_bound=True,
        )
        for _ in it:
            pass
        for _ in second.chunks():
            pass
        del head

    def stats(self) -> dict:
        """Observability snapshot: monotonic counters (requests submitted /
        completed / failed / cancelled, audio chunks emitted, frames decoded,
        decode chunks run) + live gauges (active slots, backlog) + static
        configuration. Safe from any thread; backs GET /stats."""
        out = self._stats.snapshot()
        out.setdefault("requests_submitted", 0)
        out.setdefault("requests_completed", 0)
        out.setdefault("requests_failed", 0)
        out.setdefault("requests_cancelled", 0)
        out.setdefault("active_slots", 0)
        out.setdefault("backlog", 0)
        out["queued"] = max(0, out.pop("waiting", 0))
        out["uptime_s"] = round(time.monotonic() - self._t0, 1)
        out["worker_restarts"] = self.worker_restarts
        out["closed"] = self._stop.is_set()
        out["batch_size"] = self.batch_size
        out["prompt_bucket"] = self.prompt_bucket
        out["trailing_bucket"] = self.trailing_bucket
        return out

    # -- worker -------------------------------------------------------------

    def _padded_rows(self, pd) -> tuple[jax.Array, jax.Array]:
        """(embeds [1, pb, H], trailing [1, tb, H]) for one request —
        already-bucket-padded PromptData (the submit fast path) passes
        through with zero dispatches."""
        p, t = prompt_mod.pd_lengths(pd)
        if (
            pd.input_embeds.shape[1] == self.prompt_bucket
            and pd.trailing_hidden.shape[1] == self.trailing_bucket
        ):
            return pd.input_embeds, pd.trailing_hidden
        dtype = pd.input_embeds.dtype
        h = pd.input_embeds.shape[2]
        e = jnp.zeros((1, self.prompt_bucket, h), dtype)
        e = e.at[:, :p].set(pd.input_embeds[:, :p])
        tr = jnp.zeros((1, self.trailing_bucket, h), dtype)
        tr = tr.at[:, :t].set(pd.trailing_hidden[:, :t])
        return e, tr

    def _prefill(self, req: TTSRequest) -> dict:
        pd = req.pd
        p, t = prompt_mod.pd_lengths(pd)
        e, tr = self._padded_rows(pd)
        return srv.prefill_batched(
            self.pipeline.params, e, jnp.full((1,), p, jnp.int32), tr,
            jnp.full((1,), t, jnp.int32), pd.tts_pad_embed,
            jax.vmap(jax.random.PRNGKey)(jnp.asarray([req.seed])),
            self.statics,
        )

    def _prefill_bootstrap(self, placed: dict[int, "TTSRequest"]) -> dict:
        """ONE full-B prefill for a bootstrap burst (state is None, `placed`
        maps slot -> request for the first len(placed) slots). A burst of B
        arrivals into an idle service previously dispatched B sequential
        B=1 prefills plus B-1 parked-state zero trees — on the throttled
        host that serialized ~16 dispatch chains and re-streamed the talker
        weights per request, the dominant share of the measured 2.4 s burst
        TTFA at B=16 (scripts/exp_service_ttfa.py, r4). One batched call
        streams the weights once and compiles exactly one extra signature
        (covered by warmup's first request). Rows are independent through
        prefill_batched (the same invariant ContinuousServer's full-B
        prefill parity tests prove), so per-request greedy parity is
        unchanged. Unoccupied rows replicate row 0's prompt with seed 0 —
        numerically safe garbage that admit_stream overwrites wholesale;
        lockstep decode costs the same whether a row is parked or junk."""
        b = self.batch_size
        ref_pd = next(iter(placed.values())).pd
        lengths = np.zeros((b,), np.int32)
        totals = np.zeros((b,), np.int32)
        seeds = np.zeros((b,), np.int64)
        ref_rows = self._padded_rows(ref_pd)
        e_rows: list = [None] * b
        tr_rows: list = [None] * b
        for slot, req in placed.items():
            pd = req.pd
            p, t = prompt_mod.pd_lengths(pd)
            e_rows[slot], tr_rows[slot] = self._padded_rows(pd)
            lengths[slot] = p
            totals[slot] = t
            seeds[slot] = req.seed
        # unoccupied rows: row 0's shape-valid prompt (never emitted)
        ref_slot = next(iter(placed))
        for slot in range(b):
            if slot not in placed:
                e_rows[slot], tr_rows[slot] = ref_rows
                lengths[slot] = lengths[ref_slot]
                totals[slot] = totals[ref_slot]
        # two concats instead of 2*B .at[].set dispatch chains
        e = jnp.concatenate(e_rows, axis=0)
        tr = jnp.concatenate(tr_rows, axis=0)
        return srv.prefill_batched(
            self.pipeline.params, e, jnp.asarray(lengths), tr,
            jnp.asarray(totals), ref_pd.tts_pad_embed,
            jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds)),
            self.statics,
        )

    def _run(self) -> None:
        """Worker thread: serve until shutdown, restarting after an
        unexpected crash (XLA runtime error, poisoned request) up to
        `max_worker_restarts` times. A crash fails the requests that were in
        flight (their streams raise ServiceClosed) but the NEXT submission
        is served by a fresh lockstep batch — one bad generation must not
        turn into a permanently dead service."""
        last_crash = None
        while True:
            try:
                self._serve_once()
                return  # clean shutdown (stop set)
            except Exception:
                # the restart budget guards against crash LOOPS, not against
                # a long-lived service ever hitting max_worker_restarts
                # transient errors in its lifetime: after 10+ min of healthy
                # operation since the previous crash, the budget resets
                now = time.monotonic()
                if last_crash is not None and now - last_crash > 600.0:
                    self.worker_restarts = 0
                last_crash = now
                if (
                    self._stop.is_set()
                    or self.worker_restarts >= self.max_worker_restarts
                ):
                    # give up: fail everything still queued, stop accepting
                    self._stop.set()
                    err = ServiceClosed("service is shut down")
                    while True:
                        try:
                            self._inbox.get_nowait()._push(err)
                            self._stats.inc("waiting", -1)
                        except queue.Empty:
                            return
                self.worker_restarts += 1

    def _serve_once(self) -> None:
        pl = self.pipeline
        b = self.batch_size
        dec_cfg = pl.speech_config.decoder_config
        ng = pl.config.code_predictor_config.num_code_groups
        spf = dec_cfg.total_upsample
        # row packing + batched vocode shared with serve_audio — ONE
        # implementation of the buffer-and-batch scheme (review finding:
        # the two paths had drifted)
        packer = srv._RowPacker(
            ng, self.decode_chunk, self.left_context, self.first_decode_chunk
        )
        self._packer = packer  # exposed for leak tests (lifetime = worker)

        # PCM delivery runs on its own thread: the per-boundary host pull
        # (~3 MB of float32 at B=16, ~120 ms on this throttled host — the
        # dominant boundary cost in the r4 service-TTFA measurement) now
        # overlaps the next decode chunk instead of serializing the worker
        # loop. Per-request ordering is preserved because ALL audio and
        # final pushes for slot-served requests flow through this one FIFO.
        pq: queue.Queue = queue.Queue()
        pull_err: list = [None]

        def _pull_loop() -> None:
            while True:
                item = pq.get()
                if item is None:
                    return
                dispatched, final_pushes = item
                try:
                    for key, samples, t_range, final in srv.resolve_vocoded(
                        dispatched, spf
                    ):
                        key._push(
                            AudioChunk(
                                samples=samples,
                                token_range=t_range,
                                is_final=final,
                            )
                        )
                    for req, t0 in final_pushes:
                        req._push(
                            AudioChunk(
                                samples=np.zeros(0, np.float32),
                                token_range=(t0, t0),
                                is_final=True,
                            )
                        )
                except Exception as e:  # device error surfaces at readback
                    err = ServiceClosed(
                        f"audio delivery failed: {type(e).__name__}: {e}"
                    )
                    for _, group in dispatched:
                        for key, *_ in group:
                            key._push(err)
                    for req, _ in final_pushes:
                        req._push(err)
                    # fail everything still queued, then hand the error to
                    # the worker (next iteration raises -> restart path)
                    while True:
                        try:
                            nxt = pq.get_nowait()
                        except queue.Empty:
                            break
                        if nxt is None:
                            break
                        d2, f2 = nxt
                        for _, group in d2:
                            for key, *_ in group:
                                key._push(err)
                        for req, _ in f2:
                            req._push(err)
                    pull_err[0] = e
                    return

        puller = threading.Thread(
            target=_pull_loop, name="tts-service-pull", daemon=True
        )
        puller.start()

        slots = [_SlotView() for _ in range(b)]
        backlog: deque[TTSRequest] = deque()
        # requests released from their slot whose final chunk has not been
        # pushed yet (it is produced by the batched-vocode loop below); the
        # crash handler must fail these too or their consumers hang
        finishing: list[TTSRequest] = []
        temps = np.full((b,), 1.0, np.float32)
        state = None
        pending = None  # lazy (frames, counts, eos, state) of chunk `it`
        # deferred boundary ops, FIFO:
        # ("admit", slot, fresh, src_row) | ("park", slot)
        ops: list[tuple] = []
        it = 0

        def apply_ops(state):
            for op in ops:
                if op[0] == "admit":
                    state = srv.admit_stream(
                        state, jnp.int32(op[1]), op[2], self.statics,
                        src=jnp.int32(op[3]),
                    )
                else:
                    state = srv.park_slot(state, jnp.int32(op[1]))
            ops.clear()
            return state

        def occupied() -> bool:
            return any(s.req is not None for s in slots)

        def finish(req: TTSRequest, *, error: Exception | None = None):
            if error is not None:
                packer.release(req)
                req._push(error)
                return
            t0 = packer.sent(req)
            packer.release(req)
            req._push(
                AudioChunk(
                    samples=np.zeros(0, np.float32),
                    token_range=(t0, t0),
                    is_final=True,
                )
            )

        try:
            while True:
                if pull_err[0] is not None:
                    raise pull_err[0]  # restart with a fresh batch + puller
                if self._stop.is_set():
                    raise ServiceClosed("service is shut down")

                # 1. arrivals -> backlog -> free slots
                idle = pending is None and not occupied() and not backlog
                try:
                    backlog.append(
                        self._inbox.get(timeout=0.2)
                        if idle
                        else self._inbox.get_nowait()
                    )
                except queue.Empty:
                    if idle:
                        continue
                while True:
                    try:
                        backlog.append(self._inbox.get_nowait())
                    except queue.Empty:
                        break

                bootstrap: dict[int, TTSRequest] = {}
                midflight: dict[int, TTSRequest] = {}
                for slot in range(b):
                    if not backlog:
                        break
                    if slots[slot].req is not None:
                        continue
                    req = backlog.popleft()
                    self._stats.inc("waiting", -1)
                    if req.cancelled:
                        finish(req)
                        continue
                    # claim the slot BEFORE prefill: if prefill raises, the
                    # crash handler finds the request in `slots` and fails
                    # its stream instead of orphaning it (consumer would
                    # block forever on a queue nobody ever feeds)
                    temps[slot] = req.temperature
                    slots[slot].req = req
                    if state is None:
                        # batched below: ONE full-B prefill for the whole
                        # bootstrap burst instead of per-request B=1 calls
                        bootstrap[slot] = req
                        slots[slot].active_from = 0
                        continue
                    midflight[slot] = req
                    slots[slot].active_from = it if pending is None else it + 1
                if bootstrap:
                    state = self._prefill_bootstrap(bootstrap)
                if midflight:
                    if len(midflight) == 1:
                        # single arrival: the B=1 prefill is cheaper than a
                        # full-B pass
                        ((slot, req),) = midflight.items()
                        ops.append(("admit", slot, self._prefill(req), 0))
                    else:
                        # arrival BURST into a running batch: ONE full-B
                        # prefill holds every arrival at its slot's row, and
                        # each admission copies row slot -> slot (r5 burst
                        # attribution: k sequential B=1 prefill chains were
                        # the straggler cost)
                        fresh_b = self._prefill_bootstrap(midflight)
                        for slot in midflight:
                            ops.append(("admit", slot, fresh_b, slot))

                if state is None:
                    continue

                # 2. no chunk in flight: apply ops, dispatch, loop (arrivals
                # can land while the chunk computes)
                if pending is None:
                    state = apply_ops(state)
                    if occupied():
                        pending = srv.decode_chunk_serving(
                            pl.params, pl.cp_params, state,
                            jnp.asarray(temps), self.statics,
                        )
                    continue

                # 3. boundary: chunk `it` state back, admit, prefetch `it+1`
                frames_d, _counts, eos_d, state = pending
                state = apply_ops(state)
                pending = (
                    srv.decode_chunk_serving(
                        pl.params, pl.cp_params, state,
                        jnp.asarray(temps), self.statics,
                    )
                    if occupied()
                    else None
                )

                # 4. route chunk `it`'s frames; vocode; emit
                frames_np = np.asarray(frames_d)
                eos_np = np.asarray(eos_d)
                rows = []
                empty_finals: list[TTSRequest] = []
                for slot in range(b):
                    sv = slots[slot]
                    req = sv.req
                    if req is None or it < sv.active_from:
                        continue
                    if req.cancelled:
                        packer.drop(req)  # buffered frames die with it
                        finish(req)
                        sv.req = None
                        ops.append(("park", slot))
                        continue
                    valid = frames_np[slot][frames_np[slot][:, 0] >= 0]
                    take = max(0, min(len(valid), req.max_tokens - req.emitted))
                    valid = gen_mod.filter_valid_frames(valid[:take])
                    req.emitted += take
                    self._stats.inc("frames_decoded", take)
                    done = bool(eos_np[slot]) or req.emitted >= req.max_tokens
                    r, empty_final = packer.feed(req, valid, done)
                    rows.extend(r)
                    if done:
                        if empty_final:
                            empty_finals.append(req)
                        finishing.append(req)
                        sv.req = None
                        if not bool(eos_np[slot]):
                            ops.append(("park", slot))

                # batched vocode, fixed [B, nq, width] signature; >B ready
                # rows (bursts) just take extra calls. Only DISPATCHED here:
                # the puller thread pulls the PCM and pushes the chunks, so
                # the pull overlaps the already-in-flight next decode chunk.
                dispatched = srv.vocode_rows_dispatch(
                    rows, b, pl.vocoder_params, dec_cfg, ng, packer.width
                )
                final_pushes = []
                for req in empty_finals:
                    final_pushes.append((req, packer.sent(req)))
                if dispatched or final_pushes:
                    pq.put((dispatched, final_pushes))
                # bookkeeping AFTER the puller owns delivery: a crash from
                # here on must not double-own these requests (the handler
                # errors `finishing`; the puller delivers enqueued items)
                for req in finishing:  # includes the empty_finals
                    packer.release(req)
                finishing.clear()
                it += 1
                self._stats.inc("decode_chunks")
                self._stats.set(
                    "active_slots",
                    sum(1 for s in slots if s.req is not None),
                )
                self._stats.set("backlog", len(backlog))
        except Exception as e:  # propagate to every waiting consumer
            # stop this generation's puller first, letting already-enqueued
            # audio flush (close(drain=True) relies on terminal counts that
            # the puller pushes); a wedged readback only costs the timeout —
            # the error pushes below still free every consumer
            pq.put(None)
            puller.join(timeout=30.0 if isinstance(e, ServiceClosed) else 5.0)
            err = e if isinstance(e, ServiceClosed) else ServiceClosed(
                f"service worker died: {type(e).__name__}: {e}"
            )
            if not isinstance(e, ServiceClosed):
                import traceback

                traceback.print_exc()
            for sv in slots:
                if sv.req is not None:
                    sv.req._push(err)
                    sv.req = None
            for req in finishing:
                req._push(err)
            finishing.clear()
            for req in backlog:
                self._stats.inc("waiting", -1)
                req._push(err)
            # gauges must not freeze at their pre-crash values: everything
            # this batch held was just failed
            self._stats.set("active_slots", 0)
            self._stats.set("backlog", 0)
            if isinstance(e, ServiceClosed):
                # shutdown: nothing queued may hang
                while True:
                    try:
                        self._inbox.get_nowait()._push(err)
                        self._stats.inc("waiting", -1)
                    except queue.Empty:
                        break
                return
            raise  # _run decides: restart with a fresh batch, or give up
