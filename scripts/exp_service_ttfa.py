"""Per-REQUEST time-to-first-audio through the real TTSService worker.

exp_serving_ttfa.py measures the serving primitives (prefill + one decode
chunk + one vocoder batch) under a hand-rolled all-at-once admission; this
script measures the deployed surface instead: a running TTSService
(qwen3_tts_tpu/service.py) with B slots, requests submitted from independent
threads, TTFA = wall time from submit() to the first non-empty AudioChunk in
that request's stream. Two scenarios:

  burst:  B requests submitted simultaneously into an idle service
          (worst case: all prefills + the first decode chunk + the first
          vocoder batch contend);
  steady: the batch is kept busy by long-running streams, then K fresh
          requests arrive and are admitted mid-flight (the production
          arrival pattern; includes the in-flight-chunk wait).

1.7B dims, shared rowwise-int8 weights + mega-kernels (pipeline defaults),
fake tokenizer / random weights (timing-faithful; the real checkpoint only
changes the numbers in the frames). Record results in docs/SERVING.md.
"""

import json
import os
import statistics
import sys
import threading
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
import jax

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from bench import build_models
from qwen3_tts_tpu.config import Qwen3TTSConfig, TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.service import TTSService
from qwen3_tts_tpu.testing import FakeByteTokenizer

B = 16
# argv: [chunk_steps] [first_decode_chunk]  (defaults = reference-parity
# 18-frame cadence, no early first chunk). The TTFA ladder to measure:
# `18` (baseline), `6 6` (fine cadence + early first audio).
CHUNK_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 18
FIRST_CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else None
DECODE_CHUNK = 18  # 18 frames * 1920 samples = 1.44 s per audio chunk
TEXT = "Sixteen concurrent users each want their first chunk of audio fast."


def build_pipeline():
    config = Qwen3TTSConfig.standard_1_7b()
    vcfg = TokenizerDecoderConfig()
    vparams = jax.jit(lambda k: voc.init_vocoder_params(vcfg, k, jnp.float32))(
        jax.random.PRNGKey(7)
    )
    jax.block_until_ready(vparams)
    params, cp_params = build_models(config, jnp.bfloat16, use_kernels=True)
    return SimpleNamespace(
        config=config,
        params=params,
        cp_params=cp_params,
        tokenizer=FakeByteTokenizer(),
        speech_config=SimpleNamespace(decoder_config=vcfg),
        vocoder_params=vparams,
        pipeline_config=SimpleNamespace(
            default_temperature=0.9, default_max_tokens=96
        ),
    )


def ttfa_of(svc: TTSService, text: str, max_tokens: int, seed: int) -> float:
    t0 = time.perf_counter()
    req = svc.submit(text, speaker="aiden", max_tokens=max_tokens, seed=seed)
    first = None
    for c in req.chunks():
        if first is None and len(c.samples):
            first = time.perf_counter() - t0
    return first if first is not None else float("nan")


def burst(svc: TTSService, n: int, max_tokens: int) -> list[float]:
    out: list[float | None] = [None] * n
    barrier = threading.Barrier(n)

    def one(i: int):
        barrier.wait()
        out[i] = ttfa_of(svc, TEXT, max_tokens, seed=100 + i)

    ts = [threading.Thread(target=one, args=(i,)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return [x for x in out if x is not None]


def steady(svc: TTSService, fresh: int, max_tokens: int) -> list[float]:
    """Fill B-`fresh` slots with long streams, then time `fresh` arrivals."""
    long_reqs = [
        svc.submit(TEXT, speaker="aiden", max_tokens=220, seed=i)
        for i in range(B - fresh)
    ]
    # wait until the long batch is decoding (first audio out of each)
    consumers = []
    for r in long_reqs:
        def drain(r=r):
            for _ in r.chunks():
                pass
        th = threading.Thread(target=drain)
        th.start()
        consumers.append(th)
    time.sleep(2.5)  # batch mid-flight
    vals = burst(svc, fresh, max_tokens)
    for r in long_reqs:
        r.cancel()
    for th in consumers:
        th.join(timeout=60)
    return vals


def main() -> None:
    pl = build_pipeline()
    svc = TTSService(
        pl, batch_size=B, chunk_steps=CHUNK_STEPS,
        decode_chunk=DECODE_CHUNK, left_context=8,
        first_decode_chunk=FIRST_CHUNK,
        # the byte-level fake tokenizer yields ~83 trailing tokens for TEXT;
        # the default trailing bucket (64) rejects it at submit()
        trailing_bucket=128,
    )
    try:
        # compile warmup: every jit signature the measurement will hit
        print("warmup (compiles)...", file=sys.stderr, flush=True)
        w = burst(svc, B, max_tokens=40)
        print(f"warmup ttfa {sorted(round(x * 1e3) for x in w)}",
              file=sys.stderr, flush=True)

        b_vals = []
        for rep in range(3):
            b_vals.append(sorted(burst(svc, B, max_tokens=96)))
            time.sleep(0.5)
        best_run = min(b_vals, key=lambda v: statistics.median(v))

        s_vals = steady(svc, fresh=4, max_tokens=96)

        med = statistics.median(best_run)
        print(json.dumps({
            "metric": "service_ttfa_b16_1.7b_ms",
            "value": round(med * 1e3, 1),
            "unit": "ms",
            "aux": {
                "burst_median_ms": round(med * 1e3, 1),
                "burst_min_ms": round(best_run[0] * 1e3, 1),
                "burst_max_ms": round(best_run[-1] * 1e3, 1),
                "burst_all_runs_median_ms": [
                    round(statistics.median(v) * 1e3, 1) for v in b_vals
                ],
                "steady_admission_ms": sorted(round(x * 1e3, 1) for x in s_vals),
                "audio_per_chunk_s": DECODE_CHUNK * 1920 / 24000.0,
                "batch": B,
            },
        }), flush=True)
    finally:
        svc.close()


if __name__ == "__main__":
    main()
