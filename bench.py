"""Benchmark: per-chip serving RTF on the default JAX backend.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the production serving configuration: BATCH utterances decoded in
lockstep on one chip (models/serving.py) — the full hot path per step
(batched talker step + on-device sampling + 15-group code-predictor sub-loop)
on the `.standard` (0.6B-class) config in bfloat16 with random weights (the
reference publishes no numbers, BASELINE.md; compute cost is
weight-value-independent). Per-chip RTF = wall_time / (B * audio_duration);
one frame = 80 ms of 24 kHz audio. vs_baseline = RTF / 0.05 (the BASELINE.md
per-chip target — lower is better, < 1.0 beats the target).

Measured context (ROADMAP.md): single-stream decode is ~4.2 ms/frame
(RTF ~0.053, per-op-latency/bandwidth bound); lockstep batching costs only
~20% more per step for 8 streams, ~45% for 16, ~85% for 32.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod
from qwen3_tts_tpu.models import prompt as prompt_mod
from qwen3_tts_tpu.models import serving as srv
from qwen3_tts_tpu.models import talker as talker_mod
from qwen3_tts_tpu.testing import FakeByteTokenizer

BASELINE_RTF = 0.05  # BASELINE.md target: RTF < 0.05 per chip
FRAME_SECONDS = 1920.0 / 24000.0  # 80 ms per codec frame
BATCH = 32
CHUNK_STEPS = 48


def main() -> None:
    config = Qwen3TTSConfig.standard()
    dtype = jnp.bfloat16

    # One jitted device-side init: eager per-weight RNG would dispatch
    # hundreds of ops over the (tunneled) device link, and host-side numpy
    # generation is minutes on throttled hosts.
    @jax.jit
    def device_init(key):
        k1, k2 = jax.random.split(key)
        return (
            talker_mod.init_talker_params(config, k1, dtype),
            cp_mod.init_cp_params(
                config.code_predictor_config, config.hidden_size, k2, dtype
            ),
        )

    params, cp_params = device_init(jax.random.PRNGKey(0))

    text = (
        "The quick brown fox jumps over the lazy dog while the TPU hums along, "
        "turning codec frames into twenty-four kilohertz audio in real time."
    )
    pd = prompt_mod.assemble_prompt(
        params, config, FakeByteTokenizer(), text, speaker="aiden"
    )
    assert pd is not None

    p = int(pd.input_embeds.shape[1])
    t = int(pd.trailing_hidden.shape[1])
    p_bucket = gen_mod.pick_bucket(p)
    t_bucket = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
    statics = gen_mod.GenStatics(
        config=config,
        capacity=p_bucket + gen_mod.RING_SLACK,
        chunk_steps=CHUNK_STEPS,
        track_cp_penalty=False,
    )

    h = config.hidden_size
    embeds = jnp.zeros((BATCH, p_bucket, h), dtype)
    embeds = embeds.at[:, :p].set(
        jnp.broadcast_to(pd.input_embeds.astype(dtype), (BATCH, p, h))
    )
    trailing = jnp.zeros((BATCH, t_bucket, h), dtype)
    trailing = trailing.at[:, :t].set(
        jnp.broadcast_to(pd.trailing_hidden.astype(dtype), (BATCH, t, h))
    )
    lengths = jnp.full((BATCH,), p, jnp.int32)
    totals = jnp.full((BATCH,), t, jnp.int32)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(100, 100 + BATCH))
    temp = jnp.float32(0.9)

    def fresh_state():
        return srv.prefill_batched(
            params, embeds, lengths, trailing, totals,
            pd.tts_pad_embed.astype(dtype), rngs, statics,
        )

    # Warmup / compile. decode donates state, so rebuild per timed run.
    state = fresh_state()
    frames, counts, eos, state = srv.decode_chunk_serving(
        params, cp_params, state, temp, statics
    )
    frames.block_until_ready()

    n_chunks = 3
    state = fresh_state()
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        frames, counts, eos, state = srv.decode_chunk_serving(
            params, cp_params, state, temp, statics
        )
    frames.block_until_ready()
    elapsed = time.perf_counter() - t0

    stream_frames = n_chunks * CHUNK_STEPS * BATCH
    rtf = elapsed / (stream_frames * FRAME_SECONDS)
    print(
        json.dumps(
            {
                "metric": f"serving_rtf_per_chip_0.6b_bf16_b{BATCH}",
                "value": round(rtf, 5),
                "unit": "rtf",
                "vs_baseline": round(rtf / BASELINE_RTF, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
