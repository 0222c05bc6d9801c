"""Per-stream time-to-first-audio under continuous-batching serving at B=16.

Measures the streaming-serving pipeline (models/serving.py: lockstep decode
chunks of 18 + batched [B, nq, 26] vocoder calls, the serve_audio shapes) on
the real chip at 1.7B-class dims with the pipeline-default shared rowwise-int8
weights: wall time from request arrival (prompt embeds ready) to the first
1.44 s audio chunk leaving the vocoder, when B=16 streams are admitted
together (the worst case — all prefills + first chunks contend).

Writes one JSON line; record the result in docs/SERVING.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from bench import build_models
from qwen3_tts_tpu.config import Qwen3TTSConfig, TokenizerDecoderConfig
from qwen3_tts_tpu.models import generate as gen_mod
from qwen3_tts_tpu.models import prompt as prompt_mod
from qwen3_tts_tpu.models import serving as srv
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.testing import FakeByteTokenizer

B = 16
DECODE_CHUNK = 18  # frames per vocoder batch = 1.44 s of audio
CHUNK_STEPS = 18   # decode cadence matches the vocoder chunk
TEXT = "Sixteen concurrent users ask for their first chunk of audio at once."


def main() -> None:
    config = Qwen3TTSConfig.standard_1_7b()
    vcfg = TokenizerDecoderConfig()
    dtype = jnp.bfloat16
    voc_params = jax.jit(lambda k: voc.init_vocoder_params(vcfg, k, jnp.float32))(
        jax.random.PRNGKey(7)
    )
    jax.block_until_ready(voc_params)
    params, cp_params = build_models(config, dtype, use_kernels=True)

    pd = prompt_mod.assemble_prompt(
        params, config, FakeByteTokenizer(), TEXT, speaker="aiden"
    )
    p = int(pd.input_embeds.shape[1])
    t = int(pd.trailing_hidden.shape[1])
    pb = gen_mod.pick_bucket(p)
    tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
    statics = gen_mod.GenStatics(
        config=config, capacity=pb + gen_mod.RING_SLACK,
        chunk_steps=CHUNK_STEPS, track_cp_penalty=False,
    )
    h = config.hidden_size
    embeds = jnp.zeros((B, pb, h), dtype).at[:, :p].set(
        jnp.broadcast_to(pd.input_embeds.astype(dtype), (B, p, h))
    )
    trailing = jnp.zeros((B, tb, h), dtype).at[:, :t].set(
        jnp.broadcast_to(pd.trailing_hidden.astype(dtype), (B, t, h))
    )
    lengths = jnp.full((B,), p, jnp.int32)
    totals = jnp.full((B,), t, jnp.int32)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    temp = jnp.float32(0.9)
    nq = config.code_predictor_config.num_code_groups
    vwidth = DECODE_CHUNK + 8  # serve_audio's one fixed signature

    def first_chunk():
        state = srv.prefill_batched(
            params, embeds, lengths, trailing, totals,
            pd.tts_pad_embed.astype(dtype), rngs, statics,
        )
        frames, counts, eos, state = srv.decode_chunk_serving(
            params, cp_params, state, temp, statics
        )
        # first vocoder batch: 18 new frames, no left context yet, rows
        # end-padded to the serve_audio width (causal => transparent)
        codes = jnp.clip(frames[:, :DECODE_CHUNK, :], 0, vcfg.codebook_size - 1)
        batch = jnp.zeros((B, nq, vwidth), jnp.int32).at[:, :, :DECODE_CHUNK].set(
            jnp.swapaxes(codes, 1, 2)
        )
        wav = voc.decode_frames_jit(voc_params, batch, vcfg)
        np.asarray(wav)  # host sync = audio bytes ready to send
        return counts

    first_chunk()  # compile
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        first_chunk()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    audio_s = DECODE_CHUNK * 1920 / 24000.0
    print(
        json.dumps(
            {
                "metric": "serving_ttfa_b16_1.7b_ms",
                "value": round(walls[len(walls) // 2] * 1000, 1),
                "unit": "ms",
                "aux": {
                    "best_ms": round(walls[0] * 1000, 1),
                    "worst_ms": round(walls[-1] * 1000, 1),
                    "audio_per_chunk_s": audio_s,
                    "batch": B,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
