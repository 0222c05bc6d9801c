"""Experiment: end-to-end batched serving RTF per chip (prefill + decode
chunks via models/serving.py) on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod, serving as srv
from qwen3_tts_tpu.testing import FakeByteTokenizer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
config = Qwen3TTSConfig.standard()
dtype = jnp.bfloat16


@jax.jit
def device_init(key):
    k1, k2 = jax.random.split(key)
    return (talker_mod.init_talker_params(config, k1, dtype),
            cp_mod.init_cp_params(config.code_predictor_config, config.hidden_size, k2, dtype))


params, cp_params = device_init(jax.random.PRNGKey(0))
pd = prompt_mod.assemble_prompt(params, config, FakeByteTokenizer(),
    "A serving benchmark sentence for lockstep batched decode on one chip.", speaker="aiden")
p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
statics = gen_mod.GenStatics(config=config, capacity=pb + gen_mod.RING_SLACK,
                             chunk_steps=48, track_cp_penalty=False)
temp = jnp.float32(0.9)

embeds = jnp.zeros((B, pb, config.hidden_size), dtype)
embeds = embeds.at[:, :p].set(jnp.broadcast_to(pd.input_embeds.astype(dtype), (B, p, config.hidden_size)))
trailing = jnp.zeros((B, tb, config.hidden_size), dtype)
trailing = trailing.at[:, :t].set(jnp.broadcast_to(pd.trailing_hidden.astype(dtype), (B, t, config.hidden_size)))
lengths = jnp.full((B,), p, jnp.int32)
totals = jnp.full((B,), t, jnp.int32)
rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(100, 100 + B))


def fresh():
    return srv.prefill_batched(params, embeds, lengths, trailing, totals,
                               pd.tts_pad_embed.astype(dtype), rngs, statics)


t0 = time.perf_counter()
state = fresh()
frames, counts, eos, state = srv.decode_chunk_serving(params, cp_params, state, temp, statics)
frames.block_until_ready()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

state = fresh()
jax.block_until_ready(state)
t0 = time.perf_counter()
n = 3
for _ in range(n):
    frames, counts, eos, state = srv.decode_chunk_serving(params, cp_params, state, temp, statics)
frames.block_until_ready()
dt = time.perf_counter() - t0
stream_frames = n * 48 * B
print(f"RESULT serving B={B}: {dt/(n*48)*1000:.2f} ms/step-set "
      f"-> per-chip RTF={dt/(stream_frames*0.08):.4f} "
      f"({stream_frames/dt:.0f} frames/s/chip)", flush=True)
