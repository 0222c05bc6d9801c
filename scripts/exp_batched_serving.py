"""Experiment: batched serving decode throughput (vmap over B streams)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod
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
    "A serving benchmark sentence for batched decode on one chip.", speaker="aiden")
p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
embeds = jnp.zeros((1, pb, config.hidden_size), dtype).at[:, :p].set(pd.input_embeds)
trailing = jnp.zeros((1, tb, config.hidden_size), dtype).at[:, :t].set(pd.trailing_hidden)
statics = gen_mod.GenStatics(config=config, capacity=pb + gen_mod.RING_SLACK,
                             chunk_steps=48, track_cp_penalty=True)
temp = jnp.float32(0.9)


def fresh_states():
    states = [
        gen_mod.prefill(params, embeds, jnp.int32(p), trailing, jnp.int32(t),
                        pd.tts_pad_embed, jax.random.PRNGKey(100 + i), statics)
        for i in range(B)
    ]
    return gen_mod.stack_states(states)


t0 = time.perf_counter()
states = fresh_states()
frames, counts, eos, states = gen_mod.decode_chunk_batched(params, cp_params, states, temp, statics)
frames.block_until_ready()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

states = fresh_states()
jax.block_until_ready(states)
t0 = time.perf_counter()
n = 3
for _ in range(n):
    frames, counts, eos, states = gen_mod.decode_chunk_batched(params, cp_params, states, temp, statics)
frames.block_until_ready()
dt = time.perf_counter() - t0
frames_total = n * 48 * B
per_chip_rtf = dt / (frames_total * 0.08)
print(f"RESULT B={B}: {dt/(n*48)*1000:.2f} ms per 48-frame step-set "
      f"({dt/frames_total*1000:.3f} ms/frame/chip) per-chip RTF={per_chip_rtf:.4f}", flush=True)
