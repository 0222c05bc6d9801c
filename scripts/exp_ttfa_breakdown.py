"""Experiment: TTFA decomposition — prefill / decode-18 / vocoder / transfers."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig, TokenizerDecoderConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod, vocoder as voc
from qwen3_tts_tpu.testing import FakeByteTokenizer

config = Qwen3TTSConfig.standard()
vcfg = TokenizerDecoderConfig()
dtype = jnp.bfloat16

@jax.jit
def device_init(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return (talker_mod.init_talker_params(config, k1, dtype),
            cp_mod.init_cp_params(config.code_predictor_config, config.hidden_size, k2, dtype),
            voc.init_vocoder_params(vcfg, k3, jnp.float32))

params, cp_params, voc_params = device_init(jax.random.PRNGKey(0))
jax.block_until_ready(voc_params)
pd = prompt_mod.assemble_prompt(params, config, FakeByteTokenizer(),
    "Time to first audio chunk measurement sentence.", speaker="aiden")
p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
embeds = jnp.zeros((1, pb, config.hidden_size), dtype).at[:, :p].set(pd.input_embeds)
trailing = jnp.zeros((1, tb, config.hidden_size), dtype).at[:, :t].set(pd.trailing_hidden)
statics = gen_mod.GenStatics(config=config, capacity=pb + gen_mod.RING_SLACK,
                             chunk_steps=18, track_cp_penalty=False)
temp = jnp.float32(0.9)

def run_all():
    state = gen_mod.prefill(params, embeds, jnp.int32(p), trailing, jnp.int32(t),
                            pd.tts_pad_embed, jax.random.PRNGKey(42), statics)
    frames, count, eos, state = gen_mod.decode_chunk(params, cp_params, state, temp, statics)
    codes = jnp.clip(jnp.transpose(frames)[None], 0, vcfg.codebook_size - 1)
    wav = voc.decode_frames_jit(voc_params, codes, vcfg)
    return state, frames, wav

state, frames, wav = run_all()
jax.block_until_ready((state, frames, wav))
print("warm", flush=True)

def ms(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f()
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) * 1000)
    return min(ts)

t_prefill = ms(lambda: gen_mod.prefill(params, embeds, jnp.int32(p), trailing, jnp.int32(t),
                                       pd.tts_pad_embed, jax.random.PRNGKey(42), statics))
print(f"RESULT prefill (bucket {pb}): {t_prefill:.1f} ms", flush=True)

def chunk_from_fresh():
    st = gen_mod.prefill(params, embeds, jnp.int32(p), trailing, jnp.int32(t),
                         pd.tts_pad_embed, jax.random.PRNGKey(42), statics)
    return gen_mod.decode_chunk(params, cp_params, st, temp, statics)[0]
t_both = ms(chunk_from_fresh, 3)
print(f"RESULT prefill+18frames: {t_both:.1f} ms (decode share ~{t_both - t_prefill:.1f} ms)", flush=True)

codes = jnp.clip(jnp.transpose(frames)[None], 0, vcfg.codebook_size - 1)
t_voc = ms(lambda: voc.decode_frames_jit(voc_params, codes, vcfg))
print(f"RESULT vocoder 18f: {t_voc:.1f} ms", flush=True)
