"""Experiment: per-component decode timing — talker step vs code-predictor
frame vs sampling — each looped inside one jit to exclude dispatch overhead."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.ops.sampling import sample_token

config = Qwen3TTSConfig.standard()
dtype = jnp.bfloat16
N = 32

params = talker_mod.init_talker_params(config, jax.random.PRNGKey(0), dtype)
cp_params = cp_mod.init_cp_params(config.code_predictor_config, config.hidden_size,
                                  jax.random.PRNGKey(1), dtype)
cache = talker_mod.init_kv_cache(config, 512, 1, dtype)
embed = jnp.zeros((1, 1, config.hidden_size), dtype)

@jax.jit
def talker_loop(params, embed, cache):
    def body(i, carry):
        e, c = carry
        h, c = talker_mod.talker_decode_step(params, e, c, jnp.int32(100) + i,
                                             jnp.int32(0), config)
        return h.astype(e.dtype), c
    return jax.lax.fori_loop(0, N, body, (embed, cache))

@jax.jit
def cp_loop(cp_params, h0):
    def body(i, carry):
        h, acc = carry
        codes, embed_sum, _ = cp_mod.predict_frame(
            cp_params, h, h, jax.random.PRNGKey(0), jnp.float32(0.9),
            None, config.code_predictor_config)
        return h + embed_sum.astype(h.dtype) * 1e-9, acc + codes[0]
    return jax.lax.fori_loop(0, N, body, (h0, jnp.int32(0)))

@jax.jit
def sample_loop(logits):
    def body(i, acc):
        t = sample_token(logits + acc.astype(jnp.float32) * 1e-9,
                         jax.random.PRNGKey(0), jnp.float32(0.9))
        return acc + t
    return jax.lax.fori_loop(0, N, body, jnp.int32(0))

def bench(name, fn, *args):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name}: {dt:.3f} ms/iter", flush=True)

h0 = jnp.zeros((1, 1, config.hidden_size), dtype)
logits = jnp.zeros((config.vocab_size,), jnp.float32)
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("talker", "all"):
    bench("talker_decode_step", talker_loop, params, embed, cache)
if which in ("cp", "all"):
    bench("cp_predict_frame(15 groups)", cp_loop, cp_params, h0)
if which in ("sample", "all"):
    bench("sample_token", sample_loop, logits)
print("DONE", flush=True)
