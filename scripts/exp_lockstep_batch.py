"""Experiment: lockstep batched talker decode step + cp forward cost vs B.

Uses the model code's native batch dim (shared positions/slots across the
batch) — the serving-loop design — rather than vmap (which lowers per-stream
ragged cache updates to scatters).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = 32
config = Qwen3TTSConfig.standard()
dtype = jnp.bfloat16


@jax.jit
def device_init(key):
    k1, k2 = jax.random.split(key)
    return (talker_mod.init_talker_params(config, k1, dtype),
            cp_mod.init_cp_params(config.code_predictor_config, config.hidden_size, k2, dtype))


params, cp_params = device_init(jax.random.PRNGKey(0))
cache = talker_mod.init_kv_cache(config, 512, B, dtype)
embed = jnp.zeros((B, 1, config.hidden_size), dtype)


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
    """Batched cp: one frame of 15 groups with greedy batched sampling."""
    cfg = config.code_predictor_config
    nl = cfg.num_hidden_layers

    def frame(h):
        cache_shape = (nl, B, cfg.num_key_value_heads, cp_mod.CP_CACHE_LEN, cfg.head_dim)
        ck = jnp.zeros(cache_shape, dtype)
        cv = jnp.zeros(cache_shape, dtype)
        x0 = jnp.concatenate([h, h], axis=1)  # [B, 2, H]
        hl, ck, cv = cp_mod._cp_forward(cp_params, x0, ck, cv, jnp.int32(0), cfg)
        emb = cp_params["codec_embedding"]["w"]
        heads = cp_params["lm_head"]["w"]

        def group(k, carry):
            hl, ck, cv, acc = carry
            logits = jnp.einsum("bh,vh->bv", hl[:, 0, :].astype(jnp.float32),
                                heads[k].astype(jnp.float32))
            codes = jnp.argmax(logits, -1)  # [B] greedy batched
            x = emb[k][codes][:, None, :].astype(dtype)
            hl, ck, cv = cp_mod._cp_forward(cp_params, x, ck, cv, (k + 2).astype(jnp.int32), cfg)
            return hl, ck, cv, acc + codes
        hl, ck, cv, acc = jax.lax.fori_loop(0, 14, group, (hl, ck, cv, jnp.zeros((B,), jnp.int32)))
        return hl, acc

    def body(i, carry):
        h, acc = carry
        hl, codes = frame(h)
        return h + hl.astype(h.dtype) * 1e-9, acc + codes
    return jax.lax.fori_loop(0, N, body, (h0, jnp.zeros((B,), jnp.int32)))


def bench(name, fn, *args):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"RESULT {name} B={B}: {dt:.3f} ms/step ({dt/B:.3f} ms/stream-frame)", flush=True)


bench("talker_step", talker_loop, params, embed, cache)
h0 = jnp.zeros((B, 1, config.hidden_size), dtype)
bench("cp_frame", cp_loop, cp_params, h0)
print("DONE", flush=True)
