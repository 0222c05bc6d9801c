"""Validate + time the talker mega-kernel on the real TPU at 0.6B dims, then
time the FULL decode step with both mega-kernels attached.

Usage: python scripts/exp_talker_kernel.py [unit|full|both]
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod
from qwen3_tts_tpu.ops.pallas.talker_megakernel import (
    build_talker_kernel_params_device,
    cache_to_kernel_layout,
    talker_step_kernel,
    talker_step_w8a8_ref,
)
from qwen3_tts_tpu.ops.pallas.cp_megakernel import build_cp_kernel_params_device
from qwen3_tts_tpu.testing import FakeByteTokenizer

P = lambda *a: print(*a, flush=True)
config = Qwen3TTSConfig.standard()
dtype = jnp.bfloat16
CAP = 288
which = sys.argv[1] if len(sys.argv) > 1 else "both"
P("backend:", jax.default_backend())


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
jax.block_until_ready(params)
tkp = build_talker_kernel_params_device(params, config)
jax.block_until_ready(tkp)
P("init + talker kernel build done")

if which in ("unit", "both"):
    @jax.jit
    def mk_cache(key):
        kv = (config.num_hidden_layers, 1, config.num_key_value_heads, CAP,
              config.head_dim)
        k1, k2 = jax.random.split(key)
        return {
            "k": jax.random.normal(k1, kv, dtype) * 0.3,
            "v": jax.random.normal(k2, kv, dtype) * 0.3,
            "pos": jnp.where(jnp.arange(CAP) < 60, jnp.arange(CAP), -1).astype(jnp.int32),
        }

    cache = mk_cache(jax.random.PRNGKey(3))
    cache2 = jax.jit(lambda c: cache_to_kernel_layout(c, config))(cache)
    embed = (jax.random.normal(jax.random.PRNGKey(4), (1, 1, config.hidden_size),
                               jnp.float32) * 0.5).astype(dtype)
    position = jnp.int32(60)
    ws = jnp.int32(0)
    pos2d = jnp.full((1, 1), 60, jnp.int32)
    cos, sin = talker_mod._rope_cos_sin(config, pos2d)
    cos, sin = cos[0].astype(jnp.float32), sin[0].astype(jnp.float32)

    t0 = time.time()
    h_k, lg_k, c_k = talker_step_kernel(tkp, embed, cache2, position, ws, cos, sin, config)
    jax.block_until_ready(lg_k)
    P("talker kernel compile+run: %.1fs" % (time.time() - t0))
    t0 = time.time()
    h_m, lg_m, c_m = jax.jit(lambda *a: talker_step_w8a8_ref(*a, config))(
        tkp, embed, cache2, position, ws, cos, sin)
    jax.block_until_ready(lg_m)
    P("mirror compile+run: %.1fs" % (time.time() - t0))
    hd_ = float(jnp.max(jnp.abs(h_k.astype(jnp.float32) - h_m.astype(jnp.float32))))
    ld = float(jnp.max(jnp.abs(lg_k - lg_m)))
    P("h max diff: %.2e  logits max diff: %.2e  argmax equal: %s"
      % (hd_, ld, int(jnp.argmax(lg_k)) == int(jnp.argmax(lg_m))))

    # unit timing: chained steps in one jit
    N = 100

    @jax.jit
    def run_steps(tkp, embed, cache2):
        def body(i, carry):
            emb, c2 = carry
            h, lg, c2 = talker_step_kernel(
                tkp, emb, c2, position + i, ws, cos, sin, config)
            return h.astype(dtype), c2
        return jax.lax.fori_loop(0, N, body, (embed, cache2))

    r = run_steps(tkp, embed, cache2); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(3):
        r = run_steps(tkp, embed, cache2)
    jax.block_until_ready(r)
    P("talker mega-kernel: %.3f ms/step (jnp baseline ~2.3 ms)"
      % ((time.time() - t0) / 3 / N * 1e3))

if which in ("full", "both"):
    kp = build_cp_kernel_params_device(cp_params, config.code_predictor_config)
    jax.block_until_ready(kp)
    params_k = dict(params); params_k["kernel"] = tkp
    cp_k = dict(cp_params); cp_k["kernel"] = kp

    pd = prompt_mod.assemble_prompt(
        params, config, FakeByteTokenizer(),
        "A full mega-kernel decode benchmark sentence.", speaker="aiden")
    p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
    pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
    embeds = jnp.zeros((1, pb, config.hidden_size), dtype).at[:, :p].set(pd.input_embeds)
    trailing = jnp.zeros((1, tb, config.hidden_size), dtype).at[:, :t].set(pd.trailing_hidden)
    statics = gen_mod.GenStatics(config=config, capacity=pb + gen_mod.RING_SLACK,
                                 chunk_steps=48, track_cp_penalty=True)
    temp = jnp.float32(0.9)
    state = gen_mod.prefill(params_k, embeds, jnp.int32(p), trailing, jnp.int32(t),
                            pd.tts_pad_embed, jax.random.PRNGKey(0), statics)
    t0 = time.time()
    out, count, eos, state = gen_mod.decode_chunk(params_k, cp_k, state, temp, statics)
    jax.block_until_ready(out)
    P("full decode_chunk compile+first: %.1fs frames=%d" % (time.time() - t0, int(count)))
    n = 0
    t0 = time.time()
    for _ in range(4):
        out, count, eos, state = gen_mod.decode_chunk(params_k, cp_k, state, temp, statics)
        n += 48
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    P("FULL decode (both kernels): %.3f ms/frame (RTF %.4f); round-1 bf16 was 4.2"
      % (dt, dt / 80.0))
P("DONE")
