"""Experiment: full single-stream decode_chunk ms/frame with and without the
cp mega-kernel attached (standard 0.6B dims, bf16 talker, real prompt path).

Usage: python scripts/exp_decode_with_kernel.py [kernel|jnp|both]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod
from qwen3_tts_tpu.ops.pallas.cp_megakernel import build_cp_kernel_params_device
from qwen3_tts_tpu.testing import FakeByteTokenizer

P = lambda *a: print(*a, flush=True)
config = Qwen3TTSConfig.standard()
dtype = jnp.bfloat16
CHUNK = 48


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
jax.block_until_ready(cp_params)
P("init done")

kp = build_cp_kernel_params_device(cp_params, config.code_predictor_config)
jax.block_until_ready(kp)
P("kernel params built")

pd = prompt_mod.assemble_prompt(
    params, config, FakeByteTokenizer(),
    "A single-stream decode benchmark sentence for the mega-kernel.",
    speaker="aiden",
)
p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
embeds = jnp.zeros((1, pb, config.hidden_size), dtype).at[:, :p].set(pd.input_embeds)
trailing = jnp.zeros((1, tb, config.hidden_size), dtype).at[:, :t].set(pd.trailing_hidden)
statics = gen_mod.GenStatics(
    config=config, capacity=pb + gen_mod.RING_SLACK, chunk_steps=CHUNK,
    track_cp_penalty=True,
)
temp = jnp.float32(0.9)


def run_variant(name, cp_tree):
    state = gen_mod.prefill(
        params, embeds, jnp.int32(p), trailing, jnp.int32(t),
        pd.tts_pad_embed, jax.random.PRNGKey(0), statics,
    )
    t0 = time.time()
    out, count, eos, state = gen_mod.decode_chunk(params, cp_tree, state, temp, statics)
    jax.block_until_ready(out)
    P("%s: first chunk (compile) %.1fs, frames=%d" % (name, time.time() - t0, int(count)))
    # timed chunks
    n_frames = 0
    t0 = time.time()
    for _ in range(4):
        out, count, eos, state = gen_mod.decode_chunk(params, cp_tree, state, temp, statics)
        n_frames += CHUNK  # random weights never hit EOS in practice; count checked
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_frames * 1e3
    P("%s: %.3f ms/frame (RTF %.4f)  last count=%d" % (name, dt, dt / 80.0, int(count)))
    return dt


which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("kernel", "both"):
    cp_k = dict(cp_params); cp_k["kernel"] = kp
    run_variant("cp-kernel", cp_k)
if which in ("jnp", "both"):
    run_variant("jnp", cp_params)
P("DONE")
