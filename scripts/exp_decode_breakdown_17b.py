"""Where does the 1.7B-dims decode frame go? Time (a) the talker mega-kernel
step alone, (b) the cp mega-kernel frame alone, (c) a full decode_chunk per
frame — against the int8 weight-streaming bandwidth floor."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod
from qwen3_tts_tpu.ops.pallas.cp_megakernel import (
    build_cp_kernel_params_device, predict_frame_kernel,
)
from qwen3_tts_tpu.ops.pallas.talker_megakernel import (
    build_talker_kernel_params_device, cache_to_kernel_layout,
    talker_step_kernel,
)
from qwen3_tts_tpu.ops import rope as rope_ops
from qwen3_tts_tpu.testing import FakeByteTokenizer

P = lambda *a: print(*a, flush=True)
config = Qwen3TTSConfig.standard_1_7b()
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


def timeit(fn, n=50):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    # dispatch-throughput reference: a trivial jitted op timed the same way
    triv = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128), jnp.float32)
    def triv_once():
        return triv(z)
    P(f"trivial jit dispatch:      {timeit(triv_once):.3f} ms")

    params, cp_params = device_init(jax.random.PRNGKey(0))
    jax.block_until_ready(cp_params)
    tkp = build_talker_kernel_params_device(params, config)
    cpk = build_cp_kernel_params_device(cp_params, config.code_predictor_config)
    jax.block_until_ready((tkp, cpk))
    P("kernels built")
    int8_bytes = sum(
        int(np.prod(v.shape))
        for k, v in jax.tree_util.tree_flatten_with_path(tkp)[0]
        if v.dtype == jnp.int8
        for v in [v]
    )
    P(f"talker int8 weight set: {int8_bytes/2**20:.0f} MiB "
      f"-> floor {int8_bytes/819e9*1e3:.3f} ms @819GB/s")

    hc = config.hidden_size
    hd = config.head_dim
    cap = 512
    cache2 = {
        "k2": jnp.zeros((cap, config.num_hidden_layers
                         * config.num_key_value_heads * hd), dtype),
        "v2": jnp.zeros((cap, config.num_hidden_layers
                         * config.num_key_value_heads * hd), dtype),
        "pos": jnp.full((cap,), -1, jnp.int32),
    }
    embed = jnp.zeros((1, 1, hc), dtype)
    inv = jnp.asarray(rope_ops.inv_freq(hd, config.rope_theta))
    cos, sin = rope_ops.rope_cos_sin(jnp.asarray([300]), inv)
    pos = jnp.int32(300)
    ws = jnp.int32(120)

    def talker_once():
        h, lg, _ = talker_step_kernel(
            tkp, embed, cache2, pos, ws, cos.astype(jnp.float32),
            sin.astype(jnp.float32), config
        )
        return lg

    P(f"talker step (mega-kernel): {timeit(talker_once):.3f} ms")

    th = config.hidden_size
    code_hidden = jnp.zeros((1, 1, th), dtype)
    code0_embed = jnp.zeros((1, 1, th), dtype)
    key = jax.random.PRNGKey(0)
    temp = jnp.float32(0.9)

    def cp_once():
        codes, esum, _ = predict_frame_kernel(
            cpk, code_hidden, code0_embed, key, temp, None, config.code_predictor_config
        )
        return codes

    P(f"cp frame (mega-kernel):    {timeit(cp_once):.3f} ms")

    # full decode chunk
    params2 = dict(params); params2["kernel"] = tkp
    cp2 = dict(cp_params); cp2["kernel"] = cpk
    pd = prompt_mod.assemble_prompt(
        params, config, FakeByteTokenizer(),
        "Breakdown sentence for the seventeen hundred million parameter "
        "configuration of the model.", speaker="aiden")
    p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
    pb = gen_mod.pick_bucket(p)
    tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
    embeds = jnp.zeros((1, pb, hc), dtype).at[:, :p].set(pd.input_embeds)
    trailing = jnp.zeros((1, tb, hc), dtype).at[:, :t].set(pd.trailing_hidden)
    statics = gen_mod.GenStatics(
        config=config, capacity=pb + gen_mod.RING_SLACK,
        chunk_steps=CHUNK, track_cp_penalty=False)
    def fresh():
        return gen_mod.prefill(
            params2, embeds, jnp.int32(p), trailing, jnp.int32(t),
            pd.tts_pad_embed, jax.random.PRNGKey(42), statics)

    def prefill_once():
        st = fresh()
        jax.block_until_ready(st)
        return st

    # decode_chunk donates its state: re-prefill per iteration and subtract
    st = prefill_once()
    frames, count, eos, st = gen_mod.decode_chunk(params2, cp2, st, temp, statics)
    jax.block_until_ready(frames)  # compile both

    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        st = fresh()
        frames, count, eos, st = gen_mod.decode_chunk(params2, cp2, st, temp, statics)
    jax.block_until_ready(frames)
    total = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    for _ in range(n):
        st2 = fresh()
    jax.block_until_ready(st2)
    pre = (time.perf_counter() - t0) / n * 1e3
    P(f"prefill: {pre:.2f} ms; prefill+chunk: {total:.2f} ms")
    P(f"decode_chunk: {total-pre:.2f} ms / {CHUNK} frames = "
      f"{(total-pre)/CHUNK:.3f} ms/frame")


if __name__ == "__main__":
    main()
