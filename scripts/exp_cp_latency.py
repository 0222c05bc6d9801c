"""Decompose the cp mega-kernel's per-frame latency: full kernel vs a
1-layer variant vs a 4-group variant, timed in a serialized in-jit loop
(no host dispatch). Differences attribute time to the 5-layer stack vs the
per-group fixed work (head DMA wait + sampling + embed gather)."""
import dataclasses
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import code_predictor as cp_mod
from qwen3_tts_tpu.ops.pallas.cp_megakernel import (
    build_cp_kernel_params_device, predict_frame_kernel,
)

P = lambda *a: print(*a, flush=True)
config = Qwen3TTSConfig.standard()
th = config.hidden_size
dtype = jnp.bfloat16
N = 20


def bench_variant(name, cpc):
    params = jax.jit(
        lambda k: cp_mod.init_cp_params(cpc, th, k, dtype)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    kp = build_cp_kernel_params_device(params, cpc)
    jax.block_until_ready(kp)

    temp = jnp.float32(0.9)

    @jax.jit
    def loop(kp, ch, c0, key):
        def body(i, carry):
            ch, c0, key = carry
            key, k2 = jax.random.split(key)
            codes, esum, _ = predict_frame_kernel(kp, ch, c0, k2, temp, None, cpc)
            return (esum.astype(ch.dtype), c0, key)  # serialize on esum
        return jax.lax.fori_loop(0, N, body, (ch, c0, key))

    ch = jnp.zeros((1, 1, th), dtype)
    c0 = jnp.zeros((1, 1, th), dtype)
    key = jax.random.PRNGKey(1)
    out = loop(kp, ch, c0, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(kp, ch, c0, key)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / N * 1e3
    P(f"{name}: {ms:.3f} ms/frame")
    return ms


full = bench_variant("full (5L, 16 groups)", config.code_predictor_config)
one = bench_variant(
    "1-layer (16 groups)",
    dataclasses.replace(config.code_predictor_config, num_hidden_layers=1),
)
four = bench_variant(
    "4-group (5L)",
    dataclasses.replace(config.code_predictor_config, num_code_groups=4),
)
per_layer = (full - one) / 4
per_group = (full - four) / 12
P(f"-> per layer-stack layer: {per_layer*1000:.1f} us/frame "
  f"(x5 = {per_layer*5*1000:.0f} us)")
P(f"-> per group: {per_group*1000:.1f} us ({per_group*16*1000:.0f} us for 16)")
P(f"-> fixed remainder: {(full - per_layer*5*16/16 - 0):.3f}")
