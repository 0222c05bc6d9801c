"""Measure the fused SEANet-block vocoder path vs the plain XLA path on the
real backend, at the streaming chunk shape and the bench e2e shape."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.ops.pallas.vocoder_kernels import build_vocoder_kernel_params


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    cfg = TokenizerDecoderConfig()
    params = jax.jit(lambda k: voc.init_vocoder_params(cfg, k, jnp.float32))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    kparams = dict(params)
    kparams["kernel"] = jax.device_put(build_vocoder_kernel_params(params, cfg))

    specs = [a for a in sys.argv[1:]] or ["26", "96"]
    for spec in specs:
        b, t = ([1] + [int(x) for x in spec.split("x")])[-2:]
        label = f"B={b} T={t}"
        codes = jnp.zeros((b, cfg.num_quantizers, t), jnp.int32)
        ms_plain = timeit(lambda c: voc.decode_frames_jit(params, c, cfg), codes)
        print(f"[{label}] plain {ms_plain:.3f} ms", flush=True)
        ms_fused = timeit(lambda c: voc.decode_frames_jit(kparams, c, cfg), codes)
        print(
            f"[{label}] fused {ms_fused:.3f} ms ({b*t*0.08:.2f} s audio)",
            flush=True,
        )


if __name__ == "__main__":
    main()
