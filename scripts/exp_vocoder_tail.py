"""A/B the vocoder tail fusion (out_snake + out_conv + clip folded into the
last SEANet block kernel) against the previous fused path (tail in XLA).
Stripping the t_* keys from the last block's kernel params restores the
pre-tail behavior exactly (halo and output layout are chosen at call time
from key presence)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.ops.pallas.vocoder_kernels import build_vocoder_kernel_params


def timeit(fn, *args, n=30):
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
    kernel = build_vocoder_kernel_params(params, cfg)
    kernel_notail = dict(kernel)
    kernel_notail["blocks"] = list(kernel["blocks"])
    kernel_notail["blocks"][-1] = {
        k: v for k, v in kernel["blocks"][-1].items() if not k.startswith("t_")
    }
    p_tail = dict(params)
    p_tail["kernel"] = jax.device_put(kernel)
    p_notail = dict(params)
    p_notail["kernel"] = jax.device_put(kernel_notail)

    for t in [int(x) for x in sys.argv[1:]] or [26, 106]:
        codes = jnp.zeros((1, cfg.num_quantizers, t), jnp.int32)
        for _ in range(2):  # two passes to expose noise
            a = timeit(lambda c: voc.decode_frames_jit(p_notail, c, cfg), codes)
            b = timeit(lambda c: voc.decode_frames_jit(p_tail, c, cfg), codes)
            print(f"[T={t}] no-tail {a:.3f} ms  tail {b:.3f} ms", flush=True)
        w1 = voc.decode_frames_jit(p_notail, codes, cfg)
        w2 = voc.decode_frames_jit(p_tail, codes, cfg)
        err = float(jnp.max(jnp.abs(w1 - w2)))
        print(f"[T={t}] max |dw| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
