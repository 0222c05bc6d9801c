"""Per-stage vocoder decode timing on the real backend.

Breaks decode_frames into stages (RVQ+pre-conv, pre-transformer, upsample,
SEANet blocks, output) and times each as its own jit at the streaming chunk
shape (B=1, T=18+8 frames) to find where the time goes. Params are passed as
jit ARGUMENTS (capturing them as closure constants makes XLA constant-fold
the weight tree and compile forever).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.ops.conv import (
    causal_conv1d,
    causal_transpose_conv1d,
    convnext_block,
    left_pad_conv1d,
    snake_beta,
)

T = 26  # 18-frame chunk + 8 left context
B = 1
cfg = TokenizerDecoderConfig()


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


@jax.jit
def stage_front(params, c):
    return causal_conv1d(
        params["pre_conv"], voc.rvq_decode(params["quantizer"], c)
    )


@jax.jit
def stage_tf(params, h):
    return voc.pre_transformer(params["pre_transformer"], h, cfg)


@jax.jit
def stage_up(params, h):
    for stage, ratio in zip(params["upsample"], cfg.upsampling_ratios):
        h = causal_transpose_conv1d(stage["tconv"], h, stride=ratio)
        h = convnext_block(stage["convnext"], h)
    return h


@jax.jit
def stage_init(params, h):
    return left_pad_conv1d(params["decoder"]["initial_conv"], h)


@functools.partial(jax.jit, static_argnames=("rate",))
def stage_block(block, w, rate):
    w = snake_beta(block["snake"], w)
    w = causal_transpose_conv1d(block["up"], w, stride=rate)
    for unit, dil in zip(block["units"], (1, 3, 9)):
        w = voc._residual_unit(unit, w, dil)
    return w


@jax.jit
def stage_out(params, w):
    w = snake_beta(params["decoder"]["out_snake"], w)
    w = left_pad_conv1d(params["decoder"]["out_conv"], w)
    return jnp.clip(w[..., 0].astype(jnp.float32), -1.0, 1.0)


def main():
    dtype = jnp.float32 if len(sys.argv) < 2 else jnp.dtype(sys.argv[1])
    params = jax.jit(lambda k: voc.init_vocoder_params(cfg, k, dtype))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    codes = jnp.zeros((B, cfg.num_quantizers, T), jnp.int32)

    ms, _ = timeit(lambda c: voc.decode_frames_jit(params, c, cfg), codes)
    print(
        f"[{dtype}] total decode_frames: {ms:.3f} ms "
        f"({T} frames = {T*0.08:.2f} s audio)",
        flush=True,
    )

    ms1, h1 = timeit(stage_front, params, codes)
    print(f"rvq + pre_conv: {ms1:.3f} ms  shape {h1.shape}", flush=True)
    ms2, h2 = timeit(stage_tf, params, h1)
    print(f"pre_transformer (8L): {ms2:.3f} ms  shape {h2.shape}", flush=True)
    ms3, h3 = timeit(stage_up, params, h2)
    print(f"upsample: {ms3:.3f} ms  shape {h3.shape}", flush=True)
    ms4, h4 = timeit(stage_init, params, h3)
    print(f"initial_conv: {ms4:.3f} ms  shape {h4.shape}", flush=True)

    hcur = h4
    for bi, (block, rate) in enumerate(
        zip(params["decoder"]["blocks"], cfg.upsample_rates)
    ):
        msb, hcur = timeit(stage_block, block, hcur, rate)
        print(
            f"decoder block {bi} (rate {rate}): {msb:.3f} ms  shape {hcur.shape}",
            flush=True,
        )

    mso, wav = timeit(stage_out, params, hcur)
    print(f"out snake+conv: {mso:.3f} ms  shape {wav.shape}", flush=True)


if __name__ == "__main__":
    main()
