"""Vocoder stage attribution WITHOUT per-stage dispatch noise: jit a series
of prefix graphs (stage 0..k) and difference consecutive wall times. The old
exp_vocoder_profile.py timed each stage as its own dispatch, which bills
~2 ms of tunnel/dispatch overhead to every stage; prefix differencing bills
it once. Run with the fused SEANet kernels attached (the TPU default)."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.models.vocoder import (
    causal_conv1d,
    convnext_block,
    causal_transpose_conv1d,
    left_pad_conv1d,
    pre_transformer,
    rvq_decode,
    snake_beta,
)
from qwen3_tts_tpu.ops.pallas.vocoder_kernels import (
    build_vocoder_kernel_params_device,
    seanet_block_fused,
)


def stage_fns(cfg, tail_fused=False, ic_fused=False):
    """Ordered (name, fn) where each fn advances the carried activation."""

    def _batch_ok(x):
        # decode_frames' own gate predicates — no drift
        return voc.vocoder_kernel_batch_flags(x.shape[0])[0]

    def _pt_batch_ok(x):
        return voc.vocoder_kernel_batch_flags(x.shape[0])[1]

    def up(params, h):
        # mirror decode_frames: fused stages at B=1 (or knob), T<=256
        kernel = params.get("kernel")
        if (
            kernel is not None
            and kernel.get("upsample") is not None
            and _batch_ok(h)
            and h.shape[1] <= 256
        ):
            from qwen3_tts_tpu.ops.pallas.upsample_kernel import (
                upsample_stage_fused,
            )

            for kp in kernel["upsample"]:
                h = upsample_stage_fused(kp, h)
            return h
        for stage, ratio in zip(params["upsample"], cfg.upsampling_ratios):
            h = causal_transpose_conv1d(stage["tconv"], h, stride=ratio)
            h = convnext_block(stage["convnext"], h)
        return h

    def blocks(params, wav):
        kernel = params.get("kernel")
        if kernel is not None and _batch_ok(wav):
            for kp, block, rate in zip(
                kernel["blocks"], params["decoder"]["blocks"], cfg.upsample_rates
            ):
                wav = seanet_block_fused(
                    kp, wav, rate=rate, cout=block["up"]["w"].shape[2]
                )
        else:
            for block, rate in zip(params["decoder"]["blocks"], cfg.upsample_rates):
                wav = snake_beta(block["snake"], wav)
                wav = causal_transpose_conv1d(block["up"], wav, stride=rate)
                for unit, dil in zip(block["units"], (1, 3, 9)):
                    wav = voc._residual_unit(unit, wav, dil)
        return wav

    def pt(params, h):
        # decode_frames' own routing predicates (models/vocoder.py)
        kernel = params.get("kernel")
        if (
            kernel is not None
            and kernel.get("pre_transformer") is not None
            and _pt_batch_ok(h)
            and voc.pt_kernel_shape_ok(h.shape[0], h.shape[1])
        ):
            from qwen3_tts_tpu.ops.pallas.pretransformer_kernel import (
                pre_transformer_packed,
            )

            return pre_transformer_packed(
                kernel["pre_transformer"], h,
                nl=cfg.num_hidden_layers, nh=cfg.num_attention_heads,
                hd=cfg.head_dim, eps=cfg.rms_norm_eps,
                rope_theta=cfg.rope_theta,
            )
        return pre_transformer(params["pre_transformer"], h, cfg)

    stages = [
        ("rvq+pre_conv", lambda p, c: causal_conv1d(
            p["pre_conv"], rvq_decode(p["quantizer"], c))),
        ("pre_transformer", lambda p, h: pt(p, h)),
        # with ic fusion the last upsample kernel absorbed initial_conv
        ("upsample+ic(fused)" if ic_fused else "upsample(convnext)", up),
    ]
    if not ic_fused:
        stages.append(("initial_conv", lambda p, h: left_pad_conv1d(
            p["decoder"]["initial_conv"], h)))
    stages.append(("seanet_blocks", blocks))
    if not tail_fused:
        # with tail fusion (kernel blocks carry "t_w"), the last SEANet
        # kernel already applied out_snake + out_conv + clip
        stages.append(
            ("out_snake+conv", lambda p, w: jnp.clip(
                left_pad_conv1d(
                    p["decoder"]["out_conv"],
                    snake_beta(p["decoder"]["out_snake"], w),
                )[..., 0].astype(jnp.float32), -1.0, 1.0)))
    return stages


def timeit(fn, *args, n=30):
    # block_until_ready can return WITHOUT device completion on this axon
    # stack (measured: an 8192^3 matmul "finished" in 0.08 ms) — a host
    # readback of one element is the only trustworthy completion barrier.
    # N pipelined dispatches + one readback amortizes the ~40 ms tunnel RTT.
    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        return float(jnp.sum(jnp.abs(leaf[..., -1])))

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    cfg = TokenizerDecoderConfig()
    params = jax.jit(lambda k: voc.init_vocoder_params(cfg, k, jnp.float32))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    params = dict(params)
    params["kernel"] = jax.jit(
        lambda p: build_vocoder_kernel_params_device(p, cfg)
    )(params)
    jax.block_until_ready(params["kernel"])

    t = 26 if len(sys.argv) < 2 else int(sys.argv[1])
    b = 1 if len(sys.argv) < 3 else int(sys.argv[2])
    if "fusedbatch" in sys.argv[3:]:
        # measure the kernels AT batch (decode_frames' A/B knob)
        os.environ["QWEN3TTS_VOCODER_KERNEL_BATCH"] = "1"
    elif "ptbatch" in sys.argv[3:]:
        # batched pre-transformer kernel only; SEANet/upsample stay plain
        os.environ["QWEN3TTS_VOCODER_KERNEL_BATCH"] = "pt"
    elif b > 1 or "plain" in sys.argv[3:]:
        # serving batch (or explicit "plain" A/B arm): decode_frames gates
        # the kernels off at B>1 (they lose to XLA's batched convs there) —
        # drop the subtree so the prefix graphs measure that path
        params.pop("kernel")
    kern = params.get("kernel")
    fns = stage_fns(
        cfg,
        # tail fusion only applies when the SEANet kernel path is taken
        # (B=1 or the full batch knob — NOT the pt-only arm)
        tail_fused=(
            (b == 1 or os.environ.get("QWEN3TTS_VOCODER_KERNEL_BATCH") == "1")
            and kern is not None
            and "t_w" in kern["blocks"][-1]
        ),
        ic_fused=(
            (b == 1 or os.environ.get("QWEN3TTS_VOCODER_KERNEL_BATCH") == "1")
            and t <= 256
            and kern is not None
            and kern.get("upsample") is not None
            and "ic_w" in kern["upsample"][-1]
        ),
    )
    codes = jnp.zeros((b, cfg.num_quantizers, t), jnp.int32)

    def prefix(k):
        @jax.jit
        def f(p, c):
            x = c
            for _, fn in fns[: k + 1]:
                x = fn(p, x)
            return x
        return f

    prev = 0.0
    for k, (name, _) in enumerate(fns):
        ms = timeit(prefix(k), params, codes)
        print(f"T={t} prefix {k} (+{name}): {ms:8.3f} ms  (delta {ms - prev:+.3f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
