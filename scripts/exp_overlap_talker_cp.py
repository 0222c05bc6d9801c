"""Measure the headroom of overlapping the talker's next-step weight stream
with the cp kernel (ROADMAP round-4 candidate 2 / VERDICT r3 item 4b).

The real decode frame is two pallas_calls: the talker mega-kernel (DMA-bound,
~1.35 GB int8 weight stream at 1.7B dims, ~1.95 ms/frame vs its 1.73 ms DMA
floor) followed by the cp mega-kernel (latency-bound, ~0.85 ms/frame across
~75 sequential (group x layer) micro-steps with only ~96 us of weight DMA).
Kernel launches serialize on the core, so the talker's layer-0 weight fetch
for frame t+1 cannot begin until frame t's cp kernel retires. If the two were
fused as one kernel per frame ordered [cp(t); talker(t+1)], the talker's
first weight blocks could stream during the cp phase.

This experiment measures that headroom with SYNTHETIC kernels that reproduce
the real shapes and costs (1.7B dims: 28 talker layers x ~50 MB int8,
75 cp micro-steps on ~1 MB blocks) without the full model plumbing:

  A. two kernels per frame (the production structure today)
  B. one fused kernel per frame, cp phase first, Mosaic grid pipeline only
     (lookahead depth 1: talker layer 0 prefetches during the LAST cp step)
  C. fused + MANUAL talker weight DMA (weights in HBM/ANY, a 2-slot VMEM
     ring, copies kicked from cp step 0) — layers 0 and 1 stream behind the
     whole ~0.8 ms cp phase; the rest double-buffer as usual.

VMEM arithmetic that forces this design (and killed the naive fusion, see
ROADMAP "MEASURED-INFEASIBLE r3"): talker double-buffer 2 x 50 MB is ~101 MB,
so the cp weights CANNOT stay VMEM-resident in a fused kernel (79 MB more);
here the cp blocks stream per micro-step (1 MB, double-buffered) instead.

Interpretation: (A - C) per frame is the gross overlap win. The real fused
kernel must also move the inter-frame embed_sum gather back in-kernel
(measured ~0.06 ms/frame when it was removed in r3) — subtract that for the
net. Run on the real chip: python scripts/exp_overlap_talker_cp.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1.7B-dim stand-ins
NL = 28          # talker layers
K = 4096         # talker activation width
O = 6144         # talker intermediate width; 2 dots/layer = 50.3 MB int8
NCP = 75         # cp micro-steps (15 groups x 5 layers)
KC = 1024        # cp activation width; 1 MB int8 block per step
M = 32           # M_PAD sublane tile
CP_DOTS = 6      # chained dots per cp micro-step (calibrated ~10 us/step)


def _talker_layer(x, w1, w2):
    """x (M, K) f32 -> (M, K) f32 through two int8 dots (W8A8-shaped)."""
    a = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a = jnp.tanh(a * 1e-2)
    b = jax.lax.dot_general(
        a.astype(jnp.bfloat16), w2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.tanh(b * 1e-2)


def _cp_step(y, c):
    """y (M, KC) f32, c (KC, KC) int8: CP_DOTS chained small dots
    (latency-bound like the real cp's per-(group,layer) micro-step)."""
    cb = c.astype(jnp.bfloat16)
    for _ in range(CP_DOTS):
        y = jnp.tanh(
            jax.lax.dot_general(
                y.astype(jnp.bfloat16), cb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * 1e-2
        )
    return y


# ---------------------------------------------------------------------------
# Variant A: two kernels per frame (production structure)
# ---------------------------------------------------------------------------


def _talker_kernel_a(x_ref, w1_ref, w2_ref, out_ref, xs):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        xs[...] = x_ref[...]

    xs[...] = _talker_layer(xs[...], w1_ref[0], w2_ref[0])

    @pl.when(i == NL - 1)
    def _():
        out_ref[...] = xs[...]


def talker_call_a(x, w1, w2):
    return pl.pallas_call(
        _talker_kernel_a,
        grid=(NL,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((1, O, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, K, O), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((M, K), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, K), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(x, w1, w2)


def _cp_kernel_a(y_ref, c_ref, out_ref, ys):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        ys[...] = y_ref[...]

    ys[...] = _cp_step(ys[...], c_ref[0])

    @pl.when(j == NCP - 1)
    def _():
        out_ref[...] = ys[...]


def cp_call_a(y, c):
    return pl.pallas_call(
        _cp_kernel_a,
        grid=(NCP,),
        in_specs=[
            pl.BlockSpec((M, KC), lambda j: (0, 0)),
            pl.BlockSpec((1, KC, KC), lambda j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((M, KC), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, KC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, KC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(y, c)


def frame_a(carry, _, w1, w2, c):
    x, y = carry
    x = talker_call_a(x, w1, w2)
    y = cp_call_a(jnp.tanh(y + x[:, :KC] * 1e-3), c)
    # feed the cp result back into the next frame's talker input (the real
    # loop's embed_sum dependency)
    x = x.at[:, :KC].add(y * 1e-3)
    return (x, y), None


# ---------------------------------------------------------------------------
# Variants B/C: one fused kernel per frame, cp phase first
# grid = NCP + NL steps; cp blocks pipeline per micro-step (1 MB), talker
# blocks either pipeline (B) or stream manually from HBM (C).
# ---------------------------------------------------------------------------


def _fused_kernel_b(x_ref, y_ref, c_ref, w1_ref, w2_ref, xo_ref, yo_ref,
                    xs, ys):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ys[...] = y_ref[...]

    @pl.when(i < NCP)
    def _():
        ys[...] = _cp_step(ys[...], c_ref[0])

    @pl.when(i == NCP)
    def _():
        # inter-phase coupling: cp output perturbs the talker input
        xs[...] = x_ref[...]
        xs[:, :KC] += ys[...] * 1e-3
        yo_ref[...] = ys[...]

    @pl.when(i >= NCP)
    def _():
        xs[...] = _talker_layer(xs[...], w1_ref[0], w2_ref[0])

    @pl.when(i == NCP + NL - 1)
    def _():
        xo_ref[...] = xs[...]


def fused_call_b(x, y, c, w1, w2):
    return pl.pallas_call(
        _fused_kernel_b,
        grid=(NCP + NL,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((M, KC), lambda i: (0, 0)),
            pl.BlockSpec((1, KC, KC), lambda i: (jnp.minimum(i, NCP - 1), 0, 0)),
            pl.BlockSpec(
                (1, O, K), lambda i: (jnp.maximum(i - NCP, 0), 0, 0)
            ),
            pl.BlockSpec(
                (1, K, O), lambda i: (jnp.maximum(i - NCP, 0), 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((M, KC), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K), jnp.float32),
            jax.ShapeDtypeStruct((M, KC), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, K), jnp.float32),
            pltpu.VMEM((M, KC), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(x, y, c, w1, w2)


def _fused_kernel_c(x_ref, y_ref, c_ref, w1_hbm, w2_hbm, xo_ref, yo_ref,
                    xs, ys, w1b, w2b, sems):
    i = pl.program_id(0)

    def kick(layer, slot):
        pltpu.make_async_copy(w1_hbm.at[layer], w1b.at[slot],
                              sems.at[slot, 0]).start()
        pltpu.make_async_copy(w2_hbm.at[layer], w2b.at[slot],
                              sems.at[slot, 1]).start()

    @pl.when(i == 0)
    def _():
        ys[...] = y_ref[...]
        # the whole point: layers 0 and 1 stream behind the cp phase
        kick(0, 0)
        kick(1, 1)

    @pl.when(i < NCP)
    def _():
        ys[...] = _cp_step(ys[...], c_ref[0])

    @pl.when(i == NCP)
    def _():
        xs[...] = x_ref[...]
        xs[:, :KC] += ys[...] * 1e-3
        yo_ref[...] = ys[...]

    @pl.when(i >= NCP)
    def _():
        k = i - NCP
        slot = jax.lax.rem(k, 2)
        pltpu.make_async_copy(w1_hbm.at[k], w1b.at[slot],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(w2_hbm.at[k], w2b.at[slot],
                              sems.at[slot, 1]).wait()
        xs[...] = _talker_layer(xs[...], w1b[slot], w2b[slot])

        @pl.when(k + 2 < NL)
        def _():
            kick(k + 2, slot)

    @pl.when(i == NCP + NL - 1)
    def _():
        xo_ref[...] = xs[...]


def fused_call_c(x, y, c, w1, w2):
    return pl.pallas_call(
        _fused_kernel_c,
        grid=(NCP + NL,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((M, KC), lambda i: (0, 0)),
            pl.BlockSpec((1, KC, KC), lambda i: (jnp.minimum(i, NCP - 1), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((M, KC), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K), jnp.float32),
            jax.ShapeDtypeStruct((M, KC), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, K), jnp.float32),
            pltpu.VMEM((M, KC), jnp.float32),
            pltpu.VMEM((2, O, K), jnp.int8),
            pltpu.VMEM((2, K, O), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(x, y, c, w1, w2)


def frame_fused(carry, _, w1, w2, c, call):
    x, y = carry
    x2, y2 = call(x, jnp.tanh(y + x[:, :KC] * 1e-3), c, w1, w2)
    x2 = x2.at[:, :KC].add(y2 * 1e-3)
    return (x2, y2), None


# ---------------------------------------------------------------------------


def timeit(fn, args, n=3):
    """Each fn run internally chains FRAMES frames; readback-synced."""
    out = fn(*args)
    float(jax.tree.leaves(out)[0][0, -1])  # warmup + compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0][0, -1])  # host readback barrier
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


FRAMES = 64


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    print(f"backend={jax.default_backend()} frames={FRAMES}", flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    w1 = jax.device_put(
        np.random.default_rng(0).integers(-127, 127, (NL, O, K), np.int8))
    w2 = jax.device_put(
        np.random.default_rng(1).integers(-127, 127, (NL, K, O), np.int8))
    c = jax.device_put(
        np.random.default_rng(2).integers(-127, 127, (NCP, KC, KC), np.int8))
    x0 = jax.random.normal(ks[3], (M, K), jnp.float32)
    y0 = jax.random.normal(ks[4], (M, KC), jnp.float32)

    gb = (w1.nbytes + w2.nbytes) / 1e9
    print(f"talker stream {gb:.2f} GB/frame ({(w1.nbytes + w2.nbytes) / NL / 1e6:.1f} MB/layer), "
          f"cp blocks {c.nbytes / 1e6:.0f} MB/frame", flush=True)

    # weights are ARGUMENTS, never closures: a closed-over device array
    # becomes an HLO constant and the remote compile service rejects the
    # 1.35 GB program with HTTP 413 (memory/axon gotcha)
    @jax.jit
    def run_a(x, y, w1, w2, c):
        return jax.lax.scan(
            functools.partial(frame_a, w1=w1, w2=w2, c=c), (x, y), None,
            length=FRAMES)[0]

    @jax.jit
    def run_b(x, y, w1, w2, c):
        return jax.lax.scan(
            functools.partial(frame_fused, w1=w1, w2=w2, c=c,
                              call=fused_call_b), (x, y), None,
            length=FRAMES)[0]

    @jax.jit
    def run_c(x, y, w1, w2, c):
        return jax.lax.scan(
            functools.partial(frame_fused, w1=w1, w2=w2, c=c,
                              call=fused_call_c), (x, y), None,
            length=FRAMES)[0]

    results = {}
    for name, fn in [("A two-kernel", run_a), ("B fused pipeline", run_b),
                     ("C fused manual-DMA", run_c)]:
        ms = timeit(fn, (x0, y0, w1, w2, c))
        per = ms / FRAMES
        results[name] = per
        print(f"{name:20s}: {ms:8.2f} ms total, {per:6.3f} ms/frame", flush=True)

    a, b_, c_ = (results["A two-kernel"], results["B fused pipeline"],
                 results["C fused manual-DMA"])
    print(f"\nfusion-only win (A-B): {a - b_:+.3f} ms/frame")
    print(f"manual-prefetch win (B-C): {b_ - c_:+.3f} ms/frame")
    print(f"gross overlap headroom (A-C): {a - c_:+.3f} ms/frame")
    print("net of the in-kernel embed_sum re-add (~0.06 ms, ROADMAP r3): "
          f"{a - c_ - 0.06:+.3f} ms/frame")


if __name__ == "__main__":
    main()
