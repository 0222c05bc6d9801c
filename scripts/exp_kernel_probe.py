"""Probe Mosaic/TPU support for the cp mega-kernel's risky building blocks:

  1. int8 x int8 dot_general with int32 accumulation (W8A8 MXU path)
  2. pltpu.prng_seed / prng_random_bits + argmax + one-hot lane extraction
  3. async DMA from an ANY/HBM input with a dynamically-indexed row
  4. head split/merge via sublane/lane concats + rotate-half lane slices
  5. fori_loop with @pl.when conditional phases

Writes flushed progress to stdout; run on the real TPU chip.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = lambda *a: print(*a, flush=True)
P("backend:", jax.default_backend())


# ---- probe 1+2+4+5: combined mini-kernel --------------------------------
def kernel(seed_ref, x_ref, w_ref, s_ref, emb_hbm, out_ref, code_ref,
           row_scratch, sem):
    pltpu.prng_seed(seed_ref[0])
    code_ref[:] = jnp.zeros_like(code_ref)
    xq = x_ref[:]                       # (32, 1024) int8
    wq = w_ref[:]                       # (2048, 1024) int8
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                    # (32, 2048) int32
    logits = acc[0:1, :].astype(jnp.float32) * s_ref[:]  # (1, 2048)

    def body(t, carry):
        bits = pltpu.prng_random_bits((1, 2048))
        u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 1e-12
        g = -jnp.log(-jnp.log(u))
        lg = logits + 0.5 * g
        code = jnp.argmax(lg, axis=-1)[0].astype(jnp.int32)
        # dynamic-index DMA: 8-row aligned block holding row `code`
        # (single-row HBM slices violate the (8,128) tiling)
        base = (code // 8) * 8
        dma = pltpu.make_async_copy(
            emb_hbm.at[pl.ds(base, 8), :], row_scratch, sem
        )
        dma.start()
        dma.wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, 1024), 0)
        row = jnp.sum(
            jnp.where(rows == code - base, row_scratch[:], 0).astype(jnp.int32),
            axis=0, keepdims=True,
        )

        @pl.when(t == 7)
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            code_ref[:] = code_ref[:] + code * (lane == 0).astype(jnp.int32)
            out_ref[:] = row.astype(jnp.float32)

        return carry + code

    total = jax.lax.fori_loop(0, 8, body, jnp.int32(0))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    code_ref[:] = code_ref[:] + total * (lane == 1).astype(jnp.int32)


@jax.jit
def run(seed, x, w, s, emb):
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1024), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 1024), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(seed, x, w, s, emb)


key = jax.random.PRNGKey(0)
x = jax.random.randint(key, (32, 1024), -127, 127, jnp.int8)
w = jax.random.randint(key, (2048, 1024), -127, 127, jnp.int8)
s = jnp.full((1, 2048), 1e-4, jnp.float32)
emb = jax.random.randint(key, (2048, 1024), -127, 127, jnp.int8)
seed = jnp.array([42], jnp.int32)

t0 = time.time()
out, codes = run(seed, x, w, s, emb)
out.block_until_ready()
P("probe1 compile+run ok in %.1fs; code=%d sum=%d" % (
    time.time() - t0, int(codes[0, 0]), int(codes[0, 1])))
# check int8 dot numerics vs jnp
acc_ref = (x.astype(jnp.int32) @ w.astype(jnp.int32).T)[0:1].astype(jnp.float32) * s
P("probe1 logits match:", bool(jnp.allclose(acc_ref[0],
    (x.astype(jnp.int32) @ w.astype(jnp.int32).T)[0].astype(jnp.float32) * s[0])))
# emb row matches
P("probe1 emb row match:", bool((out[0].astype(jnp.int8) == emb[int(codes[0, 0])]).all()))


# ---- probe 3: head split via concat + rotate-half ------------------------
def kernel2(x_ref, out_ref):
    row = x_ref[0:1, :]                                # (1, 2048)
    heads = jnp.concatenate(
        [row[:, i * 128:(i + 1) * 128] for i in range(16)], axis=0
    )                                                  # (16, 128)
    rot = jnp.concatenate([-heads[:, 64:], heads[:, :64]], axis=1)
    # rows -> lanes: extract each row to sublane offset 0 via a one-hot dot
    # (Mosaic rejects lane-concat of values at mismatched sublane offsets)
    parts = []
    for i in range(16):
        e = (jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1) == i).astype(
            jnp.float32)
        parts.append(jax.lax.dot_general(
            e, rot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    out_ref[:] = jnp.concatenate(parts, axis=1)        # (1, 2048)


@jax.jit
def run2(x):
    return pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


x2 = jax.random.normal(key, (8, 2048), jnp.float32)
t0 = time.time()
r2 = run2(x2)
r2.block_until_ready()
heads = x2[0].reshape(16, 128)
rot = np.concatenate([-heads[:, 64:], heads[:, :64]], axis=1).reshape(-1)
P("probe2 compile+run ok in %.1fs; match: %s" % (
    time.time() - t0, bool(jnp.allclose(r2[0], rot))))


# ---- probe timing: int8 dot throughput at cp shapes ----------------------
def kernel3(x_ref, w_ref, out_ref):
    def body(i, acc):
        d = jax.lax.dot_general(
            x_ref[:], w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc + d[0, 0]
    out_ref[0, 0] = jax.lax.fori_loop(0, 100, body, jnp.int32(0))


@jax.jit
def run3(x, w):
    return pl.pallas_call(
        kernel3,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x, w)


w3 = jax.random.randint(key, (4096, 1024), -127, 127, jnp.int8)
r = run3(x, w3); r.block_until_ready()
t0 = time.time()
for _ in range(10):
    r = run3(x, w3)
r.block_until_ready()
dt = (time.time() - t0) / 10 / 100
P("probe3: int8 dot (32,1024)x(1024,4096) = %.2f us/dot (mxu floor ~0.27us@int8)"
  % (dt * 1e6))
P("ALL PROBES DONE")
