"""A/B variants of the SEANet residual-units kernel at block-3 shapes.

The r4 op trace (exp_vocoder_op_trace.py) attributes 12.8 of the vocoder's
15.9 ms (T=106) to the four residual_units_fused calls — ~7% MXU efficiency.
Hypotheses: (a) the 7 sublane-unaligned shifted tap slices per dilated conv
relayout the whole window on the VPU 21x per call; (b) the 7 sequential
f32 accumulate-adds per conv serialize MXU flushes. Variants:

  tap:    the production kernel's structure — 7 tap dots accumulated
  im2col: ONE dot per conv — concat the 7 shifted windows along lanes
          [W, 7C] @ [7C, C] (same shifts, no accumulate chain, one MXU pass)
  snakeless: tap structure with snakes replaced by x*1.0 — bounds the
          transcendental share (sin on the VPU)
  noshift: tap dots WITHOUT the shifts (wrong numerics, same MXU work) —
          bounds the relayout share

Run: python scripts/exp_units_variants.py [S] [C]   (defaults 203520 128)
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

DILATIONS = (1, 3, 9)
HALO = 80  # covers 6*(1+3+9)=78, 8-aligned


def _snake(x, a, binv):
    s = jnp.sin(x * a)
    return x + binv * (s * s)


_INV_2PI = np.float32(1.0 / (2.0 * np.pi))
_2PI = np.float32(2.0 * np.pi)
# minimax-ish even polynomial for cos(r), r in [-pi, pi] (~2e-5 max err):
# coefficients from the Taylor-adjusted fit used by vector math libraries
_C = tuple(
    np.float32(c)
    for c in (-2.605e-07, 2.47609e-05, -1.3888397e-03, 4.16666418e-02,
              -4.999999963e-01, 1.0)
)


def _snake_fast(x, a, binv2):
    """x + (binv/2)*(1 - cos(2ax)) == x + binv*sin^2(ax), with cos as a
    range-reduced even polynomial (~1e-5 abs err — far under the bf16
    production tier). binv2 = binv/2 precomputed."""
    z = x * (2.0 * a)
    q = z * _INV_2PI
    # round-to-nearest via the magic-number trick (valid for |q| < 2^22)
    q = (q + np.float32(1.5 * 2**23)) - np.float32(1.5 * 2**23)
    r = z - q * _2PI
    r2 = r * r
    c = jnp.full_like(r2, _C[0])
    for coef in _C[1:]:
        c = c * r2 + coef
    return x + binv2 - binv2 * c


def _kernel(*refs, tile, cd, mode):
    (a1, b1i, w1, bb1, a2, b2i, w2, bb2, x_hbm, out_ref, xwin, wide, sem) = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    w = tile + HALO
    copy = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * tile, w), :], xwin, sem)
    copy.start()
    copy.wait()
    y = xwin[:].astype(jnp.float32)
    c = w2.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    valid = row >= jnp.maximum(HALO - i * tile, 0)
    y = jnp.where(valid, y, 0.0)

    for u, dil in enumerate(DILATIONS):
        if mode == "snakeless":
            h = (y * 1.0).astype(cd)
        elif mode == "fastsnake":
            h = _snake_fast(y, a1[u], 0.5 * b1i[u]).astype(cd)
        else:
            h = _snake(y, a1[u], b1i[u]).astype(cd)
        hp = jnp.concatenate([jnp.zeros((6 * dil, c), cd), h], axis=0)
        if mode == "im2col":
            # a direct lane-concat of sublane-shifted slices is a Mosaic
            # internal error (mismatched vpad offsets); stores into a wide
            # VMEM scratch normalize the layouts first
            for k in range(7):
                wide[:, k * c : (k + 1) * c] = hp[k * dil : k * dil + w]
            conv = jax.lax.dot_general(
                wide[:],
                w1[u].reshape(7 * c, c),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bb1[u]
        else:
            conv = jnp.zeros((w, c), jnp.float32) + bb1[u]
            for k in range(7):
                src = hp[6 * dil : 6 * dil + w] if mode == "noshift" else (
                    hp[k * dil : k * dil + w]
                )
                conv = conv + jax.lax.dot_general(
                    src, w1[u, k].astype(cd), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        if mode == "snakeless":
            h2 = (conv * 1.0).astype(cd)
        elif mode == "fastsnake":
            h2 = _snake_fast(conv, a2[u], 0.5 * b2i[u]).astype(cd)
        else:
            h2 = _snake(conv, a2[u], b2i[u]).astype(cd)
        y = y + (
            jax.lax.dot_general(
                h2, w2[u].astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bb2[u]
        )
        y = jnp.where(valid, y, 0.0)
    out_ref[0] = y[HALO:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "mode"))
def run_units(kp, y, *, tile, mode):
    bsz, s, c = y.shape
    n_tiles = -(-s // tile)
    yp = jnp.pad(y, ((0, 0), (HALO, n_tiles * tile - s), (0, 0)))
    kernel = functools.partial(_kernel, tile=tile, cd=jnp.bfloat16, mode=mode)
    names = ("a1", "b1i", "w1", "bb1", "a2", "b2i", "w2", "bb2")
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            *(
                pl.BlockSpec(
                    kp[n].shape,
                    lambda b, i, _n=np.ndim(kp[n]): (0,) * _n,
                    memory_space=pltpu.VMEM,
                )
                for n in names
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles * tile, c), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + HALO, c), y.dtype),
            pltpu.VMEM((tile + HALO, 7 * c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 2**20),
    )(*(kp[n] for n in names), yp)
    return out[:, :s]


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    s = 203520 if len(sys.argv) < 2 else int(sys.argv[1])
    c = 128 if len(sys.argv) < 3 else int(sys.argv[2])
    rng = np.random.default_rng(0)
    kp = {
        "a1": jnp.asarray(rng.uniform(0.5, 2, (3, 1, c)), jnp.float32),
        "b1i": jnp.asarray(rng.uniform(0.5, 2, (3, 1, c)), jnp.float32),
        "w1": jnp.asarray(
            rng.standard_normal((3, 7, c, c)) * 0.05, jnp.bfloat16
        ),
        "bb1": jnp.asarray(rng.standard_normal((3, 1, c)) * 0.1, jnp.float32),
        "a2": jnp.asarray(rng.uniform(0.5, 2, (3, 1, c)), jnp.float32),
        "b2i": jnp.asarray(rng.uniform(0.5, 2, (3, 1, c)), jnp.float32),
        "w2": jnp.asarray(
            rng.standard_normal((3, c, c)) * 0.05, jnp.bfloat16
        ),
        "bb2": jnp.asarray(rng.standard_normal((3, 1, c)) * 0.1, jnp.float32),
    }
    y = jnp.asarray(rng.standard_normal((1, s, c)) * 0.5, jnp.float32)
    tile = 8192

    def timeit(mode, n=30):
        f = lambda: run_units(kp, y, tile=tile, mode=mode)
        out = f()
        np.asarray(out[0, -1, :1])  # readback barrier
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        np.asarray(out[0, -1, :1])
        return (time.perf_counter() - t0) / n * 1e3, out

    base_ms, base = timeit("tap")
    print(f"S={s} C={c} tile={tile}", flush=True)
    print(f"tap (production):  {base_ms:8.3f} ms", flush=True)
    for mode in ("snakeless", "noshift", "im2col", "fastsnake"):
        ms, out = timeit(mode)
        note = ""
        if mode in ("im2col", "fastsnake"):
            d = float(jnp.max(jnp.abs(out - base)))
            s_ = float(jnp.max(jnp.abs(base)))
            note = f"  (max|diff| vs tap {d:.2e}, scale {s_:.2g})"
        print(f"{mode:18s}: {ms:8.3f} ms  ({ms - base_ms:+.3f}){note}",
              flush=True)


if __name__ == "__main__":
    main()
