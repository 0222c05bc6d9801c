"""Pallas TPU kernel: group-affine quantized matmul y = x @ dequant(W).T.

The TPU replacement for MLX's QuantizedLinear matmul (reference
QuantizedLayerFactory.swift:46-76; packing scheme in ops/quant.py). Packed
uint32 weights stream HBM -> VMEM tile by tile and are unpacked + affine-
scaled in VMEM right before the MXU, so HBM weight traffic is bits/16 of the
bf16 equivalent — the win for the bandwidth-bound decode step.

Mosaic cannot reshape across the lane axis, so the kernel uses a dedicated
KERNEL LAYOUT prepared once at load time by `repack_for_kernel`:

  1. lane permutation: original input index k = g*group + i moves to lane
     j = i*G + g (G = K/group_size). Group id becomes `j % G`, so the per-
     group scales/biases expand with `pltpu.repeat` (tile semantics) instead
     of an unsupported element-repeat reshape.
  2. column-major bit packing: word w holds the values at lanes
     {p*W + w : p in 0..per_word}, value p at bits [p*bits, (p+1)*bits).
     In-kernel unpack is then per_word shift-and-masks concatenated along
     lanes — no cross-lane reshape.

Activations are permuted to match with one (reshape, transpose) outside the
kernel (XLA fuses it). Supported bits: {2, 4, 8} (word-aligned); 6-bit takes
the jnp fallback (ops.quant.quantized_matmul_ref).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import quantized_matmul_ref, unpack_bits_np

PALLAS_BITS = (2, 4, 8)

# The kernels keep the full [M, K] activation block in VMEM (only the output
# dim is tiled), so large-M calls (prefill at big buckets) could exceed VMEM.
# Above this row count the jnp path is used instead — prefill is MXU-bound and
# XLA's fused dequant-matmul is fine there; the kernels exist for decode-sized M.
PALLAS_MAX_M = 1024


# ---------------------------------------------------------------------------
# Load-time repack
# ---------------------------------------------------------------------------


def kernel_lane_order(k: int, group_size: int) -> np.ndarray:
    """perm[j] = original index feeding kernel lane j (j = i*G + g)."""
    g_count = k // group_size
    j = np.arange(k)
    return (j % g_count) * group_size + (j // g_count)


def repack_for_kernel(packed: np.ndarray, bits: int, group_size: int) -> np.ndarray:
    """MLX row-major packed [O, K*bits/32] -> kernel-layout packed [O, same]."""
    if bits not in PALLAS_BITS:
        raise ValueError(f"kernel layout supports bits in {PALLAS_BITS}, got {bits}")
    o, words = packed.shape
    per = 32 // bits
    k = words * per
    q = unpack_bits_np(packed, bits, k)  # [O, K] original order
    q = q[:, kernel_lane_order(k, group_size)]  # kernel lane order
    w_words = k // per
    # word w, bit-slot p <- lane p*W + w
    q_cols = q.reshape(o, per, w_words).astype(np.uint32)
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, :, None]
    out = (q_cols << shifts).astype(np.uint32)
    # sum over p == bitwise-or (disjoint bit ranges)
    return out.sum(axis=1, dtype=np.uint64).astype(np.uint32)


def permute_activations(x: jax.Array, group_size: int) -> jax.Array:
    """Reorder x lanes to the kernel layout: [.., K] -> lane j = i*G + g."""
    k = x.shape[-1]
    g_count = k // group_size
    return (
        x.reshape(*x.shape[:-1], g_count, group_size)
        .swapaxes(-1, -2)
        .reshape(*x.shape[:-1], k)
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _kernel(x_ref, packed_ref, scales_ref, biases_ref, out_ref, *, bits, group_size):
    per = 32 // bits
    packed = packed_ref[:]  # [TO, W] uint32, kernel layout
    mask = jnp.uint32((1 << bits) - 1)
    parts = [
        ((packed >> jnp.uint32(p * bits)) & mask).astype(jnp.int32)
        for p in range(per)
    ]
    q = jnp.concatenate(parts, axis=1).astype(jnp.float32)  # [TO, K], lanes j=p*W+w

    s = pltpu.repeat(scales_ref[:], group_size, axis=1)  # lane j -> s[j % G]
    b = pltpu.repeat(biases_ref[:], group_size, axis=1)
    w = q * s + b  # [TO, K] float32

    x = x_ref[:].astype(jnp.float32)  # [M, K] (already lane-permuted)
    out_ref[:] = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "tile_out", "interpret")
)
def quantized_matmul_pallas(
    x: jax.Array,
    packed_kl: jax.Array,
    scales: jax.Array,
    biases: jax.Array | None,
    *,
    bits: int,
    group_size: int,
    tile_out: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """x [M, K] @ dequant(kernel-layout packed [O, K*bits/32]).T -> [M, O].

    packed_kl must come from `repack_for_kernel`. biases may be None.
    """
    if bits not in PALLAS_BITS:
        raise ValueError(f"pallas path supports bits in {PALLAS_BITS}, got {bits}")
    m, k = x.shape
    o = packed_kl.shape[0]
    if biases is None:
        biases = jnp.zeros_like(scales)

    tile_out = min(tile_out, o)
    while o % tile_out != 0:
        tile_out //= 2

    xp = permute_activations(x, group_size)
    grid = (o // tile_out,)
    return pl.pallas_call(
        functools.partial(_kernel, bits=bits, group_size=group_size),
        out_shape=jax.ShapeDtypeStruct((m, o), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((tile_out, packed_kl.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((tile_out, scales.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((tile_out, scales.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((m, tile_out), lambda i: (0, i)),
        interpret=interpret,
    )(xp, packed_kl, scales, biases)


def quantized_matmul(
    x: jax.Array,
    params: dict,
    *,
    bits: int,
    group_size: int,
) -> jax.Array:
    """Dispatch for a quantized linear param dict: Pallas kernel on TPU when a
    kernel-layout copy ("wq_kl") is present, else the jnp reference path on
    the MLX-layout "wq". Leading batch dims of x are flattened to rows."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if (
        "wq_kl" in params
        and jax.default_backend() == "tpu"
        and bits in PALLAS_BITS
        and x2.shape[0] <= PALLAS_MAX_M
    ):
        y = quantized_matmul_pallas(
            x2, params["wq_kl"], params["scales"], params.get("biases"),
            bits=bits, group_size=group_size,
        )
        o = params["wq_kl"].shape[0]
    else:
        b = params.get("biases")
        y = quantized_matmul_ref(
            x2, params["wq"], params["scales"],
            b if b is not None else jnp.zeros_like(params["scales"]),
            bits=bits, group_size=group_size,
        )
        o = params["wq"].shape[0]
    return y.reshape(*lead, o)


def add_kernel_layout(entry: dict, bits: int, group_size: int) -> dict:
    """Augment a packed linear param dict with the kernel-layout copy (used
    at load time on TPU; no-op for unsupported bit widths). Handles stacked
    leading layer axes."""
    if bits not in PALLAS_BITS or "wq" not in entry:
        return entry
    wq = np.asarray(entry["wq"])
    lead = wq.shape[:-2]
    flat = wq.reshape(-1, wq.shape[-2], wq.shape[-1])
    kl = np.stack([repack_for_kernel(m, bits, group_size) for m in flat])
    return {**entry, "wq_kl": kl.reshape(*lead, wq.shape[-2], wq.shape[-1])}


# ---------------------------------------------------------------------------
# int8 affine kernel (byte storage, no bit packing — dequant is cast + FMA
# in VMEM, so HBM weight traffic halves vs bf16 with negligible VPU cost)
# ---------------------------------------------------------------------------


def repack_int8_for_kernel(w8: np.ndarray, group_size: int) -> np.ndarray:
    """Permute the K axis into the kernel lane order (j = i*G + g) so the
    per-group scales expand with tile-semantics pltpu.repeat."""
    k = w8.shape[-1]
    return np.ascontiguousarray(w8[..., kernel_lane_order(k, group_size)])


def _kernel_int8(x_ref, w8_ref, scales_ref, biases_ref, out_ref, *, group_size):
    # Mosaic lacks direct unsigned->float casts; go via int32 (exact for 0..255).
    w = w8_ref[:].astype(jnp.int32).astype(jnp.float32)  # [TO, K]
    s = pltpu.repeat(scales_ref[:], group_size, axis=1)
    b = pltpu.repeat(biases_ref[:], group_size, axis=1)
    w = w * s + b
    x = x_ref[:].astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "tile_out", "interpret")
)
def quantized_matmul_int8_pallas(
    x: jax.Array,
    w8_kl: jax.Array,
    scales: jax.Array,
    biases: jax.Array,
    *,
    group_size: int,
    tile_out: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x [M, K] @ dequant(int8 kernel-layout w8 [O, K]).T -> [M, O]."""
    m, k = x.shape
    o = w8_kl.shape[0]
    tile_out = min(tile_out, o)
    while o % tile_out != 0:
        tile_out //= 2
    xp = permute_activations(x, group_size)
    return pl.pallas_call(
        functools.partial(_kernel_int8, group_size=group_size),
        out_shape=jax.ShapeDtypeStruct((m, o), x.dtype),
        grid=(o // tile_out,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((tile_out, k), lambda i: (i, 0)),
            pl.BlockSpec((tile_out, scales.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((tile_out, scales.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((m, tile_out), lambda i: (0, i)),
        interpret=interpret,
    )(xp, w8_kl, scales, biases)


def int8_matmul(x: jax.Array, params: dict) -> jax.Array:
    """Dispatch for int8 affine linear params: Pallas on TPU when the
    kernel-layout copy is present, jnp dequant otherwise."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    k = x.shape[-1]
    g = params["scales"].shape[-1]
    group = k // g
    if (
        "w8_kl" in params
        and jax.default_backend() == "tpu"
        and x2.shape[0] <= PALLAS_MAX_M
    ):
        y = quantized_matmul_int8_pallas(
            x2, params["w8_kl"], params["scales"], params["biases"], group_size=group
        )
        o = params["w8_kl"].shape[0]
    else:
        w8 = params["w8"]
        o = w8.shape[0]
        wf = w8.astype(x.dtype).reshape(o, g, group)
        wf = wf * params["scales"].astype(x.dtype)[..., None]
        wf = wf + params["biases"].astype(x.dtype)[..., None]
        y = x2 @ wf.reshape(o, k).T
    return y.reshape(*lead, o)
