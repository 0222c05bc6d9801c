"""Functional linear layer over dense or group-affine-quantized params.

Param dict conventions (pytree leaves are arrays; structure is static per jit):
  dense:     {"w": [out, in], optional "b": [out]}
  quantized: {"wq": uint32 [out, in*bits/32], "scales": [out, in/G],
              optional "biases": [out, in/G], optional "b": [out]}

bits and group size are derived from the shapes (in_dim = x.shape[-1]), so a
single `linear()` entry point serves every construction site, mirroring the
reference QuantizedLayerFactory (reference QuantizedLayerFactory.swift:46-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import dequantize_jnp


def _quant_meta(params: dict, in_dim: int) -> tuple[int, int]:
    words = params["wq"].shape[-1]
    bits = words * 32 // in_dim
    group_size = in_dim // params["scales"].shape[-1]
    return bits, group_size


def linear(params: dict, x: jax.Array) -> jax.Array:
    """y = x @ W.T (+ b). Quantized weights go through the Pallas TPU kernel
    (ops/pallas/quant_matmul) for word-aligned bit widths, else an inline
    dequant that XLA fuses into the matmul."""
    if "w8" in params:
        # int8 affine storage: dequant is a cast + fused multiply-add. On TPU
        # the Pallas kernel dequantizes tile-by-tile in VMEM so HBM weight
        # traffic stays at 1 byte/weight (XLA would materialize the dequantized
        # bf16 matrix to HBM); off-TPU (or without "w8_kl") a jnp path is used.
        from .pallas.quant_matmul import int8_matmul

        y = int8_matmul(x, params)
    elif "wq" in params:
        from .pallas.quant_matmul import quantized_matmul

        in_dim = x.shape[-1]
        bits, group_size = _quant_meta(params, in_dim)
        y = quantized_matmul(x, params, bits=bits, group_size=group_size)
    else:
        w = params["w"].astype(x.dtype)
        y = x @ w.T
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def embedding_lookup(params: dict, ids: jax.Array, dtype=None) -> jax.Array:
    """Embedding table lookup; supports a quantized table ({"wq", "scales",
    "biases"}) by gathering packed rows and dequantizing just those rows."""
    if "wq" in params:
        # bits/group can't be derived from the table shapes alone (no x.shape);
        # callers with quantized tables must pass the row width explicitly.
        raise NotImplementedError(
            "quantized embedding lookup requires explicit dims; "
            "use embedding_lookup_quant instead"
        )
    table = params["w"]
    out = jnp.take(table, ids, axis=0)
    return out.astype(dtype) if dtype is not None else out


def embedding_lookup_quant(
    params: dict, ids: jax.Array, in_dim: int, dtype=None
) -> jax.Array:
    """Quantized embedding lookup with explicit row width (in_dim)."""
    bits, group_size = _quant_meta(params, in_dim)
    rows_packed = jnp.take(params["wq"], ids, axis=0)
    scales = jnp.take(params["scales"], ids, axis=0)
    biases = (
        jnp.take(params["biases"], ids, axis=0) if "biases" in params else None
    )
    flat_packed = rows_packed.reshape(-1, rows_packed.shape[-1])
    flat_scales = scales.reshape(-1, scales.shape[-1])
    flat_biases = biases.reshape(-1, biases.shape[-1]) if biases is not None else None
    out = dequantize_jnp(
        flat_packed, flat_scales, flat_biases, bits, group_size,
        dtype=dtype or jnp.float32,
    )
    return out.reshape(*ids.shape, in_dim)
