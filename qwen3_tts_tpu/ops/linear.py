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


_VALID_BITS = (2, 3, 4, 6, 8)


def derive_packed_dims(entry: dict) -> tuple[int, int, int]:
    """(bits, group_size, in_dim) for a packed entry WITHOUT knowing the row
    width. words = in_dim*bits/32 and groups = in_dim/gs admit multiple
    solutions (e.g. 4-bit/g64 vs 8-bit/g32), so candidate group sizes are
    tried in order of prevalence — 64 first, the MLX/reference default
    (QuantizedLayerFactory.swift:6-43). Callers that know in_dim should use
    embedding_lookup_quant(..., in_dim=...) instead."""
    words = entry["wq"].shape[-1]
    groups = entry["scales"].shape[-1]
    # (words, groups) is ambiguous (4-bit/g32 == 2-bit/g64); loaders that
    # know the checkpoint's group size record it as a zero-size marker leaf
    # whose KEY encodes it ("g32") — pytree structure, so it stays static
    # under jit — and that hint is tried first
    hint = next(
        (
            int(k[1:])
            for k in entry
            if isinstance(k, str) and len(k) > 1 and k[0] == "g"
            and k[1:].isdigit()
        ),
        None,
    )
    order = ([hint] if hint else []) + [64, 32, 128, 16, 256]
    for gs in order:
        in_dim = groups * gs
        if in_dim == 0 or (words * 32) % in_dim:
            continue
        bits = words * 32 // in_dim
        if bits in _VALID_BITS:
            return bits, gs, in_dim
    raise ValueError(
        f"cannot derive packed dims from words={words}, groups={groups}"
    )


def linear(params: dict, x: jax.Array) -> jax.Array:
    """y = x @ W.T (+ b). Quantized weights go through the Pallas TPU kernel
    (ops/pallas/quant_matmul) for word-aligned bit widths, else an inline
    dequant that XLA fuses into the matmul."""
    if "w8r" in params:
        # Rowwise int8 — the mega-kernels' weight format (ops/pallas/
        # {talker,cp}_megakernel.py), shared here so prefill/serving read the
        # SAME HBM buffers the decode kernels stream (no dense copy resident):
        # w[o,:] = s[o]*q[o,:] + m[o]  =>  y[o] = s[o]*(x . q[o]) + m[o]*sum(x)
        # — the dequant folds into the output side, never materializing w.
        q = jnp.swapaxes(params["w8r"], -1, -2).astype(x.dtype)
        y = jnp.matmul(x, q, preferred_element_type=jnp.float32)
        s = params["s"][..., 0, :].astype(jnp.float32)
        m = params["m"][..., 0, :].astype(jnp.float32)
        xsum = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)
        y = (y * s + m * xsum).astype(x.dtype)
    elif "w8" in params:
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
    """Embedding table lookup over dense ({"w"}), bit-packed ({"wq","scales"
    [,"biases"]}) or int8 ({"w8","scales","biases"}) storage. Quantized tables
    gather only the requested rows and dequantize those — the memory-parity
    path for the reference's runtime Embedding quantization
    (Qwen3TTSPipeline.swift:961-980)."""
    if "wq" in params:
        _, _, in_dim = derive_packed_dims(params)
        return embedding_lookup_quant(params, ids, in_dim, dtype=dtype)
    if "w8r" in params:
        # rowwise int8 single table ({"w8r" [V,D], "s"/"m" [1,V]}; see linear())
        rows = jnp.take(params["w8r"], ids, axis=0).astype(jnp.float32)
        s = jnp.take(params["s"][0], ids, axis=0).astype(jnp.float32)
        m = jnp.take(params["m"][0], ids, axis=0).astype(jnp.float32)
        out = rows * s[..., None] + m[..., None]
        return out.astype(dtype) if dtype is not None else out
    if "w8" in params:
        rows = jnp.take(params["w8"], ids, axis=0)
        scales = jnp.take(params["scales"], ids, axis=0)
        biases = jnp.take(params["biases"], ids, axis=0)
        in_dim = params["w8"].shape[-1]
        groups = params["scales"].shape[-1]
        gsize = in_dim // groups
        r = rows.astype(jnp.float32).reshape(*rows.shape[:-1], groups, gsize)
        out = r * scales.astype(jnp.float32)[..., None] + biases.astype(
            jnp.float32
        )[..., None]
        out = out.reshape(*rows.shape[:-1], in_dim)
        return out.astype(dtype) if dtype is not None else out
    table = params["w"]
    out = jnp.take(table, ids, axis=0)
    return out.astype(dtype) if dtype is not None else out


def table_row(entry: dict, k_idx, code, dtype=None) -> jax.Array:
    """Row `code` of table `k_idx` in a STACKED table set ([ng, V, D] dense,
    or its packed/int8 equivalent). Used by the code predictor's per-group
    codec embeddings (reference Qwen3CodePredictor.swift:59-64)."""
    if "w" in entry:
        row = jnp.asarray(entry["w"])[k_idx, code]
        return row.astype(dtype) if dtype is not None else row
    if "w8r" in entry:
        # rowwise int8 (mega-kernel format; see linear()): per-row scale/mid
        rows = jnp.asarray(entry["w8r"])[k_idx, code].astype(jnp.float32)
        s = jnp.asarray(entry["s"])[k_idx, 0, code].astype(jnp.float32)
        m = jnp.asarray(entry["m"])[k_idx, 0, code].astype(jnp.float32)
        out = rows * s[..., None] + m[..., None]
        return out.astype(dtype) if dtype is not None else out
    if "w8" in entry:
        in_dim = entry["w8"].shape[-1]
        groups = entry["scales"].shape[-1]
        g = in_dim // groups
        lead = jnp.shape(jnp.asarray(code))
        rows8 = jnp.asarray(entry["w8"])[k_idx, code].astype(jnp.float32)
        rows8 = rows8.reshape(-1, groups, g)
        s = jnp.asarray(entry["scales"])[k_idx, code].astype(jnp.float32)
        s = s.reshape(-1, groups)
        b = jnp.asarray(entry["biases"])[k_idx, code].astype(jnp.float32)
        b = b.reshape(-1, groups)
        rows = (rows8 * s[..., None] + b[..., None]).reshape(*lead, in_dim)
        return rows.astype(dtype) if dtype is not None else rows
    bits, gs, in_dim = derive_packed_dims(entry)
    lead = jnp.shape(jnp.asarray(code))  # () scalar or (B,) batched
    packed = jnp.asarray(entry["wq"])[k_idx, code].reshape(-1, entry["wq"].shape[-1])
    scales = jnp.asarray(entry["scales"])[k_idx, code].reshape(
        -1, entry["scales"].shape[-1]
    )
    biases = (
        jnp.asarray(entry["biases"])[k_idx, code].reshape(
            -1, entry["biases"].shape[-1]
        )
        if "biases" in entry
        else None
    )
    rows = dequantize_jnp(
        packed, scales, biases, bits, gs, dtype=dtype or jnp.float32
    )
    return rows.reshape(*lead, in_dim)


def table_matmul(entry: dict, k_idx, x: jax.Array) -> jax.Array:
    """x @ table[k_idx].T for a stacked table set (the code predictor's
    per-group lm_heads, reference Qwen3CodePredictor.swift:66-71). Quantized
    tables dequantize inline (XLA fuses into the matmul operand)."""
    if "w" in entry:
        return x @ jnp.asarray(entry["w"])[k_idx].T.astype(x.dtype)
    if "w8r" in entry:
        # rowwise int8 (mega-kernel format): dequant folds into the output
        q = jnp.asarray(entry["w8r"])[k_idx].astype(x.dtype)      # [V, K]
        y = jnp.matmul(x, q.T, preferred_element_type=jnp.float32)
        s = jnp.asarray(entry["s"])[k_idx, 0].astype(jnp.float32)  # [V]
        m = jnp.asarray(entry["m"])[k_idx, 0].astype(jnp.float32)
        xsum = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)
        return (y * s + m * xsum).astype(x.dtype)
    if "w8" in entry:
        w8 = jnp.asarray(entry["w8"])[k_idx].astype(x.dtype)
        in_dim = entry["w8"].shape[-1]
        groups = entry["scales"].shape[-1]
        g = in_dim // groups
        v = w8.shape[0]
        w = w8.reshape(v, groups, g) * jnp.asarray(entry["scales"])[
            k_idx
        ].astype(x.dtype)[..., None] + jnp.asarray(entry["biases"])[
            k_idx
        ].astype(x.dtype)[..., None]
        return x @ w.reshape(v, in_dim).T
    bits, gs, in_dim = derive_packed_dims(entry)
    w = dequantize_jnp(
        jnp.asarray(entry["wq"])[k_idx], jnp.asarray(entry["scales"])[k_idx],
        jnp.asarray(entry["biases"])[k_idx] if "biases" in entry else None,
        bits, gs, dtype=x.dtype,
    )
    return x @ w.T


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
