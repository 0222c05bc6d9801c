"""Group-affine quantization: pack/unpack, quantize/dequantize, quantized matmul.

Mirrors MLX's affine quantization scheme that the reference relies on for
4/6/8-bit checkpoints and runtime mixed quantization (reference
Qwen3Talker.swift:141-175 `dequantized(...)`, Qwen3TTSPipeline.swift:961-980
`applyMixedQuantization`, QuantizedLayerFactory.swift:46-66):

  w[o, i] ~= scales[o, i // G] * q[o, i] + biases[o, i // G]

with q an unsigned `bits`-bit integer and G = group_size (default 64) along the
input dimension. Packed storage is a little-endian bitstream per output row,
viewed as uint32 words — identical to MLX's layout for bits in {2, 4, 8}
(32/bits values per word, LSB-first). For 6-bit the stream simply crosses word
boundaries (group 64 * 6 bits = 12 words exactly); self-consistent round-trip
is tested, cross-framework bit-layout for 6-bit is validated against dequant.

The jnp fallback matmul dequantizes inline (XLA fuses it); the Pallas kernel in
ops/pallas/quant_matmul.py is the TPU fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _check(bits: int, group_size: int, in_dim: int) -> None:
    if bits not in (2, 3, 4, 6, 8):
        raise ValueError(f"unsupported bits: {bits}")
    if in_dim % group_size != 0:
        raise ValueError(f"in_dim {in_dim} not divisible by group_size {group_size}")
    if (in_dim * bits) % 32 != 0:
        raise ValueError(f"in_dim {in_dim} * bits {bits} must be a multiple of 32")


# ---------------------------------------------------------------------------
# numpy pack / unpack (load/save path — host side)
# ---------------------------------------------------------------------------


def pack_bits_np(q: np.ndarray, bits: int) -> np.ndarray:
    """Pack unsigned ints [..., N] into a little-endian bitstream of uint32
    words [..., N*bits/32]."""
    q = np.asarray(q, dtype=np.uint32)
    n = q.shape[-1]
    assert (n * bits) % 32 == 0
    if 32 % bits == 0:
        # Fast path: values never cross word boundaries.
        per = 32 // bits
        vals = q.reshape(*q.shape[:-1], n // per, per).astype(np.uint64)
        shifts = (np.arange(per, dtype=np.uint64) * bits)[None, :]
        return (vals << shifts).sum(axis=-1).astype(np.uint32)
    # Generic path: expand each value to its bits (LSB first), then repack.
    shifts = np.arange(bits, dtype=np.uint32)
    bits_arr = ((q[..., None] >> shifts) & 1).astype(np.uint8)  # [..., N, bits]
    flat = bits_arr.reshape(*q.shape[:-1], n * bits)
    words = flat.reshape(*q.shape[:-1], n * bits // 32, 32)
    weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))
    return (words.astype(np.uint32) * weights).sum(axis=-1).astype(np.uint32)


def unpack_bits_np(packed: np.ndarray, bits: int, n: int) -> np.ndarray:
    """Inverse of pack_bits_np -> uint32 values [..., n]."""
    packed = np.asarray(packed, dtype=np.uint32)
    if 32 % bits == 0:
        per = 32 // bits
        shifts = (np.arange(per, dtype=np.uint32) * bits)[None, :]
        mask = np.uint32((1 << bits) - 1)
        vals = (packed[..., None] >> shifts) & mask
        return vals.reshape(*packed.shape[:-1], packed.shape[-1] * per)[..., :n]
    shifts = np.arange(32, dtype=np.uint32)
    bit_arr = ((packed[..., None] >> shifts) & 1).astype(np.uint8)
    flat = bit_arr.reshape(*packed.shape[:-1], packed.shape[-1] * 32)
    vals = flat[..., : n * bits].reshape(*packed.shape[:-1], n, bits)
    weights = (np.uint32(1) << np.arange(bits, dtype=np.uint32))
    return (vals.astype(np.uint32) * weights).sum(axis=-1).astype(np.uint32)


def quantize_np(
    w: np.ndarray, bits: int = 4, group_size: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Affine-quantize a float weight [out, in] -> (packed uint32, scales, biases).

    scales/biases are float32 [out, in/group]; q = round((w - min) / scale).
    """
    w = np.asarray(w, dtype=np.float32)
    out_dim, in_dim = w.shape
    _check(bits, group_size, in_dim)
    g = w.reshape(out_dim, in_dim // group_size, group_size)
    w_min = g.min(axis=-1)
    w_max = g.max(axis=-1)
    denom = float(2**bits - 1)
    scales = (w_max - w_min) / denom
    scales = np.where(scales <= 1e-12, 1.0, scales).astype(np.float32)
    biases = w_min.astype(np.float32)
    q = np.clip(np.round((g - biases[..., None]) / scales[..., None]), 0, denom)
    q = q.astype(np.uint32).reshape(out_dim, in_dim)
    return pack_bits_np(q, bits), scales, biases


def dequantize_np(
    packed: np.ndarray,
    scales: np.ndarray,
    biases: np.ndarray | None,
    bits: int = 4,
    group_size: int = 64,
    dtype=np.float32,
) -> np.ndarray:
    """Dequantize packed weights -> float [out, in]
    (reference dequant-on-load path, Qwen3Talker.swift:154-169)."""
    out_dim = packed.shape[0]
    in_dim = packed.shape[1] * 32 // bits
    _check(bits, group_size, in_dim)
    q = unpack_bits_np(packed, bits, in_dim).astype(np.float32)
    q = q.reshape(out_dim, in_dim // group_size, group_size)
    scales = np.asarray(scales, dtype=np.float32).reshape(out_dim, in_dim // group_size)
    if biases is None:
        biases = np.zeros_like(scales)
    else:
        biases = np.asarray(biases, dtype=np.float32).reshape(
            out_dim, in_dim // group_size
        )
    w = scales[..., None] * q + biases[..., None]
    return w.reshape(out_dim, in_dim).astype(dtype)


# ---------------------------------------------------------------------------
# jnp unpack / dequant / matmul (device side, jit-able)
# ---------------------------------------------------------------------------


def unpack_bits_jnp(packed: jax.Array, bits: int, n: int) -> jax.Array:
    """Unpack a little-endian uint32 bitstream into uint32 values [..., n] on
    device. Fast paths for bits dividing 32; generic gather path otherwise."""
    if 32 % bits == 0:
        per = 32 // bits
        shifts = (jnp.arange(per, dtype=jnp.uint32) * bits)[None, :]
        vals = (packed[..., None] >> shifts) & jnp.uint32((1 << bits) - 1)
        return vals.reshape(*packed.shape[:-1], packed.shape[-1] * per)[..., :n]
    # Generic path: value j spans bits [j*bits, (j+1)*bits) of the stream.
    j = jnp.arange(n, dtype=jnp.uint32)
    bit_lo = j * jnp.uint32(bits)
    word_lo = (bit_lo // 32).astype(jnp.int32)
    off = bit_lo % 32
    lo = jnp.take(packed, word_lo, axis=-1) >> off
    # Bits from the following word when the value crosses a boundary.
    word_hi = jnp.minimum(word_lo + 1, packed.shape[-1] - 1)
    hi_shift = (jnp.uint32(32) - off) % 32
    hi = jnp.where(
        off + bits > 32,
        jnp.take(packed, word_hi, axis=-1) << hi_shift,
        jnp.uint32(0),
    )
    return (lo | hi) & jnp.uint32((1 << bits) - 1)


def dequantize_jnp(
    packed: jax.Array,
    scales: jax.Array,
    biases: jax.Array | None,
    bits: int,
    group_size: int,
    dtype=jnp.float32,
) -> jax.Array:
    out_dim = packed.shape[0]
    in_dim = packed.shape[1] * 32 // bits
    q = unpack_bits_jnp(packed, bits, in_dim).astype(dtype)
    q = q.reshape(out_dim, in_dim // group_size, group_size)
    s = scales.astype(dtype)[..., None]
    b = (
        biases.astype(dtype)[..., None]
        if biases is not None
        else jnp.zeros_like(s)
    )
    return (s * q + b).reshape(out_dim, in_dim)


@functools.partial(jax.jit, static_argnames=("bits", "group_size"))
def quantized_matmul_ref(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    biases: jax.Array,
    *,
    bits: int,
    group_size: int,
) -> jax.Array:
    """Reference (jnp) quantized matmul: y = x @ dequant(W).T.

    XLA fuses the unpack+affine into the matmul operand; the Pallas kernel
    replaces this on the hot path.
    """
    w = dequantize_jnp(packed, scales, biases, bits, group_size, dtype=x.dtype)
    return x @ w.T


# ---------------------------------------------------------------------------
# Runtime mixed quantization (reference Qwen3TTSPipeline.swift:961-980)
# ---------------------------------------------------------------------------

# Linear modules quantized at 6 bits (attention q/k/v + heads); everything
# else quantizable gets 4 bits, group size 64 — the reference's mixed scheme.
_SIX_BIT_NAMES = ("qkv_proj", "codec_head", "lm_head")


def _quantize_linear_entry(
    entry: dict, bits: int, group_size: int, kernel_layout: bool = False
) -> dict:
    """Dense {"w"[, "b"]} -> packed {"wq","scales","biases"[, "b"]}. Stacked
    leading axes are handled by iterating layer slices. With kernel_layout, a
    Pallas kernel-layout copy ("wq_kl") is added for supported bit widths."""
    w = np.asarray(entry["w"], np.float32)
    lead = w.shape[:-2]
    w2 = w.reshape(-1, w.shape[-2], w.shape[-1])
    packed, scales, biases = zip(*(quantize_np(wi, bits, group_size) for wi in w2))
    out = {
        "wq": np.stack(packed).reshape(*lead, w.shape[-2], -1),
        "scales": np.stack(scales).reshape(*lead, w.shape[-2], -1),
        "biases": np.stack(biases).reshape(*lead, w.shape[-2], -1),
    }
    if "b" in entry:
        out["b"] = entry["b"]
    if kernel_layout:
        from .pallas.quant_matmul import add_kernel_layout

        out = add_kernel_layout(out, bits, group_size)
    return out


def apply_mixed_quantization(
    params: dict, group_size: int = 64, kernel_layout: bool | None = None
) -> dict:
    """Quantize every Linear in a talker/code-predictor param tree: 6-bit for
    q/k/v projections and heads, 4-bit for the rest (reference
    applyMixedQuantization, Qwen3TTSPipeline.swift:961-980). Embedding tables
    and the per-group lm_head/codec_embedding stacks stay dense (they are used
    via gathers, not the linear op). Dims not divisible by the packing
    requirements are left dense."""
    if kernel_layout is None:
        import jax

        kernel_layout = jax.default_backend() == "tpu"
    linear_paths = {
        "text_projection": ("fc1", "fc2"),
        "layers": ("qkv_proj", "o_proj", "gateup_proj", "down_proj"),
    }
    out = dict(params)
    for group, names in linear_paths.items():
        if group not in out:
            continue
        sub = dict(out[group])
        for name in names:
            if name not in sub or "w" not in sub[name]:
                continue
            bits = 6 if name in _SIX_BIT_NAMES else 4
            in_dim = np.asarray(sub[name]["w"]).shape[-1]
            if in_dim % group_size or (in_dim * bits) % 32:
                continue
            sub[name] = _quantize_linear_entry(
                sub[name], bits, group_size, kernel_layout
            )
        out[group] = sub
    for name in ("codec_head", "small_to_mtp_projection"):
        if name in out and "w" in out[name]:
            bits = 6 if name in _SIX_BIT_NAMES else 4
            in_dim = np.asarray(out[name]["w"]).shape[-1]
            if in_dim % group_size or (in_dim * bits) % 32:
                continue
            out[name] = _quantize_linear_entry(out[name], bits, group_size, kernel_layout)
    # Embedding tables and the cp's stacked codec_embedding/lm_head sets are
    # quantized too (reference quantizes Embedding in applyMixedQuantization,
    # Qwen3TTSPipeline.swift:961-980) — this is where the 4-bit memory parity
    # lives (the 151936 x 2048 text table alone is ~600 MB in bf16). They are
    # consumed via gather-dequant (ops/linear.py embedding_lookup/table_row),
    # so no kernel layout is added.
    for name in ("text_embedding", "codec_embedding", "lm_head"):
        if name in out and "w" in out[name]:
            bits = 6 if name in _SIX_BIT_NAMES else 4
            in_dim = np.asarray(out[name]["w"]).shape[-1]
            if in_dim % group_size or (in_dim * bits) % 32:
                continue
            out[name] = _quantize_linear_entry(
                out[name], bits, group_size, kernel_layout=False
            )
    return out


def quantize_rowwise_int8_np(
    w: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-output-row SIGNED int8 affine quantization: w ~= s[o] * q[o, :] + m[o]
    with q in [-127, 127].

    This is the cp mega-kernel's weight format (ops/pallas/cp_megakernel.py):
    per-row (not per-group-64) scales let the dequant fold into the OUTPUT side
    of an int8 x int8 MXU matmul — y[o] = sx*s[o]*(xq . q[o]) + m[o]*sx*sum(xq)
    — so no per-element weight dequant ever runs. Leading axes are preserved
    (rows = last-but-one axis)."""
    w = np.asarray(w, np.float32)
    mx = w.max(axis=-1)
    mn = w.min(axis=-1)
    scale = np.maximum((mx - mn) / 254.0, 1e-12).astype(np.float32)
    mid = ((mx + mn) / 2.0).astype(np.float32)
    q = np.clip(np.round((w - mid[..., None]) / scale[..., None]), -127, 127)
    return q.astype(np.int8), scale, mid


def quantize_entry_rowwise_device(entry: dict) -> dict:
    """Dense {"w"[, "b"]} linear/table entry -> rowwise-int8 {"w8r","s","m"}
    on device (the mega-kernels' weight format, readable by ops/linear.py's
    linear/table_row/table_matmul/embedding_lookup w8r branches). Used to
    quantize the non-kernel-shared subtrees (embeddings, text projection)
    without host round trips."""
    q, s, m = quantize_rowwise_int8_jnp(jnp.asarray(entry["w"]))
    out = {"w8r": q, "s": s[..., None, :], "m": m[..., None, :]}
    if "b" in entry:
        out["b"] = entry["b"]
    return out


# Talker/cp decoder-layer linears whose jnp entries can be VIEWS of the
# mega-kernels' rowwise-int8 buffers (zero extra HBM): (layer key, kernel
# prefix). Shared by pipeline loading and bench's mirror of it.
KERNEL_SHARED_LINS = (
    ("qkv_proj", "qkv"), ("o_proj", "o"),
    ("gateup_proj", "gu"), ("down_proj", "dn"),
)


def kernel_w8r_view(kernel_tree: dict, pre: str) -> dict:
    """A {"w8r","s","m"} linear/table entry aliasing the mega-kernel buffers
    `pre`_q/_s/_m — the SAME device arrays appear in both trees, so resident
    accounting that dedupes by buffer id counts them once."""
    return {
        "w8r": kernel_tree[f"{pre}_q"],
        "s": kernel_tree[f"{pre}_s"],
        "m": kernel_tree[f"{pre}_m"],
    }


def quantize_rowwise_int8_jnp(
    w: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Device-side twin of quantize_rowwise_int8_np (same rounding: both are
    round-half-even), for building kernel weights without host round trips."""
    w = w.astype(jnp.float32)
    mx = jnp.max(w, axis=-1)
    mn = jnp.min(w, axis=-1)
    scale = jnp.maximum((mx - mn) / 254.0, 1e-12)
    mid = (mx + mn) / 2.0
    q = jnp.clip(jnp.round((w - mid[..., None]) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale, mid


def quantize_act_sym_jnp(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 activation quantization (the A8 half of W8A8):
    x ~= sx * xq, xq in [-127, 127], sx = max|row| / 127. Returns (xq int8,
    sx float32 [..., 1]). Zero rows quantize to zeros (sx floor guards /0)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(ax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
    return xq.astype(jnp.int8), sx


def w8a8_linear_ref(
    x: jax.Array, q: jax.Array, s: jax.Array, m: jax.Array
) -> jax.Array:
    """jnp mirror of the kernel's W8A8 matmul: y = x @ (s*q + m).T with x
    symmetrically int8-quantized per row. q: int8 [O, K]; s, m: f32 [O]."""
    xq, sx = quantize_act_sym_jnp(x)
    acc = jax.lax.dot_general(
        xq.astype(jnp.int32), q.astype(jnp.int32),
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # integer dots are exact anyway
    ).astype(jnp.float32)
    sum_xq = jnp.sum(xq.astype(jnp.float32), axis=-1, keepdims=True)
    return sx * s.astype(jnp.float32) * acc + m.astype(jnp.float32) * (sx * sum_xq)


def quantize_int8_np(
    w: np.ndarray, group_size: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Affine int8 quantization with byte storage (no bit packing):
    w ~= scales * q + biases with q uint8 per group of `group_size` inputs.
    The TPU-recommended quantized serving format (dequant = cast + FMA in
    VMEM, see ops/pallas/quant_matmul.py::_kernel_int8)."""
    w = np.asarray(w, np.float32)
    out_dim, in_dim = w.shape
    if in_dim % group_size != 0:
        raise ValueError(f"in_dim {in_dim} not divisible by group {group_size}")
    g = w.reshape(out_dim, in_dim // group_size, group_size)
    w_min = g.min(axis=-1)
    w_max = g.max(axis=-1)
    scales = np.maximum((w_max - w_min) / 255.0, 1e-12).astype(np.float32)
    biases = w_min.astype(np.float32)
    q = np.clip(np.round((g - biases[..., None]) / scales[..., None]), 0, 255)
    return q.reshape(out_dim, in_dim).astype(np.uint8), scales, biases


def _quantize_int8_entry(entry: dict, group_size: int, kernel_layout: bool) -> dict:
    w = np.asarray(entry["w"], np.float32)
    lead = w.shape[:-2]
    w2 = w.reshape(-1, w.shape[-2], w.shape[-1])
    q, scales, biases = zip(*(quantize_int8_np(wi, group_size) for wi in w2))
    out = {
        "w8": np.stack(q).reshape(*lead, w.shape[-2], w.shape[-1]),
        "scales": np.stack(scales).reshape(*lead, w.shape[-2], -1),
        "biases": np.stack(biases).reshape(*lead, w.shape[-2], -1),
    }
    if "b" in entry:
        out["b"] = entry["b"]
    if kernel_layout:
        from .pallas.quant_matmul import repack_int8_for_kernel

        out["w8_kl"] = repack_int8_for_kernel(out["w8"], group_size)
    return out


def apply_int8_quantization(
    params: dict, group_size: int = 64, kernel_layout: bool | None = None
) -> dict:
    """Quantize every Linear in a talker/code-predictor tree to int8 affine —
    the TPU-native quantized serving preset (all layers 8-bit; the reference's
    mixed 4/6-bit scheme is available via apply_mixed_quantization)."""
    if kernel_layout is None:
        import jax

        kernel_layout = jax.default_backend() == "tpu"
    linear_paths = {
        "text_projection": ("fc1", "fc2"),
        "layers": ("qkv_proj", "o_proj", "gateup_proj", "down_proj"),
    }
    out = dict(params)
    for group, names in linear_paths.items():
        if group not in out:
            continue
        sub = dict(out[group])
        for name in names:
            if name not in sub or "w" not in sub[name]:
                continue
            if np.asarray(sub[name]["w"]).shape[-1] % group_size:
                continue
            sub[name] = _quantize_int8_entry(sub[name], group_size, kernel_layout)
        out[group] = sub
    for name in ("codec_head", "small_to_mtp_projection"):
        if name in out and "w" in out[name]:
            if np.asarray(out[name]["w"]).shape[-1] % group_size:
                continue
            out[name] = _quantize_int8_entry(out[name], group_size, kernel_layout)
    for name in ("text_embedding", "codec_embedding", "lm_head"):
        if name in out and "w" in out[name]:
            if np.asarray(out[name]["w"]).shape[-1] % group_size:
                continue
            out[name] = _quantize_int8_entry(
                out[name], group_size, kernel_layout=False
            )
    return out
