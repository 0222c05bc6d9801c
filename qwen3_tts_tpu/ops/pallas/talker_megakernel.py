"""Talker-step MEGA-kernel: one pallas_call per decode step, weights streamed.

The jnp talker decode step (models/talker.py::talker_decode_step, mirroring
reference Qwen3Talker.swift:437-577 / Qwen3Layers.swift:130-260) costs
~2.3 ms/frame on a v5e: 28 layers x ~20 small XLA ops each at ~2 us dispatch
latency, re-reading ~440 MB of bf16 weights from HBM per frame.

This kernel runs the whole step as ONE Mosaic kernel with a grid over the 28
layers. Mosaic's grid pipeline double-buffers each layer's int8 weight block
(15.7 MB -> ~19 us at the 819 GB/s floor) and its KV-cache block from HBM
automatically, so the frame cost approaches the int8 weight-streaming floor
(~0.55 ms total, ~4x less HBM traffic than bf16). The hidden state carries
across grid steps in a VMEM scratch buffer; the codec head runs in-kernel on
the last step, so a decode step is exactly one kernel launch.

Compute format is the same W8A8 scheme as ops/pallas/cp_megakernel.py
(per-row signed int8 weights, per-token symmetric int8 activations, int8 MXU
dots with output-side dequant).

KV cache layout for this path: {"k2","v2": [C, nl*nkv*hd] (model dtype),
"pos": [C]}. Per layer, the kernel reads lanes [l*nkv*hd, (l+1)*nkv*hd) —
a pipelined (C, nkv*hd) block; the caller writes the step's new K/V rows with
ONE dynamic_update_slice at ring slot position % C (kernel outputs them),
reproducing the jnp ring-cache semantics (absolute-position window masking,
ops/attention.py::gqa_attention_decode).

predict-step parity: talker_step_w8a8_ref() is the pure-jnp mirror of the same
math for tests; interpret mode matches it bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import w8a8_linear_ref
from .cp_megakernel import M_PAD, _rms, _rot_half, _to_heads, _w8a8


# ---------------------------------------------------------------------------
# The kernel (grid = (num_layers,))
# ---------------------------------------------------------------------------


def _talker_kernel(
    # SMEM scalars
    pos_ws_ref,              # (2,) int32: [position, window_start]
    # blocked per-layer inputs (leading layer axis indexed by the grid)
    qkv_q, o_q, gu_q, dn_q,  # int8 weight blocks (1, O, K)
    in_ln, post_ln, q_ln, k_ln,  # (1, 1, d)
    kblk, vblk,              # (C, nkv*hd) model-dtype cache blocks
    # full (fetched once) inputs
    qkv_s, qkv_m, o_s, o_m, gu_s, gu_m, dn_s, dn_m,  # (nl, 1, O) f32
    emb_ref,                 # (8, hc) f32 — row 0 is the input embed
    slot_pos,                # (1, C) int32 — per-slot absolute positions
    cos_ref, sin_ref,        # (1, hd) f32 for the current position
    fin_ln,                  # (1, hc)
    ch_q, ch_s, ch_m,        # codec head int8 (V, hc) + (1, V)
    # outputs
    k_new,                   # blocked (1, 8, hd) f32 per layer (rows 0:nkv)
    v_new,                   # blocked (1, 8, nkv*hd) f32 per layer (row 0)
    h_out, logits_out,       # (8, hc) f32, (8, V) f32 — written on last step
    # scratch (persists across grid steps)
    x_s, attn_s,
    *,
    nl, nq, nkv, hd, hc, inter, vocab, eps,
):
    l = pl.program_id(0)
    group = nq // nkv
    scale = 1.0 / float(hd) ** 0.5
    position = pos_ws_ref[0]
    ws = pos_ws_ref[1]
    c_len = kblk.shape[0]

    @pl.when(l == 0)
    def _():
        x_s[:] = jnp.zeros_like(x_s)
        x_s[0:1, :] = emb_ref[0:1, :]
        attn_s[:] = jnp.zeros_like(attn_s)

    cos_t = cos_ref[:]
    sin_t = sin_ref[:]

    h = x_s[:]
    xin = _rms(h, in_ln[0], eps)
    qkv = _w8a8(xin, qkv_q[0], qkv_s[pl.ds(l, 1)][0], qkv_m[pl.ds(l, 1)][0])
    row = qkv[0:1, :]
    q = _to_heads(row[:, : nq * hd], nq, hd)
    k = _to_heads(row[:, nq * hd:(nq + nkv) * hd], nkv, hd)
    v_row = row[:, (nq + nkv) * hd:]          # (1, nkv*hd) — direct slice
    q = _rms(q, q_ln[0], eps)
    k = _rms(k, k_ln[0], eps)
    q = q * cos_t + _rot_half(q, hd) * sin_t
    k = k * cos_t + _rot_half(k, hd) * sin_t

    k_new[0, 0:nkv, :] = k                    # head-form output; no _to_row
    v_new[0, 0:1, :] = v_row

    # validity over ring slots: window_start <= pos (written slots only);
    # the current token is appended as an extra column (always valid).
    pos_r = slot_pos[:]                       # (1, C)
    valid = (pos_r >= 0) & (pos_r >= ws)
    neg = jnp.float32(-1e30)

    # ALL query heads in the M dimension of TWO cache-wide dots (the cp
    # kernel's restructure, cp_megakernel.py token_pass): q_wide places head
    # i's query in lane block i//group with exact zeros elsewhere, so the
    # full-width contraction against the cache block equals the per-head
    # 128-lane dot bit-for-bit (hd-aligned zero blocks add exact +0.0 to
    # hd-aligned partial sums). Replaces a per-kv-head loop of 16 small dots
    # plus 32 one-hot _to_row extraction dots per layer — the kernel was
    # dot-issue-latency bound on top of its weight-DMA floor.
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (nq, 1), 0)
    q_wide = jnp.concatenate(
        [
            q * (rows_i // group == j).astype(jnp.float32)
            for j in range(nkv)
        ],
        axis=1,
    )                                          # (nq, nkv*hd)
    kb = kblk[:].astype(jnp.float32)           # (C, nkv*hd)
    vb = vblk[:].astype(jnp.float32)
    sc_c = jax.lax.dot_general(
        q_wide, kb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale                                  # (nq, C)
    sc_c = jnp.where(valid, sc_c, neg)
    # current token scores via a GQA-replicated k (sublane concat)
    k_gqa = jnp.concatenate(
        [k[i // group:i // group + 1, :] for i in range(nq)], axis=0
    )                                          # (nq, hd)
    sc_cur = jnp.sum(q * k_gqa, axis=-1, keepdims=True) * scale  # (nq, 1)
    # two-part softmax over [cache slots | current token] — equivalent to
    # a concat + softmax, but Mosaic rejects lane-concats of values at
    # mismatched offsets
    mx = jnp.maximum(jnp.max(sc_c, axis=-1, keepdims=True), sc_cur)
    e_c = jnp.exp(sc_c - mx)                   # (nq, C)
    e_cur = jnp.exp(sc_cur - mx)               # (nq, 1)
    denom = jnp.sum(e_c, axis=-1, keepdims=True) + e_cur
    out_wide = jax.lax.dot_general(
        e_c, vb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                          # (nq, nkv*hd)
    total = (out_wide + e_cur * v_row) / denom
    # extract head i's slice (row i, lane block i//group) into a standard
    # (1, nq*hd) row: one masked row-sum per intra-group offset (a single
    # nonzero row per lane — exact), then hd-aligned lane-slice concats.
    lanes_b = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv * hd), 1) // hd
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv * hd), 0)
    pieces = []
    for r in range(group):
        m_r = (
            (lanes_b == rows_b // group) & (rows_b % group == r)
        ).astype(jnp.float32)
        pieces.append(jnp.sum(total * m_r, axis=0, keepdims=True))
    attn_row = jnp.concatenate(
        [
            pieces[i % group][:, (i // group) * hd:(i // group + 1) * hd]
            for i in range(nq)
        ],
        axis=1,
    )                                          # (1, nq*hd)
    attn_s[0:1, :] = attn_row
    h = h + _w8a8(attn_s[:], o_q[0], o_s[pl.ds(l, 1)][0], o_m[pl.ds(l, 1)][0])
    x2 = _rms(h, post_ln[0], eps)
    gu = _w8a8(x2, gu_q[0], gu_s[pl.ds(l, 1)][0], gu_m[pl.ds(l, 1)][0])
    act = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
    h = h + _w8a8(act, dn_q[0], dn_s[pl.ds(l, 1)][0], dn_m[pl.ds(l, 1)][0])
    x_s[:] = h

    @pl.when(l == nl - 1)
    def _():
        hf = _rms(h, fin_ln[:], eps)
        h_out[:] = hf[0:8, :]
        logits = _w8a8(hf, ch_q[:], ch_s[:], ch_m[:])          # (M_PAD, V)
        logits_out[:] = logits[0:8, :]


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def _build_talker_kernel_weights_device(params: dict, config) -> dict:
    """Quantize the talker's stacked layer weights + codec head into the
    kernel's W8A8 format, on device."""
    from ..quant import quantize_rowwise_int8_jnp

    lay = params["layers"]

    def rw(w):
        q, s, m = quantize_rowwise_int8_jnp(w)
        return q, s[..., None, :], m[..., None, :]

    qkv_q, qkv_s, qkv_m = rw(lay["qkv_proj"]["w"])
    o_q, o_s, o_m = rw(lay["o_proj"]["w"])
    gu_q, gu_s, gu_m = rw(lay["gateup_proj"]["w"])
    dn_q, dn_s, dn_m = rw(lay["down_proj"]["w"])
    ch_q, ch_s, ch_m = rw(params["codec_head"]["w"])

    def ln(w):
        return w.astype(jnp.float32)[:, None, :]

    return {
        "in_ln": ln(lay["input_layernorm"]["w"]),
        "post_ln": ln(lay["post_attention_layernorm"]["w"]),
        "q_ln": ln(lay["q_norm"]["w"]),
        "k_ln": ln(lay["k_norm"]["w"]),
        "fin_ln": params["norm"]["w"].astype(jnp.float32)[None, :],
        "qkv_q": qkv_q, "qkv_s": qkv_s, "qkv_m": qkv_m,
        "o_q": o_q, "o_s": o_s, "o_m": o_m,
        "gu_q": gu_q, "gu_s": gu_s, "gu_m": gu_m,
        "dn_q": dn_q, "dn_s": dn_s, "dn_m": dn_m,
        "ch_q": ch_q, "ch_s": ch_s, "ch_m": ch_m,
    }


def build_talker_kernel_params_device(params: dict, config) -> dict:
    return dict(_build_talker_kernel_weights_device(params, config))


def build_talker_kernel_params(params: dict, config) -> dict:
    """Host (numpy) builder, for the pipeline load path. Accepts dense or
    quantized (pre-quantized checkpoint) source entries."""
    from ..quant import quantize_rowwise_int8_np
    from .cp_megakernel import dense_entry_np

    lay = params["layers"]

    def to_np(a):
        return np.asarray(a, np.float32)

    def rw(entry):
        q, s, m = quantize_rowwise_int8_np(dense_entry_np(entry))
        return (
            q,
            s[..., None, :].astype(np.float32),
            m[..., None, :].astype(np.float32),
        )

    qkv_q, qkv_s, qkv_m = rw(lay["qkv_proj"])
    o_q, o_s, o_m = rw(lay["o_proj"])
    gu_q, gu_s, gu_m = rw(lay["gateup_proj"])
    dn_q, dn_s, dn_m = rw(lay["down_proj"])
    ch_q, ch_s, ch_m = rw(params["codec_head"])

    def ln(w):
        return to_np(w)[:, None, :]

    return {
        "in_ln": ln(lay["input_layernorm"]["w"]),
        "post_ln": ln(lay["post_attention_layernorm"]["w"]),
        "q_ln": ln(lay["q_norm"]["w"]),
        "k_ln": ln(lay["k_norm"]["w"]),
        "fin_ln": to_np(params["norm"]["w"])[None, :],
        "qkv_q": qkv_q, "qkv_s": qkv_s, "qkv_m": qkv_m,
        "o_q": o_q, "o_s": o_s, "o_m": o_m,
        "gu_q": gu_q, "gu_s": gu_s, "gu_m": gu_m,
        "dn_q": dn_q, "dn_s": dn_s, "dn_m": dn_m,
        "ch_q": ch_q, "ch_s": ch_s, "ch_m": ch_m,
    }


# ---------------------------------------------------------------------------
# Cache layout conversion (standard ring cache <-> kernel layout)
# ---------------------------------------------------------------------------


def cache_to_kernel_layout(cache: dict, config) -> dict:
    """{"k","v": [nl, 1, nkv, C, D], "pos": [C]} -> {"k2","v2": [C, nl*nkv*D],
    "pos": [C]} (B=1 only)."""
    nl, b, nkv, c, d = cache["k"].shape
    assert b == 1, "kernel cache layout is single-stream"

    def conv(x):
        return (
            x[:, 0].transpose(2, 0, 1, 3).reshape(c, nl * nkv * d)
        )

    return {"k2": conv(cache["k"]), "v2": conv(cache["v"]), "pos": cache["pos"]}


def kernel_layout_to_cache(cache2: dict, config) -> dict:
    """Inverse of cache_to_kernel_layout: {"k2","v2": [C, nl*nkv*D], "pos"}
    -> the jnp decode layout {"k","v": [nl, 1, nkv, C, D], "pos": [C]}.
    Lets states prefd with kernel-bearing params feed the vmapped jnp
    batched-decode path (generate.decode_chunk_batched)."""
    c = cache2["pos"].shape[0]
    nl = config.num_hidden_layers
    nkv = config.num_key_value_heads
    d = config.head_dim

    def conv(x2):
        return x2.reshape(c, nl, nkv, d).transpose(1, 2, 0, 3)[:, None]

    return {"k": conv(cache2["k2"]), "v": conv(cache2["v2"]), "pos": cache2["pos"]}


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------


def talker_step_kernel(
    tkp: dict,
    embed: jax.Array,
    cache2: dict,
    position: jax.Array,
    window_start: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    config,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, dict]:
    """One talker decode step via the mega-kernel (B=1).

    embed: [1, 1, H]; cos/sin: [1, hd] f32 for `position`. Returns
    (h [1, 1, H], logits [V] f32, updated cache2)."""
    hc = config.hidden_size
    hd = config.head_dim
    nl = config.num_hidden_layers
    nkv = config.num_key_value_heads
    capacity = cache2["pos"].shape[0]
    dtype = embed.dtype

    emb = jnp.zeros((8, hc), jnp.float32).at[0].set(
        embed[0, 0].astype(jnp.float32)
    )
    pos_ws = jnp.stack(
        [position.astype(jnp.int32), window_start.astype(jnp.int32)]
    )
    k_new, v_new, h8, lg8 = _talker_kernel_call(
        pos_ws, emb, cache2["k2"], cache2["v2"],
        cache2["pos"][None, :], cos, sin, tkp, config, capacity, interpret
    )

    slot = (position % capacity).astype(jnp.int32)
    # k_new is head-form (nl, 8, hd) with rows 0:nkv live — flatten to the
    # cache row layout [l][kv][d] outside the kernel (free XLA reshape)
    krow = k_new[:, :nkv, :].reshape(1, nl * nkv * hd).astype(cache2["k2"].dtype)
    vrow = v_new[:, 0, :].reshape(1, nl * nkv * hd).astype(cache2["v2"].dtype)
    new_cache = {
        "k2": jax.lax.dynamic_update_slice(cache2["k2"], krow, (slot, 0)),
        "v2": jax.lax.dynamic_update_slice(cache2["v2"], vrow, (slot, 0)),
        "pos": jax.lax.dynamic_update_slice(
            cache2["pos"], position[None].astype(jnp.int32), (slot,)
        ),
    }
    h = h8[0][None, None, :].astype(dtype)
    return h, lg8[0].astype(jnp.float32), new_cache


@functools.partial(
    jax.jit, static_argnames=("config", "capacity", "interpret")
)
def _talker_kernel_call(
    pos_ws, emb, k2, v2, slot_pos, cos, sin, tkp, config, capacity, interpret
):
    hc = config.hidden_size
    hd = config.head_dim
    nl = config.num_hidden_layers
    nq = config.num_attention_heads
    nkv = config.num_key_value_heads
    inter = config.intermediate_size
    vocab = config.vocab_size
    kvw = nkv * hd

    kernel = functools.partial(
        _talker_kernel,
        nl=nl, nq=nq, nkv=nkv, hd=hd, hc=hc, inter=inter, vocab=vocab,
        eps=config.rms_norm_eps,
    )

    def blk(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    full = lambda a: blk(a.shape, lambda l: (0,) * a.ndim)  # noqa: E731
    layer3 = lambda o, k: blk((1, o, k), lambda l: (l, 0, 0))  # noqa: E731

    qw = (nq + 2 * nkv) * hd
    grid = (nl,)
    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),        # pos_ws
            layer3(qw, hc),                                # qkv_q
            layer3(hc, nq * hd),                           # o_q
            layer3(2 * inter, hc),                         # gu_q
            layer3(hc, inter),                             # dn_q
            blk((1, 1, hc), lambda l: (l, 0, 0)),          # in_ln
            blk((1, 1, hc), lambda l: (l, 0, 0)),          # post_ln
            blk((1, 1, hd), lambda l: (l, 0, 0)),          # q_ln
            blk((1, 1, hd), lambda l: (l, 0, 0)),          # k_ln
            blk((capacity, kvw), lambda l: (0, l)),        # kblk
            blk((capacity, kvw), lambda l: (0, l)),        # vblk
            full(tkp["qkv_s"]), full(tkp["qkv_m"]),
            full(tkp["o_s"]), full(tkp["o_m"]),
            full(tkp["gu_s"]), full(tkp["gu_m"]),
            full(tkp["dn_s"]), full(tkp["dn_m"]),
            full(emb),
            full(slot_pos),
            full(cos), full(sin),
            full(tkp["fin_ln"]),
            full(tkp["ch_q"]), full(tkp["ch_s"]), full(tkp["ch_m"]),
    ]
    out_specs = (
        # (1, 8, kvw) blocks: Mosaic requires the last two block dims to be
        # (8k, 128k) or equal to the array dims — a bare (1, kvw) row isn't
        blk((1, 8, hd), lambda l: (l, 0, 0)),          # k_new (head form)
        blk((1, 8, kvw), lambda l: (l, 0, 0)),         # v_new
        blk((8, hc), lambda l: (0, 0)),                # h_out
        blk((8, vocab), lambda l: (0, 0)),             # logits_out
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((nl, 8, hd), jnp.float32),
            jax.ShapeDtypeStruct((nl, 8, kvw), jnp.float32),
            jax.ShapeDtypeStruct((8, hc), jnp.float32),
            jax.ShapeDtypeStruct((8, vocab), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((M_PAD, hc), jnp.float32),        # x_s
            pltpu.VMEM((M_PAD, nq * hd), jnp.float32),   # attn_s
        ],
        compiler_params=pltpu.CompilerParams(
            # 1.7B layers double-buffer ~101 MB of int8 weight blocks; give
            # Mosaic the full 128 MB v5e VMEM minus a small reserve
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        pos_ws,
        tkp["qkv_q"], tkp["o_q"], tkp["gu_q"], tkp["dn_q"],
        tkp["in_ln"], tkp["post_ln"], tkp["q_ln"], tkp["k_ln"],
        k2, v2,
        tkp["qkv_s"], tkp["qkv_m"], tkp["o_s"], tkp["o_m"],
        tkp["gu_s"], tkp["gu_m"], tkp["dn_s"], tkp["dn_m"],
        emb, slot_pos, cos, sin, tkp["fin_ln"],
        tkp["ch_q"], tkp["ch_s"], tkp["ch_m"],
    )


# ---------------------------------------------------------------------------
# Pure-jnp mirror (same W8A8 math) — tests
# ---------------------------------------------------------------------------


def talker_step_w8a8_ref(
    tkp: dict,
    embed: jax.Array,
    cache2: dict,
    position: jax.Array,
    window_start: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    config,
) -> tuple[jax.Array, jax.Array, dict]:
    hc = config.hidden_size
    hd = config.head_dim
    nl = config.num_hidden_layers
    nq = config.num_attention_heads
    nkv = config.num_key_value_heads
    inter = config.intermediate_size
    eps = config.rms_norm_eps
    group = nq // nkv
    scale = 1.0 / float(hd) ** 0.5
    capacity = cache2["pos"].shape[0]
    dtype = embed.dtype
    kvw = nkv * hd

    def rms(x, w):
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + eps) * w.astype(jnp.float32)

    def rot_half(x):
        return jnp.concatenate([-x[:, hd // 2:], x[:, :hd // 2]], axis=1)

    h = embed[0, 0].astype(jnp.float32)[None, :]  # (1, hc)
    valid = (cache2["pos"] >= 0) & (cache2["pos"] >= window_start)
    k_rows = []
    v_rows = []
    for l in range(nl):
        xin = rms(h, tkp["in_ln"][l][0])
        qkv = w8a8_linear_ref(
            xin, tkp["qkv_q"][l], tkp["qkv_s"][l][0], tkp["qkv_m"][l][0]
        )
        q = qkv[0, : nq * hd].reshape(nq, hd)
        k = qkv[0, nq * hd:(nq + nkv) * hd].reshape(nkv, hd)
        v = qkv[0, (nq + nkv) * hd:].reshape(nkv, hd)
        q = rms(q, tkp["q_ln"][l][0])
        k = rms(k, tkp["k_ln"][l][0])
        q = q * cos + rot_half(q) * sin
        k = k * cos + rot_half(k) * sin
        k_rows.append(k.reshape(-1))
        v_rows.append(v.reshape(-1))

        kc = cache2["k2"][:, l * kvw:(l + 1) * kvw].astype(jnp.float32)
        vc = cache2["v2"][:, l * kvw:(l + 1) * kvw].astype(jnp.float32)
        outs = []
        for j in range(nkv):
            ks = kc[:, j * hd:(j + 1) * hd]
            vs = vc[:, j * hd:(j + 1) * hd]
            qp = q[j * group:(j + 1) * group]
            sc_c = jnp.dot(
                qp, ks.T, precision=jax.lax.Precision.HIGHEST
            ) * scale
            sc_c = jnp.where(valid[None, :], sc_c, -1e30)
            sc_cur = (
                jnp.sum(qp * k[j][None, :], axis=-1, keepdims=True) * scale
            )
            mx = jnp.maximum(jnp.max(sc_c, axis=-1, keepdims=True), sc_cur)
            e_c = jnp.exp(sc_c - mx)
            e_cur = jnp.exp(sc_cur - mx)
            denom = jnp.sum(e_c, axis=-1, keepdims=True) + e_cur
            out = (
                jnp.dot(e_c, vs, precision=jax.lax.Precision.HIGHEST)
                + e_cur * v[j][None, :]
            ) / denom
            outs.append(out)
        attn = jnp.concatenate(outs, axis=0).reshape(1, nq * hd)
        h = h + w8a8_linear_ref(
            attn, tkp["o_q"][l], tkp["o_s"][l][0], tkp["o_m"][l][0]
        )
        x2 = rms(h, tkp["post_ln"][l][0])
        gu = w8a8_linear_ref(
            x2, tkp["gu_q"][l], tkp["gu_s"][l][0], tkp["gu_m"][l][0]
        )
        act = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
        h = h + w8a8_linear_ref(
            act, tkp["dn_q"][l], tkp["dn_s"][l][0], tkp["dn_m"][l][0]
        )

    hf = rms(h, tkp["fin_ln"][0])
    logits = w8a8_linear_ref(hf, tkp["ch_q"], tkp["ch_s"][0], tkp["ch_m"][0])[0]

    slot = (position % capacity).astype(jnp.int32)
    krow = jnp.concatenate(k_rows)[None, :].astype(cache2["k2"].dtype)
    vrow = jnp.concatenate(v_rows)[None, :].astype(cache2["v2"].dtype)
    new_cache = {
        "k2": jax.lax.dynamic_update_slice(cache2["k2"], krow, (slot, 0)),
        "v2": jax.lax.dynamic_update_slice(cache2["v2"], vrow, (slot, 0)),
        "pos": jax.lax.dynamic_update_slice(
            cache2["pos"], position[None].astype(jnp.int32), (slot,)
        ),
    }
    return hf[None, :, :].astype(dtype), logits.astype(jnp.float32), new_cache
