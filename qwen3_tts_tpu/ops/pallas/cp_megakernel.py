"""Code-predictor MEGA-kernel: one pallas_call per frame.

The jnp code predictor (models/code_predictor.py, mirroring reference
Qwen3CodePredictor.swift:8-216 + the per-frame loop Qwen3Talker.swift:501-523)
costs ~1.9 ms/frame of the 4.2 ms bf16 decode step on a v5e: its 16 sequential
token passes re-read the 5-layer weight set from HBM 16x (2.3 GB/frame) and
dispatch ~1,200 tiny XLA ops (~2 us op latency each). This kernel runs the
ENTIRE frame — all 16 token passes x 5 layers, the tiny KV cache, the 15
lm_head matmuls, gumbel sampling, repetition-penalty bookkeeping, and the
codec-embedding gathers — in ONE Mosaic kernel with the full layer weight set
RESIDENT in VMEM (int8, ~79 MB of the 128 MB v5e VMEM).

Compute format is W8A8:
  * weights: per-output-row signed int8 affine, w[o,:] ~= s[o] * q[o,:] + m[o]
    (ops/quant.py::quantize_rowwise_int8_np)
  * activations: per-token symmetric int8, x ~= sx * xq
  * y[o] = sx*s[o]*(xq . q[o])  +  m[o]*(sx*sum(xq))   — the int8 x int8 dot
    runs on the MXU with int32 accumulation; dequant folds into the tiny
    output row, so NO per-element weight dequant ever executes (a bf16 cast of
    79M weights x 16 passes would be VPU-bound at ~1.3 ms/frame).

lm_head tables (~2 MB/group int8) stream from HBM with a double-buffered DMA
that overlaps the next group's fetch with the current token pass; sampled
codec-embedding rows are fetched with single-row DMAs.

Numerical parity: predict_frame_w8a8_ref() is a pure-jnp mirror of the exact
same math; greedy (temperature=0) codes match the kernel bit-for-bit (tested
in interpret mode and on TPU). Sampling uses the on-core PRNG
(pltpu.prng_random_bits), so sampled streams differ from the jax.random
stream of the jnp path (same distribution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import quantize_rowwise_int8_np, w8a8_linear_ref
from .. import rope as rope_ops

M_PAD = 32  # int8 MXU sublane tile; row 0 carries the token, rows 1.. stay 0


def dense_entry_np(entry: dict) -> np.ndarray:
    """Materialize a linear/table entry as a dense float32 numpy weight.
    Accepts dense ("w"), bit-packed ("wq"), and int8 ("w8") storage — kernel
    builders re-quantize to the W8A8 format from whatever the checkpoint
    carried (pre-quantized checkpoints go packed -> dense -> per-row int8)."""
    if "w" in entry:
        return np.asarray(jax.device_get(entry["w"]), np.float32)
    if "w8" in entry:
        w8 = np.asarray(jax.device_get(entry["w8"]), np.float32)
        scales = np.asarray(jax.device_get(entry["scales"]), np.float32)
        biases = np.asarray(jax.device_get(entry["biases"]), np.float32)
        in_dim = w8.shape[-1]
        g = in_dim // scales.shape[-1]
        r = w8.reshape(*w8.shape[:-1], scales.shape[-1], g)
        return (r * scales[..., None] + biases[..., None]).reshape(w8.shape)
    from ..linear import derive_packed_dims
    from ..quant import dequantize_np

    bits, gs, in_dim = derive_packed_dims(entry)
    wq = np.asarray(jax.device_get(entry["wq"]))
    scales = np.asarray(jax.device_get(entry["scales"]), np.float32)
    biases = (
        np.asarray(jax.device_get(entry["biases"]), np.float32)
        if "biases" in entry
        else None
    )
    lead = wq.shape[:-2]
    flat_wq = wq.reshape(-1, *wq.shape[-2:])
    flat_s = scales.reshape(-1, *scales.shape[-2:])
    flat_b = (
        biases.reshape(-1, *biases.shape[-2:]) if biases is not None else None
    )
    dense = np.stack(
        [
            dequantize_np(
                flat_wq[i], flat_s[i],
                flat_b[i] if flat_b is not None else None,
                bits=bits, group_size=gs,
            )
            for i in range(flat_wq.shape[0])
        ]
    )
    return dense.reshape(*lead, *dense.shape[-2:]).astype(np.float32)


# ---------------------------------------------------------------------------
# In-kernel helpers (operate on VALUES; shapes static)
# ---------------------------------------------------------------------------


def _rms(x, w_row, eps):
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w_row


def _w8a8(x, wq, s, m):
    """x (M, K) f32; wq (O, K) int8; s, m (1, O) f32 -> (M, O) f32."""
    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.maximum(ax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        # pin: a global jax_default_matmul_precision="highest" would request
        # an fp32 contract on int8 operands, which Mosaic rejects
        precision=jax.lax.Precision.DEFAULT,
    ).astype(jnp.float32)
    sum_xq = jnp.sum(xq.astype(jnp.float32), axis=-1, keepdims=True)
    return sx * s * acc + m * (sx * sum_xq)


def _to_heads(row, n, hd):
    """(1, n*hd) -> (n, hd) via sublane concat of lane slices (no cross-lane
    reshape, which Mosaic restricts)."""
    return jnp.concatenate(
        [row[:, i * hd:(i + 1) * hd] for i in range(n)], axis=0
    )


def _to_row(heads, n, hd):
    """(n, hd) -> (1, n*hd). Each row is extracted to sublane offset 0 with a
    one-hot dot before the lane concat — Mosaic rejects lane-concats of values
    at mismatched sublane offsets."""
    parts = []
    for i in range(n):
        e = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) == i).astype(
            heads.dtype
        )
        parts.append(
            jax.lax.dot_general(
                e, heads, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # exact extraction
            )
        )
    return jnp.concatenate(parts, axis=1)


def _rot_half(x, hd):
    return jnp.concatenate([-x[:, hd // 2:], x[:, :hd // 2]], axis=1)


def _gumbel_pick(lg: jax.Array, temp: jax.Array, vocab: int) -> jax.Array:
    """In-kernel gumbel-argmax draw from (1, vocab) logits `lg` — categorical
    sampling at temperature `temp`; temp == 0 degrades to exact greedy.

    u = (bits24 + 0.5) / 2^24 is strictly inside (0, 1): u == 1.0 would make
    g infinite and temp * g NaN at temperature 0. The 24-bit value is carved
    out with an explicit LOGICAL shift on int32 — a plain >> on uint32 can
    lower as an arithmetic shift on TPU, yielding negative u and NaN logits.

    Shared by _cp_kernel's sample_phase and the distribution-test harness
    (gumbel_sample_kernel) so the statistically validated formula IS the
    shipped one. Caller must have seeded the PRNG (pltpu.prng_seed)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits((1, vocab)), jnp.int32)
    u24 = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32)
    u = (u24 + 0.5) * (1.0 / 16777216.0)
    g = -jnp.log(-jnp.log(u))
    # elementwise select keeps greedy independent of g entirely
    score = jnp.where(temp > 0, lg + temp * g, lg)
    return jnp.argmax(score, axis=-1)[0].astype(jnp.int32)


def gumbel_sample_kernel(
    logits: jax.Array,
    seed: int,
    temperature: float,
    n_draws: int,
    interpret: bool = True,
) -> jax.Array:
    """Test harness: `n_draws` independent _gumbel_pick draws from fixed
    [vocab] logits, one PRNG stream (seeded once, like a decode stream).
    Returns [n_draws] int32. Used by tests/test_sampling_stats.py to
    chi-square the in-kernel sampler against the exact softmax."""
    vocab = int(logits.shape[-1])

    def body(seed_ref, temp_ref, lg_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        temp = temp_ref[0]
        lg = lg_ref[0:1, :]

        def draw(i, _):
            out_ref[pl.ds(i, 1), :] = _gumbel_pick(lg, temp, vocab)[None, None]
            return 0

        jax.lax.fori_loop(0, n_draws, draw, 0)

    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        body,
        in_specs=[sm, sm, vm],
        out_specs=vm,
        out_shape=jax.ShapeDtypeStruct((n_draws, 1), jnp.int32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([temperature], jnp.float32),
        logits.astype(jnp.float32)[None, :],
    )
    return out[:, 0]


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _cp_kernel(
    # SMEM
    seed_ref, temp_ref,
    # VMEM tensors
    x0_ref, seen_ref, cos_ref, sin_ref, qmask_ref,
    in_ln, post_ln, q_ln, k_ln, fin_ln,
    qkv_q, qkv_s, qkv_m, o_q, o_s, o_m,
    gu_q, gu_s, gu_m, dn_q, dn_s, dn_m,
    head_s, head_m, emb_s, emb_m,
    # HBM (ANY)
    head_q, emb_q,
    # outputs
    codes_out, seen_out,
    # scratch
    x_s, attn_s, kv_k, kv_v, head_buf, emb_row,
    sem_head, sem_emb,
    *,
    nl, nq, nkv, hd, hc, inter, vocab, ng, th, eps, penalty,
):
    n_pos = ng + 1
    group = nq // nkv
    scale = 1.0 / float(hd) ** 0.5
    temp = temp_ref[0]

    pltpu.prng_seed(seed_ref[0])
    seen_out[:] = seen_ref[:]
    codes_out[:] = jnp.zeros_like(codes_out)
    x_s[:] = jnp.zeros_like(x_s)
    attn_s[:] = jnp.zeros_like(attn_s)
    # Unwritten KV slots are read by the full-cache dots (their softmax weight
    # is exactly 0, but 0 * garbage/NaN is not 0) — zero them once.
    kv_k[:] = jnp.zeros_like(kv_k)
    kv_v[:] = jnp.zeros_like(kv_v)

    def head_dma(k, slot):
        return pltpu.make_async_copy(
            head_q.at[k], head_buf.at[slot], sem_head.at[slot]
        )

    head_dma(0, 0).start()

    def token_pass(t):
        """Forward the current token (x_s row 0) at position t through all
        layers, writing KV slot t. Returns final-normed hidden (M_PAD, hc).

        Attention runs with ALL nq query heads in the M dimension of TWO
        dots instead of a per-kv-head loop of 16 tiny dots plus a 16-dot
        _to_row extraction: q_wide [nq, nq*hd] places head i's query in lane
        block i (lane-tile + qmask), K_rep/V_rep [n_pos, nq*hd] replicate
        each kv head's cache block per query head (lane concats of cache
        REF loads — values at sublane offset 0, which Mosaic allows). The
        zero lanes contribute exact 0s to the f32 contractions, so results
        are bitwise identical to the per-head formulation; the qmask row-sum
        replaces _to_row. This cut the per-(group x layer) step from ~10.5
        to fewer, larger issue slots (the kernel was dot-issue-latency
        bound, not FLOP bound)."""
        cos_t = cos_ref[pl.ds(t, 1), :]  # (1, hd)
        sin_t = sin_ref[pl.ds(t, 1), :]
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (nq, n_pos), 1)
        qmask = qmask_ref[:]  # (nq, nq*hd): row i keeps lane block i
        h = x_s[:]
        for l in range(nl):
            xin = _rms(h, in_ln[l], eps)
            qkv = _w8a8(xin, qkv_q[l], qkv_s[l], qkv_m[l])  # (M, (nq+2nkv)*hd)
            row = qkv[0:1, :]
            q = _to_heads(row[:, : nq * hd], nq, hd)
            k = _to_heads(row[:, nq * hd:(nq + nkv) * hd], nkv, hd)
            v_row = row[:, (nq + nkv) * hd:]  # (1, nkv*hd) lane-major
            q = _rms(q, q_ln[l], eps)
            k = _rms(k, k_ln[l], eps)
            q = q * cos_t + _rot_half(q, hd) * sin_t
            k = k * cos_t + _rot_half(k, hd) * sin_t

            for j in range(nkv):
                kv_k[l, j, pl.ds(t, 1), :] = k[j:j + 1, :]
            kv_v[l, pl.ds(t, 1), :] = v_row

            kblocks = [kv_k[l, j] for j in range(nkv)]  # (n_pos, hd) each
            k_rep = jnp.concatenate(
                [kblocks[i // group] for i in range(nq)], axis=1
            )  # (n_pos, nq*hd)
            v_all = kv_v[l]  # (n_pos, nkv*hd)
            v_rep = jnp.concatenate(
                [
                    v_all[:, (i // group) * hd:(i // group + 1) * hd]
                    for i in range(nq)
                ],
                axis=1,
            )  # (n_pos, nq*hd)
            q_wide = jnp.concatenate([q] * nq, axis=1) * qmask  # (nq, nq*hd)

            sc = jax.lax.dot_general(
                q_wide, k_rep, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) * scale  # (nq, n_pos)
            sc = jnp.where(slot_ids <= t, sc, -1e30)
            mx = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp(sc - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out_wide = jax.lax.dot_general(
                p, v_rep, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (nq, nq*hd)
            attn_s[0:1, :] = jnp.sum(out_wide * qmask, axis=0, keepdims=True)
            h = h + _w8a8(attn_s[:], o_q[l], o_s[l], o_m[l])
            x2 = _rms(h, post_ln[l], eps)
            gu = _w8a8(x2, gu_q[l], gu_s[l], gu_m[l])  # (M, 2*inter)
            act = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
            h = h + _w8a8(act, dn_q[l], dn_s[l], dn_m[l])
        return _rms(h, fin_ln[:], eps)

    def sample_phase(h_fin, t):
        k = t - 1
        slot = jax.lax.rem(k, 2)
        head_dma(k, slot).wait()
        hb = jax.lax.cond(
            slot == 0, lambda: head_buf[0], lambda: head_buf[1]
        )  # (vocab, hc) int8
        logits = _w8a8(h_fin, hb, head_s[pl.ds(k, 1)][0], head_m[pl.ds(k, 1)][0])
        lg = logits[0:1, :]  # (1, vocab)

        # prefetch next group's head while we sample + embed
        @pl.when(t < ng)
        def _():
            head_dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        seen_row = seen_out[pl.ds(k, 1), :]  # (1, vocab)
        pen = jnp.where(seen_row > 0, jnp.float32(penalty), jnp.float32(1.0))
        lg = lg / pen

        # gumbel-argmax == categorical; temp==0 degrades to exact greedy
        # (_gumbel_pick — shared with the distribution-test harness)
        code = _gumbel_pick(lg, temp, vocab)

        lane_v = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)
        onehot = (lane_v == code).astype(jnp.float32)
        seen_out[pl.ds(k, 1), :] = jnp.maximum(seen_row, onehot)

        rows_c = jax.lax.broadcasted_iota(jnp.int32, codes_out.shape, 0)
        lanes_c = jax.lax.broadcasted_iota(jnp.int32, codes_out.shape, 1)
        codes_out[:] = codes_out[:] + code * (
            (rows_c == 0) & (lanes_c == k)
        ).astype(jnp.int32)

        # projected embedding row -> next token input. (The RAW embed_sum
        # accumulation moved OUT of the kernel: the wrapper gathers the 15
        # rows in one XLA op after codes return — the per-group raw DMA +
        # select + scale work was ~11%-class fixed overhead on the critical
        # path, ROADMAP r2 decomposition.) Single-row HBM slices violate the
        # (8,128) tiling, so DMA the aligned 8-row block holding `code` and
        # select the row with a sublane one-hot.
        base = (code // 8) * 8
        proj = pltpu.make_async_copy(
            emb_q.at[k, pl.ds(base, 8), :], emb_row, sem_emb
        )
        proj.start()

        def pick_row(block_ref):
            rows = jax.lax.broadcasted_iota(jnp.int32, block_ref.shape, 0)
            sel = (rows == code - base).astype(jnp.float32)
            return jnp.sum(
                block_ref[:].astype(jnp.float32) * sel, axis=0, keepdims=True
            )

        proj.wait()

        @pl.when(t < n_pos - 1)
        def _():
            ps = jnp.sum(emb_s[pl.ds(k, 1)][0] * onehot)
            pm = jnp.sum(emb_m[pl.ds(k, 1)][0] * onehot)
            x_s[0:1, :] = pick_row(emb_row) * ps + pm

    def step(t, carry):
        @pl.when(t == 0)
        def _():
            x_s[0:1, :] = x0_ref[0:1, :]

        @pl.when(t == 1)
        def _():
            x_s[0:1, :] = x0_ref[1:2, :]

        h_fin = token_pass(t)

        @pl.when(t >= 1)
        def _():
            sample_phase(h_fin, t)

        return carry

    jax.lax.fori_loop(0, n_pos, step, jnp.int32(0))


# ---------------------------------------------------------------------------
# Host-side builder: dense cp params -> kernel param tree (numpy)
# ---------------------------------------------------------------------------


def build_cp_kernel_params(cp_params: dict, config) -> dict:
    """Quantize a DENSE code-predictor param tree (models/code_predictor.py
    layout) into the mega-kernel's W8A8 format. Returns a dict of numpy
    arrays; callers jax.device_put it once.

    When small_to_mtp_projection is present (talker_hidden != cp hidden,
    reference Qwen3CodePredictor.swift:77-83), the per-group embedding tables
    are PRE-PROJECTED into cp space for the kernel's next-token inputs, while
    the raw tables are kept for the talker-facing embed_sum."""
    hc = config.hidden_size
    lay = cp_params["layers"]

    def rw(entry_or_w):  # rowwise int8 over the last two axes; keep leading axes
        w = (
            dense_entry_np(entry_or_w)
            if isinstance(entry_or_w, dict)
            else np.asarray(jax.device_get(entry_or_w), np.float32)
        )
        q, s, m = quantize_rowwise_int8_np(w)
        return q, s[..., None, :].astype(np.float32), m[..., None, :].astype(np.float32)

    def to_np(a):
        return np.asarray(jax.device_get(a), np.float32)

    qkv_q, qkv_s, qkv_m = rw(lay["qkv_proj"])
    o_q, o_s, o_m = rw(lay["o_proj"])
    gu_q, gu_s, gu_m = rw(lay["gateup_proj"])
    dn_q, dn_s, dn_m = rw(lay["down_proj"])

    emb_raw = dense_entry_np(cp_params["codec_embedding"])  # (ng, V, th)
    head = dense_entry_np(cp_params["lm_head"])             # (ng, V, hc)

    proj = cp_params.get("small_to_mtp_projection")
    if proj is not None:
        wp = dense_entry_np(proj)  # (hc, th)
        bp = to_np(proj["b"]) if "b" in proj else np.zeros((hc,), np.float32)
        emb_in = emb_raw @ wp.T + bp
    else:
        emb_in = emb_raw

    embi_q, embi_s, embi_m = rw(emb_in)
    if proj is None:
        embr_q, embr_s, embr_m = embi_q, embi_s, embi_m
    else:
        embr_q, embr_s, embr_m = rw(emb_raw)
    head_q, head_s, head_m = rw(head)

    cos, sin = _rope_tables(config)

    def ln(w):  # (nl, d) -> (nl, 1, d) f32
        a = to_np(w)
        return a[:, None, :]

    kp = {
        "in_ln": ln(lay["input_layernorm"]["w"]),
        "post_ln": ln(lay["post_attention_layernorm"]["w"]),
        "q_ln": ln(lay["q_norm"]["w"]),
        "k_ln": ln(lay["k_norm"]["w"]),
        "fin_ln": to_np(cp_params["norm"]["w"])[None, :],
        "qkv_q": qkv_q, "qkv_s": qkv_s, "qkv_m": qkv_m,
        "o_q": o_q, "o_s": o_s, "o_m": o_m,
        "gu_q": gu_q, "gu_s": gu_s, "gu_m": gu_m,
        "dn_q": dn_q, "dn_s": dn_s, "dn_m": dn_m,
        "head_q": head_q, "head_s": head_s, "head_m": head_m,
        "emb_q": embi_q, "emb_s": embi_s, "emb_m": embi_m,
        "embr_q": embr_q, "embr_s": embr_s, "embr_m": embr_m,
        "cos": cos,
        "sin": sin,
    }
    if proj is not None:
        # wp/bp already materialized above via dense_entry_np — proj may be
        # packed (pre-quantized checkpoints quantize this module too), so
        # proj["w"] need not exist
        kp["proj_w"] = wp
        kp["proj_b"] = bp
    return kp


def cp_kernel_hbm_bytes(kp: dict) -> int:
    return sum(np.asarray(v).nbytes for v in kp.values())


def _rope_tables(config) -> tuple[np.ndarray, np.ndarray]:
    n_pos = config.num_code_groups
    inv = rope_ops.inv_freq(config.head_dim, config.rope_theta)
    pos = np.arange(n_pos, dtype=np.float32)
    freqs = pos[:, None] * inv[None, :]
    emb_f = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb_f).astype(np.float32), np.sin(emb_f).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("config",))
def _build_kernel_weights_device(cp_params: dict, config) -> dict:
    """Device-side twin of build_cp_kernel_params (minus the host rope
    tables): quantizes on the accelerator so model-sized trees never round-trip
    through the (slow) host."""
    from ..quant import quantize_rowwise_int8_jnp

    hc = config.hidden_size
    lay = cp_params["layers"]

    def rw(w):
        q, s, m = quantize_rowwise_int8_jnp(w)
        return q, s[..., None, :], m[..., None, :]

    qkv_q, qkv_s, qkv_m = rw(lay["qkv_proj"]["w"])
    o_q, o_s, o_m = rw(lay["o_proj"]["w"])
    gu_q, gu_s, gu_m = rw(lay["gateup_proj"]["w"])
    dn_q, dn_s, dn_m = rw(lay["down_proj"]["w"])

    emb_raw = cp_params["codec_embedding"]["w"].astype(jnp.float32)
    head = cp_params["lm_head"]["w"].astype(jnp.float32)
    proj = cp_params.get("small_to_mtp_projection")
    if proj is not None:
        wp = proj["w"].astype(jnp.float32)
        bp = (
            proj["b"].astype(jnp.float32)
            if "b" in proj
            else jnp.zeros((hc,), jnp.float32)
        )
        emb_in = emb_raw @ wp.T + bp
    else:
        emb_in = emb_raw
    embi_q, embi_s, embi_m = rw(emb_in)
    if proj is None:
        embr_q, embr_s, embr_m = embi_q, embi_s, embi_m
    else:
        embr_q, embr_s, embr_m = rw(emb_raw)
    head_q, head_s, head_m = rw(head)

    def ln(w):
        return w.astype(jnp.float32)[:, None, :]

    kp = {
        "in_ln": ln(lay["input_layernorm"]["w"]),
        "post_ln": ln(lay["post_attention_layernorm"]["w"]),
        "q_ln": ln(lay["q_norm"]["w"]),
        "k_ln": ln(lay["k_norm"]["w"]),
        "fin_ln": cp_params["norm"]["w"].astype(jnp.float32)[None, :],
        "qkv_q": qkv_q, "qkv_s": qkv_s, "qkv_m": qkv_m,
        "o_q": o_q, "o_s": o_s, "o_m": o_m,
        "gu_q": gu_q, "gu_s": gu_s, "gu_m": gu_m,
        "dn_q": dn_q, "dn_s": dn_s, "dn_m": dn_m,
        "head_q": head_q, "head_s": head_s, "head_m": head_m,
        "emb_q": embi_q, "emb_s": embi_s, "emb_m": embi_m,
        "embr_q": embr_q, "embr_s": embr_s, "embr_m": embr_m,
    }
    if proj is not None:
        kp["proj_w"] = wp
        kp["proj_b"] = bp
    return kp


def build_cp_kernel_params_device(cp_params: dict, config) -> dict:
    kp = dict(_build_kernel_weights_device(cp_params, config))
    cos, sin = _rope_tables(config)
    kp["cos"] = jnp.asarray(cos)
    kp["sin"] = jnp.asarray(sin)
    return kp


# ---------------------------------------------------------------------------
# Wrapper: predict one frame via the kernel
# ---------------------------------------------------------------------------


def predict_frame_kernel(
    kp: dict,
    code_hidden: jax.Array,
    code0_embed: jax.Array,
    key: jax.Array,
    temperature: jax.Array,
    seen_cp: jax.Array | None,
    config,
    repetition_penalty: float = 1.05,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array | None]:
    """Drop-in kernel replacement for code_predictor.predict_frame (B=1).

    Returns (codes [ng] int32, embed_sum [1, 1, th], updated seen or None).
    embed_sum includes code0_embed, matching the jnp path."""
    ng = config.num_code_groups - 1
    hc = config.hidden_size
    vocab = config.vocab_size
    th = code_hidden.shape[-1]
    track = seen_cp is not None

    x0 = jnp.concatenate(
        [code_hidden[0].astype(jnp.float32), code0_embed[0].astype(jnp.float32)],
        axis=0,
    )  # (2, th)
    if "proj_w" in kp:
        x0 = x0 @ kp["proj_w"].astype(jnp.float32).T + kp["proj_b"].astype(
            jnp.float32
        )
    x0 = jnp.zeros((8, hc), jnp.float32).at[:2].set(x0)

    seen_in = (
        seen_cp.astype(jnp.float32)
        if track
        else jnp.zeros((ng, vocab), jnp.float32)
    )
    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = (kd[0] ^ (kd[-1] << 1)).astype(jnp.int32)[None]
    temp = jnp.maximum(temperature.astype(jnp.float32), 0.0)[None]
    penalty = float(repetition_penalty) if track else 1.0

    codes_row, seen_new = _cp_kernel_call(
        seed, temp, x0, seen_in, kp, config, th, penalty, interpret
    )
    codes = codes_row[0, :ng]
    # Raw embed_sum OUTSIDE the kernel: one XLA gather-dequant over the 15
    # sampled codes (int8 rows * per-row scale + mid), accumulated in group
    # order to stay bit-identical to the old in-kernel sequential sum. This
    # removed a per-group DMA + row-select from the kernel's critical path.
    gidx = jnp.arange(ng)
    rows = kp["embr_q"][gidx, codes].astype(jnp.float32)        # [ng, th]
    s = kp["embr_s"][gidx, 0, codes].astype(jnp.float32)        # [ng]
    m = kp["embr_m"][gidx, 0, codes].astype(jnp.float32)
    terms = rows * s[:, None] + m[:, None]
    esum = terms[0]
    for k in range(1, ng):
        esum = esum + terms[k]
    embed_sum = (
        code0_embed.astype(jnp.float32) + esum[None, None, :]
    ).astype(code_hidden.dtype)
    return codes, embed_sum, (seen_new[:ng] > 0) if track else None


@functools.partial(
    jax.jit, static_argnames=("config", "th", "penalty", "interpret")
)
def _cp_kernel_call(seed, temp, x0, seen_in, kp, config, th, penalty, interpret):
    ng = config.num_code_groups - 1
    n_pos = ng + 1
    hc = config.hidden_size
    hd = config.head_dim
    nq = config.num_attention_heads
    nkv = config.num_key_value_heads
    nl = config.num_hidden_layers
    inter = config.intermediate_size
    vocab = config.vocab_size

    kernel = functools.partial(
        _cp_kernel,
        nl=nl, nq=nq, nkv=nkv, hd=hd, hc=hc, inter=inter,
        vocab=vocab, ng=ng, th=th, eps=config.rms_norm_eps, penalty=penalty,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.int32),      # codes (row 0)
            jax.ShapeDtypeStruct((ng, vocab), jnp.float32), # seen
        ),
        in_specs=(
            [sm, sm, vm, vm, vm, vm, vm]
            + [vm] * 5                     # norms
            + [vm] * 12                    # layer weights + scales
            + [vm] * 4                     # head/emb scales
            + [hbm] * 2                    # head_q, emb_q
        ),
        out_specs=(vm, vm),
        scratch_shapes=[
            pltpu.VMEM((M_PAD, hc), jnp.float32),            # x_s
            pltpu.VMEM((M_PAD, nq * hd), jnp.float32),       # attn_s
            pltpu.VMEM((nl, nkv, n_pos, hd), jnp.float32),   # kv_k
            pltpu.VMEM((nl, n_pos, nkv * hd), jnp.float32),  # kv_v (row-major)
            pltpu.VMEM((2, vocab, hc), jnp.int8),            # head_buf
            pltpu.VMEM((8, hc), jnp.int8),                   # emb_row block
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        # The TPU-specific interpreter (not the generic HLO one) is required:
        # it implements prng_seed/prng_random_bits and DMA semantics on CPU.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        seed, temp, x0, seen_in, kp["cos"], kp["sin"],
        # qmask[i, c] = 1 iff c // hd == i (f32; lane-block selector)
        (
            jax.lax.broadcasted_iota(jnp.int32, (nq, nq * hd), 1) // hd
            == jax.lax.broadcasted_iota(jnp.int32, (nq, nq * hd), 0)
        ).astype(jnp.float32),
        kp["in_ln"], kp["post_ln"], kp["q_ln"], kp["k_ln"], kp["fin_ln"],
        kp["qkv_q"], kp["qkv_s"], kp["qkv_m"],
        kp["o_q"], kp["o_s"], kp["o_m"],
        kp["gu_q"], kp["gu_s"], kp["gu_m"],
        kp["dn_q"], kp["dn_s"], kp["dn_m"],
        kp["head_s"], kp["head_m"], kp["emb_s"], kp["emb_m"],
        kp["head_q"], kp["emb_q"],
    )


# ---------------------------------------------------------------------------
# Pure-jnp mirror (same W8A8 math; tests + non-TPU fallback)
# ---------------------------------------------------------------------------


def predict_frame_w8a8_ref(
    kp: dict,
    code_hidden: jax.Array,
    code0_embed: jax.Array,
    key: jax.Array,
    temperature: jax.Array,
    seen_cp: jax.Array | None,
    config,
    repetition_penalty: float = 1.05,
) -> tuple[jax.Array, jax.Array, jax.Array | None]:
    """jnp implementation of exactly the kernel's math (W8A8 per-row affine,
    f32 accumulation, gumbel-argmax sampling with jax.random). Greedy
    (temperature=0) output is bit-identical to the kernel."""
    ng = config.num_code_groups - 1
    n_pos = ng + 1
    hc = config.hidden_size
    hd = config.head_dim
    nq = config.num_attention_heads
    nkv = config.num_key_value_heads
    nl = config.num_hidden_layers
    inter = config.intermediate_size
    vocab = config.vocab_size
    th = code_hidden.shape[-1]
    eps = config.rms_norm_eps
    group = nq // nkv
    scale = 1.0 / float(hd) ** 0.5
    track = seen_cp is not None
    penalty = float(repetition_penalty) if track else 1.0

    cos = jnp.asarray(kp["cos"])  # (n_pos, hd)
    sin = jnp.asarray(kp["sin"])

    x0 = jnp.concatenate(
        [code_hidden[0].astype(jnp.float32), code0_embed[0].astype(jnp.float32)],
        axis=0,
    )
    if "proj_w" in kp:
        x0 = x0 @ kp["proj_w"].astype(jnp.float32).T + kp["proj_b"].astype(
            jnp.float32
        )

    def rms(x, w, e=eps):
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + e) * w.astype(jnp.float32)

    def rot_half(x):
        return jnp.concatenate([-x[:, hd // 2:], x[:, :hd // 2]], axis=1)

    kv_k = jnp.zeros((nl, nkv, n_pos, hd), jnp.float32)
    kv_v = jnp.zeros((nl, nkv, n_pos, hd), jnp.float32)
    seen = (
        seen_cp.astype(jnp.float32)
        if track
        else jnp.zeros((ng, vocab), jnp.float32)
    )
    slot_ids = jnp.arange(n_pos)[None, :]

    def token_pass(x, t, kv_k, kv_v):
        h = x[None, :]  # (1, hc)
        for l in range(nl):
            xin = rms(h, kp["in_ln"][l][0])
            qkv = w8a8_linear_ref(
                xin, kp["qkv_q"][l], kp["qkv_s"][l][0], kp["qkv_m"][l][0]
            )
            q = qkv[0, : nq * hd].reshape(nq, hd)
            k = qkv[0, nq * hd:(nq + nkv) * hd].reshape(nkv, hd)
            v = qkv[0, (nq + nkv) * hd:].reshape(nkv, hd)
            q = rms(q, kp["q_ln"][l][0])
            k = rms(k, kp["k_ln"][l][0])
            c = cos[t][None, :]
            s = sin[t][None, :]
            q = q * c + rot_half(q) * s
            k = k * c + rot_half(k) * s
            kv_k = jax.lax.dynamic_update_slice(
                kv_k, k[:, None, :][None], (l, 0, t, 0)
            )
            kv_v = jax.lax.dynamic_update_slice(
                kv_v, v[:, None, :][None], (l, 0, t, 0)
            )
            outs = []
            for j in range(nkv):
                qp = q[j * group:(j + 1) * group]
                # HIGHEST keeps these f32 dots exact — the TPU default would
                # demote them to bf16 passes and break kernel parity
                sc = jnp.dot(
                    qp, kv_k[l, j].T, precision=jax.lax.Precision.HIGHEST
                ) * scale  # (group, n_pos)
                sc = jnp.where(slot_ids <= t, sc, -1e30)
                mx = jnp.max(sc, axis=-1, keepdims=True)
                p = jnp.exp(sc - mx)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                outs.append(
                    jnp.dot(p, kv_v[l, j], precision=jax.lax.Precision.HIGHEST)
                )
            attn = jnp.concatenate(outs, axis=0).reshape(1, nq * hd)
            h = h + w8a8_linear_ref(
                attn, kp["o_q"][l], kp["o_s"][l][0], kp["o_m"][l][0]
            )
            x2 = rms(h, kp["post_ln"][l][0])
            gu = w8a8_linear_ref(
                x2, kp["gu_q"][l], kp["gu_s"][l][0], kp["gu_m"][l][0]
            )
            act = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
            h = h + w8a8_linear_ref(
                act, kp["dn_q"][l], kp["dn_s"][l][0], kp["dn_m"][l][0]
            )
        return rms(h, kp["fin_ln"][0]), kv_k, kv_v

    codes = jnp.zeros((ng,), jnp.int32)
    esum = jnp.zeros((th,), jnp.float32)
    x = x0[0]
    keys = jax.random.split(key, n_pos)
    temp = jnp.maximum(temperature.astype(jnp.float32), 0.0)

    for t in range(n_pos):
        if t == 1:
            x = x0[1]
        h_fin, kv_k, kv_v = token_pass(x, t, kv_k, kv_v)
        if t >= 1:
            k_idx = t - 1
            logits = w8a8_linear_ref(
                h_fin, kp["head_q"][k_idx], kp["head_s"][k_idx][0],
                kp["head_m"][k_idx][0],
            )[0]
            pen = jnp.where(
                seen[k_idx] > 0, jnp.float32(penalty), jnp.float32(1.0)
            )
            lg = logits / pen
            g = jax.random.gumbel(keys[t], (vocab,), jnp.float32)
            score = jnp.where(temp > 0, lg + temp * g, lg)
            code = jnp.argmax(score).astype(jnp.int32)
            codes = codes.at[k_idx].set(code)
            onehot = (jnp.arange(vocab) == code).astype(jnp.float32)
            seen = seen.at[k_idx].max(onehot)
            raw = (
                kp["embr_q"][k_idx][code].astype(jnp.float32)
                * kp["embr_s"][k_idx][0, code]
                + kp["embr_m"][k_idx][0, code]
            )
            esum = esum + raw
            if t < n_pos - 1:
                x = (
                    kp["emb_q"][k_idx][code].astype(jnp.float32)
                    * kp["emb_s"][k_idx][0, code]
                    + kp["emb_m"][k_idx][0, code]
                )

    embed_sum = (code0_embed.astype(jnp.float32) + esum[None, None, :]).astype(
        code_hidden.dtype
    )
    return codes, embed_sum, (seen > 0) if track else None
