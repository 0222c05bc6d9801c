"""Vocoder pre-transformer MEGA-kernel: 8 layers in one pallas_call.

After the fused SEANet blocks (ops/pallas/vocoder_kernels.py), the vocoder
is op-count-bound, not bandwidth-bound: the 8-layer causal pre-transformer
(models/vocoder.py::pre_transformer, reference DecoderTransformer,
SpeechTokenizer.swift:439-488) is ~160 small XLA ops over a [T<=110, 512]
activation, and on this stack every dispatched op costs ~25 us — ~4 ms of
pure launch overhead for ~100 us of math. This kernel runs input_proj, all
8 decoder layers (RMSNorm, per-head RoPE attention with LayerScale, SwiGLU
MLP with LayerScale), the final norm, and output_proj as ONE kernel with a
grid over layers; Mosaic's pipeline double-buffers each layer's ~8 MB bf16
weight block while the activation lives in VMEM scratch.

Mosaic-safe formulation (no lane slicing of values anywhere):
  * per-head weights are pre-split on a LEADING dim ([nl, nh, h, hd]), so
    q_h / k_h / v_h come from their own matmuls at lane offset 0;
  * rotate-half is a matmul with a constant signed permutation matrix
    R[hd, hd] (x @ R == rotate_half(x)), not a lane-slice concat;
  * the o-projection is accumulated per head (oh @ Wo_h summed over heads)
    instead of lane-concatenating 8 head outputs.

Numerics match models/vocoder.py::pre_transformer (fp32 softmax and norms;
matmuls in `compute_dtype`, bf16 on TPU / fp32 for exact-parity tests).
Parity: tests/test_pretransformer_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import rope as rope_ops

def _rms(x32, w_row, eps):
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return x32 * jax.lax.rsqrt(ms + eps) * w_row


_PARAMS = (
    "cos", "sin", "wi", "bi", "ln1", "wq", "wk", "wv", "rotm", "wo",
    "lsa", "ln2", "wg", "wu", "wd", "lsm", "fnorm", "wout", "bout",
)
_PER_LAYER = {"ln1", "wq", "wk", "wv", "wo", "lsa", "ln2", "wg", "wu", "wd", "lsm"}


def _kernel(
    cos, sin, wi, bi, ln1, wq, wk, wv, rotm, wo,
    lsa, ln2, wg, wu, wd, lsm, fnorm, wout, bout,
    x_ref, out_ref, x_s,
    *, nl, nh, hd, eps, cd,
):
    l = pl.program_id(1)

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(l == 0)
    def _():
        x_s[:] = dot(x_ref[0], wi[:]) + bi[:]

    h = x_s[:]  # (T_pad, h) fp32
    t = h.shape[0]
    scale = 1.0 / float(hd) ** 0.5
    cosv = cos[:]
    sinv = sin[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    causal = col <= row

    xin = _rms(h, ln1[0], eps)
    acc = jnp.zeros_like(h)
    for j in range(nh):
        qh = dot(xin, wq[0, j])  # (t, hd) fp32
        kh = dot(xin, wk[0, j])
        vh = dot(xin, wv[0, j])
        qh = qh * cosv + dot(qh, rotm[:]) * sinv
        kh = kh * cosv + dot(kh, rotm[:]) * sinv
        sc = jax.lax.dot_general(
            qh.astype(cd), kh.astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        sc = jnp.where(causal, sc, -1e30)
        mx = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - mx)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        oh = dot(p, vh)
        acc = acc + dot(oh, wo[0, j])
    h = h + lsa[0] * acc

    x2 = _rms(h, ln2[0], eps)
    g = dot(x2, wg[0])
    u = dot(x2, wu[0])
    m = dot(jax.nn.silu(g) * u, wd[0])
    h = h + lsm[0] * m
    x_s[:] = h

    @pl.when(l == nl - 1)
    def _():
        hf = _rms(h, fnorm[:], eps)
        out_ref[0] = (dot(hf, wout[:]) + bout[:]).astype(out_ref.dtype)


def build_pretransformer_kernel_params_device(
    pt: dict, cfg, weight_dtype=jnp.bfloat16
) -> dict:
    """Kernel param subtree from the stacked pre_transformer tree
    (models/vocoder.py init: input_proj / layers / norm / output_proj).
    Jittable; weights stay on device. Requires bias-free attention and MLP
    (the reference vocoder layout, attention_bias=False)."""
    L = pt["layers"]
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    h = cfg.hidden_size
    for name in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj"):
        if "b" in L[name]:
            raise ValueError(f"pre-transformer kernel requires bias-free {name}")

    def heads_in(w):  # [nl, nh*hd, h] -> [nl, nh, h, hd]
        nl = w.shape[0]
        return jnp.transpose(
            w.reshape(nl, nh, hd, h), (0, 1, 3, 2)
        ).astype(weight_dtype)

    def f32row(w):  # [nl, h] -> [nl, 1, h]
        return w[:, None, :].astype(jnp.float32)

    # x @ R == rotate_half(x) (ops/rope.py::rotate_half)
    rotm = np.zeros((hd, hd), np.float32)
    half = hd // 2
    for j in range(half):
        rotm[j + half, j] = -1.0
        rotm[j, j + half] = 1.0
    return {
        "wi": pt["input_proj"]["w"].T.astype(weight_dtype),
        "bi": pt["input_proj"]["b"][None].astype(jnp.float32),
        "ln1": f32row(L["input_layernorm"]["w"]),
        "wq": heads_in(L["q_proj"]["w"]),
        "wk": heads_in(L["k_proj"]["w"]),
        "wv": heads_in(L["v_proj"]["w"]),
        "rotm": jnp.asarray(rotm),
        "wo": jnp.transpose(
            L["o_proj"]["w"].reshape(-1, h, nh, hd), (0, 2, 3, 1)
        ).astype(weight_dtype),
        "lsa": f32row(L["self_attn_layer_scale"]["w"]),
        "ln2": f32row(L["post_attention_layernorm"]["w"]),
        "wg": jnp.transpose(L["gate_proj"]["w"], (0, 2, 1)).astype(weight_dtype),
        "wu": jnp.transpose(L["up_proj"]["w"], (0, 2, 1)).astype(weight_dtype),
        "wd": jnp.transpose(L["down_proj"]["w"], (0, 2, 1)).astype(weight_dtype),
        "lsm": f32row(L["mlp_layer_scale"]["w"]),
        "fnorm": pt["norm"]["w"][None].astype(jnp.float32),
        "wout": pt["output_proj"]["w"].T.astype(weight_dtype),
        "bout": pt["output_proj"]["b"][None].astype(jnp.float32),
    }


# ---------------------------------------------------------------------------
# Head-packed variant: all heads' scores/AV as TWO large MXU matmuls
# ---------------------------------------------------------------------------
#
# The per-head kernel above issues ~8 small dots per head per layer (~128
# per layer); with ~100 cycles of per-dot issue latency the kernel is
# dot-COUNT-bound and loses to XLA beyond T=64 (ROADMAP r2). This variant
# packs all heads into the sublane (M) dimension:
#
#   q/k/v computed WIDE in one dot each ([T, nh*hdp], hdp = head dim padded
#   to 64 so per-head lane slices sit at Mosaic-supported 64 offsets; the
#   pad lanes are exactly zero and drop out of every product);
#   RoPE applied wide (tiled cos/sin + one block-diagonal rotation matmul);
#   heads stacked to [nh*T, hdp] via 64-aligned lane slices + sublane
#   stores (VPU copies, no dot issue);
#   scores = ONE [nh*T, hdp] x [nh*T, hdp]^T dot — the off-diagonal
#   (cross-head) blocks are masked to -inf before the softmax, so the nh^2/nh
#   extra FLOPs buy dot-count freedom (MXU FLOPs are ~free at these sizes);
#   AV    = ONE [nh*T, nh*T] x [nh*T, hdp] dot (masked P has exact zeros in
#   cross-head blocks, so each head row only sees its own V block);
#   o-projection stays per-head (16 medium dots, the cheap part).
#
# Per-layer dot count: ~26 vs ~128 — and the two big dots tile the MXU far
# better than [T, 32] fragments. Wins at every T (measured on v5e; see
# ROADMAP), so decode_frames uses this variant with no T gate.
#
# Score STRIPS lift the old T<=128 cap (VERDICT r3 weak item 6): the
# (nh*T)^2 fp32 score/softmax intermediate is the only quadratic buffer, so
# for nh*T > 2048 the scores/AV pair runs in row strips of <= ~16 MB each
# (R rows x nh*T cols; per-strip causal+same-head mask offset by the strip
# base; outputs land in an o scratch). At nh*T <= 2048 there is exactly one
# strip — the formulation (and compiled graph) is the measured r3 one.

# Largest chunk length decode_frames routes to this kernel. VMEM at the cap
# (T=512, real dims, nrows=8192): q/k/v/o scratches ~8 MB + 16 MB score
# strip (x2-3 live) + ~11 MB/layer bf16 weights double-buffered —
# comfortably inside the 127 MB budget, at 16 unrolled strip iterations.
PACKED_T_CAP = 512
# Per-strip fp32 score bytes (rk * nrows * 4 <= this). 16 MiB keeps a
# SINGLE strip through nrows = nh*T_pad = 2048 — i.e. every chunk length
# up to the old T<=128 cap, including the production default (T=110,
# nrows=1792), compiles the exact graph the r3 numbers were measured on.
_STRIP_BYTES = 1 << 24


def _kernel_packed(
    cos, sin, wi, bi, ln1, wq, wk, wv, rotm, wo,
    lsa, ln2, wg, wu, wd, lsm, fnorm, wout, bout,
    x_ref, out_ref, x_s, q_s, k_s, v_s, o_s,
    *, nl, nh, hdp, eps, cd, tp,
):
    # Grid is (layer, batch) with batch INNERMOST: per-layer weight blocks
    # keep the same block index across consecutive b steps, so Mosaic's
    # pipeline fetches each layer's weights ONCE per layer instead of once
    # per (batch, layer) — the change that makes B>1 viable (the r3 form
    # refetched ~8 MB/layer per batch row). The residual stream for ALL
    # batch rows lives in x_s [bsz*tp, h]; everything below operates on
    # this step's row slice.
    l = pl.program_id(0)
    b = pl.program_id(1)

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(l == 0)
    def _():
        x_s[pl.ds(b * tp, tp), :] = dot(x_ref[b], wi[:]) + bi[:]

    h = x_s[pl.ds(b * tp, tp), :]  # (tp, h) fp32
    scale = 1.0 / float(hdp // 2) ** 0.5  # real head dim = hdp//2 (pad x2)

    xin = _rms(h, ln1[0], eps)
    qw = dot(xin, wq[0])                      # (tp, nh*hdp)
    kw = dot(xin, wk[0])
    vw = dot(xin, wv[0])
    cosv, sinv = cos[:], sin[:]               # (tp, nh*hdp) tiled
    qw = (qw * cosv + dot(qw, rotm[:]) * sinv) * scale
    kw = kw * cosv + dot(kw, rotm[:]) * sinv

    for j in range(nh):                       # VPU relayout, no dots
        sl = slice(j * hdp, (j + 1) * hdp)
        q_s[pl.ds(j * tp, tp), :] = qw[:, sl]
        k_s[pl.ds(j * tp, tp), :] = kw[:, sl]
        v_s[pl.ds(j * tp, tp), :] = vw[:, sl]

    nrows = nh * tp
    strip = min(nrows, max(256, _STRIP_BYTES // (nrows * 4) // 8 * 8))
    kv = k_s[:]
    vv = v_s[:]
    for s0 in range(0, nrows, strip):
        rk = min(strip, nrows - s0)
        s = dot_t(q_s[pl.ds(s0, rk), :], kv)  # (rk, nh*tp)
        r = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + s0
        c = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = (r // tp == c // tp) & (c % tp <= r % tp)  # same head, causal
        s = jnp.where(valid, s, -1e30)
        mx = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - mx)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_s[pl.ds(s0, rk), :] = dot(p, vv)    # (rk, hdp)

    acc = jnp.zeros_like(h)
    for j in range(nh):
        acc = acc + dot(o_s[pl.ds(j * tp, tp), :], wo[0, j])
    h = h + lsa[0] * acc

    x2 = _rms(h, ln2[0], eps)
    g = dot(x2, wg[0])
    u = dot(x2, wu[0])
    m = dot(jax.nn.silu(g) * u, wd[0])
    h = h + lsm[0] * m
    x_s[pl.ds(b * tp, tp), :] = h

    @pl.when(l == nl - 1)
    def _():
        hf = _rms(h, fnorm[:], eps)
        out_ref[b] = (dot(hf, wout[:]) + bout[:]).astype(out_ref.dtype)


def build_pretransformer_packed_params_device(
    pt: dict, cfg, weight_dtype=jnp.bfloat16
) -> dict:
    """Head-packed kernel weights: q/k/v as single wide matrices with each
    head's columns zero-padded from hd to hdp=2*hd (64-lane alignment), a
    block-diagonal rotate-half matrix over the wide layout, and per-head
    zero-row-padded o projections."""
    L = pt["layers"]
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    hdp = 2 * hd
    h = cfg.hidden_size
    for name in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj"):
        if "b" in L[name]:
            raise ValueError(f"pre-transformer kernel requires bias-free {name}")
    nl = L["q_proj"]["w"].shape[0]

    def wide(w):  # [nl, nh*hd, h] -> [nl, h, nh*hdp] (pad lanes zero)
        per = jnp.transpose(w.reshape(nl, nh, hd, h), (0, 3, 1, 2))  # nl,h,nh,hd
        per = jnp.pad(per, ((0, 0), (0, 0), (0, 0), (0, hdp - hd)))
        return per.reshape(nl, h, nh * hdp).astype(weight_dtype)

    def f32row(w):
        return w[:, None, :].astype(jnp.float32)

    # wide rotate-half: block-diagonal, per head the [hd, hd] signed
    # permutation in the top-left of its hdp block (pad rows/cols zero)
    half = hd // 2
    rot = np.zeros((hdp, hdp), np.float32)
    for j in range(half):
        rot[j + half, j] = -1.0
        rot[j, j + half] = 1.0
    rbig = np.zeros((nh * hdp, nh * hdp), np.float32)
    for j in range(nh):
        rbig[j * hdp: (j + 1) * hdp, j * hdp: (j + 1) * hdp] = rot

    wo = jnp.transpose(
        L["o_proj"]["w"].reshape(nl, h, nh, hd), (0, 2, 3, 1)
    )  # [nl, nh, hd, h]
    wo = jnp.pad(wo, ((0, 0), (0, 0), (0, hdp - hd), (0, 0)))

    return {
        "wi": pt["input_proj"]["w"].T.astype(weight_dtype),
        "bi": pt["input_proj"]["b"][None].astype(jnp.float32),
        "ln1": f32row(L["input_layernorm"]["w"]),
        "wq": wide(L["q_proj"]["w"]),
        "wk": wide(L["k_proj"]["w"]),
        "wv": wide(L["v_proj"]["w"]),
        "rotm": jnp.asarray(rbig).astype(weight_dtype),
        "wo": wo.astype(weight_dtype),
        "lsa": f32row(L["self_attn_layer_scale"]["w"]),
        "ln2": f32row(L["post_attention_layernorm"]["w"]),
        "wg": jnp.transpose(L["gate_proj"]["w"], (0, 2, 1)).astype(weight_dtype),
        "wu": jnp.transpose(L["up_proj"]["w"], (0, 2, 1)).astype(weight_dtype),
        "wd": jnp.transpose(L["down_proj"]["w"], (0, 2, 1)).astype(weight_dtype),
        "lsm": f32row(L["mlp_layer_scale"]["w"]),
        "fnorm": pt["norm"]["w"][None].astype(jnp.float32),
        "wout": pt["output_proj"]["w"].T.astype(weight_dtype),
        "bout": pt["output_proj"]["b"][None].astype(jnp.float32),
    }


@functools.partial(
    jax.jit, static_argnames=("nl", "nh", "hd", "eps", "rope_theta",
                              "compute_dtype", "interpret")
)
def pre_transformer_packed(
    kp: dict,
    x: jax.Array,
    *,
    nl: int,
    nh: int,
    hd: int,
    eps: float,
    rope_theta: float,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Head-packed fused pre-transformer: x [B, T, latent] -> [B, T, latent]."""
    bsz, t, latent = x.shape
    h = kp["wi"].shape[1]
    hdp = 2 * hd
    tp = -(-t // 8) * 8
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    inv = jnp.asarray(rope_ops.inv_freq(hd, rope_theta))
    cos, sin = rope_ops.rope_cos_sin(jnp.arange(tp), inv)  # [tp, hd]
    # tiled wide cos/sin: each head's hdp block = [cos(hd); zeros(hd pad)]
    cosw = jnp.tile(jnp.pad(cos, ((0, 0), (0, hdp - hd))), (1, nh))
    sinw = jnp.tile(jnp.pad(sin, ((0, 0), (0, hdp - hd))), (1, nh))
    kp = dict(kp, cos=cosw, sin=sinw)

    def spec(name):
        shp = kp[name].shape
        if name in _PER_LAYER:
            return pl.BlockSpec(
                (1,) + shp[1:],
                lambda l, b, _n=len(shp): (l,) + (0,) * (_n - 1),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            shp, lambda l, b, _n=len(shp): (0,) * _n, memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _kernel_packed, nl=nl, nh=nh, hdp=hdp, eps=eps, cd=compute_dtype, tp=tp
    )
    # batch INNERMOST so consecutive steps share each layer's weight block
    # (see _kernel_packed); the residual scratch holds every batch row.
    # x/out are whole-array blocks with a CONSTANT index (fetched/flushed
    # once — a per-b out block would be revisited non-consecutively, which
    # the Pallas pipeline forbids); the kernel indexes their leading dim.
    out = pl.pallas_call(
        kernel,
        grid=(nl, bsz),
        in_specs=[
            *(spec(name) for name in _PARAMS),
            pl.BlockSpec(
                (bsz, tp, latent), lambda l, b: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bsz, tp, latent), lambda l, b: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, tp, latent), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bsz * tp, h), jnp.float32),
            pltpu.VMEM((nh * tp, hdp), jnp.float32),
            pltpu.VMEM((nh * tp, hdp), jnp.float32),
            pltpu.VMEM((nh * tp, hdp), jnp.float32),
            pltpu.VMEM((nh * tp, hdp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 2**20),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*(kp[name] for name in _PARAMS), xp)
    return out[:, :t]


@functools.partial(
    jax.jit, static_argnames=("nl", "nh", "hd", "eps", "rope_theta",
                              "compute_dtype", "interpret")
)
def pre_transformer_fused(
    kp: dict,
    x: jax.Array,
    *,
    nl: int,
    nh: int,
    hd: int,
    eps: float,
    rope_theta: float,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused pre-transformer: x [B, T, latent] -> [B, T, latent]."""
    bsz, t, latent = x.shape
    h = kp["wi"].shape[1]
    tp = -(-t // 8) * 8
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    inv = jnp.asarray(rope_ops.inv_freq(hd, rope_theta))
    cos, sin = rope_ops.rope_cos_sin(jnp.arange(tp), inv)  # [tp, hd]
    kp = dict(kp, cos=cos, sin=sin)

    def spec(name):
        shp = kp[name].shape
        if name in _PER_LAYER:
            return pl.BlockSpec(
                (1,) + shp[1:],
                lambda b, l, _n=len(shp): (l,) + (0,) * (_n - 1),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            shp, lambda b, l, _n=len(shp): (0,) * _n, memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _kernel, nl=nl, nh=nh, hd=hd, eps=eps, cd=compute_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nl),
        in_specs=[
            *(spec(name) for name in _PARAMS),
            pl.BlockSpec(
                (1, tp, latent), lambda b, l: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tp, latent), lambda b, l: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, tp, latent), x.dtype),
        scratch_shapes=[pltpu.VMEM((tp, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 2**20),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*(kp[name] for name in _PARAMS), xp)
    return out[:, :t]
