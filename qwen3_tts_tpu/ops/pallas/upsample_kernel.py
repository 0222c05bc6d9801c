"""Fused ConvNeXt-upsample stage for the vocoder.

Each of the vocoder's two upsample stages (reference SpeechTokenizer.swift:
879-884: CausalTransposeConv1d(k=2, stride=2) followed by a ConvNeXt block)
is ~12 small XLA ops over a [B, T, 1024] activation — at decode-chunk
lengths (T = 26..212 rows) every one of them is sublane-starved and the
stage chain pays repeated HBM round-trips on tensors that fit VMEM many
times over. This kernel runs ONE pallas_call per stage with the activation
VMEM-resident end to end.

TPU-first structure (the same phase trick as vocoder_kernels.py, pushed one
level deeper): a K == stride transposed conv never mixes time steps, so the
stage computes in PHASE SPACE instead of materializing the upsampled
sequence —

  * upsample: one MXU matmul [T, C] @ [C, 2C]; lane-half p holds output
    phase p (out[2t+p] = x[t] @ w[s-1-p], ops/conv.py:144-168 semantics).
  * ConvNeXt depthwise k=7 causal conv on the INTERLEAVED sequence
    decomposes into per-phase tap sums over sublane-shifted phase planes:
        h[2t]   = sum_i dw[i] * z[2t - i]   ->  taps alternate y0/y1 shifted
        h[2t+1] = sum_i dw[i] * z[2t+1 - i]
    (dw[i] = w[6-i], the causal left-pad-6 orientation) — pure VPU
    multiplies + supported sublane concats, no interleave ever exists.
  * LayerNorm(eps 1e-6), pw 4x expand, exact GELU (erf), pw project, gamma
    scale, residual — all in fp32 vector math with the two big matmuls
    ([T, C] @ [C, 4C], [T, 4C] @ [4C, C]) per phase in `compute_dtype`.
  * output block [T, 2C]: row t = [phase0(t) | phase1(t)]; the caller's
    [B, T, 2, C] -> [B, 2T, C] interleave is a FREE contiguous reshape in
    HBM (an in-kernel reshape that changes the lane dim is an unsupported
    Mosaic shape cast).

Weights stay VMEM-resident (~21 MB bf16 per stage incl. the upsample
matmul); the grid is (B,) so batch rows stream through the same resident
weights.

Parity: matches causal_transpose_conv1d + convnext_block (ops/conv.py) to
fp32 tolerance when weight/compute dtypes are float32;
tests/test_upsample_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _np32(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), np.float32)


def _build_stage_params(stage, xp, to32, weight_dtype, initial_conv=None) -> dict:
    """Kernel param layout for one upsample stage (models/vocoder.py init:
    {"tconv": k=2/stride=2 pre-flipped HIO, "convnext": ConvNeXt block}).
    Generic over xp = numpy (host, checkpoint load) / jax.numpy (device,
    jittable — random-init benches skip the throttled host link).

    `initial_conv` (the SEANet decoder's left-pad k=7 entry conv,
    SpeechTokenizer.swift:786-803) folds into the LAST stage's kernel: its
    taps decompose over the stage's output phases exactly like the
    depthwise conv, just with matmul taps — the [B, 2T, 1024] ConvNeXt
    output then never round-trips HBM before the width change to 1536."""
    w = to32(stage["tconv"]["w"])  # [2, Cin, Cout], pre-flipped HIO
    k, cin, cout = w.shape
    if k != 2 or cin != cout:
        raise ValueError(f"upsample kernel expects k==stride==2, C==C (got {w.shape})")
    cn = stage["convnext"]
    dw = to32(cn["dwconv"]["w"])[:, 0, :]  # [7, C]
    if dw.shape[0] != 7:
        raise ValueError(f"upsample kernel expects dwconv k=7 (got {dw.shape})")
    ic = {}
    if initial_conv is not None:
        w_ic = to32(initial_conv["w"])  # [7, C, Cic]
        if w_ic.shape[0] != 7 or w_ic.shape[1] != cin:
            raise ValueError(f"initial_conv fold expects k=7 from C (got {w_ic.shape})")
        ic = {
            "ic_w": w_ic[::-1].astype(weight_dtype),  # reversed taps
            "ic_b": to32(initial_conv["b"])[None],
        }
    return {
        **ic,
        # phase p columns = w[stride-1-p] (ops/conv.py:157 ordering); the
        # bias tiles across both phase lane-halves
        "up_w": xp.concatenate([w[1], w[0]], axis=1).astype(weight_dtype),
        "up_b": xp.concatenate([to32(stage["tconv"]["b"])] * 2)[None],
        # reversed taps: h[u] = b + sum_i dw_r[i] * z[u-i]
        "dw": dw[::-1],
        "dw_b": to32(cn["dwconv"]["b"])[None],
        "ln_w": to32(cn["norm"]["w"])[None],
        "ln_b": to32(cn["norm"]["b"])[None],
        # linear() computes x @ W.T — pre-transpose to [in, out]
        "pw1_w": to32(cn["pwconv1"]["w"]).T.astype(weight_dtype),
        "pw1_b": to32(cn["pwconv1"]["b"])[None],
        "pw2_w": to32(cn["pwconv2"]["w"]).T.astype(weight_dtype),
        "pw2_b": to32(cn["pwconv2"]["b"])[None],
        "gamma": to32(cn["gamma"])[None],
    }


def build_upsample_stage_params(
    stage: dict, weight_dtype=np.float32, initial_conv: dict | None = None
) -> dict:
    """Host-side (numpy) kernel params for one stage."""
    return _build_stage_params(stage, np, _np32, weight_dtype, initial_conv)


def build_upsample_stage_params_device(
    stage: dict, weight_dtype=jnp.bfloat16, initial_conv: dict | None = None
) -> dict:
    """Device-side (jnp, jittable) kernel params for one stage."""
    return _build_stage_params(
        stage, jnp, lambda x: jnp.asarray(x, jnp.float32), weight_dtype,
        initial_conv,
    )


_PARAMS = (
    "up_w", "up_b", "dw", "dw_b", "ln_w", "ln_b",
    "pw1_w", "pw1_b", "pw2_w", "pw2_b", "gamma",
)
_IC_PARAMS = ("ic_w", "ic_b")


def _erf_f32(x):
    """f32 erf as the Eigen/XLA rational polynomial (odd p / even q over
    x clamped to [-4, 4]) — Mosaic's TPU lowering has no `erf` primitive
    (jax.lax.erf raises NotImplementedError in-kernel), but this is the
    exact formula XLA's own f32 erf expands to, so in-kernel GELU matches
    the plain-path jnp.erf to ~1 ulp. Only uses mul/add/div."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = np.float32(-2.72614225801306e-10)
    for c in (
        2.77068142495902e-08, -2.10102402082508e-06, -5.69250639462346e-05,
        -7.34990630326855e-04, -2.95459980854025e-03, -1.60960333262415e-02,
    ):
        p = p * x2 + np.float32(c)
    p = p * x
    q = np.float32(-1.45660718464996e-05)
    for c in (
        -2.13374055278905e-04, -1.68282697438203e-03, -7.37332916720468e-03,
        -1.42647390514189e-02,
    ):
        q = q * x2 + np.float32(c)
    return p / q


def _stage_kernel(*refs, cd, names):
    p = dict(zip(names, refs[: len(names)]))
    x_ref, out_ref = refs[len(names):]
    x = x_ref[0]  # [T, C]
    t, c = x.shape

    # upsample: both phases in one MXU dot; lane half p = out[2t + p]
    y = jax.lax.dot_general(
        x.astype(cd), p["up_w"][:].astype(cd), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + p["up_b"][:]  # [T, 2C] f32
    y0 = y[:, :c]
    y1 = y[:, c:]

    def sh(a, k):  # rows shifted down k (causal zeros enter at the top)
        if k == 0:
            return a
        if k >= t:  # very short chunks (T<=3): every row shifts out
            return jnp.zeros((t, c), jnp.float32)
        return jnp.concatenate([jnp.zeros((k, c), jnp.float32), a[:-k]], axis=0)

    dw = [p["dw"][i : i + 1] for i in range(7)]
    b_dw = p["dw_b"][:]
    # per-phase taps of the interleaved causal depthwise k=7 conv (see module
    # docstring): z[2t] = y0[t], z[2t+1] = y1[t]
    h0 = (
        b_dw + dw[0] * y0 + dw[1] * sh(y1, 1) + dw[2] * sh(y0, 1)
        + dw[3] * sh(y1, 2) + dw[4] * sh(y0, 2)
        + dw[5] * sh(y1, 3) + dw[6] * sh(y0, 3)
    )
    h1 = (
        b_dw + dw[0] * y1 + dw[1] * y0 + dw[2] * sh(y1, 1)
        + dw[3] * sh(y0, 1) + dw[4] * sh(y1, 2)
        + dw[5] * sh(y0, 2) + dw[6] * sh(y1, 3)
    )

    def convnext_tail(h, res):
        mu = jnp.mean(h, axis=1, keepdims=True)
        d = h - mu
        var = jnp.mean(d * d, axis=1, keepdims=True)
        g = d * jax.lax.rsqrt(var + 1e-6) * p["ln_w"][:] + p["ln_b"][:]
        a = jax.lax.dot_general(
            g.astype(cd), p["pw1_w"][:].astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + p["pw1_b"][:]
        a = 0.5 * a * (1.0 + _erf_f32(a * np.float32(2**-0.5)))  # exact GELU
        o = jax.lax.dot_general(
            a.astype(cd), p["pw2_w"][:].astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + p["pw2_b"][:]
        return res + p["gamma"][:] * o

    o0 = convnext_tail(h0, y0)
    o1 = convnext_tail(h1, y1)

    if "ic_w" in p:
        # folded initial_conv (left-pad k=7, C -> Cic): matmul taps over the
        # stage's output phases, same decomposition as the depthwise conv
        W = [p["ic_w"][i] for i in range(7)]

        def tap(a, wi):
            return jax.lax.dot_general(
                a.astype(cd), wi.astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        b_ic = p["ic_b"][:]
        ic0 = (
            b_ic + tap(o0, W[0]) + tap(sh(o1, 1), W[1]) + tap(sh(o0, 1), W[2])
            + tap(sh(o1, 2), W[3]) + tap(sh(o0, 2), W[4])
            + tap(sh(o1, 3), W[5]) + tap(sh(o0, 3), W[6])
        )
        ic1 = (
            b_ic + tap(o1, W[0]) + tap(o0, W[1]) + tap(sh(o1, 1), W[2])
            + tap(sh(o0, 1), W[3]) + tap(sh(o1, 2), W[4])
            + tap(sh(o0, 2), W[5]) + tap(sh(o1, 3), W[6])
        )
        out_ref[0] = jnp.concatenate([ic0, ic1], axis=1).astype(out_ref.dtype)
    else:
        out_ref[0] = jnp.concatenate([o0, o1], axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def upsample_stage_fused(
    kp: dict,
    x: jax.Array,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused upsample stage: x [B, T, C] -> [B, 2T, C], one pallas_call.

    Numerically equivalent (fp32 tolerance at float32 weight/compute dtypes)
    to causal_transpose_conv1d(stride=2) + convnext_block (ops/conv.py).
    With the folded initial_conv (kp carries ic_w/ic_b, the last stage) the
    output is [B, 2T, Cic] — left_pad_conv1d applied on top."""
    bsz, t, c = x.shape
    names = _PARAMS + _IC_PARAMS if "ic_w" in kp else _PARAMS
    out_c = kp["ic_w"].shape[-1] if "ic_w" in kp else c
    kernel = functools.partial(_stage_kernel, cd=compute_dtype, names=names)
    out = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            *(
                pl.BlockSpec(
                    kp[name].shape,
                    lambda b, _n=np.ndim(kp[name]): (0,) * _n,
                    memory_space=pltpu.VMEM,
                )
                for name in names
            ),
            pl.BlockSpec((1, t, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, 2 * out_c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, t, 2 * out_c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 2**20),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*(kp[name] for name in names), x)
    # phase interleave [B, T, 2, C'] -> [B, 2T, C']: free contiguous reshape
    return out.reshape(bsz, 2 * t, out_c)
