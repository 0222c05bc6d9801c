"""Fused SEANet decoder-block path for the vocoder.

Each decoder block (reference DecoderBlock, SpeechTokenizer.swift:753-784)
is SnakeBeta -> causal transposed-conv upsample (stride r) -> three dilated
residual units (d = 1, 3, 9). The SEANet tail dominates vocoder device time
(scripts/exp_vocoder_profile.py): channel counts shrink to 96 while T grows
to ~50k rows per 18-frame chunk, so in XLA each of the ~14 small ops per
block pays a full HBM round-trip on a tensor that comfortably fits in VMEM.

TPU-first split of the block:

  * SnakeBeta + upsample run as TWO MXU matmuls in plain XLA: the causal
    transposed conv (k=2r, stride r, right-trim r) decomposes by output
    phase into out[t*r + p] = x[t] @ W_lo[p] + x[t-1] @ W_hi[p] with
    W_lo/W_hi prebuilt [Cin, r*Cout]. The phase interleave
    [B, T, r*Cout] -> [B, T*r, Cout] is a FREE contiguous reshape in HBM.
    (Doing that reshape inside a Pallas kernel is an unsupported Mosaic
    vector shape cast - it changes the lane dim - which is why the
    interleave lives host-side and only the units are a kernel.)
  * The three residual units run as ONE pallas_call: 4 SnakeBetas, three
    7-tap dilated causal convs (each = 7 tap matmuls [W, C] @ [C, C]
    accumulated in fp32 over a left-zero-padded window; snake(0) = 0 so
    zero padding is exact), three 1x1 convs, residual adds - activation
    stays VMEM-resident, HBM is touched once in / once out.

Time is tiled: grid = (B, n_tiles); each program DMAs its input window
(tile + H halo rows, H = 80 >= 78 = 6*(1+3+9), the receptive field of the
unit chain) from HBM, computes the chain, and writes only the non-halo
rows. The host pre-pads H zero rows at the front (causal-pad semantics);
rows that lie before the sequence start are re-zeroed after every unit so
their biases cannot leak into kept rows through later taps.

SnakeBeta runs in fp32 with exp(alpha) / 1/(exp(beta)+eps) precomputed on
the host; matmuls run in a configurable compute dtype (bf16 on TPU).

Parity: matches the jnp path (ops/conv.py snake_beta /
causal_transpose_conv1d / models/vocoder.py _residual_unit composition) to
fp32 tolerance when compute_dtype=float32; tests/test_vocoder_kernel.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DILATIONS = (1, 3, 9)
# receptive field of the unit chain, rounded up to the fp32 sublane tile
# (8): the DMA window size tile+halo must be 8-row aligned for Mosaic
_HALO = -(-sum(6 * d for d in DILATIONS) // 8) * 8  # 78 -> 80
# with the fused out_snake/out_conv tail the k=7 output conv reads 6 rows
# before each kept row, so those rows need the FULL unit-chain receptive
# field too: halo >= 78 + 6 -> 88 (8-aligned)
_HALO_TAIL = -(-(sum(6 * d for d in DILATIONS) + 6) // 8) * 8  # 84 -> 88


def _np32(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), np.float32)


def _build_block_kernel_params(block, rate, weight_dtype, xp, to32, tail=None) -> dict:
    """Transform one decoder block's param subtree (see models/vocoder.py
    init: {"snake", "up", "units"}) into the fused-path layout. Generic over
    the array backend: xp = numpy (host-side, used at checkpoint load) or
    jax.numpy (device-side, avoids pulling weights over the throttled host
    link); to32 converts a leaf to an fp32 xp array. The large matmul
    weights are stored in `weight_dtype` (bf16 for the TPU serving path;
    fp32 for exact-parity tests); snake params and biases stay fp32."""
    w_up = to32(block["up"]["w"])  # [2r, Cin, Cout], pre-flipped HIO
    k, cin, cout = w_up.shape
    assert k == 2 * rate, (k, rate)
    # Mosaic requires the lane (channel) dim of the units kernel's HBM DMA
    # window to be 128-aligned; blocks 2/3 have Cout = 192/96. Zero-pad the
    # post-upsample channel dim to the next 128 multiple — exact, because
    # snake(0) = 0 and zero weight rows/columns contribute nothing — folded
    # into the upsample matmul columns so no XLA pad op touches the big
    # activation; the caller slices [..., :Cout] back after the kernel.
    cpad = -(-cout // 128) * 128

    def padc(w, axes):
        pads = [(0, 0)] * w.ndim
        for ax in axes:
            pads[ax] = (0, cpad - w.shape[ax])
        return xp.pad(w, pads)

    # out[t*r + p] = x[t] @ w_up[2r-1-p] + x[t-1] @ w_up[r-1-p]
    w_lo = xp.concatenate(
        [padc(w_up[2 * rate - 1 - p], (1,)) for p in range(rate)], axis=1
    )
    w_hi = xp.concatenate(
        [padc(w_up[rate - 1 - p], (1,)) for p in range(rate)], axis=1
    )
    w_lo = w_lo.astype(weight_dtype)  # [Cin, r*Cpad]
    w_hi = w_hi.astype(weight_dtype)

    def snake(p, pad=False):
        a = xp.exp(to32(p["alpha"]))
        binv = 1.0 / (xp.exp(to32(p["beta"])) + 1e-9)
        if pad:
            a, binv = padc(a, (0,)), padc(binv, (0,))
        return a[None, :], binv[None, :]

    a0, b0 = snake(block["snake"])
    units = block["units"]
    u_a1 = xp.stack([snake(u["act1"], True)[0] for u in units])
    u_binv1 = xp.stack([snake(u["act1"], True)[1] for u in units])
    u_a2 = xp.stack([snake(u["act2"], True)[0] for u in units])
    u_binv2 = xp.stack([snake(u["act2"], True)[1] for u in units])
    u_w1 = xp.stack(
        [padc(to32(u["conv1"]["w"]), (1, 2)) for u in units]
    ).astype(weight_dtype)  # [3, 7, Cpad, Cpad]
    u_b1 = xp.stack([padc(to32(u["conv1"]["b"]), (0,))[None] for u in units])
    u_w2 = xp.stack(
        [padc(to32(u["conv2"]["w"])[0], (0, 1)) for u in units]
    ).astype(weight_dtype)  # [3, Cpad, Cpad]
    u_b2 = xp.stack([padc(to32(u["conv2"]["b"]), (0,))[None] for u in units])
    kp = {
        "snake_a": a0, "snake_binv": b0,
        "w_lo": w_lo, "w_hi": w_hi,
        "up_b": padc(to32(block["up"]["b"]), (0,))[None],
        "u_a1": u_a1, "u_binv1": u_binv1, "u_w1": u_w1, "u_b1": u_b1,
        "u_a2": u_a2, "u_binv2": u_binv2, "u_w2": u_w2, "u_b2": u_b2,
    }
    if tail is not None:
        # fold out_snake + out_conv (k=7, Cout=1) + clip into the last
        # block's kernel (reference DecoderOutputSnake / DecoderOutputConv,
        # SpeechTokenizer.swift:805-840). The out conv's left-pad-6 semantics
        # fall out of the kernel's zeroed pre-sequence rows; padded channels
        # carry zero weights so the fold is exact.
        t_a, t_binv = snake(tail["snake"], pad=True)
        kp["t_a"] = t_a
        kp["t_binv"] = t_binv
        # [7, Cin, 1] -> [7, Cpad, 1] matvec taps
        kp["t_w"] = padc(to32(tail["conv"]["w"]), (1,)).astype(weight_dtype)
        kp["t_b"] = to32(tail["conv"]["b"]).reshape(1, 1)
    return kp


def build_seanet_block_kernel_params(
    block: dict, rate: int, weight_dtype=np.float32, tail: dict | None = None
) -> dict:
    """Host-side (numpy) kernel params for one block; see
    _build_block_kernel_params. `tail` = {"snake", "conv"} folds the
    vocoder's out_snake/out_conv into this block's kernel."""
    return _build_block_kernel_params(block, rate, weight_dtype, np, _np32, tail)


def build_seanet_block_kernel_params_device(
    block: dict, rate: int, weight_dtype=jnp.bfloat16, tail: dict | None = None
) -> dict:
    """Device-side (jnp, jittable) kernel params for one block; see
    _build_block_kernel_params."""
    return _build_block_kernel_params(
        block, rate, weight_dtype, jnp, lambda x: jnp.asarray(x, jnp.float32), tail
    )


def _snake(x, a, binv):
    s = jnp.sin(x * a)
    return x + binv * (s * s)


_INV_2PI = np.float32(1.0 / (2.0 * np.pi))
_2PI = np.float32(2.0 * np.pi)
# even minimax polynomial for cos(r), r in [-pi, pi] (~1e-5 max err)
_COS_C = tuple(
    np.float32(c)
    for c in (-2.605e-07, 2.47609e-05, -1.3888397e-03, 4.16666418e-02,
              -4.999999963e-01, 1.0)
)


def _snake_fast(x, a, binv):
    """SnakeBeta via sin^2(z) = (1 - cos(2z))/2 with cos as a range-reduced
    even polynomial. Mosaic's sin lowering dominated the fused units kernel
    (block-3 shapes: 6.67 ms with jnp.sin, 2.86 with the snakes removed,
    2.75 with this polynomial — sin was 57% of the kernel, r4
    scripts/exp_units_variants.py); the polynomial makes the activation
    essentially free. Accuracy: ~3e-4 abs per application, ~0.6% of signal
    scale through a full 3-unit chain — below the bf16 tier the production
    path already runs at (matmuls are bf16; on-chip kernel-vs-jnp rel RMS
    gate is 5%). The exact `_snake` stays the fp32 parity path."""
    z = x * (2.0 * a)
    # explicit round, NOT the (q + 1.5*2^23) - 1.5*2^23 magic-number trick:
    # the Pallas interpreter evaluates kernel math above f32 precision, so
    # the magic add never sheds the fraction and the whole activation
    # silently degenerated to identity in interpret mode (caught by
    # test_fused_block_bf16_polynomial_snake_close)
    q = jax.lax.round(z * _INV_2PI, jax.lax.RoundingMethod.TO_NEAREST_EVEN)
    r = z - q * _2PI
    r2 = r * r
    c = jnp.full_like(r2, _COS_C[0])
    for coef in _COS_C[1:]:
        c = c * r2 + coef
    b2 = 0.5 * binv
    return x + b2 - b2 * c


def _units_kernel(*refs, tile: int, cd, names):
    p = dict(zip(names, refs[: len(names)]))
    x_hbm, out_ref, xwin, sem = refs[len(names):]
    u_a1, u_binv1, u_w1, u_b1 = p["u_a1"], p["u_binv1"], p["u_w1"], p["u_b1"]
    u_a2, u_binv2, u_w2, u_b2 = p["u_a2"], p["u_binv2"], p["u_w2"], p["u_b2"]
    tail = "t_w" in p
    halo = _HALO_TAIL if tail else _HALO

    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    total = pl.num_programs(0) * nt
    w = tile + halo  # input window rows

    # Double-buffered window stream: window l+1's DMA is kicked BEFORE
    # waiting on window l, so the HBM fetch of the next tile overlaps this
    # tile's compute (grid steps run sequentially on TPU, so slot 1-slot's
    # previous consumer — program l-1's compute — has already retired).
    # The original start();wait() serialized ~every tile's DMA with the
    # unit-chain compute.
    l = b * nt + i
    slot = jax.lax.rem(l, 2)

    def window_copy(ll, s):
        bb = ll // nt
        ii = jax.lax.rem(ll, nt)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * tile, w), :], xwin.at[s], sem.at[s]
        )

    @pl.when(l == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(l + 1 < total)
    def _():
        window_copy(l + 1, 1 - slot).start()

    window_copy(l, slot).wait()

    # exact sin at fp32 compute (the parity-test mode); the polynomial
    # snake on the production bf16 path (see _snake_fast)
    snake = _snake if cd == jnp.float32 else _snake_fast
    y = xwin[slot].astype(jnp.float32)
    c = u_w2.shape[-1]
    # Window rows whose sequence position i*tile + row - halo is negative
    # lie BEFORE the sequence start: the host pads them with zeros, and they
    # must STAY zero after every unit (in the reference, taps reaching
    # before t=0 see the causal zero padding, not unit outputs whose biases
    # make fabricated rows nonzero). For tile > halo only tile 0 has such
    # rows, but small forced tiles can leave them in later windows too.
    row = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    valid = row >= jnp.maximum(halo - i * tile, 0)
    y = jnp.where(valid, y, 0.0)

    for u, dil in enumerate(DILATIONS):
        h = snake(y, u_a1[u], u_binv1[u]).astype(cd)
        hp = jnp.concatenate([jnp.zeros((6 * dil, c), cd), h], axis=0)
        conv = jnp.zeros((w, c), jnp.float32) + u_b1[u]
        for k in range(7):
            conv = conv + jax.lax.dot_general(
                hp[k * dil : k * dil + w],
                u_w1[u, k].astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        h2 = snake(conv, u_a2[u], u_binv2[u]).astype(cd)
        y = y + (
            jax.lax.dot_general(
                h2, u_w2[u].astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + u_b2[u]
        )
        y = jnp.where(valid, y, 0.0)

    if tail:
        # fused out_snake -> out_conv (k=7, Cout=1, left-pad 6) -> clip.
        # Kept rows start at `halo`; the conv's 6-row lookback lands on
        # rows >= halo - 6 = 82, which have the full unit-chain receptive
        # field (78) — that is what _HALO_TAIL buys. Pre-sequence rows are
        # zero (see `valid`), matching the reference's left zero padding.
        ys = snake(y[halo - 6 :], p["t_a"][:], p["t_binv"][:]).astype(cd)
        wav = jnp.zeros((tile, 1), jnp.float32) + p["t_b"][:]
        for k in range(7):
            wav = wav + jax.lax.dot_general(
                ys[k : k + tile], p["t_w"][k].astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        wav = jnp.clip(wav, -1.0, 1.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_ref[0] = jnp.where(lane == 0, wav, 0.0).astype(out_ref.dtype)
    else:
        out_ref[0] = y[halo:].astype(out_ref.dtype)


_UNIT_PARAMS = (
    "u_a1", "u_binv1", "u_w1", "u_b1", "u_a2", "u_binv2", "u_w2", "u_b2",
)
_TAIL_PARAMS = ("t_a", "t_binv", "t_w", "t_b")


def _pick_tile(c: int, weight_bytes: int) -> int:
    """Output-tile rows, shrunk so unit weights + ~10 live fp32 activation
    buffers + the input window stay inside an 80 MB working budget (leaves
    ~48 MB of the 128 MB v5e VMEM for Mosaic spill slots and the
    double-buffered output blocks)."""
    budget = 80 * 2**20 - weight_bytes
    per_row = 11 * c * 4  # +1 buffer: the double-buffered input window
    t = max(256, min(8192, budget // per_row))
    return t // 8 * 8


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "tile", "interpret")
)
def residual_units_fused(
    kp: dict,
    y: jax.Array,
    *,
    compute_dtype=jnp.bfloat16,
    tile: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused 3-unit chain: y [B, S, C] -> [B, S, C], one pallas_call.

    When kp carries the tail params (t_a/t_binv/t_w/t_b) the kernel also
    applies out_snake + out_conv + clip and returns the waveform in lane 0
    of a [B, S, 128] fp32 output (Mosaic output blocks need 128-aligned
    lanes; the caller slices lane 0)."""
    bsz, s, c = y.shape
    tail = "t_w" in kp
    names = _UNIT_PARAMS + _TAIL_PARAMS if tail else _UNIT_PARAMS
    halo = _HALO_TAIL if tail else _HALO
    weight_bytes = sum(
        int(np.prod(kp[n].shape)) * jnp.dtype(kp[n].dtype).itemsize
        for n in _UNIT_PARAMS
    )
    tt = tile or _pick_tile(c, weight_bytes)
    n_tiles = -(-s // tt)
    # front halo (causal zeros) + right pad to a tile multiple
    yp = jnp.pad(y, ((0, 0), (halo, n_tiles * tt - s), (0, 0)))

    out_c = 128 if tail else c
    out_dtype = jnp.float32 if tail else y.dtype
    kernel = functools.partial(_units_kernel, tile=tt, cd=compute_dtype, names=names)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            *(
                pl.BlockSpec(
                    kp[name].shape,
                    # bind ndim now: a late-binding closure over `name` would
                    # give every spec the LAST param's rank
                    lambda b, i, _n=np.ndim(kp[name]): (0,) * _n,
                    memory_space=pltpu.VMEM,
                )
                for name in names
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tt, out_c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles * tt, out_c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + halo, c), y.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 2**20),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*(kp[name] for name in names), yp)
    return out[:, :s]


def seanet_block_fused(
    kp: dict,
    x: jax.Array,
    *,
    rate: int,
    cout: int,
    compute_dtype=jnp.bfloat16,
    tile: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused decoder block: x [B, T, Cin] -> [B, T * rate, Cout].

    `cout` is the TRUE output channel count (the kernel computes in a
    128-aligned padded channel space; see build_seanet_block_kernel_params).

    Numerically equivalent (fp32-tolerance at compute_dtype=float32) to:
      snake_beta -> causal_transpose_conv1d(stride=rate) ->
      _residual_unit(d=1) -> _residual_unit(d=3) -> _residual_unit(d=9)
    """
    bsz, t, _cin = x.shape
    cpad = kp["u_w2"].shape[-1]
    cd = compute_dtype
    # SnakeBeta + phase-decomposed upsample: two MXU matmuls in plain XLA,
    # then the FREE interleave reshape [B, T, r*Cout] -> [B, T*r, Cout].
    xs = _snake(x.astype(jnp.float32), kp["snake_a"], kp["snake_binv"])
    xs = xs.astype(cd)
    prev = jnp.concatenate([jnp.zeros_like(xs[:, :1]), xs[:, :-1]], axis=1)
    dn = (((2,), (0,)), ((), ()))
    acc = jax.lax.dot_general(
        xs, kp["w_lo"].astype(cd), dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        prev, kp["w_hi"].astype(cd), dn, preferred_element_type=jnp.float32
    )
    y = acc.reshape(bsz, t * rate, cpad) + kp["up_b"][0]
    y = y.astype(x.dtype)
    y = residual_units_fused(
        kp, y, compute_dtype=compute_dtype, tile=tile, interpret=interpret
    )
    if "t_w" in kp:
        # tail-fused: out_snake + out_conv + clip ran in-kernel; the
        # waveform sits in lane 0 -> [B, T * rate] fp32
        return y[..., 0]
    return y[..., :cout]


def _pretransformer_subtree(params: dict, cfg):
    # head-PACKED layout (scores/AV as two large stacked matmuls): wins at
    # every T on v5e, unlike the per-head variant's T<=64 gate (ROADMAP r3)
    from .pretransformer_kernel import build_pretransformer_packed_params_device

    try:
        return build_pretransformer_packed_params_device(
            params["pre_transformer"], cfg, weight_dtype=jnp.bfloat16
        )
    except ValueError:
        # layout the kernel doesn't cover (e.g. attention biases) — the jnp
        # pre_transformer path handles it; only the blocks run fused
        return None


def _upsample_subtree(params: dict, build, weight_dtype):
    # fused ConvNeXt-upsample stages (ops/pallas/upsample_kernel.py), with
    # the SEANet initial_conv folded into the LAST stage's kernel; a layout
    # the kernel doesn't cover (k != stride, channel change) falls back to
    # the jnp upsample loop
    stages = params["upsample"]
    last = len(stages) - 1
    try:
        return [
            build(
                stage, weight_dtype,
                initial_conv=(
                    params["decoder"]["initial_conv"] if i == last else None
                ),
            )
            for i, stage in enumerate(stages)
        ]
    except ValueError:
        return None


def build_vocoder_kernel_params(
    params: dict, cfg, weight_dtype=ml_dtypes.bfloat16
) -> dict:
    """Kernel param subtree (SEANet blocks + ConvNeXt-upsample stages +
    pre-transformer mega-kernel); store under params["kernel"] to enable the
    fused paths in models/vocoder.py. Block params build host-side (numpy);
    the pre-transformer subtree builds via jnp (transposes run on device
    after upload, which device_put of the full tree then passes through).
    The LAST block's kernel absorbs out_snake/out_conv/clip (tail fusion)."""
    from .upsample_kernel import build_upsample_stage_params

    blocks = params["decoder"]["blocks"]
    last = len(blocks) - 1
    return {
        "blocks": [
            build_seanet_block_kernel_params(
                block, rate, weight_dtype,
                tail={
                    "snake": params["decoder"]["out_snake"],
                    "conv": params["decoder"]["out_conv"],
                } if i == last else None,
            )
            for i, (block, rate) in enumerate(zip(blocks, cfg.upsample_rates))
        ],
        "upsample": _upsample_subtree(
            params, build_upsample_stage_params, weight_dtype
        ),
        "pre_transformer": _pretransformer_subtree(params, cfg),
    }


def build_vocoder_kernel_params_device(
    params: dict, cfg, weight_dtype=jnp.bfloat16
) -> dict:
    """Device-side (jittable) variant of build_vocoder_kernel_params, for
    params that already live on device (e.g. bench/test random init) —
    avoids pulling ~150 MB of vocoder weights over the throttled host."""
    from .upsample_kernel import build_upsample_stage_params_device

    blocks = params["decoder"]["blocks"]
    last = len(blocks) - 1
    return {
        "blocks": [
            build_seanet_block_kernel_params_device(
                block, rate, weight_dtype,
                tail={
                    "snake": params["decoder"]["out_snake"],
                    "conv": params["decoder"]["out_conv"],
                } if i == last else None,
            )
            for i, (block, rate) in enumerate(zip(blocks, cfg.upsample_rates))
        ],
        "upsample": _upsample_subtree(
            params, build_upsample_stage_params_device, weight_dtype
        ),
        "pre_transformer": _pretransformer_subtree(params, cfg),
    }
