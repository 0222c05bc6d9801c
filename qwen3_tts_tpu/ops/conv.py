"""1-D convolution primitives for the vocoder / audio encoders, channels-last.

All tensors are [B, T, C] (TPU-friendly NHC: the channel dim rides the
128-lane axis and convs lower onto the MXU). The reference keeps [B, C, T] and
transposes around every MLX conv (reference SpeechTokenizer.swift:160-204);
here the layout is NHC end-to-end and the load-time sanitizer re-lays kernels
once instead.

Param conventions (pytree dicts):
  conv:           {"w": [K, Cin/groups, Cout], optional "b": [Cout]}   (HIO)
  transpose conv: {"w": [K, Cin, Cout] HIO, spatially FLIPPED at load time
                   (torch layout [Cin, Cout, K] -> flip K -> transpose),
                   optional "b": [Cout]}
so both run as a single lax.conv_general_dilated with no runtime flips.

Causality semantics mirror the reference exactly:
  - causal_conv1d: left pad (k_eff - stride), plus the right "extra" pad that
    makes ceil-mode frame math work out (reference CausalConv1d,
    SpeechTokenizer.swift:114-170)
  - causal_transpose_conv1d: VALID transpose conv, then trim (K - stride)
    from the right (reference CausalTransposeConv1d / DecoderBlockUpsample,
    SpeechTokenizer.swift:174-204, 720-751)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .norms import layer_norm
from .linear import linear

_DIMS = ("NHC", "HIO", "NHC")


def conv1d(
    params: dict,
    x: jax.Array,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding: tuple[int, int] = (0, 0),
) -> jax.Array:
    """Plain 1-D conv over [B, T, Cin] -> [B, T', Cout]."""
    w = params["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMS,
        feature_group_count=groups,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def causal_extra_pad(length: int, k_eff: int, stride: int) -> int:
    """Right padding that completes the last (possibly partial) stride frame
    (reference CausalConv1d.getExtraPadding, SpeechTokenizer.swift:154-158)."""
    pad = k_eff - stride
    n_frames = (length - k_eff + pad) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - pad)
    return ideal - length


def causal_conv1d(
    params: dict,
    x: jax.Array,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Causal 1-D conv (reference CausalConv1d, SpeechTokenizer.swift:114-170).

    Left-pads (k_eff - stride) and right-pads the ceil-mode remainder, then
    runs a VALID conv. For stride 1 the output length equals the input length.
    """
    k = params["w"].shape[0]
    k_eff = (k - 1) * dilation + 1
    pad_left = k_eff - stride
    pad_right = causal_extra_pad(x.shape[1], k_eff, stride)
    if (
        groups == x.shape[-1]
        and stride == 1
        and params["w"].shape[1] == 1
        and params["w"].shape[2] == x.shape[-1]  # channel multiplier 1 only
    ):
        # depthwise (ConvNeXt dwconv): K shifted channel-wise multiplies fuse
        # into one XLA kernel — much faster than the grouped-conv lowering
        w = params["w"].astype(x.dtype)  # [K, 1, C]
        xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
        t_out = xp.shape[1] - k_eff + 1
        y = sum(
            xp[:, j * dilation : j * dilation + t_out, :] * w[j, 0]
            for j in range(k)
        )
        if "b" in params:
            y = y + params["b"].astype(y.dtype)
        return y
    return conv1d(
        params, x,
        stride=stride, dilation=dilation, groups=groups,
        padding=(pad_left, pad_right),
    )


def left_pad_conv1d(params: dict, x: jax.Array) -> jax.Array:
    """Stride-1 conv with pure left padding k-1 (reference DecoderInitialConv /
    DecoderOutputConv, SpeechTokenizer.swift:786-803, 823-840)."""
    k = params["w"].shape[0]
    return conv1d(params, x, padding=(k - 1, 0))


def transpose_conv1d(params: dict, x: jax.Array, *, stride: int) -> jax.Array:
    """Full (VALID) 1-D transposed conv: [B, T, Cin] -> [B, (T-1)*s + K, Cout].

    Implemented as an lhs-dilated conv with the kernel stored pre-flipped in
    HIO ("w": [K, Cin, Cout] with the spatial axis reversed relative to the
    forward orientation), which is numerically identical to
    torch.nn.functional.conv_transpose1d(padding=0).
    """
    w = params["w"].astype(x.dtype)  # [K, Cin, Cout], pre-flipped HIO
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMS,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def causal_transpose_conv1d(params: dict, x: jax.Array, *, stride: int) -> jax.Array:
    """Transposed conv then right-trim (K - stride): output length T * stride
    (reference CausalTransposeConv1d, SpeechTokenizer.swift:174-204).

    K == stride (the vocoder's ConvNeXt upsample stages) decomposes by
    output phase into ONE matmul + a free reshape — out[t*s + p] =
    x[t] @ w[s-1-p] — which is much faster on TPU than the general
    lhs-dilated conv path (no dilated zeros ever materialize)."""
    w = params["w"]  # [K, Cin, Cout], pre-flipped HIO
    k = w.shape[0]
    if k == stride:
        bsz, t, _cin = x.shape
        cout = w.shape[2]
        wf = jnp.concatenate(
            [w[stride - 1 - p] for p in range(stride)], axis=1
        ).astype(x.dtype)  # [Cin, stride*Cout]
        y = (x @ wf).reshape(bsz, t * stride, cout)
        if "b" in params:
            y = y + params["b"].astype(y.dtype)
        return y
    y = transpose_conv1d(params, x, stride=stride)
    trim = k - stride
    if trim > 0:
        y = y[:, : y.shape[1] - trim, :]
    return y


def snake_beta(params: dict, x: jax.Array, eps: float = 1e-9) -> jax.Array:
    """SnakeBeta activation x + (1/(e^beta + eps)) * sin(x * e^alpha)^2 over
    channels-last input (reference SnakeBeta / DecoderOutputSnake,
    SpeechTokenizer.swift:92-110, 805-821)."""
    alpha = jnp.exp(params["alpha"].astype(jnp.float32))
    beta = jnp.exp(params["beta"].astype(jnp.float32))
    x32 = x.astype(jnp.float32)
    y = x32 + (1.0 / (beta + eps)) * jnp.square(jnp.sin(x32 * alpha))
    return y.astype(x.dtype)


def convnext_block(params: dict, x: jax.Array) -> jax.Array:
    """ConvNeXt block (reference ConvNeXtBlock, SpeechTokenizer.swift:208-236):
    causal depthwise conv k=7 -> LayerNorm(eps 1e-6) -> pw 4x expand -> exact
    GELU -> pw project -> gamma scale -> residual. x: [B, T, C]."""
    c = x.shape[-1]
    h = causal_conv1d(params["dwconv"], x, groups=c)
    h = layer_norm(h, params["norm"]["w"], params["norm"]["b"], 1e-6)
    h = linear(params["pwconv1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = linear(params["pwconv2"], h)
    h = params["gamma"].astype(h.dtype) * h
    return x + h
