"""Conv primitive tests: cross-validated against torch (CPU) for exact
semantics of causal conv, transposed conv, and the reference's trim/pad rules.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from qwen3_tts_tpu.ops import conv as conv_ops


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("k,stride,dilation", [(7, 1, 1), (7, 1, 3), (3, 1, 9), (7, 2, 1), (4, 2, 1)])
def test_causal_conv_matches_torch(k, stride, dilation):
    rng = np.random.default_rng(0)
    b, t, cin, cout = 2, 37, 5, 8
    x = rng.normal(size=(b, t, cin)).astype(np.float32)
    w = rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1
    bias = rng.normal(size=(cout,)).astype(np.float32)

    y = conv_ops.causal_conv1d(
        {"w": jnp.asarray(w), "b": jnp.asarray(bias)},
        jnp.asarray(x),
        stride=stride,
        dilation=dilation,
    )

    # Reference semantics (SpeechTokenizer.swift:114-170): left pad
    # k_eff - stride, right pad the ceil-mode remainder, VALID conv.
    k_eff = (k - 1) * dilation + 1
    pad_left = k_eff - stride
    pad_right = conv_ops.causal_extra_pad(t, k_eff, stride)
    xt = torch.from_numpy(x).permute(0, 2, 1)  # [B, C, T]
    xt = F.pad(xt, (pad_left, pad_right))
    wt = torch.from_numpy(w).permute(2, 1, 0)  # [Cout, Cin, K]
    yt = F.conv1d(xt, wt, torch.from_numpy(bias), stride=stride, dilation=dilation)
    yt = yt.permute(0, 2, 1).numpy()

    assert y.shape == yt.shape
    np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-5)
    if stride == 1:
        assert y.shape[1] == t  # stride-1 causal convs preserve length


def test_causal_conv_is_causal():
    """Output at time t must not change when future inputs change."""
    rng = np.random.default_rng(1)
    b, t, c = 1, 32, 4
    x1 = rng.normal(size=(b, t, c)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 20:] += 100.0
    w = rng.normal(size=(7, c, c)).astype(np.float32)
    p = {"w": jnp.asarray(w)}
    y1 = _np(conv_ops.causal_conv1d(p, jnp.asarray(x1), dilation=3))
    y2 = _np(conv_ops.causal_conv1d(p, jnp.asarray(x2), dilation=3))
    np.testing.assert_allclose(y1[:, :20], y2[:, :20], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k,stride", [(16, 8), (10, 5), (8, 4), (6, 3), (2, 2), (4, 2)])
def test_transpose_conv_matches_torch(k, stride):
    rng = np.random.default_rng(2)
    b, t, cin, cout = 2, 19, 6, 4
    x = rng.normal(size=(b, t, cin)).astype(np.float32)
    wt = rng.normal(size=(cin, cout, k)).astype(np.float32) * 0.1  # torch layout
    bias = rng.normal(size=(cout,)).astype(np.float32)

    # Our storage: torch [Cin, Cout, K] -> flip K -> [K, Cin, Cout] HIO
    w_ours = np.ascontiguousarray(wt[:, :, ::-1].transpose(2, 0, 1))
    y = conv_ops.transpose_conv1d(
        {"w": jnp.asarray(w_ours), "b": jnp.asarray(bias)},
        jnp.asarray(x),
        stride=stride,
    )

    yt = F.conv_transpose1d(
        torch.from_numpy(x).permute(0, 2, 1),
        torch.from_numpy(wt),
        torch.from_numpy(bias),
        stride=stride,
    ).permute(0, 2, 1).numpy()

    assert y.shape == yt.shape == (b, (t - 1) * stride + k, cout)
    np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-5)


def test_causal_transpose_conv_length():
    """Right-trim (K - stride) gives exactly T * stride output
    (reference CausalTransposeConv1d / DecoderBlockUpsample)."""
    rng = np.random.default_rng(3)
    for k, stride in [(16, 8), (2, 2), (6, 3)]:
        x = rng.normal(size=(1, 13, 4)).astype(np.float32)
        w = rng.normal(size=(k, 4, 4)).astype(np.float32)
        y = conv_ops.causal_transpose_conv1d(
            {"w": jnp.asarray(w)}, jnp.asarray(x), stride=stride
        )
        assert y.shape == (1, 13 * stride, 4)


def test_snake_beta_zero_params_near_identity_plus_sin2():
    x = jnp.linspace(-2, 2, 64).reshape(1, 16, 4)
    p = {"alpha": jnp.zeros((4,)), "beta": jnp.zeros((4,))}
    y = conv_ops.snake_beta(p, x)
    expected = np.asarray(x) + np.sin(np.asarray(x)) ** 2
    np.testing.assert_allclose(_np(y), expected, rtol=1e-5, atol=1e-6)


def test_convnext_block_residual_and_shape():
    rng = np.random.default_rng(4)
    dim, t = 8, 20
    x = rng.normal(size=(2, t, dim)).astype(np.float32)
    import jax

    from qwen3_tts_tpu.models.vocoder import _convnext

    p = _convnext(jax.random.PRNGKey(0), dim, jnp.float32)
    y = conv_ops.convnext_block(p, jnp.asarray(x))
    assert y.shape == x.shape
    # gamma starts at 1e-6 -> block is near-identity at init
    np.testing.assert_allclose(_np(y), x, atol=1e-3)
