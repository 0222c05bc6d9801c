"""Speaker encoder: ECAPA-TDNN x-vector extractor for voice cloning.

Re-implements the reference SpeakerEncoder (reference
SpeakerEncoder/SpeakerEncoder.swift:1-604) TPU-first: the mel/STFT frontend is
jnp (framing via gather + rfft on device instead of the reference's host-side
Swift loops, :169-209), and the TDNN stack runs channels-last [B, T, C].

Architecture (SpeakerEncoder.swift:420-524): mel spectrogram (nFFT 1024,
128 mels, hop 256, Slaney-style filterbank with enorm, log clip 1e-5) ->
TDNN block -> 3 SE-Res2Net blocks (scale 8, dilations 2/3/4) -> concat of the
3 SE block outputs -> MFA TDNN (1536 ch) -> attentive statistics pooling ->
1x1 conv fc -> 1024-dim embedding.

All TDNN convs use REFLECT padding (k-1)*d/2 on both sides and ReLU
(SpeakerEncoder.swift:234-258).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpeakerEncoderConfig
from ..ops.conv import conv1d


# ---------------------------------------------------------------------------
# Mel spectrogram frontend (reference SpeakerEncoder.swift:37-209)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sample_rate: int = 24000,
    n_fft: int = 1024,
    num_mels: int = 128,
    fmin: float = 0.0,
    fmax: float = 12000.0,
) -> np.ndarray:
    """Slaney-style mel filterbank with area normalization, [n_fft//2+1, mels]
    (reference createMelFilterbankImpl, SpeakerEncoder.swift:75-146)."""
    num_freqs = n_fft // 2 + 1
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    log_step = np.log(6.4) / 27.0

    def hz_to_mel(hz):
        hz = np.asarray(hz, np.float64)
        return np.where(
            hz >= min_log_hz,
            min_log_mel + np.log(np.maximum(hz, 1e-10) / min_log_hz) / log_step,
            hz / f_sp,
        )

    def mel_to_hz(mel):
        mel = np.asarray(mel, np.float64)
        return np.where(
            mel >= min_log_mel,
            min_log_hz * np.exp(log_step * (mel - min_log_mel)),
            f_sp * mel,
        )

    all_freqs = np.arange(num_freqs) * (sample_rate / 2) / (num_freqs - 1)
    m_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), num_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)

    down = (all_freqs[:, None] - f_pts[None, :-2]) / f_diff[None, :-1]
    up = (f_pts[None, 2:] - all_freqs[:, None]) / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (f_pts[2:] - f_pts[:-2])
    return (fb * enorm[None, :]).astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Symmetric Hann (reference speakerEncoderSTFT, SpeakerEncoder.swift:181-184)."""
    i = np.arange(win_length, dtype=np.float32)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * i / (win_length - 1)))


def mel_spectrogram(
    audio: jax.Array,
    *,
    n_fft: int = 1024,
    num_mels: int = 128,
    sample_rate: int = 24000,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float = 12000.0,
) -> jax.Array:
    """audio [L] or [B, L] -> log-mel [B, frames, mels]
    (reference melSpectrogram, SpeakerEncoder.swift:37-73)."""
    x = jnp.asarray(audio, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    pad = n_fft // 2
    padded = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = (padded.shape[1] - n_fft) // hop_size + 1
    idx = np.arange(num_frames)[:, None] * hop_size + np.arange(n_fft)[None, :]
    frames = padded[:, idx] * jnp.asarray(hann_window(win_size))
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))
    mel = spec @ jnp.asarray(mel_filterbank(sample_rate, n_fft, num_mels, fmin, fmax))
    return jnp.log(jnp.clip(mel, 1e-5, None))


# ---------------------------------------------------------------------------
# ECAPA blocks (channels-last [B, T, C])
# ---------------------------------------------------------------------------


def _reflect_pad_time(x: jax.Array, pad: int) -> jax.Array:
    if pad <= 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


def tdnn_block(params: dict, x: jax.Array, dilation: int = 1) -> jax.Array:
    """Reflect-padded dilated conv + ReLU (reference TimeDelayNetBlock,
    SpeakerEncoder.swift:234-258)."""
    k = params["w"].shape[0]
    pad = (k - 1) * dilation // 2
    h = _reflect_pad_time(x, pad)
    return jax.nn.relu(conv1d(params, h, dilation=dilation))


def res2net_block(params: dict, x: jax.Array, scale: int, dilation: int) -> jax.Array:
    """Hierarchical multi-scale conv (reference Res2NetBlock,
    SpeakerEncoder.swift:260-302). params["blocks"]: list of scale-1 TDNNs."""
    chunk = x.shape[-1] // scale
    outputs = []
    part = None
    for i in range(scale):
        piece = x[..., i * chunk : (i + 1) * chunk]
        if i == 0:
            part = piece
        elif i == 1:
            part = tdnn_block(params["blocks"][0], piece, dilation)
        else:
            part = tdnn_block(params["blocks"][i - 1], piece + part, dilation)
        outputs.append(part)
    return jnp.concatenate(outputs, axis=-1)


def se_block(params: dict, x: jax.Array) -> jax.Array:
    """Squeeze-excitation over time mean (reference SqueezeExcitationBlock,
    SpeakerEncoder.swift:304-322)."""
    s = x.mean(axis=1, keepdims=True)  # [B, 1, C]
    s = jax.nn.relu(conv1d(params["conv1"], s))
    s = jax.nn.sigmoid(conv1d(params["conv2"], s))
    return x * s


def se_res2net_block(params: dict, x: jax.Array, scale: int, dilation: int) -> jax.Array:
    """TDNN -> Res2Net -> TDNN -> SE + residual (reference
    SqueezeExcitationRes2NetBlock, SpeakerEncoder.swift:324-353)."""
    h = tdnn_block(params["tdnn1"], x)
    h = res2net_block(params["res2net_block"], h, scale, dilation)
    h = tdnn_block(params["tdnn2"], h)
    h = se_block(params["se_block"], h)
    return h + x


def attentive_stats_pooling(params: dict, x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Attention-weighted mean+std pooling over time (reference
    AttentiveStatisticsPooling, SpeakerEncoder.swift:355-395).
    x: [B, T, C] -> [B, 1, 2C]."""
    t = x.shape[1]
    mean = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    std = jnp.sqrt(var + eps)
    attn_in = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
    )
    a = tdnn_block(params["tdnn"], attn_in)
    a = jnp.tanh(a)
    a = conv1d(params["conv"], a)
    a = jax.nn.softmax(a, axis=1)  # softmax over time
    wmean = (a * x).sum(axis=1, keepdims=True)
    wvar = (a * jnp.square(x - wmean)).sum(axis=1, keepdims=True)
    wstd = jnp.sqrt(jnp.clip(wvar, eps, None))
    return jnp.concatenate([wmean, wstd], axis=-1)


def speaker_encoder_forward(
    params: dict, mels: jax.Array, config: SpeakerEncoderConfig
) -> jax.Array:
    """mels [B, T, M] -> embeddings [B, enc_dim]
    (reference SpeakerEncoder.callAsFunction, SpeakerEncoder.swift:496-524)."""
    scale = config.enc_res2net_scale
    h = tdnn_block(params["blocks"][0], mels, config.enc_dilations[0])
    hiddens = []
    for i in range(1, 4):
        h = se_res2net_block(params["blocks"][i], h, scale, config.enc_dilations[i])
        hiddens.append(h)
    h = jnp.concatenate(hiddens, axis=-1)
    h = tdnn_block(params["mfa"], h, config.enc_dilations[4])
    h = attentive_stats_pooling(params["asp"], h)
    h = conv1d(params["fc"], h)
    return h[:, 0, :]


# ---------------------------------------------------------------------------
# Loading + wrapper
# ---------------------------------------------------------------------------


def _conv_p(w: dict, prefix: str) -> dict:
    weight = np.asarray(w[f"{prefix}.weight"], np.float32).transpose(2, 1, 0)  # HIO
    p = {"w": np.ascontiguousarray(weight)}
    if f"{prefix}.bias" in w:
        p["b"] = np.asarray(w[f"{prefix}.bias"], np.float32)
    return p


def load_speaker_encoder_params(weights: dict, config: SpeakerEncoderConfig) -> dict:
    """Assemble the ECAPA param tree from "speaker_encoder."-prefixed keys
    (reference SpeakerEncoder.load, SpeakerEncoder.swift:550-603)."""
    w = {
        k[len("speaker_encoder."):]: v
        for k, v in weights.items()
        if k.startswith("speaker_encoder.")
    }
    scale = config.enc_res2net_scale

    def se_res2net(prefix: str) -> dict:
        return {
            "tdnn1": _conv_p(w, f"{prefix}.tdnn1.conv"),
            "tdnn2": _conv_p(w, f"{prefix}.tdnn2.conv"),
            "se_block": {
                "conv1": _conv_p(w, f"{prefix}.se_block.conv1"),
                "conv2": _conv_p(w, f"{prefix}.se_block.conv2"),
            },
            "res2net_block": {
                "blocks": [
                    _conv_p(w, f"{prefix}.res2net_block.blocks.{j}.conv")
                    for j in range(scale - 1)
                ]
            },
        }

    return {
        "blocks": [
            _conv_p(w, "blocks.0.conv"),
            se_res2net("blocks.1"),
            se_res2net("blocks.2"),
            se_res2net("blocks.3"),
        ],
        "mfa": _conv_p(w, "mfa.conv"),
        "asp": {
            "tdnn": _conv_p(w, "asp.tdnn.conv"),
            "conv": _conv_p(w, "asp.conv"),
        },
        "fc": _conv_p(w, "fc"),
    }


def config_from_weights(weights: dict) -> SpeakerEncoderConfig:
    """Infer the ECAPA dims from checkpoint weight shapes (torch conv layout
    [Cout, Cin, K]); dilations keep the reference defaults (1,2,3,4,1)."""
    w = {
        k[len("speaker_encoder."):]: v
        for k, v in weights.items()
        if k.startswith("speaker_encoder.")
    }
    b0 = np.asarray(w["blocks.0.conv.weight"])
    mel_dim, k0 = b0.shape[1], b0.shape[2]
    ch = [b0.shape[0]]
    kz = [k0]
    scale = 1 + len(
        {
            k.split(".")[4]  # blocks.1.res2net_block.blocks.<j>.conv.weight
            for k in w
            if k.startswith("blocks.1.res2net_block.blocks.") and k.endswith(".weight")
        }
    )
    for i in (1, 2, 3):
        t1 = np.asarray(w[f"blocks.{i}.tdnn1.conv.weight"])
        ch.append(t1.shape[0])
        kz.append(np.asarray(w[f"blocks.{i}.res2net_block.blocks.0.conv.weight"]).shape[2])
    mfa = np.asarray(w["mfa.conv.weight"])
    ch.append(mfa.shape[0])
    kz.append(mfa.shape[2])
    return SpeakerEncoderConfig(
        enc_dim=np.asarray(w["fc.weight"]).shape[0],
        mel_dim=mel_dim,
        enc_channels=tuple(ch),
        enc_kernel_sizes=tuple(kz),
        enc_res2net_scale=scale,
        enc_se_channels=np.asarray(w["blocks.1.se_block.conv1.weight"]).shape[0],
        enc_attention_channels=np.asarray(w["asp.tdnn.conv.weight"]).shape[0],
    )


def init_speaker_encoder_params(
    config: SpeakerEncoderConfig, key: jax.Array
) -> dict:
    """Random init with the real structure (tests)."""
    ks = iter(jax.random.split(key, 64))

    def conv(k_size, cin, cout, scale_=0.05):
        return {
            "w": (jax.random.normal(next(ks), (k_size, cin, cout)) * scale_).astype(
                jnp.float32
            ),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    ch = config.enc_channels
    kz = config.enc_kernel_sizes
    r = config.enc_res2net_scale

    def se_res2net(cin, cout, k_size):
        return {
            "tdnn1": conv(1, cin, cout),
            "tdnn2": conv(1, cout, cout),
            "se_block": {
                "conv1": conv(1, cout, config.enc_se_channels),
                "conv2": conv(1, config.enc_se_channels, cout),
            },
            "res2net_block": {
                "blocks": [conv(k_size, cout // r, cout // r) for _ in range(r - 1)]
            },
        }

    return {
        "blocks": [
            conv(kz[0], config.mel_dim, ch[0]),
            se_res2net(ch[0], ch[1], kz[1]),
            se_res2net(ch[1], ch[2], kz[2]),
            se_res2net(ch[2], ch[3], kz[3]),
        ],
        "mfa": conv(kz[4], ch[1] + ch[2] + ch[3], ch[4]),
        "asp": {
            "tdnn": conv(1, ch[4] * 3, config.enc_attention_channels),
            "conv": conv(1, config.enc_attention_channels, ch[4]),
        },
        "fc": conv(1, ch[4] * 2, config.enc_dim),
    }


class SpeakerEncoder:
    """Wrapper matching the pipeline surface (reference
    Qwen3TTSPipeline.extractSpeakerEmbedding, Qwen3TTSPipeline.swift:906-918)."""

    def __init__(self, params: dict, config: SpeakerEncoderConfig | None = None):
        self.config = config or SpeakerEncoderConfig()
        self.params = jax.device_put(params)  # one async transfer per tree

    @classmethod
    def from_weights(cls, weights: dict, config: SpeakerEncoderConfig | None = None):
        cfg = config or config_from_weights(weights)
        return cls(load_speaker_encoder_params(weights, cfg), cfg)

    def extract_embedding(
        self, audio: np.ndarray, sample_rate: int = 24000
    ) -> np.ndarray:
        mels = mel_spectrogram(
            jnp.asarray(audio),
            sample_rate=sample_rate,
            num_mels=self.config.mel_dim,
        )
        emb = speaker_encoder_forward(self.params, mels, self.config)
        return np.asarray(emb).reshape(-1)
