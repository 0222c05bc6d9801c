"""Audio encoder for ICL voice cloning: 24 kHz waveform -> 16 x T codec codes.

Re-implements the reference Qwen3TTSAudioEncoder (reference
Vocoder/Qwen3TTSAudioEncoder.swift:1-649) TPU-first, channels-last:

  causal SEANet CNN (initial conv, per-ratio [ResnetBlock xN, ELU,
  strided conv k=2r s=r] over REVERSED upsampling_ratios, final ELU + conv;
  total downsample x960; :117-186) -> 8-layer NON-causal transformer
  (LayerNorm, GELU fc1/fc2 MLP, LayerScale, RoPE theta 1e4; :190-336) ->
  x`compress` downsample conv (:340-358) -> split residual VQ ENCODE
  (L2-argmin nearest codebook, residual subtraction, input_proj only;
  :362-453) -> keep first encoder_valid_num_quantizers codes (:558-560).

The Mimi causal conv padding rule is identical to the vocoder's CausalConv1d,
so ops.conv.causal_conv1d is reused directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpeechTokenizerConfig, TokenizerEncoderConfig
from ..ops.attention import sdpa
from ..ops.conv import causal_conv1d, conv1d
from ..ops.linear import linear
from ..ops.norms import layer_norm
from ..ops import rope as rope_ops


# ---------------------------------------------------------------------------
# SEANet CNN
# ---------------------------------------------------------------------------


def _elu(x: jax.Array) -> jax.Array:
    """ELU alpha=1 (reference ELUActivation, Qwen3TTSAudioEncoder.swift:8-20)."""
    return jnp.maximum(x, 0) + jnp.minimum(jnp.expm1(x), 0)


def resnet_block(params: dict, x: jax.Array, dilation: int) -> jax.Array:
    """ELU -> causal conv k3 (dilated) -> ELU -> causal conv k1 + residual
    (reference MimiResnetBlock, Qwen3TTSAudioEncoder.swift:88-113)."""
    h = _elu(x)
    h = causal_conv1d(params["conv1"], h, dilation=dilation)
    h = _elu(h)
    h = causal_conv1d(params["conv2"], h)
    return x + h


def seanet_encode(params: dict, x: jax.Array, cfg: TokenizerEncoderConfig) -> jax.Array:
    """[B, L, 1] -> [B, L/prod(ratios), hidden_size]
    (reference MimiSEANetEncoder, Qwen3TTSAudioEncoder.swift:117-186)."""
    h = causal_conv1d(params["initial_conv"], x)
    ratios = tuple(reversed(cfg.upsampling_ratios))
    for stage, ratio in zip(params["stages"], ratios):
        for res, dil_idx in zip(stage["resnets"], range(cfg.num_residual_layers)):
            h = resnet_block(res, h, cfg.dilation_growth_rate**dil_idx)
        h = _elu(h)
        h = causal_conv1d(stage["down"], h, stride=ratio)
    h = _elu(h)
    return causal_conv1d(params["final_conv"], h)


# ---------------------------------------------------------------------------
# Non-causal transformer
# ---------------------------------------------------------------------------


def encoder_transformer(
    params: dict, x: jax.Array, cfg: TokenizerEncoderConfig
) -> jax.Array:
    """Bidirectional transformer over [B, T, H]
    (reference EncoderTransformer, Qwen3TTSAudioEncoder.swift:303-336)."""
    b, t, _ = x.shape
    hd = cfg.head_dim
    nh = cfg.num_attention_heads
    scale = 1.0 / float(hd) ** 0.5

    inv = jnp.asarray(rope_ops.inv_freq(hd, cfg.rope_theta))
    cos, sin = rope_ops.rope_cos_sin(jnp.arange(t)[None, :], inv)
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]

    h = x
    for lp in params["layers"]:
        xin = layer_norm(
            h, lp["input_layernorm"]["w"], lp["input_layernorm"]["b"], cfg.norm_eps
        )
        q = linear(lp["q_proj"], xin).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = linear(lp["k_proj"], xin).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = linear(lp["v_proj"], xin).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        q = rope_ops.apply_rope(q, c, s)
        k = rope_ops.apply_rope(k, c, s)
        attn = sdpa(q, k, v, scale, None).transpose(0, 2, 1, 3).reshape(b, t, -1)
        attn = linear(lp["o_proj"], attn)
        h = h + lp["self_attn_layer_scale"]["w"] * attn
        x2 = layer_norm(
            h,
            lp["post_attention_layernorm"]["w"],
            lp["post_attention_layernorm"]["b"],
            cfg.norm_eps,
        )
        m = linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], x2), approximate=False))
        h = h + lp["mlp_layer_scale"]["w"] * m
    return h


# ---------------------------------------------------------------------------
# RVQ encode
# ---------------------------------------------------------------------------


def _nearest_codes(codebook: jax.Array, x: jax.Array) -> jax.Array:
    """L2-argmin over codebook rows. codebook [V, D], x [B, T, D] -> [B, T]
    (reference EuclideanCodebook.encode, SpeechTokenizer.swift:511-519)."""
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)
    e_sq = jnp.sum(codebook * codebook, axis=-1)
    dot = x @ codebook.T
    dist = x_sq - 2.0 * dot + e_sq[None, None, :]
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def rvq_encode_half(params: dict, x: jax.Array) -> jax.Array:
    """Residual VQ encode of one half. x: [B, T, H] -> codes [n, B, T]
    (reference EncoderResidualVectorQuantizer.encode,
    Qwen3TTSAudioEncoder.swift:382-416)."""
    residual = linear(params["input_proj"], x)
    codes = []
    for cb in params["codebooks"]:
        idx = _nearest_codes(cb, residual)
        quantized = jnp.take(cb, idx, axis=0)
        codes.append(idx)
        residual = residual - quantized
    return jnp.stack(codes, axis=0)


def rvq_encode(params: dict, x: jax.Array) -> jax.Array:
    """Split semantic + acoustic encode -> [B, num_quantizers, T]
    (reference EncoderSplitResidualVectorQuantizer.encode,
    Qwen3TTSAudioEncoder.swift:420-453)."""
    sem = rvq_encode_half(params["semantic"], x)
    aco = rvq_encode_half(params["acoustic"], x)
    return jnp.concatenate([sem, aco], axis=0).transpose(1, 0, 2)


def audio_encode(
    params: dict,
    audio: jax.Array,
    cfg: TokenizerEncoderConfig,
    valid_num_quantizers: int = 16,
) -> jax.Array:
    """[B, L] or [L] float32 -> codes [B, valid_num_quantizers, T]
    (reference Qwen3TTSAudioEncoder.callAsFunction,
    Qwen3TTSAudioEncoder.swift:525-563)."""
    x = jnp.asarray(audio, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    h = seanet_encode(params["seanet"], x[..., None], cfg)
    h = encoder_transformer(params["transformer"], h, cfg)
    h = causal_conv1d(params["downsample"], h, stride=cfg.compress)
    codes = rvq_encode(params["quantizer"], h)
    return codes[:, :valid_num_quantizers]


# ---------------------------------------------------------------------------
# Loading / init
# ---------------------------------------------------------------------------


def _conv_p(w: dict, prefix: str) -> dict:
    weight = np.asarray(w[f"{prefix}.weight"], np.float32).transpose(2, 1, 0)
    p = {"w": np.ascontiguousarray(weight)}
    if f"{prefix}.bias" in w:
        p["b"] = np.asarray(w[f"{prefix}.bias"], np.float32)
    return p


def _lin_p(w: dict, prefix: str) -> dict:
    weight = np.asarray(w[f"{prefix}.weight"], np.float32)
    if weight.ndim == 3:  # conv1d k=1 proj
        weight = weight[:, :, 0]
    p = {"w": weight}
    if f"{prefix}.bias" in w:
        p["b"] = np.asarray(w[f"{prefix}.bias"], np.float32)
    return p


def load_audio_encoder_params(weights: dict, cfg: TokenizerEncoderConfig) -> dict:
    """Assemble params from "encoder."-prefixed keys in the speech_tokenizer
    checkpoint (reference sanitizeEncoderWeights,
    Qwen3TTSAudioEncoder.swift:579-648). SEANet layer indices follow the
    reference's flat layer list: 0 = initial conv, then per ratio
    [num_residual_layers resnets, ELU, downsample conv], then final ELU+conv
    (ELUs hold no weights but occupy indices)."""
    w = {k[len("encoder."):]: v for k, v in weights.items() if k.startswith("encoder.")}

    # RVQ codebooks from EMA stats
    stats: dict[str, dict[str, np.ndarray]] = {}
    clean = {}
    for k, v in w.items():
        if "._codebook.cluster_usage" in k or "._codebook.embedding_sum" in k:
            base, _, field = k.partition("._codebook.")
            stats.setdefault(base, {})[field] = v
        else:
            clean[k] = v
    for base, d in stats.items():
        usage = np.clip(np.asarray(d["cluster_usage"], np.float32), 1e-5, None)
        clean[f"{base}.codebook.embed"] = (
            np.asarray(d["embedding_sum"], np.float32) / usage[:, None]
        )
    w = clean

    # SEANet layer index bookkeeping
    idx = 0
    seanet: dict = {"stages": []}
    seanet["initial_conv"] = _conv_p(w, f"encoder.layers.{idx}.conv")
    idx += 1
    for _ratio in reversed(cfg.upsampling_ratios):
        resnets = []
        for _j in range(cfg.num_residual_layers):
            resnets.append(
                {
                    "conv1": _conv_p(w, f"encoder.layers.{idx}.block.1.conv"),
                    "conv2": _conv_p(w, f"encoder.layers.{idx}.block.3.conv"),
                }
            )
            idx += 1
        idx += 1  # ELU (no params)
        down = _conv_p(w, f"encoder.layers.{idx}.conv")
        idx += 1
        seanet["stages"].append({"resnets": resnets, "down": down})
    idx += 1  # final ELU
    seanet["final_conv"] = _conv_p(w, f"encoder.layers.{idx}.conv")

    def tf_layer(i: int) -> dict:
        p = f"encoder_transformer.layers.{i}"
        return {
            "input_layernorm": {
                "w": np.asarray(w[f"{p}.input_layernorm.weight"], np.float32),
                "b": np.asarray(w[f"{p}.input_layernorm.bias"], np.float32),
            },
            "post_attention_layernorm": {
                "w": np.asarray(w[f"{p}.post_attention_layernorm.weight"], np.float32),
                "b": np.asarray(w[f"{p}.post_attention_layernorm.bias"], np.float32),
            },
            "self_attn_layer_scale": {
                "w": np.asarray(w[f"{p}.self_attn_layer_scale.scale"], np.float32)
            },
            "mlp_layer_scale": {
                "w": np.asarray(w[f"{p}.mlp_layer_scale.scale"], np.float32)
            },
            "q_proj": _lin_p(w, f"{p}.self_attn.q_proj"),
            "k_proj": _lin_p(w, f"{p}.self_attn.k_proj"),
            "v_proj": _lin_p(w, f"{p}.self_attn.v_proj"),
            "o_proj": _lin_p(w, f"{p}.self_attn.o_proj"),
            "fc1": _lin_p(w, f"{p}.mlp.fc1"),
            "fc2": _lin_p(w, f"{p}.mlp.fc2"),
        }

    def rvq_half(base: str, n: int) -> dict:
        return {
            "input_proj": _lin_p(w, f"{base}.input_proj"),
            "output_proj": _lin_p(w, f"{base}.output_proj"),
            "codebooks": [
                np.asarray(w[f"{base}.layers.{i}.codebook.embed"], np.float32)
                for i in range(n)
            ],
        }

    ns = cfg.num_semantic_quantizers
    na = cfg.num_quantizers - ns
    return {
        "seanet": seanet,
        "transformer": {"layers": [tf_layer(i) for i in range(cfg.num_hidden_layers)]},
        "downsample": _conv_p(w, "downsample.conv.conv"),
        "quantizer": {
            "semantic": rvq_half("quantizer.semantic_residual_vector_quantizer", ns),
            "acoustic": rvq_half("quantizer.acoustic_residual_vector_quantizer", na),
        },
    }


def init_audio_encoder_params(cfg: TokenizerEncoderConfig, key: jax.Array) -> dict:
    """Random init with the real structure (tests)."""
    ks = iter(jax.random.split(key, 256))

    def conv(k_size, cin, cout):
        return {
            "w": (jax.random.normal(next(ks), (k_size, cin, cout)) * 0.05).astype(
                jnp.float32
            ),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    def lin(out, inn, bias=True):
        p = {"w": (jax.random.normal(next(ks), (out, inn)) * 0.05).astype(jnp.float32)}
        if bias:
            p["b"] = jnp.zeros((out,), jnp.float32)
        return p

    nf = cfg.num_filters
    seanet: dict = {
        "initial_conv": conv(cfg.kernel_size, cfg.audio_channels, nf),
        "stages": [],
    }
    cur = nf
    for i, ratio in enumerate(reversed(cfg.upsampling_ratios)):
        out = nf * (2 ** (i + 1))
        resnets = [
            {
                "conv1": conv(cfg.residual_kernel_size, cur, cur // cfg.compress),
                "conv2": conv(1, cur // cfg.compress, cur),
            }
            for _ in range(cfg.num_residual_layers)
        ]
        seanet["stages"].append({"resnets": resnets, "down": conv(2 * ratio, cur, out)})
        cur = out
    seanet["final_conv"] = conv(cfg.last_kernel_size, cur, cfg.hidden_size)

    h = cfg.hidden_size
    hd = cfg.head_dim
    nh = cfg.num_attention_heads

    def tf_layer():
        return {
            "input_layernorm": {"w": jnp.ones((h,)), "b": jnp.zeros((h,))},
            "post_attention_layernorm": {"w": jnp.ones((h,)), "b": jnp.zeros((h,))},
            "self_attn_layer_scale": {
                "w": jnp.full((h,), cfg.layer_scale_initial_scale)
            },
            "mlp_layer_scale": {"w": jnp.full((h,), cfg.layer_scale_initial_scale)},
            "q_proj": lin(nh * hd, h, bias=False),
            "k_proj": lin(nh * hd, h, bias=False),
            "v_proj": lin(nh * hd, h, bias=False),
            "o_proj": lin(h, nh * hd, bias=False),
            "fc1": lin(cfg.intermediate_size, h),
            "fc2": lin(h, cfg.intermediate_size),
        }

    d = cfg.vector_quantization_hidden_dimension
    ns = cfg.num_semantic_quantizers
    na = cfg.num_quantizers - ns

    def rvq_half(n):
        return {
            "input_proj": lin(d, h, bias=False),
            "output_proj": lin(h, d, bias=False),
            "codebooks": [
                (jax.random.normal(next(ks), (cfg.codebook_size, d)) * 0.1).astype(
                    jnp.float32
                )
                for _ in range(n)
            ],
        }

    return {
        "seanet": seanet,
        "transformer": {"layers": [tf_layer() for _ in range(cfg.num_hidden_layers)]},
        "downsample": conv(2 * cfg.compress, h, h),
        "quantizer": {"semantic": rvq_half(ns), "acoustic": rvq_half(na)},
    }


class AudioEncoder:
    """Wrapper matching the pipeline surface (reference
    Qwen3TTSPipeline.encodeReferenceAudio, Qwen3TTSPipeline.swift:924-945)."""

    def __init__(
        self,
        params: dict,
        cfg: TokenizerEncoderConfig,
        valid_num_quantizers: int = 16,
    ):
        self.cfg = cfg
        self.valid_num_quantizers = valid_num_quantizers
        self.params = jax.device_put(params)  # one async transfer per tree

    @classmethod
    def from_weights(cls, weights: dict, speech_config: SpeechTokenizerConfig):
        cfg = speech_config.encoder_config
        assert cfg is not None
        return cls(
            load_audio_encoder_params(weights, cfg),
            cfg,
            speech_config.encoder_valid_num_quantizers,
        )

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """audio [L] -> codes [valid_num_quantizers, T] int32."""
        codes = audio_encode(
            self.params, jnp.asarray(audio), self.cfg, self.valid_num_quantizers
        )
        return np.asarray(codes[0])
