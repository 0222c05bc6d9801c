"""Test utilities: tiny model configs, random checkpoints, fake tokenizers.

Used by tests/ to exercise every subsystem without real multi-GB checkpoints —
the strategy SURVEY.md §4 calls for (the reference itself has no model-level
tests). Token-id constants are scaled down so tiny embedding tables stay small;
relationships between ids (codec ids < codec vocab, tts ids < text vocab)
mirror the real checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import (
    CodePredictorConfig,
    Qwen3TTSConfig,
    SpeechTokenizerConfig,
    TokenizerDecoderConfig,
    TokenizerEncoderConfig,
)


def tiny_talker_config(**overrides) -> Qwen3TTSConfig:
    """Small talker config with the real structure (GQA, MRoPE, MTP head).

    Codec special ids keep their REAL values (2148/2149/2150/2155-2157) since
    codec vocab stays 3072; tts text ids are remapped into a small text vocab.
    """
    defaults = dict(
        hidden_size=64,
        num_hidden_layers=2,
        vocab_size=3072,
        text_vocab_size=4096,
        text_hidden_size=96,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=128,
        rms_norm_eps=1e-6,
        max_position_embeddings=4096,
        rope_theta=1000000.0,
        tts_bos_token_id=4000,
        tts_eos_token_id=4001,
        tts_pad_token_id=4002,
        mrope_section=(3, 3, 2),
        code_predictor_config=CodePredictorConfig(
            hidden_size=48,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=12,
            intermediate_size=96,
            vocab_size=2048,
            num_code_groups=16,
        ),
    )
    defaults.update(overrides)
    return Qwen3TTSConfig(**defaults)


def tiny_decoder_config(**overrides) -> TokenizerDecoderConfig:
    """Small vocoder-decoder config; upsample factors kept real (1920x) unless
    overridden, since frame math depends on them."""
    defaults = dict(
        latent_dim=32,
        codebook_dim=16,
        codebook_size=64,
        decoder_dim=64,
        hidden_size=32,
        intermediate_size=64,
        head_dim=8,
        num_attention_heads=4,
        num_key_value_heads=4,
        num_hidden_layers=2,
        num_quantizers=16,
        num_semantic_quantizers=1,
        upsample_rates=(4, 3),
        upsampling_ratios=(2, 2),
        vector_quantization_hidden_dimension=16,
    )
    defaults.update(overrides)
    return TokenizerDecoderConfig(**defaults)


def tiny_encoder_config(**overrides) -> TokenizerEncoderConfig:
    defaults = dict(
        audio_channels=1,
        codebook_dim=16,
        codebook_size=64,
        compress=2,
        hidden_size=32,
        intermediate_size=64,
        kernel_size=7,
        last_kernel_size=3,
        num_filters=8,
        num_hidden_layers=2,
        num_residual_layers=1,
        num_quantizers=32,
        num_semantic_quantizers=1,
        upsampling_ratios=(4, 3),
        head_dim=8,
        num_attention_heads=4,
        num_key_value_heads=4,
        vector_quantization_hidden_dimension=16,
    )
    defaults.update(overrides)
    return TokenizerEncoderConfig(**defaults)


def tiny_speech_tokenizer_config(**overrides) -> SpeechTokenizerConfig:
    dec = overrides.pop("decoder_config", tiny_decoder_config())
    enc = overrides.pop("encoder_config", tiny_encoder_config())
    total = dec.total_upsample
    return SpeechTokenizerConfig(
        decoder_config=dec,
        encoder_config=enc,
        decode_upsample_rate=total,
        encode_downsample_rate=total,
        **overrides,
    )


class FakeByteTokenizer:
    """Deterministic tokenizer for model tests: maps bytes to ids < 256 and a
    few special strings to fixed ids; encode is injective enough for prompts."""

    SPECIALS = {
        "<|im_start|>": 300,
        "<|im_end|>": 301,
    }

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        rest = text
        while rest:
            for sp, sid in self.SPECIALS.items():
                if rest.startswith(sp):
                    ids.append(sid)
                    rest = rest[len(sp):]
                    break
            else:
                ids.append(rest.encode("utf-8")[0] if ord(rest[0]) < 128 else 255)
                rest = rest[1:]
        return ids

    def decode(self, ids) -> str:
        return "".join(chr(i) if i < 128 else "?" for i in ids)


def tiny_models(seed: int = 0, dtype=jnp.float32):
    """Convenience: (config, talker_params, cp_params)."""
    from .models import code_predictor as cp_mod
    from .models import talker as talker_mod

    cfg = tiny_talker_config()
    params = talker_mod.init_talker_params(cfg, jax.random.PRNGKey(seed), dtype)
    cp_params = cp_mod.init_cp_params(
        cfg.code_predictor_config, cfg.hidden_size, jax.random.PRNGKey(seed + 1), dtype
    )
    return cfg, params, cp_params


# ---------------------------------------------------------------------------
# Reference-format checkpoint export (tests round-trip through io.checkpoint)
# ---------------------------------------------------------------------------


def export_talker_checkpoint(params, cp_params, config) -> dict:
    """Serialize (talker_params, cp_params) into reference-format checkpoint
    keys ("talker.model.*", "talker.code_predictor.model.*" — the layout
    io.checkpoint.load_talker_checkpoint consumes, reference
    Qwen3Talker.swift:117-137)."""
    import numpy as np

    out = {}

    def put_linear(prefix, entry):
        if "wq" in entry:
            out[f"{prefix}.weight"] = np.asarray(entry["wq"])
            out[f"{prefix}.scales"] = np.asarray(entry["scales"])
            if "biases" in entry:
                out[f"{prefix}.biases"] = np.asarray(entry["biases"])
        else:
            out[f"{prefix}.weight"] = np.asarray(entry["w"])
        if "b" in entry:
            out[f"{prefix}.bias"] = np.asarray(entry["b"])

    t = "talker.model"
    out[f"{t}.text_embedding.weight"] = np.asarray(params["text_embedding"]["w"])
    out[f"{t}.codec_embedding.weight"] = np.asarray(params["codec_embedding"]["w"])
    put_linear(f"{t}.text_projection.linear_fc1", params["text_projection"]["fc1"])
    put_linear(f"{t}.text_projection.linear_fc2", params["text_projection"]["fc2"])
    put_linear(f"{t}.codec_head", params["codec_head"])
    out[f"{t}.norm.weight"] = np.asarray(params["norm"]["w"])

    lp = params["layers"]
    for i in range(config.num_hidden_layers):
        p = f"{t}.layers.{i}"
        out[f"{p}.input_layernorm.weight"] = np.asarray(lp["input_layernorm"]["w"][i])
        out[f"{p}.post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"]["w"][i]
        )
        out[f"{p}.self_attn.q_norm.weight"] = np.asarray(lp["q_norm"]["w"][i])
        out[f"{p}.self_attn.k_norm.weight"] = np.asarray(lp["k_norm"]["w"][i])
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            put_linear(
                f"{p}.self_attn.{name}",
                {k: v[i] for k, v in lp[name].items()},
            )
        for name in ("gate_proj", "up_proj", "down_proj"):
            put_linear(f"{p}.mlp.{name}", {k: v[i] for k, v in lp[name].items()})

    c = "talker.code_predictor.model"
    cp_cfg = config.code_predictor_config
    ng = cp_cfg.num_code_groups - 1
    for i in range(ng):
        out[f"{c}.codec_embedding.{i}.weight"] = np.asarray(
            cp_params["codec_embedding"]["w"][i]
        )
        out[f"{c}.lm_head.{i}.weight"] = np.asarray(cp_params["lm_head"]["w"][i])
    out[f"{c}.norm.weight"] = np.asarray(cp_params["norm"]["w"])
    if "small_to_mtp_projection" in cp_params:
        put_linear(f"{c}.small_to_mtp_projection", cp_params["small_to_mtp_projection"])
    clp = cp_params["layers"]
    for i in range(cp_cfg.num_hidden_layers):
        p = f"{c}.layers.{i}"
        out[f"{p}.input_layernorm.weight"] = np.asarray(clp["input_layernorm"]["w"][i])
        out[f"{p}.post_attention_layernorm.weight"] = np.asarray(
            clp["post_attention_layernorm"]["w"][i]
        )
        out[f"{p}.self_attn.q_norm.weight"] = np.asarray(clp["q_norm"]["w"][i])
        out[f"{p}.self_attn.k_norm.weight"] = np.asarray(clp["k_norm"]["w"][i])
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            put_linear(
                f"{p}.self_attn.{name}", {k: v[i] for k, v in clp[name].items()}
            )
        for name in ("gate_proj", "up_proj", "down_proj"):
            put_linear(f"{p}.mlp.{name}", {k: v[i] for k, v in clp[name].items()})
    return out


def export_vocoder_checkpoint(params, cfg) -> dict:
    """Serialize a vocoder param tree into reference-format keys with torch
    conv layouts and RVQ EMA stats (the layout
    io.checkpoint.load_vocoder_checkpoint consumes, reference
    AudioDecoder.swift:196-305)."""
    import numpy as np

    out = {}

    def conv_torch(entry):
        return np.ascontiguousarray(np.asarray(entry["w"]).transpose(2, 1, 0))

    def tconv_torch(entry):
        w = np.asarray(entry["w"])  # flipped HIO [K, Cin, Cout]
        return np.ascontiguousarray(w.transpose(1, 2, 0)[:, :, ::-1])

    def put_conv(prefix, entry, transpose=False):
        out[f"{prefix}.weight"] = tconv_torch(entry) if transpose else conv_torch(entry)
        if "b" in entry:
            out[f"{prefix}.bias"] = np.asarray(entry["b"])

    def put_linear(prefix, entry):
        out[f"{prefix}.weight"] = np.asarray(entry["w"])
        if "b" in entry:
            out[f"{prefix}.bias"] = np.asarray(entry["b"])

    def put_snake(prefix, entry):
        out[f"{prefix}.alpha"] = np.asarray(entry["alpha"])
        out[f"{prefix}.beta"] = np.asarray(entry["beta"])

    pre = "decoder"  # top-level "decoder." prefix, stripped at load
    q = params["quantizer"]
    for half, base in (("semantic", "rvq_first"), ("acoustic", "rvq_rest")):
        cbs = np.asarray(q[half]["codebooks"])
        for i in range(cbs.shape[0]):
            b = f"{pre}.quantizer.{base}.vq.layers.{i}._codebook"
            out[f"{b}.cluster_usage"] = np.ones((cbs.shape[1],), np.float32)
            out[f"{b}.embedding_sum"] = cbs[i]
        out[f"{pre}.quantizer.{base}.output_proj.weight"] = np.asarray(
            q[half]["out_proj"]["w"]
        )[:, :, None]

    put_conv(f"{pre}.pre_conv.conv", params["pre_conv"])

    pt = params["pre_transformer"]
    put_linear(f"{pre}.pre_transformer.input_proj", pt["input_proj"])
    put_linear(f"{pre}.pre_transformer.output_proj", pt["output_proj"])
    out[f"{pre}.pre_transformer.norm.weight"] = np.asarray(pt["norm"]["w"])
    nl = np.asarray(pt["layers"]["input_layernorm"]["w"]).shape[0]
    for i in range(nl):
        p = f"{pre}.pre_transformer.layers.{i}"
        L = pt["layers"]
        out[f"{p}.input_layernorm.weight"] = np.asarray(L["input_layernorm"]["w"][i])
        out[f"{p}.post_attention_layernorm.weight"] = np.asarray(
            L["post_attention_layernorm"]["w"][i]
        )
        out[f"{p}.self_attn_layer_scale.scale"] = np.asarray(
            L["self_attn_layer_scale"]["w"][i]
        )
        out[f"{p}.mlp_layer_scale.scale"] = np.asarray(L["mlp_layer_scale"]["w"][i])
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            put_linear(f"{p}.self_attn.{name}", {k: v[i] for k, v in L[name].items()})
        for name in ("gate_proj", "up_proj", "down_proj"):
            put_linear(f"{p}.mlp.{name}", {k: v[i] for k, v in L[name].items()})

    for i, stage in enumerate(params["upsample"]):
        put_conv(f"{pre}.upsample.{i}.0.conv", stage["tconv"], transpose=True)
        cn = stage["convnext"]
        put_conv(f"{pre}.upsample.{i}.1.dwconv.conv", cn["dwconv"])
        out[f"{pre}.upsample.{i}.1.norm.weight"] = np.asarray(cn["norm"]["w"])
        out[f"{pre}.upsample.{i}.1.norm.bias"] = np.asarray(cn["norm"]["b"])
        put_linear(f"{pre}.upsample.{i}.1.pwconv1", cn["pwconv1"])
        put_linear(f"{pre}.upsample.{i}.1.pwconv2", cn["pwconv2"])
        out[f"{pre}.upsample.{i}.1.gamma"] = np.asarray(cn["gamma"])

    dec = params["decoder"]
    put_conv(f"{pre}.decoder.0.conv", dec["initial_conv"])
    for i, block in enumerate(dec["blocks"]):
        p = f"{pre}.decoder.{i + 1}.block"
        put_snake(f"{p}.0", block["snake"])
        put_conv(f"{p}.1.conv", block["up"], transpose=True)
        for j, unit in enumerate(block["units"]):
            u = f"{p}.{j + 2}"
            put_snake(f"{u}.act1", unit["act1"])
            put_conv(f"{u}.conv1.conv", unit["conv1"])
            put_snake(f"{u}.act2", unit["act2"])
            put_conv(f"{u}.conv2.conv", unit["conv2"])
    n_blocks = len(dec["blocks"])
    put_snake(f"{pre}.decoder.{n_blocks + 1}", dec["out_snake"])
    put_conv(f"{pre}.decoder.{n_blocks + 2}.conv", dec["out_conv"])
    return out
