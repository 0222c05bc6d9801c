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

    def put_layer(prefix, lp, i, nq_hd, nkv_hd, inter):
        out[f"{prefix}.input_layernorm.weight"] = np.asarray(lp["input_layernorm"]["w"][i])
        out[f"{prefix}.post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"]["w"][i]
        )
        out[f"{prefix}.self_attn.q_norm.weight"] = np.asarray(lp["q_norm"]["w"][i])
        out[f"{prefix}.self_attn.k_norm.weight"] = np.asarray(lp["k_norm"]["w"][i])
        # fused qkv/gateup are stored separately in reference checkpoints
        qkv = {k: v[i] for k, v in lp["qkv_proj"].items()}
        splits = (nq_hd, nq_hd + nkv_hd)
        put_linear(f"{prefix}.self_attn.q_proj", {k: v[: splits[0]] for k, v in qkv.items()})
        put_linear(f"{prefix}.self_attn.k_proj", {k: v[splits[0]: splits[1]] for k, v in qkv.items()})
        put_linear(f"{prefix}.self_attn.v_proj", {k: v[splits[1]:] for k, v in qkv.items()})
        put_linear(f"{prefix}.self_attn.o_proj", {k: v[i] for k, v in lp["o_proj"].items()})
        gu = {k: v[i] for k, v in lp["gateup_proj"].items()}
        put_linear(f"{prefix}.mlp.gate_proj", {k: v[:inter] for k, v in gu.items()})
        put_linear(f"{prefix}.mlp.up_proj", {k: v[inter:] for k, v in gu.items()})
        put_linear(f"{prefix}.mlp.down_proj", {k: v[i] for k, v in lp["down_proj"].items()})

    lp = params["layers"]
    for i in range(config.num_hidden_layers):
        put_layer(
            f"{t}.layers.{i}", lp, i,
            config.num_attention_heads * config.head_dim,
            config.num_key_value_heads * config.head_dim,
            config.intermediate_size,
        )

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
        put_layer(
            f"{c}.layers.{i}", clp, i,
            cp_cfg.num_attention_heads * cp_cfg.head_dim,
            cp_cfg.num_key_value_heads * cp_cfg.head_dim,
            cp_cfg.intermediate_size,
        )
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


# ---------------------------------------------------------------------------
# On-disk tiny model directory (pipeline tests)
# ---------------------------------------------------------------------------


def make_tiny_tokenizer_json() -> dict:
    """A loadable tokenizer.json: byte-fallback vocab + chat specials."""
    vocab = {"<0x%02X>" % b: b for b in range(256)}
    vocab["Ġ"] = 256  # Ġ
    vocab["Ċ"] = 257  # Ċ
    for i, ch in enumerate(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,!?'\";:-"
    ):
        vocab[ch] = 258 + i
    added = [
        {"content": "<|im_start|>", "id": 400, "special": True},
        {"content": "<|im_end|>", "id": 401, "special": True},
    ]
    return {
        "model": {"vocab": vocab, "merges": []},
        "added_tokens": added,
    }


def config_to_json_dict(cfg: Qwen3TTSConfig) -> dict:
    """Serialize a talker config into the flat config.json layout the loader
    consumes (reference Qwen3Config.swift:208-253)."""
    d = {
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "vocab_size": cfg.vocab_size,
        "text_vocab_size": cfg.text_vocab_size,
        "text_hidden_size": cfg.text_hidden_size,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.head_dim,
        "intermediate_size": cfg.intermediate_size,
        "rms_norm_eps": cfg.rms_norm_eps,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rope_theta": cfg.rope_theta,
        "tts_bos_token_id": cfg.tts_bos_token_id,
        "tts_eos_token_id": cfg.tts_eos_token_id,
        "tts_pad_token_id": cfg.tts_pad_token_id,
        "codec_bos_id": cfg.codec_bos_id,
        "codec_eos_token_id": cfg.codec_eos_token_id,
        "codec_pad_id": cfg.codec_pad_id,
        "codec_nothink_id": cfg.codec_nothink_id,
        "codec_think_bos_id": cfg.codec_think_bos_id,
        "codec_think_eos_id": cfg.codec_think_eos_id,
        "spk_id": cfg.spk_id,
        "code_predictor_config": {
            "hidden_size": cfg.code_predictor_config.hidden_size,
            "num_hidden_layers": cfg.code_predictor_config.num_hidden_layers,
            "num_attention_heads": cfg.code_predictor_config.num_attention_heads,
            "num_key_value_heads": cfg.code_predictor_config.num_key_value_heads,
            "head_dim": cfg.code_predictor_config.head_dim,
            "intermediate_size": cfg.code_predictor_config.intermediate_size,
            "rms_norm_eps": cfg.code_predictor_config.rms_norm_eps,
            "rope_theta": cfg.code_predictor_config.rope_theta,
            "vocab_size": cfg.code_predictor_config.vocab_size,
            "num_code_groups": cfg.code_predictor_config.num_code_groups,
        },
    }
    if cfg.mrope_section is not None:
        d["rope_scaling"] = {"mrope_section": list(cfg.mrope_section)}
    if cfg.tts_model_type is not None:
        d["tts_model_type"] = cfg.tts_model_type
    return d


def decoder_config_to_json_dict(dec) -> dict:
    import dataclasses as _dc

    return {k: (list(v) if isinstance(v, tuple) else v)
            for k, v in _dc.asdict(dec).items()}


def write_tiny_model_dir(
    path,
    seed: int = 0,
    tts_model_type: str | None = None,
    with_encoders: bool = False,
):
    """Write a complete loadable tiny model directory (config.json,
    model.safetensors, tokenizer.json, speech_tokenizer/) and return
    (config, talker_params, cp_params, decoder_config, vocoder_params).
    With with_encoders=True, speaker-encoder weights go into the main file and
    audio-encoder weights + encoder_config into the speech_tokenizer file
    (the layouts the pipeline probes for, Qwen3TTSPipeline.swift:156-170,
    211-218)."""
    import dataclasses as _dc
    import json as _json
    import os as _os

    from .io import safetensors_io
    from .models import code_predictor as cp_mod
    from .models import talker as talker_mod
    from .models import vocoder as voc_mod

    path = _os.fspath(path)
    _os.makedirs(_os.path.join(path, "speech_tokenizer"), exist_ok=True)

    cfg = tiny_talker_config(
        tts_model_type=tts_model_type,
        # fixture tokenizer ids stay < 512; specials 400/401
        text_vocab_size=4096,
    )
    params = talker_mod.init_talker_params(cfg, jax.random.PRNGKey(seed))
    cp_params = cp_mod.init_cp_params(
        cfg.code_predictor_config, cfg.hidden_size, jax.random.PRNGKey(seed + 1)
    )
    with open(_os.path.join(path, "config.json"), "w") as f:
        _json.dump(config_to_json_dict(cfg), f)
    main_weights = export_talker_checkpoint(params, cp_params, cfg)
    if with_encoders:
        from .models import speaker_encoder as spk_mod

        spk_cfg = tiny_speaker_config()
        spk_params = spk_mod.init_speaker_encoder_params(
            spk_cfg, jax.random.PRNGKey(seed + 3)
        )
        main_weights.update(export_speaker_encoder_checkpoint(spk_params))
    safetensors_io.save_file(main_weights, _os.path.join(path, "model.safetensors"))
    with open(_os.path.join(path, "tokenizer.json"), "w") as f:
        _json.dump(make_tiny_tokenizer_json(), f)

    dec = tiny_decoder_config(codebook_size=cfg.code_predictor_config.vocab_size)
    voc_params = voc_mod.init_vocoder_params(dec, jax.random.PRNGKey(seed + 2))
    st_cfg = {
        "decoder_config": decoder_config_to_json_dict(dec),
        "encoder_valid_num_quantizers": 16,
        "input_sample_rate": 24000,
        "output_sample_rate": 24000,
        "decode_upsample_rate": dec.total_upsample,
        "encode_downsample_rate": dec.total_upsample,
    }
    st_weights = export_vocoder_checkpoint(voc_params, dec)
    if with_encoders:
        from .models import audio_encoder as aenc_mod

        enc_cfg = tiny_encoder_config()
        enc_params = aenc_mod.init_audio_encoder_params(
            enc_cfg, jax.random.PRNGKey(seed + 4)
        )
        st_weights.update(export_audio_encoder_checkpoint(enc_params, enc_cfg))
        st_cfg["encoder_config"] = {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in _dc.asdict(enc_cfg).items()
        }
        st_cfg["encoder_valid_num_quantizers"] = enc_cfg.num_quantizers // 2
    with open(_os.path.join(path, "speech_tokenizer", "config.json"), "w") as f:
        _json.dump(st_cfg, f)
    safetensors_io.save_file(
        st_weights, _os.path.join(path, "speech_tokenizer", "model.safetensors")
    )
    return cfg, params, cp_params, dec, voc_params


# ---------------------------------------------------------------------------
# Cloning-encoder fixtures (speaker encoder + audio encoder)
# ---------------------------------------------------------------------------


def tiny_speaker_config():
    from .config import SpeakerEncoderConfig

    # enc_dim must equal the tiny talker's hidden_size (64): the speaker
    # embedding is concatenated directly into the codec-embedding stream with
    # no projection (models/prompt.py, reference Qwen3Talker.swift:370-379),
    # exactly as real checkpoints pair enc_dim=1024 with hidden 1024.
    return SpeakerEncoderConfig(
        enc_dim=64,
        mel_dim=16,
        enc_channels=(16, 16, 16, 16, 48),
        enc_kernel_sizes=(5, 3, 3, 3, 1),
        enc_dilations=(1, 2, 3, 4, 1),
        enc_res2net_scale=8,
        enc_se_channels=8,
        enc_attention_channels=8,
    )


def export_speaker_encoder_checkpoint(params) -> dict:
    """Serialize a speaker-encoder param tree into "speaker_encoder." keys
    with torch conv layouts (reference SpeakerEncoder.load,
    SpeakerEncoder.swift:550-603)."""
    import numpy as np

    out = {}

    def put(prefix, entry):
        out[f"speaker_encoder.{prefix}.weight"] = np.ascontiguousarray(
            np.asarray(entry["w"]).transpose(2, 1, 0)
        )
        out[f"speaker_encoder.{prefix}.bias"] = np.asarray(entry["b"])

    put("blocks.0.conv", params["blocks"][0])
    for i in range(1, 4):
        b = params["blocks"][i]
        put(f"blocks.{i}.tdnn1.conv", b["tdnn1"])
        put(f"blocks.{i}.tdnn2.conv", b["tdnn2"])
        put(f"blocks.{i}.se_block.conv1", b["se_block"]["conv1"])
        put(f"blocks.{i}.se_block.conv2", b["se_block"]["conv2"])
        for j, blk in enumerate(b["res2net_block"]["blocks"]):
            put(f"blocks.{i}.res2net_block.blocks.{j}.conv", blk)
    put("mfa.conv", params["mfa"])
    put("asp.tdnn.conv", params["asp"]["tdnn"])
    put("asp.conv", params["asp"]["conv"])
    put("fc", params["fc"])
    return out


def export_audio_encoder_checkpoint(params, cfg) -> dict:
    """Serialize an audio-encoder param tree into "encoder." keys with torch
    layouts and RVQ EMA stats (reference sanitizeEncoderWeights,
    Qwen3TTSAudioEncoder.swift:579-648)."""
    import numpy as np

    out = {}

    def put_conv(prefix, entry):
        out[f"encoder.{prefix}.weight"] = np.ascontiguousarray(
            np.asarray(entry["w"]).transpose(2, 1, 0)
        )
        if "b" in entry:
            out[f"encoder.{prefix}.bias"] = np.asarray(entry["b"])

    def put_lin(prefix, entry, as_conv=False):
        w = np.asarray(entry["w"])
        out[f"encoder.{prefix}.weight"] = w[:, :, None] if as_conv else w
        if "b" in entry:
            out[f"encoder.{prefix}.bias"] = np.asarray(entry["b"])

    sea = params["seanet"]
    idx = 0
    put_conv(f"encoder.layers.{idx}.conv", sea["initial_conv"])
    idx += 1
    for stage in sea["stages"]:
        for res in stage["resnets"]:
            put_conv(f"encoder.layers.{idx}.block.1.conv", res["conv1"])
            put_conv(f"encoder.layers.{idx}.block.3.conv", res["conv2"])
            idx += 1
        idx += 1  # ELU
        put_conv(f"encoder.layers.{idx}.conv", stage["down"])
        idx += 1
    idx += 1  # final ELU
    put_conv(f"encoder.layers.{idx}.conv", sea["final_conv"])

    for i, lp in enumerate(params["transformer"]["layers"]):
        p = f"encoder_transformer.layers.{i}"
        out[f"encoder.{p}.input_layernorm.weight"] = np.asarray(lp["input_layernorm"]["w"])
        out[f"encoder.{p}.input_layernorm.bias"] = np.asarray(lp["input_layernorm"]["b"])
        out[f"encoder.{p}.post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"]["w"]
        )
        out[f"encoder.{p}.post_attention_layernorm.bias"] = np.asarray(
            lp["post_attention_layernorm"]["b"]
        )
        out[f"encoder.{p}.self_attn_layer_scale.scale"] = np.asarray(
            lp["self_attn_layer_scale"]["w"]
        )
        out[f"encoder.{p}.mlp_layer_scale.scale"] = np.asarray(lp["mlp_layer_scale"]["w"])
        put_lin(f"{p}.self_attn.q_proj", lp["q_proj"])
        put_lin(f"{p}.self_attn.k_proj", lp["k_proj"])
        put_lin(f"{p}.self_attn.v_proj", lp["v_proj"])
        put_lin(f"{p}.self_attn.o_proj", lp["o_proj"])
        put_lin(f"{p}.mlp.fc1", lp["fc1"])
        put_lin(f"{p}.mlp.fc2", lp["fc2"])

    put_conv("downsample.conv.conv", params["downsample"])

    for half, base in (
        ("semantic", "quantizer.semantic_residual_vector_quantizer"),
        ("acoustic", "quantizer.acoustic_residual_vector_quantizer"),
    ):
        q = params["quantizer"][half]
        put_lin(f"{base}.input_proj", q["input_proj"], as_conv=True)
        put_lin(f"{base}.output_proj", q["output_proj"], as_conv=True)
        for i, cb in enumerate(q["codebooks"]):
            cb = np.asarray(cb)
            out[f"encoder.{base}.layers.{i}._codebook.cluster_usage"] = np.ones(
                (cb.shape[0],), np.float32
            )
            out[f"encoder.{base}.layers.{i}._codebook.embedding_sum"] = cb
    return out


# ---------------------------------------------------------------------------
# Host-side (numpy) random params — fast init for benches and driver entries
# (eager jax.random on a tunneled TPU dispatches hundreds of slow device ops)
# ---------------------------------------------------------------------------


class _RandPool:
    """Cheap pseudo-random weights: one real RNG block, tiled with offsets.

    Real per-value RNG on this class of host is ~10M samples/s — minutes for a
    0.6B model. Benchmarks/drivers only need plausible weight statistics, so
    draw one 1M-sample pool and serve every request as offset views of it.
    """

    def __init__(self, seed):
        import numpy as np

        self._rng = np.random.default_rng(seed)
        self._pool = self._rng.standard_normal(1 << 20, dtype=np.float32)
        self._off = 0

    def standard_normal(self, shape, dtype=None):
        import numpy as np

        n = int(np.prod(shape))
        reps = n // len(self._pool) + 2
        self._off = (self._off + 977) % len(self._pool)
        flat = np.tile(self._pool, reps)[self._off : self._off + n]
        return flat.reshape(shape)


def _np_dense(rng, out, inn, bias=False):
    import numpy as np

    p = {"w": rng.standard_normal((out, inn), dtype=np.float32) * np.float32(0.02)}
    if bias:
        p["b"] = np.zeros((out,), np.float32)
    return p


def _np_layer_tree(rng, h, nq, nkv, hd, inter, nl):
    import numpy as np

    def stack(fn):
        e = [fn() for _ in range(nl)]
        return {k: np.stack([x[k] for x in e]) for k in e[0]}

    return {
        "input_layernorm": {"w": np.ones((nl, h), np.float32)},
        "post_attention_layernorm": {"w": np.ones((nl, h), np.float32)},
        "q_norm": {"w": np.ones((nl, hd), np.float32)},
        "k_norm": {"w": np.ones((nl, hd), np.float32)},
        "qkv_proj": stack(lambda: _np_dense(rng, (nq + 2 * nkv) * hd, h)),
        "o_proj": stack(lambda: _np_dense(rng, h, nq * hd)),
        "gateup_proj": stack(lambda: _np_dense(rng, 2 * inter, h)),
        "down_proj": stack(lambda: _np_dense(rng, h, inter)),
    }


def random_host_talker_params(config, seed: int = 0) -> dict:
    """Numpy random talker params with the real (fused) structure (pooled
    pseudo-random values — see _RandPool)."""
    import numpy as np

    rng = _RandPool(seed)
    c = config
    return {
        "text_embedding": {
            "w": rng.standard_normal((c.text_vocab_size, c.text_hidden_size),
                                     dtype=np.float32) * np.float32(0.02)
        },
        "codec_embedding": {
            "w": rng.standard_normal((c.vocab_size, c.hidden_size),
                                     dtype=np.float32) * np.float32(0.02)
        },
        "text_projection": {
            "fc1": _np_dense(rng, c.text_hidden_size, c.text_hidden_size, True),
            "fc2": _np_dense(rng, c.hidden_size, c.text_hidden_size, True),
        },
        "codec_head": _np_dense(rng, c.vocab_size, c.hidden_size),
        "norm": {"w": __import__("numpy").ones((c.hidden_size,), "float32")},
        "layers": _np_layer_tree(
            rng, c.hidden_size, c.num_attention_heads, c.num_key_value_heads,
            c.head_dim, c.intermediate_size, c.num_hidden_layers,
        ),
    }


def random_host_cp_params(config, seed: int = 1) -> dict:
    """Numpy random code-predictor params with the real (fused) structure
    (pooled pseudo-random values — see _RandPool)."""
    import numpy as np

    rng = _RandPool(seed)
    cc = config.code_predictor_config
    ng = cc.num_code_groups - 1
    params = {
        "codec_embedding": {
            "w": rng.standard_normal((ng, cc.vocab_size, config.hidden_size),
                                     dtype=np.float32) * np.float32(0.02)
        },
        "lm_head": {
            "w": rng.standard_normal((ng, cc.vocab_size, cc.hidden_size),
                                     dtype=np.float32) * np.float32(0.02)
        },
        "norm": {"w": np.ones((cc.hidden_size,), np.float32)},
        "layers": _np_layer_tree(
            rng, cc.hidden_size, cc.num_attention_heads, cc.num_key_value_heads,
            cc.head_dim, cc.intermediate_size, cc.num_hidden_layers,
        ),
    }
    if cc.hidden_size != config.hidden_size:
        params["small_to_mtp_projection"] = _np_dense(
            rng, cc.hidden_size, config.hidden_size, bias=True
        )
    return params


def write_golden_model_dir(path, seed: int = 0, group_size: int = 64):
    """Full-fidelity reference-format checkpoint for the convert-and-verify
    harness (io/verify.py): write_tiny_model_dir's layout PLUS every
    real-checkpoint storage quirk at tiny dims —

    - PRE-QUANTIZED uint32 (.weight/.scales/.biases) triples with
      HETEROGENEOUS per-tensor bit widths (the reference loads each module
      independently, so real checkpoints mix widths: Qwen3Talker.swift:141-175)
    - dense keys interleaved where dims are packing-ineligible (mixed storage)
    - a "quantization" block in config.json (keep-packed load path)
    - speaker_encoder.* in the main file, encoder.* + RVQ EMA stats
      (cluster_usage / embedding_sum) in speech_tokenizer/ (already written by
      write_tiny_model_dir with_encoders=True; AudioDecoder.swift:285-302)

    Returns write_tiny_model_dir's tuple (the DENSE source trees, for tests
    that want to cross-check the dequantized load)."""
    import json as _json
    import os as _os

    import numpy as np

    from .io import safetensors_io
    from .ops.quant import quantize_np

    ret = write_tiny_model_dir(path, seed=seed, with_encoders=True)
    main_path = _os.path.join(_os.fspath(path), "model.safetensors")
    mw = safetensors_io.load_file(main_path)

    def eligible(key: str, arr) -> bool:
        return (
            key.startswith("talker.")
            and key.endswith(".weight")
            and getattr(arr, "ndim", 0) == 2
            and "norm" not in key
            and arr.shape[-1] % group_size == 0
        )

    widths = (4, 6, 8)
    out = {}
    i = 0
    for k in sorted(mw):
        a = mw[k]
        if eligible(k, a):
            bits = widths[i % len(widths)]
            i += 1
            if (a.shape[-1] * bits) % 32:
                bits = 4
            packed, scales, biases = quantize_np(
                np.asarray(a, np.float32), bits, group_size
            )
            stem = k[: -len(".weight")]
            out[k] = packed
            out[f"{stem}.scales"] = scales
            out[f"{stem}.biases"] = biases
        else:
            out[k] = a
    safetensors_io.save_file(out, main_path)

    cfg_path = _os.path.join(_os.fspath(path), "config.json")
    with open(cfg_path, "r", encoding="utf-8") as f:
        raw = _json.load(f)
    raw["quantization"] = {"bits": 4, "group_size": group_size}
    with open(cfg_path, "w", encoding="utf-8") as f:
        _json.dump(raw, f)
    return ret


def chisq_gof_pvalue(counts, probs) -> float:
    """Chi-square goodness-of-fit p-value with small-expectation bins merged
    (classic validity rule: expected >= 5 per bin). Shared by the sampled-
    path statistical tests (tests/test_sampling_stats.py) and bench.py's
    on-chip gumbel check so the merge rule cannot drift between them.
    Requires scipy (lazy import; baked into the image)."""
    import numpy as _np
    from scipy import stats as _sps

    counts = _np.asarray(counts, _np.float64)
    exp = _np.asarray(probs, _np.float64) * counts.sum()
    order = _np.argsort(exp)
    counts, exp = counts[order], exp[order]
    while len(exp) > 2 and exp[0] < 5.0:
        exp[1] += exp[0]
        counts[1] += counts[0]
        exp, counts = exp[1:], counts[1:]
    exp *= counts.sum() / exp.sum()  # renormalize away fp drift
    return float(_sps.chisquare(counts, exp).pvalue)
