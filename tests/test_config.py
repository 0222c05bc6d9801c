"""Config decoding tests (mirrors reference ConfigTests.swift coverage)."""

import json

from qwen3_tts_tpu.config import (
    Qwen3TTSConfig,
    QuantizationSettings,
    SpeechTokenizerConfig,
)

FLAT = {
    "hidden_size": 1024,
    "num_hidden_layers": 28,
    "vocab_size": 3072,
    "text_vocab_size": 151936,
    "num_attention_heads": 16,
    "intermediate_size": 3072,
    "rms_norm_eps": 1e-6,
    "max_position_embeddings": 32768,
    "rope_theta": 1000000.0,
}


def test_standard_defaults():
    cfg = Qwen3TTSConfig.standard()
    assert cfg.hidden_size == 1024
    assert cfg.num_hidden_layers == 28
    assert cfg.vocab_size == 3072
    assert cfg.text_vocab_size == 151936
    assert cfg.text_hidden_size == 2048
    assert cfg.tts_bos_token_id == 151672
    assert cfg.codec_eos_token_id == 2150
    assert cfg.spk_id["aiden"] == 2861
    assert cfg.code_predictor_config.num_code_groups == 16
    assert cfg.code_predictor_config.hidden_size == 1024


def test_flat_decode():
    cfg = Qwen3TTSConfig.from_json(json.dumps(FLAT))
    assert cfg.hidden_size == 1024
    assert cfg.num_key_value_heads == 8  # default
    assert cfg.head_dim == 128  # default
    assert cfg.mrope_section is None
    assert cfg.tts_model_type is None


def test_nested_talker_config():
    nested = {"talker_config": dict(FLAT), "tts_model_type": "voice_design"}
    nested["talker_config"]["rope_scaling"] = {
        "mrope_section": [24, 20, 20],
        "interleaved": True,
    }
    nested["talker_config"]["spk_id"] = {"aiden": 2861}
    cfg = Qwen3TTSConfig.from_json(json.dumps(nested))
    assert cfg.hidden_size == 1024
    assert cfg.mrope_section == (24, 20, 20)
    assert cfg.tts_model_type == "voice_design"
    assert cfg.spk_id == {"aiden": 2861}


def test_quantization_config():
    d = dict(FLAT)
    d["quantization"] = {"group_size": 64, "bits": 4}
    cfg = Qwen3TTSConfig.from_json(json.dumps(d))
    assert cfg.quantization is not None
    assert cfg.quantization.enabled
    assert cfg.quantization.bits == 4
    assert cfg.quantization_settings.bits == 4

    # quantization_config preferred over quantization
    d["quantization_config"] = {"group_size": 32, "bits": 8}
    cfg = Qwen3TTSConfig.from_json(json.dumps(d))
    assert cfg.quantization_settings.bits == 8
    assert cfg.quantization_settings.group_size == 32


def test_quantization_settings_from_dict():
    assert not QuantizationSettings.from_dict(None).enabled
    assert not QuantizationSettings.from_dict({"group_size": 64}).enabled
    qs = QuantizationSettings.from_dict({"bits": 6})
    assert qs.enabled and qs.bits == 6 and qs.group_size == 64


def test_speech_tokenizer_config():
    raw = {
        "decoder_config": {
            "latent_dim": 1024,
            "upsample_rates": [8, 5, 4, 3],
            "upsampling_ratios": [2, 2],
        },
        "input_sample_rate": 24000,
    }
    cfg = SpeechTokenizerConfig.from_json(json.dumps(raw))
    assert cfg.decoder_config.latent_dim == 1024
    assert cfg.decoder_config.total_upsample == 1920
    assert cfg.encoder_valid_num_quantizers == 16
    assert cfg.encoder_config is None


def test_hashable_for_jit():
    cfg = Qwen3TTSConfig.standard()
    assert hash(cfg) == hash(Qwen3TTSConfig.standard())
