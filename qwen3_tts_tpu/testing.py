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
