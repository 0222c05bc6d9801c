"""TTS prompt assembly in embedding space.

Reproduces the reference prompt layout exactly
(reference Qwen3Talker.swift:344-433, identical logic in generateStream
:655-744):

  [instruct? | ICL(ref text + ref semantic codes)?] ⧺ role(3 text tokens) ⧺
  [tts_pad × padCount, tts_bos] + codecEmbed[:-1]   (elementwise sum) ⧺
  (text token 3 + codec_bos embed)

with trailing text hidden = proj(embed(text tokens 4..N-6)) ⧺ tts_eos — fed
one embed per decode step.

Runs eagerly (a handful of embedding lookups + the 2-layer text projection,
once per utterance); the result is padded to a static bucket before entering
the jitted prefill.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..config import Qwen3TTSConfig
from . import talker as talker_mod

MIN_PROMPT_TOKENS = 9


@dataclass
class PromptData:
    input_embeds: jnp.ndarray      # [1, P, H]
    trailing_hidden: jnp.ndarray   # [1, T, H]
    tts_pad_embed: jnp.ndarray     # [1, 1, H]


def assemble_prompt(
    params: dict,
    config: Qwen3TTSConfig,
    tokenizer,
    text: str,
    speaker: str = "",
    instruct: str | None = None,
    speaker_embedding: np.ndarray | None = None,
    reference_transcript: str | None = None,
    reference_audio_codes: list[list[int]] | None = None,
) -> PromptData | None:
    """Build prompt embeddings; returns None when the text is too short
    (< 9 tokens, reference Qwen3Talker.swift:348-352)."""
    use_icl = (
        reference_audio_codes is not None
        and reference_transcript is not None
        and len(reference_transcript) > 0
    )
    speaker_name = speaker.lower()
    speaker_id = config.spk_id.get(speaker_name)

    chat_text = f"<|im_start|>assistant\n{text}<|im_end|>\n<|im_start|>assistant\n"
    ids = np.asarray(tokenizer.encode(chat_text), dtype=np.int32)
    n = len(ids)
    if n < MIN_PROMPT_TOKENS:
        return None
    ids_j = jnp.asarray(ids)

    tts_tokens = jnp.asarray(
        [config.tts_bos_token_id, config.tts_eos_token_id, config.tts_pad_token_id],
        jnp.int32,
    )
    tts_embeds = talker_mod.encode_text(params, tts_tokens)[None]  # [1, 3, H]
    tts_bos = tts_embeds[:, 0:1]
    tts_eos = tts_embeds[:, 1:2]
    tts_pad = tts_embeds[:, 2:3]

    codec_prefill = jnp.asarray(
        [config.codec_nothink_id, config.codec_think_bos_id, config.codec_think_eos_id],
        jnp.int32,
    )
    codec_embed = talker_mod.encode_audio(params, codec_prefill)[None]  # [1, 3, H]
    codec_suffix = talker_mod.encode_audio(
        params, jnp.asarray([config.codec_pad_id, config.codec_bos_id], jnp.int32)
    )[None]

    if speaker_id is not None:
        spk = talker_mod.encode_audio(
            params, jnp.asarray([speaker_id], jnp.int32)
        )[None]
        codec_embed = jnp.concatenate([codec_embed, spk, codec_suffix], axis=1)
    elif speaker_embedding is not None:
        spk = jnp.asarray(speaker_embedding).reshape(1, 1, -1).astype(codec_embed.dtype)
        if spk.shape[-1] != codec_embed.shape[-1]:
            raise ValueError(
                f"speaker_embedding dim {spk.shape[-1]} != talker hidden "
                f"{codec_embed.shape[-1]}; the embedding joins the codec "
                "stream unprojected (reference Qwen3Talker.swift:370-379)"
            )
        codec_embed = jnp.concatenate([codec_embed, spk, codec_suffix], axis=1)
    else:
        codec_embed = jnp.concatenate([codec_embed, codec_suffix], axis=1)

    role_embed = talker_mod.encode_text(params, ids_j[0:3])[None]

    pad_count = codec_embed.shape[1] - 2
    pad_embeds = jnp.tile(tts_pad, (1, pad_count, 1))
    combined = jnp.concatenate([pad_embeds, tts_bos], axis=1)
    combined = combined + codec_embed[:, : codec_embed.shape[1] - 1]

    instruct_embed = None
    if instruct:
        formatted = f"<|im_start|>user\n{instruct}<|im_end|>\n"
        inst_ids = jnp.asarray(tokenizer.encode(formatted), jnp.int32)
        instruct_embed = talker_mod.encode_text(params, inst_ids)[None]
    elif use_icl:
        ref_text = f"<|im_start|>user\n{reference_transcript}<|im_end|>\n"
        ref_ids = jnp.asarray(tokenizer.encode(ref_text), jnp.int32)
        ref_text_embed = talker_mod.encode_text(params, ref_ids)[None]
        # Only the first (semantic) codebook row conditions generation
        # (reference Qwen3Talker.swift:401-404).
        sem = reference_audio_codes[0] if reference_audio_codes else []
        if len(sem) > 0:
            sem_codes = jnp.asarray(sem, jnp.int32)
            ref_audio_embed = talker_mod.encode_audio(params, sem_codes)[None]
            instruct_embed = jnp.concatenate([ref_text_embed, ref_audio_embed], axis=1)
        else:
            instruct_embed = ref_text_embed
    elif speaker and speaker_id is None and speaker_embedding is None:
        # Backward compat: treat the speaker string as an instruct
        # (reference Qwen3Talker.swift:408-414).
        formatted = f"<|im_start|>user\n{speaker}<|im_end|>\n"
        inst_ids = jnp.asarray(tokenizer.encode(formatted), jnp.int32)
        instruct_embed = talker_mod.encode_text(params, inst_ids)[None]

    if instruct_embed is not None:
        input_embeds = jnp.concatenate([instruct_embed, role_embed, combined], axis=1)
    else:
        input_embeds = jnp.concatenate([role_embed, combined], axis=1)

    first_text = talker_mod.encode_text(params, ids_j[3:4])[None] + codec_embed[:, -1:]
    input_embeds = jnp.concatenate([input_embeds, first_text], axis=1)

    trailing_len = n - 4 - 5
    if trailing_len > 0:
        trailing = talker_mod.encode_text(params, ids_j[4 : n - 5])[None]
        trailing_hidden = jnp.concatenate([trailing, tts_eos], axis=1)
    else:
        trailing_hidden = tts_eos

    return PromptData(
        input_embeds=input_embeds,
        trailing_hidden=trailing_hidden,
        tts_pad_embed=tts_pad,
    )
