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

import functools
from dataclasses import dataclass

import jax
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
    # set by assemble_prompt_padded: the arrays above are bucket-padded and
    # these carry the real lengths (None = arrays are exact-length)
    p: int | None = None
    t: int | None = None


def pd_lengths(pd: PromptData) -> tuple[int, int]:
    """(prompt, trailing) token counts, padded- and exact-length alike."""
    p = pd.p if pd.p is not None else int(pd.input_embeds.shape[1])
    t = pd.t if pd.t is not None else int(pd.trailing_hidden.shape[1])
    return p, t


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


# ---------------------------------------------------------------------------
# Jitted bucket-padded assembly (serving fast path)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("pb", "tb", "has_speaker", "ids_len")
)
def _assemble_padded_jit(
    params: dict,
    ids_pad: jax.Array,   # [ids_len] int32, zero-padded past n
    n: jax.Array,         # int32 true token count
    codec_ids: jax.Array, # [5 or 6] int32 codec prefix(+speaker)+suffix ids
    tts_ids: jax.Array,   # [3] int32 (tts_bos, tts_eos, tts_pad)
    *,
    pb: int,
    tb: int,
    has_speaker: bool,
    ids_len: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One-dispatch equivalent of assemble_prompt's speaker/plain path,
    producing BUCKET-PADDED (input_embeds [1, pb, H], trailing [1, tb, H],
    tts_pad [1, 1, H]). Row values are identical to the eager path (same
    gathers, same projection applied row-wise) — the service pads to these
    buckets anyway, so serving parity is unchanged while a submit() costs
    one dispatch instead of ~40 eager ops (the dominant share of the
    r4-measured 1157 ms burst TTFA through a tunneled host)."""
    del has_speaker, ids_len  # encoded in codec_ids / ids_pad shapes
    # Shape-match the eager path's encode_text calls exactly: XLA lowers an
    # M=1 projection to a GEMV whose accumulation order differs from a GEMM
    # row, so slicing one row out of a big batched projection is NOT
    # bit-identical to eager's per-piece calls (measured ~1e-5 — enough to
    # flip a near-tie greedy argmax). Four calls of eager's own shapes keep
    # rows bitwise equal while still costing one dispatch total.
    tts3 = talker_mod.encode_text(params, tts_ids)[None]        # [1, 3, H]
    tts_bos = tts3[:, 0:1]
    tts_eos = tts3[:, 1:2]
    tts_pad = tts3[:, 2:3]
    role = talker_mod.encode_text(params, ids_pad[0:3])[None]   # [1, 3, H]
    first = talker_mod.encode_text(params, ids_pad[3:4])[None]  # [1, 1, H]
    tr_rows = talker_mod.encode_text(params, ids_pad[4:4 + tb])[None]

    codec_embed = talker_mod.encode_audio(params, codec_ids)[None]
    clen = codec_embed.shape[1]

    pad_count = clen - 2
    combined = jnp.concatenate(
        [jnp.tile(tts_pad, (1, pad_count, 1)), tts_bos], axis=1
    ) + codec_embed[:, : clen - 1]
    first_text = first + codec_embed[:, -1:]
    prefix = jnp.concatenate([role, combined, first_text], axis=1)
    p = prefix.shape[1]  # static: 3 + (clen - 1) + 1
    h = prefix.shape[2]
    input_embeds = jnp.zeros((1, pb, h), prefix.dtype).at[:, :p].set(prefix)

    # trailing: tokens 4..n-6 (t_text = n - 9 of them), then tts_eos
    t_text = jnp.maximum(n - 9, 0)
    mask = (jnp.arange(tb) < t_text)[None, :, None]
    trailing = jnp.where(mask, tr_rows, jnp.zeros_like(tr_rows))
    trailing = jax.lax.dynamic_update_slice(
        trailing, tts_eos.astype(trailing.dtype), (0, t_text, 0)
    )
    return input_embeds, trailing, tts_pad


def assemble_prompt_padded(
    params: dict,
    config: Qwen3TTSConfig,
    tokenizer,
    text: str,
    *,
    prompt_bucket: int,
    trailing_bucket: int,
    speaker: str = "",
    **kwargs,
) -> PromptData | None:
    """Bucket-padded prompt assembly for the serving submit path.

    The named-speaker / plain path runs as ONE jitted dispatch
    (_assemble_padded_jit); instruct / ICL / speaker-embedding / freeform-
    speaker requests fall back to the eager assemble_prompt (then pad),
    preserving behavior exactly. Returns PromptData with .p/.t set, or None
    for too-short text. Prompts that exceed the buckets also fall back to
    the eager path so the caller's own bucket check raises its usual error."""
    speaker_id = config.spk_id.get(speaker.lower())
    has_extras = any(
        kwargs.get(k) is not None
        for k in (
            "instruct", "speaker_embedding", "reference_transcript",
            "reference_audio_codes",
        )
    )
    # fast path = the named-speaker / plain prompt layout ONLY: any extra
    # conditioning (instruct/ICL/embedding) or freeform speaker string goes
    # through the eager reference-layout builder
    fast = not has_extras and (speaker_id is not None or not speaker)
    if not fast:
        pd = assemble_prompt(
            params, config, tokenizer, text, speaker=speaker, **kwargs
        )
        return _pad_prompt_data(pd, prompt_bucket, trailing_bucket)

    chat_text = (
        f"<|im_start|>assistant\n{text}<|im_end|>\n<|im_start|>assistant\n"
    )
    ids = np.asarray(tokenizer.encode(chat_text), dtype=np.int32)
    n = len(ids)
    if n < MIN_PROMPT_TOKENS:
        return None
    has_speaker = speaker_id is not None
    p = 3 + (6 if has_speaker else 5) - 1 + 1
    t = max(n - 9, 0) + 1
    if p > prompt_bucket or t > trailing_bucket:
        # over-bucket: eager path, exact lengths — the caller's bucket
        # check reports the real numbers
        pd = assemble_prompt(
            params, config, tokenizer, text, speaker=speaker, **kwargs
        )
        return _pad_prompt_data(pd, prompt_bucket, trailing_bucket)

    ids_len = trailing_bucket + 16
    ids_pad = np.zeros((ids_len,), np.int32)
    ids_pad[: min(n, ids_len)] = ids[:ids_len]
    codec = [
        config.codec_nothink_id, config.codec_think_bos_id,
        config.codec_think_eos_id,
    ]
    if has_speaker:
        codec.append(speaker_id)
    codec += [config.codec_pad_id, config.codec_bos_id]
    tts_ids = np.asarray(
        [config.tts_bos_token_id, config.tts_eos_token_id,
         config.tts_pad_token_id], np.int32,
    )
    embeds, trailing, tts_pad = _assemble_padded_jit(
        params, jnp.asarray(ids_pad), jnp.int32(n), jnp.asarray(codec),
        jnp.asarray(tts_ids), pb=prompt_bucket, tb=trailing_bucket,
        has_speaker=has_speaker, ids_len=ids_len,
    )
    return PromptData(
        input_embeds=embeds, trailing_hidden=trailing,
        tts_pad_embed=tts_pad, p=p, t=t,
    )


def _pad_prompt_data(
    pd: PromptData | None, pb: int, tb: int
) -> PromptData | None:
    """Pad an exact-length PromptData to the serving buckets (no-op when it
    doesn't fit — the caller's bucket check owns that error)."""
    if pd is None:
        return None
    p = int(pd.input_embeds.shape[1])
    t = int(pd.trailing_hidden.shape[1])
    if p > pb or t > tb:
        return pd
    h = pd.input_embeds.shape[2]
    e = jnp.zeros((1, pb, h), pd.input_embeds.dtype)
    e = e.at[:, :p].set(pd.input_embeds)
    tr = jnp.zeros((1, tb, h), pd.trailing_hidden.dtype)
    tr = tr.at[:, :t].set(pd.trailing_hidden)
    return PromptData(
        input_embeds=e, trailing_hidden=tr, tts_pad_embed=pd.tts_pad_embed,
        p=p, t=t,
    )
