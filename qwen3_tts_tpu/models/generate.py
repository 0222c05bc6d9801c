"""Jit-compiled autoregressive generation loops for the talker.

This is the TPU-native replacement for the reference's host-driven decode loop
(reference Qwen3Talker.swift:437-577): prefill is one jitted call and decoding
runs in jitted CHUNKS of frames via lax.while_loop — the talker step, code-0
sampling, the 15-step code-predictor sub-loop, repetition-penalty bookkeeping,
EOS / consecutive-pad stopping, the trailing-text schedule, and the
192-token-window trim schedule all execute on device. Codes cross to the host
once per chunk (the reference syncs 16 times per frame).

Static shapes: prompts are padded to length buckets; the KV cache capacity is
bucket + RING_SLACK so the ring never overwrites a live window slot
(pre-trim span <= P + 15, post-trim span <= 192 + 15).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen3TTSConfig
from ..ops.sampling import NEG_INF, sample_token, talker_valid_mask
from . import code_predictor as cp_mod
from . import talker as talker_mod

# Reference decode-window constants (Qwen3Layers.swift:108, Qwen3Talker.swift:556-561)
KV_WINDOW = 192
TRIM_INTERVAL = 15
MAX_CONSECUTIVE_PAD = 6

RING_SLACK = 224  # > KV_WINDOW + TRIM_INTERVAL; keeps ring slots collision-free

PROMPT_BUCKETS = (64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048)
TRAILING_BUCKETS = (32, 64, 128, 256, 512, 1024)


def pick_bucket(n: int, buckets=PROMPT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds largest bucket {buckets[-1]}")


@dataclass(frozen=True)
class GenStatics:
    """Static (hashable) generation parameters for jit."""

    config: Qwen3TTSConfig
    capacity: int
    chunk_steps: int
    track_cp_penalty: bool
    repetition_penalty: float = 1.05
    # Run the kernels' pure-jnp W8A8 mirrors (talker_step_w8a8_ref /
    # predict_frame_w8a8_ref) instead of the pallas_calls — same arithmetic,
    # so greedy codes must match the compiled kernels exactly. Used by the
    # bench's on-chip kernel-parity check; never a production path.
    kernel_mirror: bool = False


def prefill_statics(statics: GenStatics) -> GenStatics:
    """Normalized jit key for the prefill programs: they read only
    (config, capacity), so the decode-side knobs (chunk_steps,
    track_cp_penalty, repetition_penalty) are pinned — one compiled prefill
    per prompt bucket serves generate(), generate_stream(), and the serving
    paths instead of one per knob combination (each a multi-second XLA
    compile)."""
    return GenStatics(
        config=statics.config, capacity=statics.capacity,
        chunk_steps=0, track_cp_penalty=False,
    )  # kernel_mirror pinned to default: prefill never runs the kernels


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------


def prefill(
    params: dict,
    embeds_padded: jax.Array,
    length: jax.Array,
    trailing_padded: jax.Array,
    total_text: jax.Array,
    tts_pad_embed: jax.Array,
    rng: jax.Array,
    statics: GenStatics,
) -> dict:
    """Run the prompt through the talker and build the initial decode state.

    Unjitted wrapper: normalizes `statics` via prefill_statics before
    hitting the jit cache, so the sharing of ONE compiled prefill per
    (config, capacity) holds by construction — a caller passing raw
    decode-side knobs cannot fork the cache into a duplicate 60-300 s TPU
    compile."""
    return _prefill_jit(
        params, embeds_padded, length, trailing_padded, total_text,
        tts_pad_embed, rng, prefill_statics(statics),
    )


@functools.partial(jax.jit, static_argnames=("statics",))
def _prefill_jit(
    params: dict,
    embeds_padded: jax.Array,
    length: jax.Array,
    trailing_padded: jax.Array,
    total_text: jax.Array,
    tts_pad_embed: jax.Array,
    rng: jax.Array,
    statics: GenStatics,
) -> dict:
    cfg = statics.config
    cache = talker_mod.init_kv_cache(
        cfg, statics.capacity, batch=1, dtype=embeds_padded.dtype
    )
    h_last, cache = talker_mod.talker_prefill(
        params, embeds_padded, length, cache, cfg
    )
    logits = talker_mod.codec_head(params, h_last)[0, 0]  # [V] float32

    if "kernel" in params:
        # talker mega-kernel decode path: ring cache in [C, nl*nkv*hd] layout
        # (ops/pallas/talker_megakernel.py)
        from ..ops.pallas.talker_megakernel import cache_to_kernel_layout

        cache = cache_to_kernel_layout(cache, cfg)

    ng = cfg.code_predictor_config.num_code_groups - 1
    cp_vocab = cfg.code_predictor_config.vocab_size
    return {
        "cache": cache,
        "h_last": h_last,
        "logits": logits,
        "total_len": length.astype(jnp.int32),
        "window_start": jnp.int32(0),
        "step": jnp.int32(0),
        "trailing_idx": jnp.int32(0),
        "consecutive_pad": jnp.int32(0),
        "eos": jnp.bool_(False),
        "seen_code0": jnp.zeros((cfg.vocab_size,), jnp.bool_),
        "seen_cp": jnp.zeros((ng, cp_vocab), jnp.bool_),
        "trailing": trailing_padded,
        "total_text": total_text.astype(jnp.int32),
        "tts_pad_embed": tts_pad_embed,
        "rng": rng,
    }


# ---------------------------------------------------------------------------
# Decode chunk
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("statics",), donate_argnames=("state",))
def decode_chunk(
    params: dict,
    cp_params: dict,
    state: dict,
    temperature: jax.Array,
    statics: GenStatics,
) -> tuple[jax.Array, jax.Array, jax.Array, dict]:
    """Generate up to `statics.chunk_steps` frames fully on device.

    Returns (frames [chunk_steps, num_code_groups] int32, count int32,
    eos bool[], state). Frames beyond `count` are zero-filled; eos is returned
    standalone (as well as in state) so prefetching callers can read it after
    state's buffers have been donated to the next chunk. eos is set when
    generation stopped (EOS token or >6 consecutive pads — reference
    Qwen3Talker.swift:485-494).
    """
    cfg = statics.config
    cp_cfg = cfg.code_predictor_config
    ng = cp_cfg.num_code_groups
    chunk = statics.chunk_steps

    eos_id = jnp.int32(cfg.codec_eos_token_id)
    pad_id = jnp.int32(cfg.codec_pad_id)
    # -inf at eos/pad while text remains (reference Qwen3Talker.swift:457-460)
    eos_pad_mask = (
        jnp.zeros((cfg.vocab_size,), jnp.float32)
        .at[cfg.codec_eos_token_id]
        .set(NEG_INF)
        .at[cfg.codec_pad_id]
        .set(NEG_INF)
    )
    # pass the config ids: the reference hardcodes 2148/2150 in its mask
    # (Qwen3Talker.swift:19-33) and would never terminate on a checkpoint
    # with nonstandard ids — here the stop logic and the sampleable set stay
    # consistent by construction (identical behavior at the defaults)
    valid_mask = talker_valid_mask(
        cfg.vocab_size, pad_id=cfg.codec_pad_id, eos_id=cfg.codec_eos_token_id
    )

    def cond(carry):
        state, out, count, i = carry
        return (i < chunk) & jnp.logical_not(state["eos"])

    def body(carry):
        state, out, count, i = carry
        rng, k0, kcp = jax.random.split(state["rng"], 3)
        state = {**state, "rng": rng}

        has_text = state["trailing_idx"] < state["total_text"]
        lg = state["logits"] + jnp.where(has_text, eos_pad_mask, 0.0)
        code0 = sample_token(
            lg, k0, temperature,
            seen_mask=state["seen_code0"],
            repetition_penalty=statics.repetition_penalty,
            valid_mask=valid_mask,
        )

        is_eos = code0 == eos_id
        is_pad = code0 == pad_id
        new_consec = jnp.where(is_pad, state["consecutive_pad"] + 1, 0)
        stop = is_eos | (is_pad & (new_consec > MAX_CONSECUTIVE_PAD))

        def do_stop(operand):
            state, out, count, i = operand
            return ({**state, "eos": jnp.bool_(True)}, out, count, i + 1)

        def do_emit(operand):
            state, out, count, i = operand
            code0_embed = talker_mod.encode_audio(params, code0[None, None])  # [1,1,H]
            codes15, embed_sum, seen_cp = cp_mod.predict_frame(
                cp_params,
                state["h_last"],
                code0_embed,
                kcp,
                temperature,
                state["seen_cp"] if statics.track_cp_penalty else None,
                cp_cfg,
                repetition_penalty=statics.repetition_penalty,
                use_kernel_mirror=statics.kernel_mirror,
            )
            frame = jnp.concatenate([code0[None], codes15])
            out = jax.lax.dynamic_update_slice(out, frame[None], (i, 0))

            seen_code0 = state["seen_code0"].at[code0].set(True)

            # Next input embed: trailing text (or tts_pad) + summed codec embeds
            # (reference Qwen3Talker.swift:531-548)
            t_idx = jnp.minimum(state["trailing_idx"], state["trailing"].shape[1] - 1)
            trailing_embed = jax.lax.dynamic_slice(
                state["trailing"], (0, t_idx, 0), (1, 1, state["trailing"].shape[2])
            )
            has_text_now = state["trailing_idx"] < state["total_text"]
            text_embed = jnp.where(has_text_now, trailing_embed, state["tts_pad_embed"])
            new_trailing_idx = jnp.where(
                has_text_now, state["trailing_idx"] + 1, state["trailing_idx"]
            )

            input_embed = (text_embed + embed_sum).astype(state["h_last"].dtype)
            if "kernel" in params:
                from ..ops.pallas.talker_megakernel import (
                    talker_step_kernel,
                    talker_step_w8a8_ref,
                )

                pos2d = jnp.broadcast_to(
                    state["total_len"][None, None], (1, 1)
                )
                cos, sin = talker_mod._rope_cos_sin(cfg, pos2d)
                step_args = (
                    params["kernel"], input_embed, state["cache"],
                    state["total_len"], state["window_start"],
                    cos[0].astype(jnp.float32), sin[0].astype(jnp.float32),
                    cfg,
                )
                if statics.kernel_mirror:
                    h, logits, cache = talker_step_w8a8_ref(*step_args)
                else:
                    h, logits, cache = talker_step_kernel(
                        *step_args, interpret=jax.default_backend() != "tpu"
                    )
            else:
                h, cache = talker_mod.talker_decode_step(
                    params, input_embed, state["cache"],
                    state["total_len"], state["window_start"], cfg,
                )
                logits = talker_mod.codec_head(params, h)[0, 0]

            total_len = state["total_len"] + 1
            step = state["step"] + 1
            # Trim schedule: every 15 steps clamp window to last 192 tokens
            # (reference Qwen3Talker.swift:556-561)
            window_start = jnp.where(
                step % TRIM_INTERVAL == 0,
                jnp.maximum(state["window_start"], total_len - KV_WINDOW),
                state["window_start"],
            )

            new_state = {
                **state,
                "cache": cache,
                "h_last": h,
                "logits": logits,
                "total_len": total_len,
                "window_start": window_start,
                "step": step,
                "trailing_idx": new_trailing_idx,
                "consecutive_pad": new_consec,
                "seen_code0": seen_code0,
                "seen_cp": seen_cp if statics.track_cp_penalty else state["seen_cp"],
            }
            return (new_state, out, count + 1, i + 1)

        return jax.lax.cond(stop, do_stop, do_emit, (state, out, count, i))

    out0 = jnp.zeros((chunk, ng), jnp.int32)
    state, out, count, _ = jax.lax.while_loop(
        cond, body, (state, out0, jnp.int32(0), jnp.int32(0))
    )
    return out, count, state["eos"], state


# ---------------------------------------------------------------------------
# Host-side orchestration
# ---------------------------------------------------------------------------


def stream_codes(
    params: dict,
    cp_params: dict,
    config: Qwen3TTSConfig,
    prompt_data,
    *,
    temperature: float = 0.9,
    max_tokens: int = 1200,
    chunk_steps: int = 48,
    track_cp_penalty: bool = True,
    repetition_penalty: float = 1.05,
    seed: int = 0,
    initial_state: dict | None = None,
):
    """Generator over raw frame chunks [<=chunk_steps, 16] int32 — the
    streaming producer (reference Qwen3Talker.generateStream,
    Qwen3Talker.swift:633-885). Prefill + each decode chunk are single jitted
    device calls; codes cross to host once per chunk.

    `initial_state`: a prefill() result to resume from instead of prefilling
    here — the caller must have built it from THIS prompt_data with matching
    statics (same buckets / chunk_steps / penalty settings and seed). Used by
    io/verify.py, which checksums prefill activations and then decodes from
    the same state rather than paying the prompt forward pass twice.
    """
    from . import prompt as prompt_mod

    dtype = prompt_data.input_embeds.dtype
    # pd_lengths: bucket-padded PromptData (assemble_prompt_padded) carries
    # its true lengths in .p/.t; exact-length pds report their shapes
    p, t = prompt_mod.pd_lengths(prompt_data)
    p_bucket = max(pick_bucket(p), int(prompt_data.input_embeds.shape[1]))
    t_bucket = max(
        pick_bucket(t, TRAILING_BUCKETS),
        int(prompt_data.trailing_hidden.shape[1]),
    )

    statics = GenStatics(
        config=config,
        capacity=p_bucket + RING_SLACK,
        chunk_steps=chunk_steps,
        track_cp_penalty=track_cp_penalty,
        repetition_penalty=repetition_penalty,
    )

    if initial_state is not None:
        state = initial_state
    else:
        # padded prompt buffers are only needed when prefilling here — a
        # resume from initial_state must not pay the two device allocations;
        # an already-bucket-padded pd passes through untouched
        if prompt_data.input_embeds.shape[1] == p_bucket:
            embeds_padded = prompt_data.input_embeds
        else:
            embeds_padded = jnp.zeros(
                (1, p_bucket, prompt_data.input_embeds.shape[2]), dtype
            )
            embeds_padded = embeds_padded.at[:, :p].set(
                prompt_data.input_embeds[:, :p]
            )
        if prompt_data.trailing_hidden.shape[1] == t_bucket:
            trailing_padded = prompt_data.trailing_hidden
        else:
            trailing_padded = jnp.zeros(
                (1, t_bucket, prompt_data.trailing_hidden.shape[2]), dtype
            )
            trailing_padded = trailing_padded.at[:, :t].set(
                prompt_data.trailing_hidden[:, :t]
            )
        rng = jax.random.PRNGKey(seed)
        state = prefill(
            params,
            embeds_padded,
            jnp.int32(p),
            trailing_padded,
            jnp.int32(t),
            prompt_data.tts_pad_embed,
            rng,
            statics,
        )

    temp = jnp.float32(temperature)
    emitted = 0
    # Depth-1 prefetch: dispatch chunk i+1 (async) before blocking on chunk
    # i's results, so the device never idles across the host round trip. The
    # EOS flag is read from chunk i while i+1 is in flight; at most one
    # speculative chunk runs past EOS and its output is dropped.
    pending = decode_chunk(params, cp_params, state, temp, statics)
    while emitted < max_tokens:
        frames, count, eos, state = pending
        dispatch_next = emitted + statics.chunk_steps < max_tokens
        if dispatch_next:
            pending = decode_chunk(params, cp_params, state, temp, statics)
        count = int(count)  # blocks on chunk i only
        if count > 0:
            chunk_np = np.asarray(frames[:count])
            # Cap at max_tokens (reference loops exactly maxTokens times)
            take = min(count, max_tokens - emitted)
            chunk_np = chunk_np[:take]
            emitted += take
            if len(chunk_np) > 0:
                yield chunk_np
        if bool(eos) or not dispatch_next:
            break


def generate_codes(
    params: dict,
    cp_params: dict,
    config: Qwen3TTSConfig,
    prompt_data,
    *,
    on_chunk=None,
    **kwargs,
) -> np.ndarray:
    """Drive prefill + chunked decode to completion; returns raw frames
    [T, 16] int32 (including pad frames — callers filter code0 < 2048,
    reference Qwen3Talker.swift:571-576). `on_chunk(frames_np)` is called per
    chunk for streaming consumers."""
    all_frames: list[np.ndarray] = []
    for chunk_np in stream_codes(params, cp_params, config, prompt_data, **kwargs):
        all_frames.append(chunk_np)
        if on_chunk is not None:
            on_chunk(chunk_np)
    if not all_frames:
        return np.zeros((0, config.code_predictor_config.num_code_groups), np.int32)
    return np.concatenate(all_frames, axis=0)


def filter_valid_frames(frames: np.ndarray) -> np.ndarray:
    """Keep frames whose code 0 is a real codebook entry
    (reference Qwen3Talker.swift:571-576)."""
    if len(frames) == 0:
        return frames
    mask = (frames[:, 0] >= 0) & (frames[:, 0] < 2048)
    return frames[mask]


# ---------------------------------------------------------------------------
# Batched serving
# ---------------------------------------------------------------------------


def stack_states(states: list[dict], config=None) -> dict:
    """Stack B per-stream decode states on a new leading axis.

    States prefilled with kernel-bearing params carry the mega-kernel ring
    cache layout ("k2"); that layout is converted to the plain k/v layout
    HERE — outside the decode_chunk_batched jit boundary — so the batched
    program sees ONE input signature on every call (converting inside the
    jit would give the first call a k2 pytree and later calls a k/v pytree,
    forcing a second full trace of the large batched-decode program). Pass
    the model config whenever states may carry the kernel layout."""
    out = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    if "k2" in out["cache"]:
        if config is None:
            raise ValueError(
                "states carry the mega-kernel cache layout; pass config= to "
                "stack_states so it converts outside the jit boundary"
            )
        from ..ops.pallas.talker_megakernel import kernel_layout_to_cache

        out = dict(out)
        out["cache"] = jax.vmap(
            lambda c: kernel_layout_to_cache(c, config)
        )(out["cache"])
    return out


@functools.partial(jax.jit, static_argnames=("statics",), donate_argnames=("states",))
def decode_chunk_batched(
    params: dict,
    cp_params: dict,
    states: dict,
    temperature: jax.Array,
    statics: GenStatics,
) -> tuple[jax.Array, jax.Array, jax.Array, dict]:
    """vmap of decode_chunk over B stacked stream states (see stack_states).

    Per-op latency on TPU is nearly flat in the row dimension at these sizes,
    so B concurrent streams decode in roughly the wall time of one — the
    per-chip serving throughput lever (ROADMAP.md). Returns
    (frames [B, chunk, 16], counts [B], eos [B], states).

    The vmapped while_loop runs until every stream's chunk finishes; streams
    that hit EOS early idle inside the loop (their outputs are already
    correct — `cond` keeps them parked via state["eos"]).
    """
    # The mega-kernels are B=1 pallas_calls; under vmap the jnp paths must
    # run instead (their batched matmuls amortize weight reads across
    # streams).
    params = {k: v for k, v in params.items() if k != "kernel"}
    cp_params = {k: v for k, v in cp_params.items() if k != "kernel"}

    if "k2" in states["cache"]:
        # structure is static at trace time, so this is a trace-time check
        raise ValueError(
            "kernel-layout states must be converted before the jit boundary: "
            "use stack_states(states, config=statics.config)"
        )

    def one(state, temp):
        # reuse the single-stream body exactly (jit-inlined, not re-jitted)
        return decode_chunk.__wrapped__(params, cp_params, state, temp, statics)

    return jax.vmap(one, in_axes=(0, None))(states, temperature)
