"""Code predictor (MTP head): 5-layer mini-transformer that autoregressively
predicts codec groups 1..15 given the talker's last hidden state and code 0
(reference Model/Qwen3CodePredictor.swift:8-216, driven by the talker loop at
Qwen3Talker.swift:501-523).

TPU-first structure: layer weights, the 15 per-group embedding tables, and the
15 per-group lm_heads are stacked on leading axes; the per-frame 15-iteration
loop runs entirely on device (lax.fori_loop) with a tiny fixed-capacity KV
cache, so a full 16-code frame costs zero host syncs (the reference does 16
`.item()` syncs per frame, Qwen3Talker.swift:482,520).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CodePredictorConfig
from ..ops.attention import gqa_attention_full
from ..ops import linear as linear_ops
from ..ops.linear import linear
from ..ops.norms import rms_norm
from ..ops import rope as rope_ops
from ..ops.sampling import NEG_INF, sample_token

# Cache capacity: 1 hidden + 1 code0 embed + 14 group embeds = 16 positions;
# padded for sublane alignment.
CP_CACHE_LEN = 16


def init_cp_params(
    config: CodePredictorConfig, talker_hidden: int, key: jax.Array, dtype=jnp.float32
) -> dict:
    hc = config.hidden_size
    hd = config.head_dim
    nq = config.num_attention_heads
    nkv = config.num_key_value_heads
    nl = config.num_hidden_layers
    ng = config.num_code_groups - 1
    keys = jax.random.split(key, 12)

    def _dense(k, out_dim, in_dim, bias=False):
        k1, k2 = jax.random.split(k)
        p = {"w": (jax.random.normal(k1, (out_dim, in_dim)) * 0.02).astype(dtype)}
        if bias:
            p["b"] = (jax.random.normal(k2, (out_dim,)) * 0.02).astype(dtype)
        return p

    def stack(fn, k):
        ks = jax.random.split(k, nl)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[fn(kk) for kk in ks])

    params = {
        "codec_embedding": {
            "w": (jax.random.normal(keys[0], (ng, config.vocab_size, talker_hidden)) * 0.02).astype(dtype)
        },
        "lm_head": {
            "w": (jax.random.normal(keys[1], (ng, config.vocab_size, hc)) * 0.02).astype(dtype)
        },
        "norm": {"w": jnp.ones((hc,), dtype)},
        "layers": {
            "input_layernorm": {"w": jnp.ones((nl, hc), dtype)},
            "post_attention_layernorm": {"w": jnp.ones((nl, hc), dtype)},
            "q_norm": {"w": jnp.ones((nl, hd), dtype)},
            "k_norm": {"w": jnp.ones((nl, hd), dtype)},
            "qkv_proj": stack(lambda k: _dense(k, (nq + 2 * nkv) * hd, hc), keys[2]),
            "o_proj": stack(lambda k: _dense(k, hc, nq * hd), keys[5]),
            "gateup_proj": stack(
                lambda k: _dense(k, 2 * config.intermediate_size, hc), keys[6]
            ),
            "down_proj": stack(lambda k: _dense(k, hc, config.intermediate_size), keys[8]),
        },
    }
    if hc != talker_hidden:
        params["small_to_mtp_projection"] = _dense(keys[9], hc, talker_hidden, bias=True)
    return params


def _cp_forward(
    params: dict,
    x: jax.Array,
    cache_k: jax.Array,
    cache_v: jax.Array,
    start_pos: jax.Array,
    config: CodePredictorConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Run the cp transformer over x [B, L, H_in] at positions
    [start_pos, start_pos + L); attends over cache slots < start_pos + L.

    Returns (h_last [B, 1, Hc], new cache_k, new cache_v) where caches are
    [nl, B, Hkv, CP_CACHE_LEN, D].
    """
    if "small_to_mtp_projection" in params:
        x = linear(params["small_to_mtp_projection"], x)

    b, l, _ = x.shape
    hd = config.head_dim
    nq = config.num_attention_heads
    nkv = config.num_key_value_heads
    scale = 1.0 / float(hd) ** 0.5

    positions = start_pos + jnp.arange(l)
    inv = jnp.asarray(rope_ops.inv_freq(hd, config.rope_theta))
    cos, sin = rope_ops.rope_cos_sin(positions[None, :], inv)

    end = start_pos + l
    slot_idx = jnp.arange(CP_CACHE_LEN)
    # additive mask over cache slots: valid iff slot < end and causal w.r.t.
    # each query position (query i at absolute pos start_pos+i sees slots <= it)
    q_pos = positions[:, None]
    mask = jnp.where(
        (slot_idx[None, :] <= q_pos) & (slot_idx[None, :] < end), 0.0, NEG_INF
    )

    h = x
    zero = jnp.int32(0)
    for i in range(config.num_hidden_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        xin = rms_norm(h, lp["input_layernorm"]["w"], config.rms_norm_eps)
        qkv = linear(lp["qkv_proj"], xin)
        q = qkv[..., : nq * hd].reshape(b, l, nq, hd)
        k = qkv[..., nq * hd : (nq + nkv) * hd].reshape(b, l, nkv, hd)
        v = qkv[..., (nq + nkv) * hd :].reshape(b, l, nkv, hd)
        q = rms_norm(q, lp["q_norm"]["w"], config.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"]["w"], config.rms_norm_eps)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        c = cos[:, None, :, :]
        s = sin[:, None, :, :]
        q = rope_ops.apply_rope(q, c, s)
        k = rope_ops.apply_rope(k, c, s)

        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k[None], (jnp.int32(i), zero, zero, start_pos, zero)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v[None], (jnp.int32(i), zero, zero, start_pos, zero)
        )

        attn = gqa_attention_full(q, cache_k[i], cache_v[i], scale, mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, l, -1)
        h = h + linear(lp["o_proj"], attn)
        x2 = rms_norm(h, lp["post_attention_layernorm"]["w"], config.rms_norm_eps)
        gu = linear(lp["gateup_proj"], x2)
        ci = config.intermediate_size
        h = h + linear(lp["down_proj"], jax.nn.silu(gu[..., :ci]) * gu[..., ci:])

    h = rms_norm(h, params["norm"]["w"], config.rms_norm_eps)
    return h[:, -1:, :], cache_k, cache_v


def predict_frame(
    params: dict,
    code_hidden: jax.Array,
    code0_embed: jax.Array,
    key: jax.Array,
    temperature: jax.Array,
    seen_cp: jax.Array | None,
    config: CodePredictorConfig,
    repetition_penalty: float = 1.05,
    use_kernel_mirror: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array | None]:
    """Predict codes 1..15 for one frame (reference Qwen3Talker.swift:501-523).

    SINGLE-STREAM ONLY (B == 1): code_hidden / code0_embed are [1, 1, H_t]
    (sample_group reads logits row 0 and emb_row returns one row — a B>1
    call would mis-sample; batched serving uses
    serving.predict_frame_batched instead). seen_cp: bool [15, vocab]
    repetition sets (None = no penalty, the generateStream behavior).
    Returns (codes [15] int32, embed_sum [1, 1, H_t] = sum of the 15 group
    embeds, updated seen_cp).
    """
    # W8A8 mega-kernel path (ops/pallas/cp_megakernel.py): one pallas_call per
    # frame. Attached by the pipeline under the reserved "kernel" key; B=1 only
    # (batched serving keeps the jnp path, where weight reads amortize over
    # streams). Off-TPU the kernel runs in the Mosaic interpreter.
    if "kernel" in params and code_hidden.shape[0] == 1:
        from ..ops.pallas.cp_megakernel import (
            predict_frame_kernel,
            predict_frame_w8a8_ref,
        )

        if use_kernel_mirror:
            # Same W8A8 arithmetic as the kernel, pure jnp — the bench's
            # on-chip parity baseline (GenStatics.kernel_mirror).
            return predict_frame_w8a8_ref(
                params["kernel"], code_hidden, code0_embed, key, temperature,
                seen_cp, config, repetition_penalty,
            )
        return predict_frame_kernel(
            params["kernel"], code_hidden, code0_embed, key, temperature,
            seen_cp, config, repetition_penalty,
            interpret=jax.default_backend() != "tpu",
        )

    ng = config.num_code_groups - 1
    nl = config.num_hidden_layers
    b = code_hidden.shape[0]
    dtype = code_hidden.dtype
    cache_shape = (nl, b, config.num_key_value_heads, CP_CACHE_LEN, config.head_dim)
    cache_k = jnp.zeros(cache_shape, dtype)
    cache_v = jnp.zeros(cache_shape, dtype)

    emb_tables = params["codec_embedding"]  # stacked [ng, V, H_t] (any storage)
    head_tables = params["lm_head"]         # stacked [ng, V, Hc]

    def emb_row(k_idx, code):
        return linear_ops.table_row(emb_tables, k_idx, code, dtype)[
            None, None, :
        ]

    # Iteration 0: two tokens [code_hidden, code0_embed]
    x0 = jnp.concatenate([code_hidden, code0_embed], axis=1)
    h_last, cache_k, cache_v = _cp_forward(
        params, x0, cache_k, cache_v, jnp.int32(0), config
    )

    def sample_group(k_group, h_last_g, key_g, seen):
        logits = linear_ops.table_matmul(
            head_tables, k_group, h_last_g[:, 0, :]
        ).astype(jnp.float32)[0]
        seen_row = seen[k_group] if seen is not None else None
        return sample_token(
            logits, key_g, temperature,
            seen_mask=seen_row, repetition_penalty=repetition_penalty,
        )

    track = seen_cp is not None
    group_keys = jax.random.split(key, ng)

    code1 = sample_group(jnp.int32(0), h_last, group_keys[0], seen_cp)
    if track:
        seen_cp = seen_cp.at[0, code1].set(True)

    codes0 = jnp.zeros((ng,), jnp.int32).at[0].set(code1)
    embed_sum0 = code0_embed + emb_row(jnp.int32(0), code1)

    def body(k_idx, carry):
        codes, embed_sum, ck, cv, seen = carry
        prev_code = codes[k_idx - 1]
        x = emb_row(k_idx - 1, prev_code)
        h_last_k, ck, cv = _cp_forward(
            params, x, ck, cv, (k_idx + 1).astype(jnp.int32), config
        )
        code_k = sample_group(k_idx, h_last_k, group_keys[k_idx], seen if track else None)
        codes = codes.at[k_idx].set(code_k)
        embed_sum = embed_sum + emb_row(k_idx, code_k)
        if track:
            seen = seen.at[k_idx, code_k].set(True)
        return codes, embed_sum, ck, cv, seen

    seen_state = seen_cp if track else jnp.zeros((ng, 1), jnp.bool_)
    codes, embed_sum, cache_k, cache_v, seen_state = jax.lax.fori_loop(
        1, ng, body, (codes0, embed_sum0, cache_k, cache_v, seen_state)
    )

    return codes, embed_sum, (seen_state if track else None)
