"""Teacher-forced training step for the talker, sharded over a (dp, tp) mesh.

The reference framework is inference-only (SURVEY.md §5: load-only
checkpointing, no training). This module adds the TPU-native training
capability: a jit-compiled step — forward over the full frame sequence
(teacher forcing), cross-entropy on the codec head, grads, and an optax
update — that runs under any `jax.sharding.Mesh` built by
`parallel.sharding.make_mesh`. Parallelism is expressed only through the
NamedSharding placement of params (tp) and batch (dp); XLA inserts the
psum/all-gather collectives over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..config import Qwen3TTSConfig
from ..ops.attention import causal_mask, gqa_attention_full
from ..ops.linear import linear
from ..ops.norms import rms_norm
from ..models.talker import _rope_cos_sin, _layer_qkv, codec_head


def talker_forward_train(
    params: dict, embeds: jax.Array, config: Qwen3TTSConfig, remat: bool = False
) -> jax.Array:
    """Full-sequence causal forward over input embeds [B, T, H] -> hidden
    states [B, T, H] (layer-stacked lax.scan, same math as
    models.talker.talker_prefill but keeping every position and no cache).

    remat=True wraps the per-layer scan body in `jax.checkpoint`: activations
    are recomputed layer-by-layer in the backward pass, cutting peak training
    memory from O(layers x B x T x H) of saved intermediates to O(1 layer) —
    the standard TPU trade of MXU FLOPs for HBM when batch x sequence grows.
    """
    b, t, _ = embeds.shape
    scale = 1.0 / float(config.head_dim) ** 0.5
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    cos, sin = _rope_cos_sin(config, positions)
    mask = causal_mask(t)

    def body(h, lp):
        x = rms_norm(h, lp["input_layernorm"]["w"], config.rms_norm_eps)
        q, k, v = _layer_qkv(lp, x, cos, sin, config)
        attn = gqa_attention_full(q, k, v, scale, mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, -1)
        h = h + linear(lp["o_proj"], attn)
        x2 = rms_norm(h, lp["post_attention_layernorm"]["w"], config.rms_norm_eps)
        from ..models.talker import _swiglu  # fused or unfused-tp layout

        return h + linear(lp["down_proj"], _swiglu(lp, x2, config.intermediate_size)), None

    h, _ = jax.lax.scan(jax.checkpoint(body) if remat else body, embeds, params["layers"])
    return rms_norm(h, params["norm"]["w"], config.rms_norm_eps)


def next_frame_loss(
    params: dict,
    batch: dict,
    config: Qwen3TTSConfig,
    remat: bool = False,
) -> jax.Array:
    """Teacher-forced next-code-0 cross-entropy.

    batch: {"embeds": [B, T, H] input embeddings (summed text+codec, already
    assembled), "targets": [B, T] int32 code-0 ids for the NEXT position,
    "mask": [B, T] float32 1.0 where the target is real}.
    """
    h = talker_forward_train(params, batch["embeds"], config, remat=remat)
    logits = codec_head(params, h)  # [B, T, V] float32
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, batch["targets"][..., None], axis=-1)[..., 0]
    mask = batch["mask"].astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(config: Qwen3TTSConfig, optimizer=None, remat: bool = False):
    """Returns jitted (params, opt_state, batch) -> (params, opt_state, loss).

    Shardings propagate from the arguments: place params with
    parallel.sharding.shard_params and the batch with a dp-sharded
    NamedSharding; the compiled step then runs tp/dp-parallel with XLA
    collectives over ICI, no code changes. remat=True rematerializes layer
    activations in backward (same numbers, lower peak HBM).
    """
    if optimizer is None:
        optimizer = make_optimizer()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(next_frame_loss)(
            params, batch, config, remat
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer, step


# ---------------------------------------------------------------------------
# Full TTS loss: code-0 head + teacher-forced code-predictor groups
# ---------------------------------------------------------------------------


def cp_forward_train(
    cp_params: dict, x: jax.Array, cfg, remat: bool = False
) -> jax.Array:
    """Full-sequence causal forward of the code predictor for teacher
    forcing: x [N, 16, H_in] (token 0 = talker hidden, token 1 = talker codec
    embed of code 0, token k+1 = cp group-(k-1) embed of code k). Returns all
    hidden states [N, 16, Hc]."""
    from ..models.code_predictor import CP_CACHE_LEN  # noqa: F401 (doc link)
    from ..ops import rope as rope_ops
    from ..ops.attention import causal_mask, gqa_attention_full

    if "small_to_mtp_projection" in cp_params:
        x = linear(cp_params["small_to_mtp_projection"], x)
    n, l, _ = x.shape
    hd = cfg.head_dim
    nq = cfg.num_attention_heads
    nkv = cfg.num_key_value_heads
    scale = 1.0 / float(hd) ** 0.5

    inv = jnp.asarray(rope_ops.inv_freq(hd, cfg.rope_theta))
    cos, sin = rope_ops.rope_cos_sin(jnp.arange(l)[None, :], inv)
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    mask = causal_mask(l)

    def body(h, lp):
        xin = rms_norm(h, lp["input_layernorm"]["w"], cfg.rms_norm_eps)
        qkv = linear(lp["qkv_proj"], xin)
        q = qkv[..., : nq * hd].reshape(n, l, nq, hd)
        k = qkv[..., nq * hd : (nq + nkv) * hd].reshape(n, l, nkv, hd)
        v = qkv[..., (nq + nkv) * hd :].reshape(n, l, nkv, hd)
        q = rms_norm(q, lp["q_norm"]["w"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        k = rms_norm(k, lp["k_norm"]["w"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q = rope_ops.apply_rope(q, c, s)
        k = rope_ops.apply_rope(k, c, s)
        attn = gqa_attention_full(q, k, v, scale, mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(n, l, -1)
        h = h + linear(lp["o_proj"], attn)
        x2 = rms_norm(h, lp["post_attention_layernorm"]["w"], cfg.rms_norm_eps)
        gu = linear(lp["gateup_proj"], x2)
        ii = cfg.intermediate_size
        return h + linear(lp["down_proj"], jax.nn.silu(gu[..., :ii]) * gu[..., ii:]), None

    h, _ = jax.lax.scan(jax.checkpoint(body) if remat else body, x, cp_params["layers"])
    return rms_norm(h, cp_params["norm"]["w"], cfg.rms_norm_eps)


def tts_loss(
    params: dict,
    cp_params: dict,
    batch: dict,
    config: Qwen3TTSConfig,
    remat: bool = False,
) -> tuple[jax.Array, dict]:
    """Joint teacher-forced TTS loss mirroring inference exactly.

    batch: {"embeds": [B, T, H] input embeddings (text hidden + summed codec
    embeds of the PREVIOUS frame, as the decode loop builds them),
    "frames": [B, T, 16] int32 target codec frames, "mask": [B, T] float32}.
    Returns (total_loss, {"code0": ..., "cp": ...}).
    """
    from ..models.talker import codec_head, encode_audio

    cp_cfg = config.code_predictor_config
    ng = cp_cfg.num_code_groups  # 16

    h = talker_forward_train(params, batch["embeds"], config, remat=remat)  # [B, T, H]
    b, t, hdim = h.shape
    mask = batch["mask"].astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)

    # code-0 cross-entropy from the talker head
    logits0 = codec_head(params, h)
    logp0 = jax.nn.log_softmax(logits0, axis=-1)
    nll0 = -jnp.take_along_axis(logp0, batch["frames"][..., 0:1], axis=-1)[..., 0]
    loss0 = (nll0 * mask).sum() / denom

    # teacher-forced code predictor over all frames at once
    frames = batch["frames"].reshape(b * t, ng)
    h_flat = h.reshape(b * t, 1, hdim)
    code0_emb = encode_audio(params, frames[:, 0])[:, None, :]  # talker table
    emb_tables = cp_params["codec_embedding"]["w"]  # [15, V, H]
    # cp input sequence mirrors predict_frame: token k+1 (k=1..14) is
    # cp table (k-1) applied to the TRUE code of group k.
    group_codes = frames.T[1 : ng - 1].clip(0, cp_cfg.vocab_size - 1)  # [14, B*T]
    group_embs = jax.vmap(lambda tb, c: jnp.take(tb, c, axis=0))(
        emb_tables[: ng - 2], group_codes
    )  # [14, B*T, H]
    x = jnp.concatenate(
        [h_flat, code0_emb, group_embs.transpose(1, 0, 2)], axis=1
    ).astype(h.dtype)  # [B*T, 16, H]
    cp_h = cp_forward_train(cp_params, x, cp_cfg, remat=remat)  # [B*T, 16, Hc]

    heads = cp_params["lm_head"]["w"]  # [15, V, Hc]
    # position k+1 predicts group k+1's code via lm_head[k]
    preds = cp_h[:, 1:ng, :]  # [B*T, 15, Hc]
    logits_cp = jnp.einsum(
        "nkh,kvh->nkv", preds.astype(jnp.float32), heads.astype(jnp.float32)
    )
    targets_cp = frames[:, 1:ng].clip(0, cp_cfg.vocab_size - 1)
    logp_cp = jax.nn.log_softmax(logits_cp, axis=-1)
    nll_cp = -jnp.take_along_axis(logp_cp, targets_cp[..., None], axis=-1)[..., 0]
    mask_flat = mask.reshape(b * t, 1)
    loss_cp = (nll_cp * mask_flat).sum() / (denom * (ng - 1))

    return loss0 + loss_cp, {"code0": loss0, "cp": loss_cp}


def make_tts_train_step(config: Qwen3TTSConfig, optimizer=None, remat: bool = False):
    """Joint (talker + code predictor) training step; shardings propagate
    from the argument placements like make_train_step. remat=True
    rematerializes both stacks' layer activations in backward."""
    if optimizer is None:
        optimizer = make_optimizer()

    def loss_fn(both, batch):
        return tts_loss(both["talker"], both["cp"], batch, config, remat=remat)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(both, opt_state, batch):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(both, batch)
        updates, opt_state = optimizer.update(grads, opt_state, both)
        both = optax.apply_updates(both, updates)
        return both, opt_state, loss, parts

    return optimizer, step
