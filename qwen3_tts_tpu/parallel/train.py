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
    params: dict, embeds: jax.Array, config: Qwen3TTSConfig
) -> jax.Array:
    """Full-sequence causal forward over input embeds [B, T, H] -> hidden
    states [B, T, H] (layer-stacked lax.scan, same math as
    models.talker.talker_prefill but keeping every position and no cache)."""
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
        gu = linear(lp["gateup_proj"], x2)
        ii = config.intermediate_size
        return h + linear(lp["down_proj"], jax.nn.silu(gu[..., :ii]) * gu[..., ii:]), None

    h, _ = jax.lax.scan(body, embeds, params["layers"])
    return rms_norm(h, params["norm"]["w"], config.rms_norm_eps)


def next_frame_loss(
    params: dict,
    batch: dict,
    config: Qwen3TTSConfig,
) -> jax.Array:
    """Teacher-forced next-code-0 cross-entropy.

    batch: {"embeds": [B, T, H] input embeddings (summed text+codec, already
    assembled), "targets": [B, T] int32 code-0 ids for the NEXT position,
    "mask": [B, T] float32 1.0 where the target is real}.
    """
    h = talker_forward_train(params, batch["embeds"], config)
    logits = codec_head(params, h)  # [B, T, V] float32
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, batch["targets"][..., None], axis=-1)[..., 0]
    mask = batch["mask"].astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(config: Qwen3TTSConfig, optimizer=None):
    """Returns jitted (params, opt_state, batch) -> (params, opt_state, loss).

    Shardings propagate from the arguments: place params with
    parallel.sharding.shard_params and the batch with a dp-sharded
    NamedSharding; the compiled step then runs tp/dp-parallel with XLA
    collectives over ICI, no code changes.
    """
    if optimizer is None:
        optimizer = make_optimizer()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(next_frame_loss)(params, batch, config)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer, step
