"""A/B the head-packed pre-transformer kernel vs the per-head kernel and the
jnp path, at streaming (T=26), gate-boundary (64), and e2e (106) chunk sizes.
Timings are N serialized in-jit iterations (single-call walls are
tunnel-RTT-dominated; see memory/axon-measurement-hygiene)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from qwen3_tts_tpu.config import TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.ops.pallas.pretransformer_kernel import (
    build_pretransformer_kernel_params_device,
    build_pretransformer_packed_params_device,
    pre_transformer_fused,
    pre_transformer_packed,
)

N = 50
cfg = TokenizerDecoderConfig()
params = jax.jit(lambda k: voc.init_vocoder_params(cfg, k, jnp.float32))(
    jax.random.PRNGKey(0)
)
pt = params["pre_transformer"]
kp_old = build_pretransformer_kernel_params_device(pt, cfg)
kp_new = build_pretransformer_packed_params_device(pt, cfg)
jax.block_until_ready((kp_old, kp_new))
KW = dict(
    nl=cfg.num_hidden_layers, nh=cfg.num_attention_heads, hd=cfg.head_dim,
    eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
)


def timed(loop, *args):
    loop(*args).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        loop(*args).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / N)
    return best * 1e3


def kernel_loop(fn):
    @jax.jit
    def loop(kp, x):
        return jax.lax.fori_loop(
            0, N, lambda i, h: fn(kp, h, **KW).astype(h.dtype), x
        )
    return loop


@jax.jit
def jnp_loop(p, x):
    return jax.lax.fori_loop(
        0, N, lambda i, h: voc.pre_transformer(p, h, cfg).astype(h.dtype), x
    )


old_loop = kernel_loop(pre_transformer_fused)
new_loop = kernel_loop(pre_transformer_packed)

for t in (26, 64, 106):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, t, cfg.latent_dim), jnp.float32)
    o = timed(old_loop, kp_old, x)
    p = timed(new_loop, kp_new, x)
    j = timed(jnp_loop, pt, x)
    print(
        f"T={t}: per-head {o:.2f} ms  packed {p:.2f} ms  jnp {j:.2f} ms",
        flush=True,
    )
