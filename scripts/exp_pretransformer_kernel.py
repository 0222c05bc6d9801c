"""Isolated timing: jnp pre_transformer vs the mega-kernel on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from qwen3_tts_tpu.config import TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.ops.pallas.pretransformer_kernel import (
    build_pretransformer_kernel_params_device, pre_transformer_fused,
)

cfg = TokenizerDecoderConfig()
params = jax.jit(lambda k: voc.init_vocoder_params(cfg, k, jnp.float32))(
    jax.random.PRNGKey(0))
jax.block_until_ready(params)
pt = params["pre_transformer"]
kp = jax.jit(lambda p: build_pretransformer_kernel_params_device(p, cfg))(pt)
jax.block_until_ready(kp)

jnp_fn = jax.jit(lambda p, x: voc.pre_transformer(p, x, cfg))
def fused_fn(x):
    return pre_transformer_fused(
        kp, x, nl=cfg.num_hidden_layers, nh=cfg.num_attention_heads,
        hd=cfg.head_dim, eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta)

def timeit(fn, *a, n=30):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

for t in (26, 96):
    x = jnp.zeros((1, t, cfg.latent_dim), jnp.float32)
    print(f"T={t} jnp:   {timeit(jnp_fn, pt, x):.3f} ms", flush=True)
    print(f"T={t} fused: {timeit(fused_fn, x):.3f} ms", flush=True)
