"""Validate + time the cp mega-kernel on the real TPU at 0.6B dims.

Stages (each prints a flushed line):
  1. device-side init + W8A8 build of standard cp params
  2. one kernel frame: greedy parity vs the jnp W8A8 mirror
  3. seed-to-seed variation at temperature > 0 (on-core PRNG is live)
  4. per-frame timing: 100 chained frames inside one jit
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qwen3_tts_tpu.config import CodePredictorConfig
from qwen3_tts_tpu.models import code_predictor as cp_mod
from qwen3_tts_tpu.ops.pallas.cp_megakernel import (
    build_cp_kernel_params_device,
    predict_frame_kernel,
    predict_frame_w8a8_ref,
)

P = lambda *a: print(*a, flush=True)
CFG = CodePredictorConfig()  # 0.6B standard: hc=1024 nl=5 nq=16 nkv=8 inter=3072
TH = 1024
P("backend:", jax.default_backend(), "config:", CFG.hidden_size, CFG.num_hidden_layers)

t0 = time.time()
init = jax.jit(
    lambda k: cp_mod.init_cp_params(CFG, TH, k, dtype=jnp.float32)
)
params = init(jax.random.PRNGKey(0))
jax.block_until_ready(params)
P("init: %.1fs" % (time.time() - t0))

t0 = time.time()
kp = build_cp_kernel_params_device(params, CFG)
jax.block_until_ready(kp)
P("build kernel params: %.1fs" % (time.time() - t0))

key = jax.random.PRNGKey(1)
ch = jax.random.normal(key, (1, 1, TH), jnp.float32) * 0.5
c0 = jax.random.normal(jax.random.PRNGKey(2), (1, 1, TH), jnp.float32) * 0.5
ng = CFG.num_code_groups - 1
seen = jnp.zeros((ng, CFG.vocab_size), jnp.bool_)
tz = jnp.float32(0.0)

t0 = time.time()
codes_k, esum_k, seen_k = predict_frame_kernel(kp, ch, c0, key, tz, seen, CFG)
jax.block_until_ready(codes_k)
P("kernel compile+run: %.1fs" % (time.time() - t0))

t0 = time.time()
codes_m, esum_m, _ = jax.jit(
    lambda *a: predict_frame_w8a8_ref(*a, CFG)
)(kp, ch, c0, key, tz, seen)
jax.block_until_ready(codes_m)
P("mirror compile+run: %.1fs" % (time.time() - t0))
ck, cm = np.asarray(codes_k), np.asarray(codes_m)
P("greedy parity: kernel==mirror:", bool((ck == cm).all()))
P("kernel:", ck)
P("mirror:", cm)
P("agree: %d/15 first_diff=%s" % (
    (ck == cm).sum(), np.nonzero(ck != cm)[0][:1]))
ed = float(np.abs(np.asarray(esum_k) - np.asarray(esum_m)).max())
P("esum max diff: %.2e" % ed)

# seed variation at T>0
outs = set()
for s in range(4):
    c, _, _ = predict_frame_kernel(
        kp, ch, c0, jax.random.PRNGKey(s), jnp.float32(0.9), seen, CFG
    )
    outs.add(tuple(np.asarray(c)))
P("sampling distinct outputs over 4 seeds:", len(outs))

# timing: chained frames in one jit
N = 100


@jax.jit
def run_frames(kp, ch, c0, key, seen):
    def body(i, carry):
        ch, seen, key = carry
        key, k2 = jax.random.split(key)
        codes, esum, seen = predict_frame_kernel(
            kp, ch, c0, k2, jnp.float32(0.9), seen, CFG
        )
        return jnp.tanh(esum), seen, key

    ch, seen, key = jax.lax.fori_loop(0, N, body, (ch, seen, key))
    return ch, seen


t0 = time.time()
r = run_frames(kp, ch, c0, key, seen)
jax.block_until_ready(r)
P("timing loop compile+first: %.1fs" % (time.time() - t0))
t0 = time.time()
reps = 3
for _ in range(reps):
    r = run_frames(kp, ch, c0, key, seen)
jax.block_until_ready(r)
dt = (time.time() - t0) / reps / N
P("cp mega-kernel: %.3f ms/frame (jnp cp baseline ~1.93 ms/frame)" % (dt * 1e3))
P("DONE")
