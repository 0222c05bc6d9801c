"""Per-OP device-time attribution of the fused vocoder decode at one chunk
size: trace N decode_frames calls, aggregate TPU events by op name, print
the top ops. Pinpoints where the SEANet-block 12.5 ms (T=106, r4 campaign)
actually goes — tconv phase matmuls vs units kernels vs snakes vs DMA —
before optimizing anything. Usage: python scripts/exp_vocoder_op_trace.py
[T] [plain]"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)

import jax

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from qwen3_tts_tpu.config import TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.ops.pallas.vocoder_kernels import (
    build_vocoder_kernel_params_device,
)

N = 30


def main():
    t = 106 if len(sys.argv) < 2 else int(sys.argv[1])
    plain = "plain" in sys.argv[2:]
    cfg = TokenizerDecoderConfig()
    vp = jax.jit(lambda k: voc.init_vocoder_params(cfg, k, jnp.float32))(
        jax.random.PRNGKey(7)
    )
    jax.block_until_ready(vp)
    if not plain:
        vp = dict(vp, kernel=jax.jit(
            lambda p: build_vocoder_kernel_params_device(p, cfg)
        )(vp))
        jax.block_until_ready(vp["kernel"])
    codes = jax.random.randint(
        jax.random.PRNGKey(1), (1, cfg.num_quantizers, t), 0, cfg.codebook_size
    )

    voc.decode_frames_jit(vp, codes, cfg).block_until_ready()  # compile
    d = f"/tmp/trace_voc_ops_{t}{'_plain' if plain else ''}"
    os.system(f"rm -rf {d}")
    with jax.profiler.trace(d):
        for _ in range(N):
            r = voc.decode_frames_jit(vp, codes, cfg)
        r.block_until_ready()

    tpu_pids = set()
    events = []
    for p in glob.glob(f"{d}/**/*.trace.json.gz", recursive=True):
        with gzip.open(p, "rt") as f:
            tr = json.load(f)
        evs = tr.get("traceEvents", [])
        for e in evs:
            if (
                e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))
            ):
                tpu_pids.add(e["pid"])
        events.extend(evs)

    # XLA op events nest under the jit_decode_frames module event on the
    # same TPU pid; aggregate leaf ops (skip the module envelope itself)
    by_op = defaultdict(float)
    total_module = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = str(e.get("name", ""))
        dur = float(e.get("dur", 0.0))
        if name.startswith("jit_decode_frames"):
            total_module += dur
            continue
        by_op[name] += dur
    print(f"T={t} {'plain' if plain else 'fused'}: "
          f"module total {total_module / 1e3 / N:.3f} ms/call over {N} calls")
    ranked = sorted(by_op.items(), key=lambda kv: -kv[1])[:24]
    for name, us in ranked:
        print(f"  {us / 1e3 / N:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
