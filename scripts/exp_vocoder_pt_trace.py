"""Trace-based timing of full vocoder decode_frames with the head-packed
pre-transformer kernel vs plain jnp, at stream (26) and e2e (106) chunk
sizes. Device durations come from jax.profiler traces (wall clocks through
the tunnel are unreliable; memory/axon-measurement-hygiene). The old
per-head kernel's in-decode numbers are in ROADMAP.md round 2 (it no longer
fits decode_frames, which now builds the packed layout)."""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")

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
cfg = TokenizerDecoderConfig()
vp = jax.jit(lambda k: voc.init_vocoder_params(cfg, k, jnp.float32))(
    jax.random.PRNGKey(7)
)
jax.block_until_ready(vp)
vp_packed = dict(vp, kernel=build_vocoder_kernel_params_device(vp, cfg))


def device_ms(fn, *args, tag):
    """Mean per-call device time over N calls from a profiler trace."""
    fn(*args).block_until_ready()  # compile outside the trace
    d = f"/tmp/trace_{tag}"
    os.system(f"rm -rf {d}")
    with jax.profiler.trace(d):
        for _ in range(N):
            r = fn(*args)
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
    total = sum(
        float(e.get("dur", 0.0))
        for e in events
        if e.get("ph") == "X" and e.get("pid") in tpu_pids
        and str(e.get("name", "")).startswith("jit_decode_frames")
    )
    return total / 1000.0 / N


for t in (26, 106):
    codes = jax.random.randint(
        jax.random.PRNGKey(1), (1, cfg.num_quantizers, t), 0, cfg.codebook_size
    )
    ms_packed = device_ms(
        lambda c: voc.decode_frames_jit(vp_packed, c, cfg), codes,
        tag=f"packed{t}",
    )
    ms_plain = device_ms(
        lambda c: voc.decode_frames_jit(vp, c, cfg), codes, tag=f"plain{t}"
    )
    print(
        f"T={t}: decode_frames packed-kernel {ms_packed:.2f} ms  "
        f"plain {ms_plain:.2f} ms",
        flush=True,
    )
