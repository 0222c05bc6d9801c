"""Prime the persistent XLA/Mosaic compile cache for a deploy (VERDICT r4
item 8: the fused serving-batch vocoder signature costs ~28 min on a cold
cache and sits on the default serving path — a cache-miss deploy blocked
~30 min before serving).

The compilation cache is keyed by the compiled PROGRAM (HLO: shapes, dtypes,
flags), never by weight values, so priming with random weights at the deploy
dims produces byte-for-byte the cache entries a real checkpoint hits. Run
this once per (TPU generation x jaxlib version x deploy config) on a build
machine, then ship the cache directory as a deploy artifact:

    python scripts/prime_cache.py --dims 1.7b --batch-size 16 \
        --cache-dir ./deploy_cache
    tar czf qwen3tts-cache-v5e.tgz deploy_cache/
    # on the serving host: untar, point QWEN3TTS_CACHE_DIR (or the default
    # .jax_cache path) at it, start the server with --warmup — warmup now
    # LOADS executables instead of compiling them.

Measured (v5e, docs/SERVING.md "Cold starts"): cold compile of the full
bench signature set ~26 min; the same signatures from a primed cache load
in about a minute. This script prints its own elapsed + cache size as the
deploy-procedure receipt.
"""

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--dims", choices=("0.6b", "1.7b"), default="1.7b")
parser.add_argument("--batch-size", type=int, default=16)
parser.add_argument("--chunk-steps", type=int, default=6)
parser.add_argument("--decode-chunk", type=int, default=18)
parser.add_argument("--first-decode-chunk", type=int, default=6)
parser.add_argument("--left-context", type=int, default=8)
parser.add_argument("--prompt-bucket", type=int, default=None)
parser.add_argument("--trailing-bucket", type=int, default=128)
parser.add_argument(
    "--single-stream", action="store_true",
    help="also warm the blocking/streaming single-stream pipeline paths",
)
parser.add_argument(
    "--cache-dir", default=None,
    help="compile-cache directory to prime (default: repo .jax_cache)",
)
args = parser.parse_args()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.abspath(args.cache_dir or os.path.join(_REPO, ".jax_cache"))
os.makedirs(cache_dir, exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from bench import build_models
from qwen3_tts_tpu.config import Qwen3TTSConfig, TokenizerDecoderConfig
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.service import TTSService
from qwen3_tts_tpu.testing import FakeByteTokenizer


def cache_stats() -> tuple[int, float]:
    n, size = 0, 0
    for root, _dirs, files in os.walk(cache_dir):
        for f in files:
            n += 1
            size += os.path.getsize(os.path.join(root, f))
    return n, size / 2**20


def main() -> None:
    t_start = time.time()
    n0, mb0 = cache_stats()
    config = (
        Qwen3TTSConfig.standard_1_7b()
        if args.dims == "1.7b"
        else Qwen3TTSConfig.standard()
    )
    vcfg = TokenizerDecoderConfig()
    vparams = jax.jit(
        lambda k: voc.init_vocoder_params(vcfg, k, jnp.float32)
    )(jax.random.PRNGKey(7))
    jax.block_until_ready(vparams)
    if jax.default_backend() == "tpu":
        from qwen3_tts_tpu.ops.pallas.vocoder_kernels import (
            build_vocoder_kernel_params_device,
        )

        vparams = dict(vparams)
        vparams["kernel"] = jax.jit(
            lambda p: build_vocoder_kernel_params_device(p, vcfg)
        )(vparams)
        jax.block_until_ready(vparams["kernel"])
    params, cp_params = build_models(config, jnp.bfloat16, use_kernels=True)
    pl = SimpleNamespace(
        config=config,
        params=params,
        cp_params=cp_params,
        tokenizer=FakeByteTokenizer(),
        speech_config=SimpleNamespace(decoder_config=vcfg),
        vocoder_params=vparams,
        pipeline_config=SimpleNamespace(
            default_temperature=0.9, default_max_tokens=96
        ),
    )
    svc = TTSService(
        pl,
        batch_size=args.batch_size,
        chunk_steps=args.chunk_steps,
        decode_chunk=args.decode_chunk,
        left_context=args.left_context,
        first_decode_chunk=args.first_decode_chunk,
        prompt_bucket=args.prompt_bucket,
        trailing_bucket=args.trailing_bucket,
    )
    try:
        t0 = time.time()
        svc.warmup()
        warm_s = time.time() - t0
    finally:
        svc.close()

    single_s = None
    if args.single_stream:
        from qwen3_tts_tpu.models import generate as gen_mod
        from qwen3_tts_tpu.models import prompt as prompt_mod

        t0 = time.time()
        pd = prompt_mod.assemble_prompt(
            params, config, FakeByteTokenizer(),
            "Prime the single-stream generation path signatures.",
            speaker="aiden",
        )
        for chunk_np in gen_mod.stream_codes(
            params, cp_params, config, pd, temperature=0.0, max_tokens=24,
            chunk_steps=48,
        ):
            pass
        import numpy as np

        codes = jnp.asarray(
            np.zeros((1, vcfg.num_quantizers, 18), np.int32)
        )
        jax.block_until_ready(voc.decode_frames_jit(vparams, codes, vcfg))
        single_s = time.time() - t0

    n1, mb1 = cache_stats()
    print(json.dumps({
        "backend": jax.default_backend(),
        "dims": args.dims,
        "batch_size": args.batch_size,
        "service_warmup_s": round(warm_s, 1),
        "single_stream_warmup_s": (
            round(single_s, 1) if single_s is not None else None
        ),
        "total_s": round(time.time() - t_start, 1),
        "cache_entries": n1,
        "cache_new_entries": n1 - n0,
        "cache_mb": round(mb1, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
