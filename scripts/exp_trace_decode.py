"""jax.profiler trace of the 1.7B decode_chunk: per-kernel device times.

Wall-clock timing of individual kernel calls through the tunneled chip is
useless (~35 ms dispatch+sync per call; eager glue ~0.4 ms/op) — this is
the authoritative way to attribute decode time: trace one jitted chunk and
aggregate the device-side "X" events by name (ROADMAP.md decode
attribution)."""
import sys, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod
from qwen3_tts_tpu.ops.pallas.cp_megakernel import build_cp_kernel_params_device
from qwen3_tts_tpu.ops.pallas.talker_megakernel import build_talker_kernel_params_device
from qwen3_tts_tpu.testing import FakeByteTokenizer

config = Qwen3TTSConfig.standard_1_7b()
dtype = jnp.bfloat16
CHUNK = 48

@jax.jit
def device_init(key):
    k1, k2 = jax.random.split(key)
    return (talker_mod.init_talker_params(config, k1, dtype),
            cp_mod.init_cp_params(config.code_predictor_config, config.hidden_size, k2, dtype))

params, cp_params = device_init(jax.random.PRNGKey(0))
jax.block_until_ready(cp_params)
tkp = build_talker_kernel_params_device(params, config)
cpk = build_cp_kernel_params_device(cp_params, config.code_predictor_config)
jax.block_until_ready((tkp, cpk))
params2 = dict(params); params2["kernel"] = tkp
cp2 = dict(cp_params); cp2["kernel"] = cpk
hc = config.hidden_size
pd = prompt_mod.assemble_prompt(params, config, FakeByteTokenizer(),
    "Trace sentence for decoding.", speaker="aiden")
p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
embeds = jnp.zeros((1, pb, hc), dtype).at[:, :p].set(pd.input_embeds)
trailing = jnp.zeros((1, tb, hc), dtype).at[:, :t].set(pd.trailing_hidden)
statics = gen_mod.GenStatics(config=config, capacity=pb + gen_mod.RING_SLACK,
                             chunk_steps=CHUNK, track_cp_penalty=False)
temp = jnp.float32(0.9)

def run_once():
    st = gen_mod.prefill(params2, embeds, jnp.int32(p), trailing, jnp.int32(t),
                         pd.tts_pad_embed, jax.random.PRNGKey(42), statics)
    frames, count, eos, st = gen_mod.decode_chunk(params2, cp2, st, temp, statics)
    return frames

jax.block_until_ready(run_once())  # compile
print("compiled", flush=True)

with jax.profiler.trace("/tmp/jxtrace"):
    jax.block_until_ready(run_once())
print("traced", flush=True)

# parse the trace
files = glob.glob("/tmp/jxtrace/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
agg = collections.Counter()
cnt = collections.Counter()
for f in files:
    ev = json.load(gzip.open(f))["traceEvents"]
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            pidname = e.get("pid")
            name = e.get("name", "")
            agg[name] += e["dur"]
            cnt[name] += 1
for name, us in agg.most_common(25):
    print(f"{us/1000:9.2f} ms  x{cnt[name]:5d}  {name[:90]}", flush=True)
