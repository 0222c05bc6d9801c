"""Experiment: decode RTF with all linears int8 via the Pallas VMEM-dequant
kernel (w8_kl) vs the jnp int8 path, on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, ml_dtypes
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod
from qwen3_tts_tpu.ops.quant import apply_int8_quantization
from qwen3_tts_tpu.testing import FakeByteTokenizer

mode = sys.argv[1] if len(sys.argv) > 1 else "kernel"  # kernel | jnp
CACHE = f"/tmp/i8k_cache_{mode}.npz"


def save_trees(path, **trees):
    flat = {}
    for name, tree in trees.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, v in leaves:
            flat[name + "|" + jax.tree_util.keystr(kp)] = np.asarray(v)
    np.savez(path, **flat)


def load_trees(path, names):
    data = np.load(path)
    out = {n: {} for n in names}
    for key in data.files:
        name, _, kp = key.partition("|")
        node = out[name]
        parts = [pc.strip("[]'") for pc in kp.split("][")]
        for pc in parts[:-1]:
            node = node.setdefault(pc, {})
        node[parts[-1]] = data[key]
    return [out[n] for n in names]

config = Qwen3TTSConfig.standard()
import os
if os.path.exists(CACHE):
    t0 = time.perf_counter()
    params, cp_params = load_trees(CACHE, ["params", "cp"])
    print(f"cache load: {time.perf_counter()-t0:.1f}s", flush=True)
else:
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)

    def np_like(tree_fn):
        shapes = jax.eval_shape(tree_fn)
        return jax.tree.map(
            lambda sd: rng.standard_normal(sd.shape).astype(np.float32) * 0.02,
            shapes,
        )

    params = np_like(lambda: talker_mod.init_talker_params(config, jax.random.PRNGKey(0)))
    cp_params = np_like(lambda: cp_mod.init_cp_params(
        config.code_predictor_config, config.hidden_size, jax.random.PRNGKey(1)))
    print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    params = apply_int8_quantization(params, kernel_layout=(mode == "kernel"))
    cp_params = apply_int8_quantization(cp_params, kernel_layout=(mode == "kernel"))
    print(f"int8 quantize ({mode}): {time.perf_counter()-t0:.1f}s", flush=True)
    save_trees(CACHE, params=params, cp=cp_params)
    print("cached", flush=True)

cast = lambda x: np.asarray(x) if np.asarray(x).dtype.kind in "ui" else np.asarray(x, ml_dtypes.bfloat16)
t0 = time.perf_counter()
params = jax.device_put(jax.tree.map(cast, params))
cp_params = jax.device_put(jax.tree.map(cast, cp_params))
jax.block_until_ready((params, cp_params))
print(f"transfer: {time.perf_counter()-t0:.1f}s", flush=True)

dtype = jnp.bfloat16
pd = prompt_mod.assemble_prompt(params, config, FakeByteTokenizer(),
    "A benchmark sentence for int8 kernel decode speed on the TPU chip.", speaker="aiden")
p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
embeds = jnp.zeros((1, pb, config.hidden_size), dtype).at[:, :p].set(pd.input_embeds.astype(dtype))
trailing = jnp.zeros((1, tb, config.hidden_size), dtype).at[:, :t].set(pd.trailing_hidden.astype(dtype))
statics = gen_mod.GenStatics(config=config, capacity=pb + gen_mod.RING_SLACK, chunk_steps=48, track_cp_penalty=True)
temp = jnp.float32(0.9)
tp = pd.tts_pad_embed.astype(dtype)
t0 = time.perf_counter()
state = gen_mod.prefill(params, embeds, jnp.int32(p), trailing, jnp.int32(t), tp, jax.random.PRNGKey(42), statics)
frames, count, eos, state = gen_mod.decode_chunk(params, cp_params, state, temp, statics)
frames.block_until_ready()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
state = gen_mod.prefill(params, embeds, jnp.int32(p), trailing, jnp.int32(t), tp, jax.random.PRNGKey(42), statics)
jax.block_until_ready(state)
t0 = time.perf_counter(); n = 4
for _ in range(n):
    frames, count, eos, state = gen_mod.decode_chunk(params, cp_params, state, temp, statics)
frames.block_until_ready()
dt = time.perf_counter() - t0
print(f"RESULT int8-{mode}: {dt/(n*48)*1000:.2f} ms/frame RTF={dt/(n*48*0.08):.4f}", flush=True)
