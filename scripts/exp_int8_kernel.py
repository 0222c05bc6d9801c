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

    def dense(out, inn, bias=False):
        p = {"w": rng.standard_normal((out, inn), dtype=np.float32) * np.float32(0.02)}
        if bias:
            p["b"] = np.zeros((out,), np.float32)
        return p

    def stack(fn, n):
        e = [fn() for _ in range(n)]
        return {k: np.stack([x[k] for x in e]) for k in e[0]}

    def layer_tree(h, nq, nkv, hd, inter, nl):
        return {
            "input_layernorm": {"w": np.ones((nl, h), np.float32)},
            "post_attention_layernorm": {"w": np.ones((nl, h), np.float32)},
            "q_norm": {"w": np.ones((nl, hd), np.float32)},
            "k_norm": {"w": np.ones((nl, hd), np.float32)},
            "qkv_proj": stack(lambda: dense((nq + 2 * nkv) * hd, h), nl),
            "o_proj": stack(lambda: dense(h, nq * hd), nl),
            "gateup_proj": stack(lambda: dense(2 * inter, h), nl),
            "down_proj": stack(lambda: dense(h, inter), nl),
        }

    c = config
    params = {
        "text_embedding": {"w": rng.standard_normal((c.text_vocab_size, c.text_hidden_size), dtype=np.float32) * np.float32(0.02)},
        "codec_embedding": {"w": rng.standard_normal((c.vocab_size, c.hidden_size), dtype=np.float32) * np.float32(0.02)},
        "text_projection": {"fc1": dense(c.text_hidden_size, c.text_hidden_size, True),
                            "fc2": dense(c.hidden_size, c.text_hidden_size, True)},
        "codec_head": dense(c.vocab_size, c.hidden_size),
        "norm": {"w": np.ones((c.hidden_size,), np.float32)},
        "layers": layer_tree(c.hidden_size, c.num_attention_heads, c.num_key_value_heads,
                             c.head_dim, c.intermediate_size, c.num_hidden_layers),
    }
    cc = c.code_predictor_config
    ng = cc.num_code_groups - 1
    cp_params = {
        "codec_embedding": {"w": rng.standard_normal((ng, cc.vocab_size, c.hidden_size), dtype=np.float32) * np.float32(0.02)},
        "lm_head": {"w": rng.standard_normal((ng, cc.vocab_size, cc.hidden_size), dtype=np.float32) * np.float32(0.02)},
        "norm": {"w": np.ones((cc.hidden_size,), np.float32)},
        "layers": layer_tree(cc.hidden_size, cc.num_attention_heads, cc.num_key_value_heads,
                             cc.head_dim, cc.intermediate_size, cc.num_hidden_layers),
    }
    print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    params = apply_int8_quantization(params, kernel_layout=(mode == "kernel"))
    cp_params = apply_int8_quantization(cp_params, kernel_layout=(mode == "kernel"))
    print(f"int8 quantize ({mode}): {time.perf_counter()-t0:.1f}s", flush=True)
    save_trees(CACHE, params=params, cp=cp_params)
    print("cached", flush=True)
    if os.environ.get("CACHE_ONLY") == "1":
        sys.exit(0)

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
