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


def quantize_int8_tree_jnp(tree, group=64):
    """Device-side int8 affine quantization of every fused linear entry,
    with the Pallas kernel lane permutation applied on device."""
    from qwen3_tts_tpu.ops.pallas.quant_matmul import kernel_lane_order

    def q_entry(entry):
        w = entry["w"].astype(jnp.float32)
        o, k = w.shape[-2], w.shape[-1]
        if k % group:
            return entry
        g = w.reshape(*w.shape[:-1], k // group, group)
        wmin = g.min(-1)
        wmax = g.max(-1)
        scales = jnp.maximum((wmax - wmin) / 255.0, 1e-12)
        biases = wmin
        q = jnp.clip(jnp.round((g - biases[..., None]) / scales[..., None]), 0, 255)
        w8 = q.reshape(*w.shape).astype(jnp.uint8)
        perm = jnp.asarray(kernel_lane_order(k, group))
        out = {"w8": w8, "scales": scales, "biases": biases,
               "w8_kl": jnp.take(w8, perm, axis=-1)}
        if "b" in entry:
            out["b"] = entry["b"]
        return out

    def walk(node):
        if isinstance(node, dict) and "w" in node and node["w"].ndim >= 2 and node["w"].shape[-1] >= group:
            # only quantize linear-like entries (skip norms/embeddings by name upstream)
            return q_entry(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    out = dict(tree)
    for grp, names in (("text_projection", ("fc1", "fc2")),
                       ("layers", ("qkv_proj", "o_proj", "gateup_proj", "down_proj"))):
        if grp in out:
            sub = dict(out[grp])
            for n in names:
                if n in sub and "w" in sub[n]:
                    sub[n] = q_entry(sub[n])
            out[grp] = sub
    for n in ("codec_head", "small_to_mtp_projection"):
        if n in out and "w" in out[n]:
            out[n] = q_entry(out[n])
    return out


t0 = time.perf_counter()
dtype = jnp.bfloat16


@jax.jit
def device_init(key):
    k1, k2 = jax.random.split(key)
    params = talker_mod.init_talker_params(config, k1, dtype)
    cp_params = cp_mod.init_cp_params(
        config.code_predictor_config, config.hidden_size, k2, dtype
    )
    if mode != "bf16":
        params = quantize_int8_tree_jnp(params)
        cp_params = quantize_int8_tree_jnp(cp_params)
    return params, cp_params


params, cp_params = device_init(jax.random.PRNGKey(0))
jax.block_until_ready((params, cp_params))
print(f"device init+quant ({mode}): {time.perf_counter()-t0:.1f}s", flush=True)

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
