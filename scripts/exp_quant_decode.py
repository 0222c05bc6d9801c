"""Experiment: decode RTF for all-4bit quantized talker+cp, jnp path vs
Pallas kernel path, against the bf16 baseline. Run on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, ml_dtypes
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.ops.quant import quantize_np
from qwen3_tts_tpu.ops.pallas.quant_matmul import repack_for_kernel
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod
from qwen3_tts_tpu.testing import FakeByteTokenizer

rng = np.random.default_rng(0)
config = Qwen3TTSConfig.standard()
cpc = config.code_predictor_config
h, th, nl, hd, nq, nkv, I = (config.hidden_size, config.text_hidden_size,
    config.num_hidden_layers, config.head_dim, config.num_attention_heads,
    config.num_key_value_heads, config.intermediate_size)
hc, cnl, cI = cpc.hidden_size, cpc.num_hidden_layers, cpc.intermediate_size
cnq, cnkv, chd, ng = (cpc.num_attention_heads, cpc.num_key_value_heads,
                      cpc.head_dim, cpc.num_code_groups - 1)

def qdense(out, inn, bits):
    w = rng.standard_normal((out, inn), np.float32) * 0.02
    p, s, b = quantize_np(w, bits, 64)
    return {"wq": p, "scales": s, "biases": b}

def ddense(out, inn, bias=False):
    p = {"w": rng.standard_normal((out, inn), np.float32) * 0.02}
    if bias:
        p["b"] = np.zeros((out,), np.float32)
    return p

def stack(fn, n):
    e = [fn() for _ in range(n)]
    return {k: np.stack([x[k] for x in e]) for k in e[0]}

def build(make_lin):
    params = {
      "text_embedding": {"w": rng.standard_normal((8192, th), np.float32) * 0.02},
      "codec_embedding": {"w": rng.standard_normal((config.vocab_size, h), np.float32) * 0.02},
      "text_projection": {"fc1": ddense(th, th, True), "fc2": ddense(h, th, True)},
      "codec_head": make_lin(config.vocab_size, h),
      "norm": {"w": np.ones((h,), np.float32)},
      "layers": {
        "input_layernorm": {"w": np.ones((nl, h), np.float32)},
        "post_attention_layernorm": {"w": np.ones((nl, h), np.float32)},
        "q_norm": {"w": np.ones((nl, hd), np.float32)},
        "k_norm": {"w": np.ones((nl, hd), np.float32)},
        "q_proj": stack(lambda: make_lin(nq*hd, h), nl),
        "k_proj": stack(lambda: make_lin(nkv*hd, h), nl),
        "v_proj": stack(lambda: make_lin(nkv*hd, h), nl),
        "o_proj": stack(lambda: make_lin(h, nq*hd), nl),
        "gate_proj": stack(lambda: make_lin(I, h), nl),
        "up_proj": stack(lambda: make_lin(I, h), nl),
        "down_proj": stack(lambda: make_lin(h, I), nl),
      },
    }
    cp_params = {
      "codec_embedding": {"w": rng.standard_normal((ng, cpc.vocab_size, h), np.float32) * 0.02},
      "lm_head": {"w": rng.standard_normal((ng, cpc.vocab_size, hc), np.float32) * 0.02},
      "norm": {"w": np.ones((hc,), np.float32)},
      "layers": {
        "input_layernorm": {"w": np.ones((cnl, hc), np.float32)},
        "post_attention_layernorm": {"w": np.ones((cnl, hc), np.float32)},
        "q_norm": {"w": np.ones((cnl, chd), np.float32)},
        "k_norm": {"w": np.ones((cnl, chd), np.float32)},
        "q_proj": stack(lambda: make_lin(cnq*chd, hc), cnl),
        "k_proj": stack(lambda: make_lin(cnkv*chd, hc), cnl),
        "v_proj": stack(lambda: make_lin(cnkv*chd, hc), cnl),
        "o_proj": stack(lambda: make_lin(hc, cnq*chd), cnl),
        "gate_proj": stack(lambda: make_lin(cI, hc), cnl),
        "up_proj": stack(lambda: make_lin(cI, hc), cnl),
        "down_proj": stack(lambda: make_lin(hc, cI), cnl),
      },
    }
    return params, cp_params

def add_kl_tree(tree, bits):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            if "wq" in v:
                wq = v["wq"]
                lead = wq.shape[:-2]
                flat = wq.reshape(-1, wq.shape[-2], wq.shape[-1])
                kl = np.stack([repack_for_kernel(m, bits, 64) for m in flat])
                out[k] = {**v, "wq_kl": kl.reshape(wq.shape)}
            else:
                out[k] = add_kl_tree(v, bits)
        else:
            out[k] = v
    return out

def measure(tag, params, cp_params):
    cast = lambda x: np.asarray(x) if np.asarray(x).dtype.kind in "ui" else np.asarray(x, ml_dtypes.bfloat16)
    qp = jax.device_put(jax.tree.map(cast, params))
    qc = jax.device_put(jax.tree.map(cast, cp_params))
    jax.block_until_ready((qp, qc))
    dtype = jnp.bfloat16
    pd = prompt_mod.assemble_prompt(qp, config, FakeByteTokenizer(),
        "A benchmark sentence for decode speed measurement on the TPU chip.", speaker="aiden")
    p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
    pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
    embeds = jnp.zeros((1, pb, h), dtype).at[:, :p].set(pd.input_embeds.astype(dtype))
    trailing = jnp.zeros((1, tb, h), dtype).at[:, :t].set(pd.trailing_hidden.astype(dtype))
    statics = gen_mod.GenStatics(config=config, capacity=pb + gen_mod.RING_SLACK,
                                 chunk_steps=48, track_cp_penalty=True)
    temp = jnp.float32(0.9)
    tp = pd.tts_pad_embed.astype(dtype)
    t0 = time.perf_counter()
    state = gen_mod.prefill(qp, embeds, jnp.int32(p), trailing, jnp.int32(t), tp, jax.random.PRNGKey(42), statics)
    frames, count, eos, state = gen_mod.decode_chunk(qp, qc, state, temp, statics)
    frames.block_until_ready()
    print(f"{tag} compile: {time.perf_counter()-t0:.1f}s", flush=True)
    state = gen_mod.prefill(qp, embeds, jnp.int32(p), trailing, jnp.int32(t), tp, jax.random.PRNGKey(42), statics)
    jax.block_until_ready(state)
    t0 = time.perf_counter(); n = 3
    for _ in range(n):
        frames, count, eos, state = gen_mod.decode_chunk(qp, qc, state, temp, statics)
    frames.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"RESULT {tag}: {dt/(n*48)*1000:.2f} ms/frame RTF={dt/(n*48*0.08):.4f}", flush=True)

mode = sys.argv[1] if len(sys.argv) > 1 else "bf16"
t0 = time.perf_counter()
if mode == "jnp4":
    p_, c_ = build(lambda o, i: qdense(o, i, 4))
elif mode == "pallas4":
    p_, c_ = build(lambda o, i: qdense(o, i, 4))
    p_ = add_kl_tree(p_, 4); c_ = add_kl_tree(c_, 4)
elif mode == "pallas8":
    p_, c_ = build(lambda o, i: qdense(o, i, 8))
    p_ = add_kl_tree(p_, 8); c_ = add_kl_tree(c_, 8)
else:
    p_, c_ = build(lambda o, i: ddense(o, i))
print(f"build {mode}: {time.perf_counter()-t0:.1f}s", flush=True)
measure(mode, p_, c_)
print("DONE", flush=True)
