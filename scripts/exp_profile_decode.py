"""Capture a jax.profiler trace of steady-state decode chunks on the TPU and
print the top self-time ops (via tensorboard_plugin_profile xplane parsing)."""
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod
from qwen3_tts_tpu.models import prompt as prompt_mod
from qwen3_tts_tpu.models import talker as talker_mod
from qwen3_tts_tpu.testing import FakeByteTokenizer

LOGDIR = "/tmp/decode_trace"

config = Qwen3TTSConfig.standard()
dtype = jnp.bfloat16
params = talker_mod.init_talker_params(config, jax.random.PRNGKey(0), dtype)
cp_params = cp_mod.init_cp_params(config.code_predictor_config, config.hidden_size,
                                  jax.random.PRNGKey(1), dtype)
pd = prompt_mod.assemble_prompt(params, config, FakeByteTokenizer(),
    "Profiling sentence for the decode loop on the TPU chip.", speaker="aiden")
p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
embeds = jnp.zeros((1, pb, config.hidden_size), dtype).at[:, :p].set(pd.input_embeds)
trailing = jnp.zeros((1, tb, config.hidden_size), dtype).at[:, :t].set(pd.trailing_hidden)
statics = gen_mod.GenStatics(config=config, capacity=pb + gen_mod.RING_SLACK,
                             chunk_steps=48, track_cp_penalty=True)
temp = jnp.float32(0.9)

state = gen_mod.prefill(params, embeds, jnp.int32(p), trailing, jnp.int32(t),
                        pd.tts_pad_embed, jax.random.PRNGKey(42), statics)
frames, count, eos, state = gen_mod.decode_chunk(params, cp_params, state, temp, statics)
frames.block_until_ready()
print("warm", flush=True)

with jax.profiler.trace(LOGDIR):
    for _ in range(2):
        frames, count, eos, state = gen_mod.decode_chunk(params, cp_params, state, temp, statics)
    frames.block_until_ready()
print("traced", flush=True)

# Parse the xplane and print top ops by self time.
xplanes = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"), recursive=True)
print("xplane files:", xplanes, flush=True)
if xplanes:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    params_tool = {"graph_viewer_options": {}}
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, params_tool)
            out = os.path.join("/tmp", f"decode_{tool}.out")
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"wrote {out} ({len(data)} bytes)", flush=True)
        except Exception as e:
            print(f"{tool} failed: {e}", flush=True)
print("DONE", flush=True)
