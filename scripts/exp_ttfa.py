"""Experiment: time-to-first-audio on the real TPU — warm prefill + first
18-frame decode chunk + vocoder decode of those frames (the streaming path's
first AudioChunk; BASELINE target < 200 ms)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from qwen3_tts_tpu.config import Qwen3TTSConfig, TokenizerDecoderConfig
from qwen3_tts_tpu.models import talker as talker_mod, code_predictor as cp_mod
from qwen3_tts_tpu.models import generate as gen_mod, prompt as prompt_mod, vocoder as voc
from qwen3_tts_tpu.testing import FakeByteTokenizer

config = Qwen3TTSConfig.standard()
vcfg = TokenizerDecoderConfig()  # real vocoder dims (1920x upsample)
dtype = jnp.bfloat16


@jax.jit
def device_init(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return (talker_mod.init_talker_params(config, k1, dtype),
            cp_mod.init_cp_params(config.code_predictor_config, config.hidden_size, k2, dtype),
            voc.init_vocoder_params(vcfg, k3, jnp.float32))


t0 = time.perf_counter()
params, cp_params, voc_params = device_init(jax.random.PRNGKey(0))
jax.block_until_ready(voc_params)
print(f"device init: {time.perf_counter()-t0:.1f}s", flush=True)

# attach the W8A8 mega-kernels (the default TPU decode path) unless "nokernel"
if "nokernel" not in sys.argv:
    from qwen3_tts_tpu.ops.pallas.cp_megakernel import build_cp_kernel_params_device
    from qwen3_tts_tpu.ops.pallas.talker_megakernel import (
        build_talker_kernel_params_device,
    )

    cp_params = dict(cp_params)
    cp_params["kernel"] = build_cp_kernel_params_device(
        cp_params, config.code_predictor_config
    )
    params = dict(params)
    params["kernel"] = build_talker_kernel_params_device(params, config)
    from qwen3_tts_tpu.ops.pallas.vocoder_kernels import (
        build_vocoder_kernel_params_device,
    )

    voc_params = dict(voc_params)
    voc_params["kernel"] = jax.jit(
        lambda pr: build_vocoder_kernel_params_device(pr, vcfg)
    )(voc_params)
    jax.block_until_ready((params["kernel"], cp_params["kernel"]))
    print("mega-kernels attached", flush=True)

pd = prompt_mod.assemble_prompt(params, config, FakeByteTokenizer(),
    "Time to first audio chunk measurement sentence.", speaker="aiden")
p = int(pd.input_embeds.shape[1]); t = int(pd.trailing_hidden.shape[1])
pb = gen_mod.pick_bucket(p); tb = gen_mod.pick_bucket(t, gen_mod.TRAILING_BUCKETS)
embeds = jnp.zeros((1, pb, config.hidden_size), dtype).at[:, :p].set(pd.input_embeds)
trailing = jnp.zeros((1, tb, config.hidden_size), dtype).at[:, :t].set(pd.trailing_hidden)
FIRST_CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 18
statics = gen_mod.GenStatics(config=config, capacity=pb + gen_mod.RING_SLACK,
                             chunk_steps=FIRST_CHUNK, track_cp_penalty=False)
temp = jnp.float32(0.9)

# warm up all three compiled programs
t0 = time.perf_counter()
state = gen_mod.prefill(params, embeds, jnp.int32(p), trailing, jnp.int32(t),
                        pd.tts_pad_embed, jax.random.PRNGKey(42), statics)
frames, count, eos, state = gen_mod.decode_chunk(params, cp_params, state, temp, statics)
codes = jnp.zeros((1, vcfg.num_quantizers, FIRST_CHUNK), jnp.int32)
wav = voc.decode_frames_jit(voc_params, codes, vcfg)
jax.block_until_ready((frames, wav))
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

# measure TTFA warm
t0 = time.perf_counter()
state = gen_mod.prefill(params, embeds, jnp.int32(p), trailing, jnp.int32(t),
                        pd.tts_pad_embed, jax.random.PRNGKey(42), statics)
frames, count, eos, state = gen_mod.decode_chunk(params, cp_params, state, temp, statics)
frames_np = np.asarray(frames)  # host sync (streaming consumer does this)
codes = jnp.asarray(np.clip(frames_np.T[None], 0, vcfg.codebook_size - 1))
wav = voc.decode_frames_jit(voc_params, codes, vcfg)
wav_np = np.asarray(wav)
ttfa = time.perf_counter() - t0
audio_s = FIRST_CHUNK * 1920 / 24000
print(f"RESULT TTFA: {ttfa*1000:.1f} ms for first {audio_s:.2f}s of audio "
      f"(target < 200 ms)", flush=True)

# vocoder-only steady-state RTF
t0 = time.perf_counter()
n = 5
for _ in range(n):
    wav = voc.decode_frames_jit(voc_params, codes, vcfg)
wav.block_until_ready()
dt = (time.perf_counter() - t0) / n
print(f"RESULT vocoder: {dt*1000:.1f} ms per {FIRST_CHUNK} frames "
      f"(RTF {dt/audio_s:.4f})", flush=True)
