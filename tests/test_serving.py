"""Batched lockstep serving tests: greedy parity with the single-stream path,
ragged prompt lengths, EOS freezing, and orchestration."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.models import generate as G
from qwen3_tts_tpu.models import prompt as P
from qwen3_tts_tpu.models import serving as S
from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_models

TEXTS = [
    "First stream text for batched serving.",
    "A different and somewhat longer second stream with extra words at the end.",
    "Short third one here.",
]


def _single_greedy(cfg, params, cp_params, text, max_tokens=16, chunk=8):
    pd = P.assemble_prompt(params, cfg, FakeByteTokenizer(), text, speaker="aiden")
    frames = G.generate_codes(
        params, cp_params, cfg, pd,
        temperature=0.0, max_tokens=max_tokens, chunk_steps=chunk,
        track_cp_penalty=False,
    )
    return G.filter_valid_frames(frames)


def test_serving_greedy_matches_single():
    cfg, params, cp_params = tiny_models()
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in TEXTS
    ]
    batched = S.generate_codes_batched(
        params, cp_params, cfg, pds, temperature=0.0, max_tokens=16, chunk_steps=8
    )
    for i, text in enumerate(TEXTS):
        single = _single_greedy(cfg, params, cp_params, text)
        got = G.filter_valid_frames(batched[i])
        n = min(len(single), len(got))
        assert n > 0
        np.testing.assert_array_equal(got[:n], single[:n], err_msg=f"stream {i}")
        assert len(got) == len(single)


def test_serving_sampled_runs_and_validates():
    cfg, params, cp_params = tiny_models()
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in TEXTS[:2]
    ]
    out = S.generate_codes_batched(
        params, cp_params, cfg, pds, temperature=0.9, max_tokens=12, chunk_steps=6,
        seed=3,
    )
    assert len(out) == 2
    for frames in out:
        assert frames.shape[1] == 16
        valid = G.filter_valid_frames(frames)
        assert np.all(valid >= 0)


def test_serving_seeded_reproducible():
    cfg, params, cp_params = tiny_models()
    pds = [
        P.assemble_prompt(params, cfg, FakeByteTokenizer(), t, speaker="aiden")
        for t in TEXTS[:2]
    ]
    a = S.generate_codes_batched(
        params, cp_params, cfg, pds, temperature=0.8, max_tokens=8, seed=5
    )
    b = S.generate_codes_batched(
        params, cp_params, cfg, pds, temperature=0.8, max_tokens=8, seed=5
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_pipeline_generate_many(tmp_path):
    import jax.numpy as jnp

    from qwen3_tts_tpu.pipeline import Qwen3TTSPipeline
    from qwen3_tts_tpu.testing import write_tiny_model_dir

    write_tiny_model_dir(tmp_path)
    pl = Qwen3TTSPipeline(tmp_path, dtype=jnp.float32)
    texts = [
        "Batched pipeline first utterance.",
        "Second utterance with different words entirely.",
    ]
    outs = pl.generate_many(texts, "aiden", temperature=0.0, max_tokens=8, seed=1)
    assert len(outs) == 2
    for o in outs:
        assert len(o) > 0 and np.all(np.isfinite(o))
    # greedy parity with single-stream generate (which uses cp penalty=True by
    # default -> compare against the no-penalty single path via serving's own
    # parity test; here check shape consistency and determinism)
    outs2 = pl.generate_many(texts, "aiden", temperature=0.0, max_tokens=8, seed=1)
    for a, b in zip(outs, outs2):
        np.testing.assert_array_equal(a, b)


def test_stream_first_decode_chunk(tmp_path):
    import jax.numpy as jnp

    from qwen3_tts_tpu.pipeline import Qwen3TTSPipeline
    from qwen3_tts_tpu.testing import write_tiny_model_dir

    write_tiny_model_dir(tmp_path)
    pl = Qwen3TTSPipeline(tmp_path, dtype=jnp.float32)
    spf = pl._samples_per_frame
    chunks = list(
        pl.generate_stream(
            "Low latency streaming test sentence here.", "aiden",
            max_tokens=40, chunk_size=10, first_decode_chunk=9, seed=5,
        )
    )
    body = [c for c in chunks if len(c.samples)]
    assert len(body[0].samples) == 9 * spf  # early first chunk
    from qwen3_tts_tpu.pipeline import DECODE_CHUNK_SIZE

    if len(body) > 2:
        assert len(body[1].samples) == DECODE_CHUNK_SIZE * spf
    # audio equals the default-path audio for the same codes
    full = list(
        pl.generate_stream(
            "Low latency streaming test sentence here.", "aiden",
            max_tokens=40, chunk_size=10, seed=5,
        )
    )
    a = np.concatenate([c.samples for c in body])
    b = np.concatenate([c.samples for c in full if len(c.samples)])
    # same codes; vocoder context boundaries differ -> compare lengths only
    assert len(a) == len(b)
