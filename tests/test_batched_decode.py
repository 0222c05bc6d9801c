"""Batched serving tests: vmapped decode chunks must match per-stream decode."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.models import generate as G
from qwen3_tts_tpu.models import prompt as P
from qwen3_tts_tpu.testing import FakeByteTokenizer, tiny_models
import pytest

pytestmark = pytest.mark.slow


def _prep(cfg, params, text):
    pd = P.assemble_prompt(params, cfg, FakeByteTokenizer(), text, speaker="aiden")
    p = int(pd.input_embeds.shape[1])
    t = int(pd.trailing_hidden.shape[1])
    pb = G.pick_bucket(p)
    tb = G.pick_bucket(t, G.TRAILING_BUCKETS)
    e = jnp.zeros((1, pb, cfg.hidden_size)).at[:, :p].set(pd.input_embeds)
    tr = jnp.zeros((1, tb, cfg.hidden_size)).at[:, :t].set(pd.trailing_hidden)
    return pd, e, jnp.int32(p), tr, jnp.int32(t), pb


def test_batched_matches_single_greedy():
    cfg, params, cp_params = tiny_models()
    texts = [
        "First stream text for batched decode.",
        "A different second stream with other words.",
    ]
    statics = None
    states = []
    singles = []
    for i, text in enumerate(texts):
        pd, e, p, tr, t, pb = _prep(cfg, params, text)
        statics = G.GenStatics(
            config=cfg, capacity=pb + G.RING_SLACK, chunk_steps=8,
            track_cp_penalty=True,
        )
        st = G.prefill(params, e, p, tr, t, pd.tts_pad_embed,
                       jax.random.PRNGKey(i), statics)
        states.append(st)
        # single-stream reference (greedy)
        f, c, eos, _ = G.decode_chunk(
            params, cp_params,
            G.prefill(params, e, p, tr, t, pd.tts_pad_embed,
                      jax.random.PRNGKey(i), statics),
            jnp.float32(0.0), statics,
        )
        singles.append((np.asarray(f), int(c)))

    batched = G.stack_states(states)
    bf, bc, beos, _ = G.decode_chunk_batched(
        params, cp_params, batched, jnp.float32(0.0), statics
    )
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(bf[i]), singles[i][0])
        assert int(bc[i]) == singles[i][1]
