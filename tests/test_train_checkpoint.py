"""Training checkpoint/resume (parallel/checkpoint.py) and remat.

The reference has no training and load-only checkpointing (SURVEY.md §5);
these tests pin the added capability: orbax save/restore of the joint train
state is exact, resume continues bit-identically with the uninterrupted run
(CPU float32 is deterministic), restore lands on the template's shardings
under a mesh, and remat changes memory behavior only — not numbers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import code_predictor as cp_mod
from qwen3_tts_tpu.models import talker as talker_mod
from qwen3_tts_tpu.parallel import checkpoint as ckpt
from qwen3_tts_tpu.parallel import sharding as sh
from qwen3_tts_tpu.parallel import train as train_mod
from qwen3_tts_tpu.testing import tiny_talker_config

pytestmark = pytest.mark.slow


def _init_state(config, seed=0):
    params = talker_mod.init_talker_params(config, jax.random.PRNGKey(seed))
    cp_params = cp_mod.init_cp_params(
        config.code_predictor_config, config.hidden_size, jax.random.PRNGKey(seed + 1)
    )
    return {"talker": params, "cp": cp_params}


def _tts_batch(config, b=2, t=8, seed=3):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    ng = config.code_predictor_config.num_code_groups
    return {
        "embeds": jax.random.normal(k1, (b, t, config.hidden_size)),
        "frames": jax.random.randint(
            k2, (b, t, ng), 0, config.code_predictor_config.vocab_size
        ),
        "mask": jnp.ones((b, t), jnp.float32),
    }


def _trees_equal(a, b):
    flat_a, tdef_a = jax.tree.flatten(a)
    flat_b, tdef_b = jax.tree.flatten(b)
    assert tdef_a == tdef_b
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_roundtrip_exact(tmp_path):
    config = tiny_talker_config()
    both = _init_state(config)
    optimizer, step = train_mod.make_tts_train_step(config)
    opt_state = jax.jit(optimizer.init)(both)
    both, opt_state, _, _ = step(both, opt_state, _tts_batch(config))

    state = {"params": both, "opt_state": opt_state}
    ckpt.save_train_state(str(tmp_path), 1, state)
    assert ckpt.latest_step(str(tmp_path)) == 1

    restored_step, restored = ckpt.restore_train_state(str(tmp_path), state)
    assert restored_step == 1
    _trees_equal(state, restored)


def test_resume_matches_uninterrupted(tmp_path):
    config = tiny_talker_config()
    optimizer, step = train_mod.make_tts_train_step(config)

    # Uninterrupted: 3 steps.
    both = _init_state(config)
    opt_state = jax.jit(optimizer.init)(both)
    for i in range(3):
        both, opt_state, _, _ = step(both, opt_state, _tts_batch(config, seed=10 + i))
    ref = jax.tree.map(np.asarray, both)

    # Interrupted: 2 steps, save, restore into a FRESH process-like template,
    # 1 more step.
    both2 = _init_state(config)
    opt_state2 = jax.jit(optimizer.init)(both2)
    for i in range(2):
        both2, opt_state2, _, _ = step(
            both2, opt_state2, _tts_batch(config, seed=10 + i)
        )
    ckpt.save_train_state(str(tmp_path), 2, {"params": both2, "opt_state": opt_state2})

    template = _init_state(config, seed=7)  # different values, same structure
    t_opt = jax.jit(optimizer.init)(template)
    step_no, restored = ckpt.restore_train_state(
        str(tmp_path), {"params": template, "opt_state": t_opt}
    )
    assert step_no == 2
    both3, opt_state3, _, _ = step(
        restored["params"], restored["opt_state"], _tts_batch(config, seed=12)
    )
    _trees_equal(ref, jax.tree.map(np.asarray, both3))


def test_restore_lands_on_template_shardings(tmp_path):
    """The resume path a sharded job actually takes: save the SHARDED train
    state (shard_params unfuses qkv/gateup into per-section entries, so the
    sharded tree's structure differs from the dense one), restore onto a
    freshly sharded same-structure template, and land on its shardings."""
    config = tiny_talker_config()
    mesh = sh.make_mesh(8, tp=2)
    both = _init_state(config)
    both["talker"] = sh.shard_params(both["talker"], mesh, config=config)
    ckpt.save_train_state(str(tmp_path), 5, both)

    template = _init_state(config, seed=7)  # different values, same structure
    template["talker"] = sh.shard_params(template["talker"], mesh, config=config)
    _, restored = ckpt.restore_train_state(str(tmp_path), template)
    _trees_equal(both, restored)

    # Spot-check an attention projection actually restored tp-sharded.
    want = template["talker"]["layers"]["qkv_proj"]["q"]["w"].sharding
    got = restored["talker"]["layers"]["qkv_proj"]["q"]["w"].sharding
    assert got == want, (got, want)


def test_retention_keeps_most_recent(tmp_path):
    config = tiny_talker_config()
    both = _init_state(config)
    for s in (1, 2, 3, 4):
        ckpt.save_train_state(str(tmp_path), s, both, keep=2)
    assert ckpt.all_steps(str(tmp_path)) == [3, 4]
    with pytest.raises(FileNotFoundError):
        ckpt.restore_train_state(str(tmp_path / "empty"), both)


def test_remat_same_numbers():
    config = tiny_talker_config()
    both = _init_state(config)
    batch = _tts_batch(config)

    loss_fn = lambda remat: jax.value_and_grad(
        lambda b: train_mod.tts_loss(b["talker"], b["cp"], batch, config, remat=remat)[0]
    )(both)
    (l0, g0), (l1, g1) = loss_fn(False), loss_fn(True)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
