"""Jacobi (fixed-point) decoding prototype for the code predictor.

The cp mega-kernel is latency-bound: ~75 sequential (group x layer) micro
steps at ~10.5 us each (ROADMAP decomposition). Jacobi iteration replaces the
sequential chain with parallel SWEEPS: draft all 15 codes, run ONE causal
16-position pass (same per-dot cost as a single token pass — M_PAD=32 already
covers 16 rows), re-sample every group from its own position's logits with
per-group noise FIXED across sweeps, repeat until the codes stop changing.
Prefix convergence is guaranteed (group k is exact after sweep k), so the
fixpoint equals the sequential result EXACTLY — greedy and fixed-noise
sampling both — in at most 15 sweeps.

Whether this wins depends on the sweep-count distribution: break-even is
~10 sweeps; real RVQ acoustic groups are weakly coupled so 2-5 is expected,
but the BENCH runs synthetic random weights, which may behave differently.
This script measures exactly that before any kernel work.

Usage: python scripts/exp_cp_jacobi.py [n_trials]
"""
import sys, os
import functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from qwen3_tts_tpu.config import Qwen3TTSConfig
from qwen3_tts_tpu.models import code_predictor as cp_mod
from qwen3_tts_tpu.ops.pallas.cp_megakernel import (
    build_cp_kernel_params_device,
)
from qwen3_tts_tpu.ops.quant import w8a8_linear_ref

P = lambda *a: print(*a, flush=True)


@functools.partial(jax.jit, static_argnums=(0,))
def parallel_pass_jit(cp_cfg_and_th, kp, codes, x0, gumbel, temp, seen):
    """Causal 16-position pass given draft codes (ng,) -> new codes."""
    cp_cfg, th = cp_cfg_and_th
    ng = cp_cfg.num_code_groups - 1
    n_pos = ng + 1
    hc = cp_cfg.hidden_size
    hd = cp_cfg.head_dim
    nq = cp_cfg.num_attention_heads
    nkv = cp_cfg.num_key_value_heads
    nl = cp_cfg.num_hidden_layers
    inter = cp_cfg.intermediate_size
    eps = cp_cfg.rms_norm_eps
    group = nq // nkv
    scale = 1.0 / float(hd) ** 0.5
    cos = kp["cos"]
    sin = kp["sin"]

    def rms(x, w):
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + eps) * w.astype(jnp.float32)

    def rot_half(x):
        return jnp.concatenate([-x[..., hd // 2:], x[..., :hd // 2]], axis=-1)

    pen = jnp.where(seen > 0, jnp.float32(1.05), jnp.float32(1.0))  # (ng, V)

    def embed_in(k, code):
        return (
            kp["emb_q"][k][code].astype(jnp.float32) * kp["emb_s"][k][0, code]
            + kp["emb_m"][k][0, code]
        )

    rows = [x0[0], x0[1]] + [embed_in(k, codes[k]) for k in range(ng - 1)]
    X = jnp.stack(rows, axis=0)  # (n_pos, hc)
    h = X
    for l in range(nl):
        xin = rms(h, kp["in_ln"][l][0])
        qkv = w8a8_linear_ref(
            xin, kp["qkv_q"][l], kp["qkv_s"][l][0], kp["qkv_m"][l][0]
        )  # (n_pos, (nq+2nkv)*hd)
        q = qkv[:, : nq * hd].reshape(n_pos, nq, hd)
        k = qkv[:, nq * hd:(nq + nkv) * hd].reshape(n_pos, nkv, hd)
        v = qkv[:, (nq + nkv) * hd:].reshape(n_pos, nkv, hd)
        q = rms(q, kp["q_ln"][l][0])
        k = rms(k, kp["k_ln"][l][0])
        q = q * cos[:, None, :] + rot_half(q) * sin[:, None, :]
        k = k * cos[:, None, :] + rot_half(k) * sin[:, None, :]
        kg = jnp.repeat(k, group, axis=1)  # (n_pos, nq, hd)
        vg = jnp.repeat(v, group, axis=1)
        sc = jnp.einsum(
            "qnd,knd->nqk", q, kg,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale  # (nq, n_pos_q, n_pos_k)
        causal = (
            jnp.arange(n_pos)[:, None] >= jnp.arange(n_pos)[None, :]
        )
        sc = jnp.where(causal[None, :, :], sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1)
        out = jnp.einsum(
            "nqk,knd->qnd", p, vg,
            precision=jax.lax.Precision.HIGHEST,
        )  # (n_pos, nq, hd)
        attn = out.reshape(n_pos, nq * hd)
        h = h + w8a8_linear_ref(
            attn, kp["o_q"][l], kp["o_s"][l][0], kp["o_m"][l][0]
        )
        x2 = rms(h, kp["post_ln"][l][0])
        gu = w8a8_linear_ref(
            x2, kp["gu_q"][l], kp["gu_s"][l][0], kp["gu_m"][l][0]
        )
        act = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
        h = h + w8a8_linear_ref(
            act, kp["dn_q"][l], kp["dn_s"][l][0], kp["dn_m"][l][0]
        )
    h_fin = rms(h, kp["fin_ln"][0])  # (n_pos, hc)
    new = []
    for k in range(ng):
        logits = w8a8_linear_ref(
            h_fin[k + 1:k + 2], kp["head_q"][k], kp["head_s"][k][0],
            kp["head_m"][k][0],
        )[0]
        lg = logits / pen[k]
        sc_ = jnp.where(temp > 0, lg + temp * gumbel[k], lg)
        new.append(jnp.argmax(sc_).astype(jnp.int32))
    return jnp.stack(new)


def jacobi_stats(config, kp, code_hidden, code0_embed, gumbel, temp, seen):
    """Run Jacobi sweeps in w8a8 ref math. Returns (codes, n_sweeps,
    per-sweep changed counts). Also runs the sequential chain with the SAME
    noise and asserts the fixpoint matches it."""
    cp_cfg = config.code_predictor_config
    ng = cp_cfg.num_code_groups - 1

    x0 = jnp.concatenate(
        [code_hidden.astype(jnp.float32), code0_embed.astype(jnp.float32)],
        axis=0,
    )  # (2, th)
    if "proj_w" in kp:
        x0 = x0 @ kp["proj_w"].astype(jnp.float32).T + kp["proj_b"].astype(
            jnp.float32
        )

    static = (cp_cfg, config.hidden_size)
    pp = lambda codes: parallel_pass_jit(static, kp, codes, x0, gumbel, temp, seen)

    # sequential reference with the same noise: iterate positions one by one
    # (prefix of each Jacobi sweep is already exact, so running the parallel
    # pass ng times from a zero draft IS the sequential result)
    codes_seq = jnp.zeros((ng,), jnp.int32)
    for _ in range(ng):
        codes_seq = pp(codes_seq)

    codes = jnp.zeros((ng,), jnp.int32)
    changed_per_sweep = []
    for s in range(ng + 1):
        new = pp(codes)
        changed = int(jnp.sum(new != codes))
        changed_per_sweep.append(changed)
        codes = new
        if changed == 0:
            break
    n_sweeps = len(changed_per_sweep)  # last sweep is the fixpoint check
    assert np.array_equal(np.asarray(codes), np.asarray(codes_seq)), (
        np.asarray(codes), np.asarray(codes_seq)
    )
    return np.asarray(codes), n_sweeps, changed_per_sweep


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    config = Qwen3TTSConfig.standard()
    cp_cfg = config.code_predictor_config
    ng = cp_cfg.num_code_groups - 1
    vocab = cp_cfg.vocab_size
    th = config.hidden_size

    key = jax.random.PRNGKey(0)
    # device-side jitted init: eager init on this throttled host takes >15 min
    cp_params = jax.jit(
        lambda k: cp_mod.init_cp_params(cp_cfg, th, k, jnp.bfloat16)
    )(key)
    jax.block_until_ready(cp_params)
    P("cp params initialized")
    kp = build_cp_kernel_params_device(cp_params, cp_cfg)
    jax.block_until_ready(kp)
    P("cp kernel params built (0.6B dims)")

    for temp_v, label in ((0.0, "greedy"), (0.9, "temp=0.9")):
        sweeps_all = []
        for trial in range(n_trials):
            kt = jax.random.fold_in(key, trial + 1)
            k1, k2, k3, k4 = jax.random.split(kt, 4)
            # hidden states roughly unit-RMS after the final norm
            code_hidden = jax.random.normal(k1, (1, th), jnp.float32)
            code0_embed = jax.random.normal(k2, (1, th), jnp.float32) * 0.02
            gumbel = jax.random.gumbel(k3, (ng, vocab), jnp.float32)
            seen = (jax.random.uniform(k4, (ng, vocab)) < 0.01).astype(
                jnp.float32
            )
            _, n_sweeps, changed = jacobi_stats(
                config, kp, code_hidden, code0_embed, gumbel,
                jnp.float32(temp_v), seen,
            )
            sweeps_all.append(n_sweeps)
            P(f"  [{label}] trial {trial}: sweeps={n_sweeps} changed={changed}")
        arr = np.array(sweeps_all)
        P(f"{label}: sweeps mean={arr.mean():.2f} median={np.median(arr):.0f} "
          f"max={arr.max()} (break-even ~10)")


if __name__ == "__main__":
    main()
