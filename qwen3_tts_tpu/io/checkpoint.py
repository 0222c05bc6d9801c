"""Checkpoint loading: reference-format safetensors -> framework param trees.

Reproduces the reference's four key-namespace sanitizers (SURVEY.md §2a rows
2/9/10/11):

  - talker / code-predictor remap: strip "talker.", collapse
    "code_predictor.model." -> "code_predictor.", strip "model.", drop
    "audio_decoder." keys (reference Qwen3Talker.swift:114-137)
  - dequantize-on-load: any uint-packed ".weight" with a sibling ".scales"
    (and optional ".biases") is expanded via the group-affine scheme when the
    model is NOT running pre-quantized (reference Qwen3Talker.swift:139-175);
    when it IS pre-quantized the packed triple is kept and fed to the
    quantized matmul path
  - vocoder sanitizer: strip "audio_decoder."/"decoder." prefixes
    ("decoder.decoder." keeps one), drop encoder keys, reconstruct RVQ
    codebooks from EMA stats embed = embedding_sum / clip(cluster_usage,
    1e-5), re-lay conv kernels (reference AudioDecoder.swift:196-305)

Layout conversions into this framework's conventions (all channels-last):
  conv torch [Cout, Cin, K]            -> HIO [K, Cin, Cout]
  transpose conv torch [Cin, Cout, K]  -> flip K -> HIO [K, Cin, Cout]
  linear / embedding                   -> unchanged ([out, in] / [V, D])
Per-layer weights are stacked on a leading layer axis to match the scanned
model code (models/talker.py, models/vocoder.py).
"""

from __future__ import annotations

import numpy as np

from ..config import Qwen3TTSConfig, QuantizationSettings, TokenizerDecoderConfig
from ..ops.quant import dequantize_np

__all__ = [
    "remap_talker_keys",
    "dequantize_weights",
    "load_talker_checkpoint",
    "load_vocoder_checkpoint",
]


# ---------------------------------------------------------------------------
# Key remap + dequant passes
# ---------------------------------------------------------------------------


def remap_talker_keys(weights: dict) -> dict:
    """Prefix remap (reference Qwen3Talker.swift:117-137)."""
    out = {}
    for key, value in weights.items():
        if key.startswith("audio_decoder."):
            continue
        k = key
        if k.startswith("talker."):
            k = k[len("talker."):]
        if k.startswith("code_predictor.model."):
            k = "code_predictor." + k[len("code_predictor.model."):]
        if k.startswith("model."):
            k = k[len("model."):]
        out[k] = value
    return out


def _derived_bits(wq, scales, settings: QuantizationSettings) -> tuple[int, int]:
    """Per-tensor (bits, group_size) derived from the packed shapes.

    Mixed-width checkpoints (the reference's own runtime scheme: 6-bit
    embed/qkv/heads, 4-bit rest, Qwen3TTSPipeline.swift:961-980) store
    DIFFERENT widths per tensor, so settings.bits must never be trusted for
    an individual tensor — settings only contributes the group-size hint."""
    from ..ops.linear import derive_packed_dims

    entry = {"wq": wq, "scales": scales}
    if settings.enabled and settings.group_size != 64:
        entry[f"g{settings.group_size}"] = np.zeros((0,), np.int8)
    bits, gs, _ = derive_packed_dims(entry)
    return bits, gs


def dequantize_weights(weights: dict, settings: QuantizationSettings) -> dict:
    """Expand every packed (.weight uint + .scales [+ .biases]) triple to a
    float16 dense weight (reference Qwen3Talker.swift:141-175)."""
    out = dict(weights)
    drop: set[str] = set()
    for key in list(out):
        if not key.endswith(".weight"):
            continue
        w = out[key]
        if w.dtype not in (np.uint8, np.uint16, np.uint32):
            continue
        scales_key = key[: -len(".weight")] + ".scales"
        biases_key = key[: -len(".weight")] + ".biases"
        scales = out.get(scales_key)
        if scales is None:
            continue
        biases = out.get(biases_key)
        packed = np.ascontiguousarray(w).view(np.uint32) if w.dtype != np.uint32 else w
        bits, gs = _derived_bits(packed, scales, settings)
        out[key] = dequantize_np(
            packed, np.asarray(scales, np.float32),
            np.asarray(biases, np.float32) if biases is not None else None,
            bits=bits, group_size=gs, dtype=np.float16,
        )
        drop.update((scales_key, biases_key))
    for k in drop:
        out.pop(k, None)
    # Any stragglers (reference drops all remaining .scales/.biases too)
    return {k: v for k, v in out.items() if not (k.endswith(".scales") or k.endswith(".biases"))}


# ---------------------------------------------------------------------------
# Talker + code predictor assembly
# ---------------------------------------------------------------------------


def _linear_entry(w: dict, prefix: str, dtype) -> dict:
    """Build a linear param dict from checkpoint keys: dense {"w"[, "b"]} or
    packed {"wq", "scales"[, "biases"][, "b"]}."""
    weight = w[f"{prefix}.weight"]
    entry: dict = {}
    if weight.dtype == np.uint32:
        entry["wq"] = weight
        entry["scales"] = np.asarray(w[f"{prefix}.scales"], dtype)
        if f"{prefix}.biases" in w:
            entry["biases"] = np.asarray(w[f"{prefix}.biases"], dtype)
    else:
        entry["w"] = np.asarray(weight, dtype)
    if f"{prefix}.bias" in w:
        entry["b"] = np.asarray(w[f"{prefix}.bias"], dtype)
    return entry


def _fuse_out(*entries: dict) -> dict:
    """Fuse linear params along the OUTPUT axis (q/k/v -> qkv, gate/up ->
    gateup). Output rows are independent, so results are bitwise identical to
    separate matmuls; works for dense ("w"), packed ("wq"/"scales"/"biases"/
    "wq_kl" — rows are packed independently), and biases ("b")."""
    keys = entries[0].keys()
    mismatched = any(e.keys() != keys for e in entries[1:]) or any(
        np.asarray(e[k]).shape[1:] != np.asarray(entries[0][k]).shape[1:]
        for e in entries[1:]
        for k in (keys & e.keys())
        if k != "b"
    )
    if mismatched:
        # q/k/v (or gate/up) quantized at different widths: fuse their exact
        # dequantized values instead (see _stack on heterogeneous layers)
        out = {
            "w": np.concatenate(
                [_entry_dense(e, np.float32) for e in entries], axis=0
            )
        }
        if all("b" in e for e in entries):
            out["b"] = np.concatenate(
                [np.asarray(e["b"], np.float32) for e in entries], axis=0
            )
        return out
    return {k: np.concatenate([e[k] for e in entries], axis=0) for k in keys}


def _entry_dense(entry: dict, dtype) -> np.ndarray:
    """Materialize one linear/table entry as a dense weight. Packed entries
    derive their (bits, group) from the shapes (ops/linear.py heuristic)."""
    if "w" in entry:
        return np.asarray(entry["w"], dtype)
    from ..ops.linear import derive_packed_dims

    bits, gs, _ = derive_packed_dims(entry)
    return dequantize_np(
        entry["wq"], entry["scales"], entry.get("biases"),
        bits=bits, group_size=gs, dtype=dtype,
    )


def _stack(entries: list[dict], dtype=np.float32) -> dict:
    """Stack a list of param dicts on a new leading axis.

    Homogeneous entries stack as-is (dense or packed). HETEROGENEOUS entries —
    e.g. a checkpoint quantizing layer 0's qkv at 6 bits and layer 5's at 4
    (the reference loads these because every layer is its own module,
    Qwen3Talker.swift:141-175) — are dequantized to a dense stack: exact
    values, at the cost of dense storage for that field (the TPU decode path
    re-quantizes into the W8A8 mega-kernels regardless)."""
    keys = entries[0].keys()
    homogeneous = all(e.keys() == keys for e in entries) and all(
        np.asarray(e[k]).shape == np.asarray(entries[0][k]).shape
        and np.asarray(e[k]).dtype == np.asarray(entries[0][k]).dtype
        for e in entries
        for k in keys
    )
    if homogeneous:
        return {k: np.stack([e[k] for e in entries]) for k in keys}
    out = {"w": np.stack([_entry_dense(e, dtype) for e in entries])}
    if all("b" in e for e in entries):
        out["b"] = np.stack([np.asarray(e["b"], dtype) for e in entries])
    return out


def _embed_dense(w: dict, prefix: str, settings: QuantizationSettings, dtype) -> np.ndarray:
    """Embedding table, dequantized if stored packed (lookups stay dense)."""
    weight = w[f"{prefix}.weight"]
    if weight.dtype == np.uint32 and f"{prefix}.scales" in w:
        bits, gs = _derived_bits(weight, w[f"{prefix}.scales"], settings)
        return dequantize_np(
            weight, w[f"{prefix}.scales"], w.get(f"{prefix}.biases"),
            bits=bits, group_size=gs, dtype=dtype,
        )
    return np.asarray(weight, dtype)


def _embed_entry(
    w: dict, prefix: str, settings: QuantizationSettings, dtype, keep_packed: bool
) -> dict:
    """Embedding table entry: packed storage is KEPT on the quantized path
    (ops/linear.py embedding_lookup gather-dequantizes rows — the reference's
    quantized-Embedding memory model, Qwen3TTSPipeline.swift:961-980), else
    dequantized to dense."""
    weight = w[f"{prefix}.weight"]
    if keep_packed and weight.dtype == np.uint32 and f"{prefix}.scales" in w:
        entry = {"wq": weight, "scales": np.asarray(w[f"{prefix}.scales"], dtype)}
        if f"{prefix}.biases" in w:
            entry["biases"] = np.asarray(w[f"{prefix}.biases"], dtype)
        if settings.enabled and settings.group_size != 64:
            # group-size marker for derive_packed_dims (key encodes it; the
            # zero-size leaf keeps it pytree-structural, static under jit)
            entry[f"g{settings.group_size}"] = np.zeros((0,), np.int8)
        return entry
    return {"w": _embed_dense(w, prefix, settings, dtype)}


def load_talker_checkpoint(
    weights: dict, config: Qwen3TTSConfig, dtype=np.float32
) -> tuple[dict, dict]:
    """Assemble (talker_params, cp_params) trees from a reference-format
    checkpoint dict (reference Qwen3Talker.swift:114-270).

    Pre-quantized checkpoints (config.quantization set) keep Linear layers
    packed for the quantized matmul path; otherwise any packed weights are
    dequantized on load per config.quantization_config.
    """
    w = remap_talker_keys(weights)
    settings = config.quantization_settings
    if config.quantization is None:
        dq = QuantizationSettings(
            enabled=True,
            bits=settings.bits if settings.enabled else 8,
            group_size=settings.group_size if settings.enabled else 64,
        )
        w = dequantize_weights(w, dq)

    nl = config.num_hidden_layers

    def layer_field(path_fmt: str, builder) -> dict:
        return _stack([builder(path_fmt.format(i=i)) for i in range(nl)])

    def lin(p: str) -> dict:
        entry = _linear_entry(w, p, dtype)
        if "wq" in entry:
            if settings.enabled and settings.group_size != 64:
                entry[f"g{settings.group_size}"] = np.zeros((0,), np.int8)
            # Pre-quantized checkpoint: add the Pallas kernel-layout copy on
            # TPU. Bits/group are derived PER TENSOR from its shapes (mixed-
            # width checkpoints carry different widths; add_kernel_layout
            # itself no-ops for widths outside PALLAS_BITS).
            import jax

            if jax.default_backend() == "tpu":
                from ..ops.pallas.quant_matmul import add_kernel_layout

                bits, gs = _derived_bits(entry["wq"], entry["scales"], settings)
                entry = add_kernel_layout(entry, bits, gs)
        return entry
    norm = lambda p: {"w": np.asarray(w[f"{p}.weight"], dtype)}  # noqa: E731

    keep_packed = config.quantization is not None
    params = {
        "text_embedding": _embed_entry(
            w, "text_embedding", settings, dtype, keep_packed
        ),
        "codec_embedding": _embed_entry(
            w, "codec_embedding", settings, dtype, keep_packed
        ),
        "text_projection": {
            "fc1": lin("text_projection.linear_fc1"),
            "fc2": lin("text_projection.linear_fc2"),
        },
        "codec_head": lin("codec_head"),
        "norm": norm("norm"),
        "layers": {
            "input_layernorm": layer_field("layers.{i}.input_layernorm", lambda p: norm(p)),
            "post_attention_layernorm": layer_field(
                "layers.{i}.post_attention_layernorm", lambda p: norm(p)
            ),
            "q_norm": layer_field("layers.{i}.self_attn.q_norm", lambda p: norm(p)),
            "k_norm": layer_field("layers.{i}.self_attn.k_norm", lambda p: norm(p)),
            "qkv_proj": layer_field(
                "layers.{i}", lambda pre: _fuse_out(
                    lin(f"{pre}.self_attn.q_proj"),
                    lin(f"{pre}.self_attn.k_proj"),
                    lin(f"{pre}.self_attn.v_proj"),
                )
            ),
            "o_proj": layer_field("layers.{i}.self_attn.o_proj", lin),
            "gateup_proj": layer_field(
                "layers.{i}", lambda pre: _fuse_out(
                    lin(f"{pre}.mlp.gate_proj"), lin(f"{pre}.mlp.up_proj")
                )
            ),
            "down_proj": layer_field("layers.{i}.mlp.down_proj", lin),
        },
    }

    cp_cfg = config.code_predictor_config
    ng = cp_cfg.num_code_groups - 1
    ncl = cp_cfg.num_hidden_layers

    def cp_layer_field(path_fmt: str, builder) -> dict:
        return _stack([builder(path_fmt.format(i=i)) for i in range(ncl)])

    cp_params = {
        "codec_embedding": _stack(
            [
                _embed_entry(
                    w, f"code_predictor.codec_embedding.{i}", settings, dtype,
                    keep_packed,
                )
                for i in range(ng)
            ]
        ),
        "lm_head": _stack(
            [
                _embed_entry(
                    w, f"code_predictor.lm_head.{i}", settings, dtype, keep_packed
                )
                for i in range(ng)
            ]
        ),
        "norm": norm("code_predictor.norm"),
        "layers": {
            "input_layernorm": cp_layer_field(
                "code_predictor.layers.{i}.input_layernorm", lambda p: norm(p)
            ),
            "post_attention_layernorm": cp_layer_field(
                "code_predictor.layers.{i}.post_attention_layernorm", lambda p: norm(p)
            ),
            "q_norm": cp_layer_field(
                "code_predictor.layers.{i}.self_attn.q_norm", lambda p: norm(p)
            ),
            "k_norm": cp_layer_field(
                "code_predictor.layers.{i}.self_attn.k_norm", lambda p: norm(p)
            ),
            "qkv_proj": cp_layer_field(
                "code_predictor.layers.{i}", lambda pre: _fuse_out(
                    lin(f"{pre}.self_attn.q_proj"),
                    lin(f"{pre}.self_attn.k_proj"),
                    lin(f"{pre}.self_attn.v_proj"),
                )
            ),
            "o_proj": cp_layer_field("code_predictor.layers.{i}.self_attn.o_proj", lin),
            "gateup_proj": cp_layer_field(
                "code_predictor.layers.{i}", lambda pre: _fuse_out(
                    lin(f"{pre}.mlp.gate_proj"), lin(f"{pre}.mlp.up_proj")
                )
            ),
            "down_proj": cp_layer_field("code_predictor.layers.{i}.mlp.down_proj", lin),
        },
    }
    if "code_predictor.small_to_mtp_projection.weight" in w:
        cp_params["small_to_mtp_projection"] = lin("code_predictor.small_to_mtp_projection")

    return params, cp_params


# ---------------------------------------------------------------------------
# Vocoder assembly
# ---------------------------------------------------------------------------


def _strip_vocoder_prefix(key: str) -> str | None:
    """Prefix rules + encoder filter (reference AudioDecoder.swift:200-217)."""
    k = key
    if k.startswith("audio_decoder."):
        k = k[len("audio_decoder."):]
    if k.startswith("decoder.") and not k.startswith("decoder.decoder."):
        k = k[len("decoder."):]
    elif k.startswith("decoder.decoder."):
        k = k[len("decoder."):]
    if k.startswith("encoder.") or ".encoder." in k:
        return None
    return k


def reconstruct_codebooks(weights: dict) -> dict:
    """Replace `<base>._codebook.{cluster_usage,embedding_sum}` pairs with
    `<base>.codebook.embed` = sum / clip(usage, 1e-5)
    (reference AudioDecoder.swift:219-237, 285-302)."""
    out = {}
    stats: dict[str, dict[str, np.ndarray]] = {}
    for key, v in weights.items():
        if "._codebook.cluster_usage" in key or "._codebook.embedding_sum" in key:
            base, _, field = key.partition("._codebook.")
            stats.setdefault(base, {})[field] = v
            continue
        out[key] = v
    for base, d in stats.items():
        usage = np.clip(np.asarray(d["cluster_usage"], np.float32), 1e-5, None)
        out[f"{base}.codebook.embed"] = (
            np.asarray(d["embedding_sum"], np.float32) / usage[:, None]
        )
    return out


def _conv_entry(w: dict, prefix: str, dtype, transpose_conv: bool = False) -> dict:
    """Conv param from torch-layout checkpoint weights (see module docstring)."""
    weight = np.asarray(w[f"{prefix}.weight"], np.float32)
    if transpose_conv:
        weight = weight[:, :, ::-1].transpose(2, 0, 1)  # [Cin,Cout,K] -> flipped HIO
    else:
        weight = weight.transpose(2, 1, 0)  # [Cout,Cin,K] -> HIO
    entry = {"w": np.ascontiguousarray(weight).astype(dtype)}
    if f"{prefix}.bias" in w:
        entry["b"] = np.asarray(w[f"{prefix}.bias"], dtype)
    return entry


def load_vocoder_checkpoint(
    weights: dict, cfg: TokenizerDecoderConfig, dtype=np.float32
) -> dict:
    """Assemble the vocoder param tree from a reference-format
    speech_tokenizer checkpoint (reference AudioDecoder.swift:133-155,
    196-305). Key paths mirror the reference module structure in snake_case
    (`pre_transformer.layers.{i}.self_attn.q_proj`, `upsample.{i}.0.conv`,
    `decoder.{i}.block.{j}`, `quantizer.rvq_first.vq.layers.{i}`)."""
    w0 = {}
    for key, v in weights.items():
        k = _strip_vocoder_prefix(key)
        if k is not None:
            w0[k] = v
    w = reconstruct_codebooks(w0)

    lin = lambda p: _linear_entry(w, p, dtype)  # noqa: E731
    norm = lambda p: {"w": np.asarray(w[f"{p}.weight"], dtype)}  # noqa: E731
    snake = lambda p: {  # noqa: E731
        "alpha": np.asarray(w[f"{p}.alpha"], dtype).reshape(-1),
        "beta": np.asarray(w[f"{p}.beta"], dtype).reshape(-1),
    }

    def rvq_half(base: str, n: int) -> dict:
        cbs = np.stack(
            [np.asarray(w[f"{base}.vq.layers.{i}.codebook.embed"], dtype) for i in range(n)]
        )
        proj = np.asarray(w[f"{base}.output_proj.weight"], np.float32)
        if proj.ndim == 3:  # conv1d k=1 [Cout, Cin, 1]
            proj = proj[:, :, 0]
        return {"codebooks": cbs, "out_proj": {"w": proj.astype(dtype)}}

    ns = cfg.num_semantic_quantizers
    na = cfg.num_quantizers - ns

    def tf_layer(i: int) -> dict:
        p = f"pre_transformer.layers.{i}"
        return {
            "input_layernorm": norm(f"{p}.input_layernorm"),
            "post_attention_layernorm": norm(f"{p}.post_attention_layernorm"),
            "self_attn_layer_scale": {
                "w": np.asarray(w[f"{p}.self_attn_layer_scale.scale"], dtype)
            },
            "mlp_layer_scale": {"w": np.asarray(w[f"{p}.mlp_layer_scale.scale"], dtype)},
            "q_proj": lin(f"{p}.self_attn.q_proj"),
            "k_proj": lin(f"{p}.self_attn.k_proj"),
            "v_proj": lin(f"{p}.self_attn.v_proj"),
            "o_proj": lin(f"{p}.self_attn.o_proj"),
            "gate_proj": lin(f"{p}.mlp.gate_proj"),
            "up_proj": lin(f"{p}.mlp.up_proj"),
            "down_proj": lin(f"{p}.mlp.down_proj"),
        }

    def convnext(p: str) -> dict:
        return {
            "dwconv": _conv_entry(w, f"{p}.dwconv.conv", dtype),
            "norm": {
                "w": np.asarray(w[f"{p}.norm.weight"], dtype),
                "b": np.asarray(w[f"{p}.norm.bias"], dtype),
            },
            "pwconv1": lin(f"{p}.pwconv1"),
            "pwconv2": lin(f"{p}.pwconv2"),
            "gamma": np.asarray(w[f"{p}.gamma"], dtype),
        }

    params = {
        "quantizer": {
            "semantic": rvq_half("quantizer.rvq_first", ns),
            "acoustic": rvq_half("quantizer.rvq_rest", na),
        },
        "pre_conv": _conv_entry(w, "pre_conv.conv", dtype),
        "pre_transformer": {
            "input_proj": lin("pre_transformer.input_proj"),
            "layers": _stack_tree([tf_layer(i) for i in range(cfg.num_hidden_layers)]),
            "norm": norm("pre_transformer.norm"),
            "output_proj": lin("pre_transformer.output_proj"),
        },
        "upsample": [
            {
                "tconv": _conv_entry(w, f"upsample.{i}.0.conv", dtype, transpose_conv=True),
                "convnext": convnext(f"upsample.{i}.1"),
            }
            for i in range(len(cfg.upsampling_ratios))
        ],
    }

    n_blocks = len(cfg.upsample_rates)
    blocks = []
    for i in range(n_blocks):
        p = f"decoder.{i + 1}.block"
        units = []
        for j in range(3):
            u = f"{p}.{j + 2}"
            units.append(
                {
                    "act1": snake(f"{u}.act1"),
                    "conv1": _conv_entry(w, f"{u}.conv1.conv", dtype),
                    "act2": snake(f"{u}.act2"),
                    "conv2": _conv_entry(w, f"{u}.conv2.conv", dtype),
                }
            )
        blocks.append(
            {
                "snake": snake(f"{p}.0"),
                "up": _conv_entry(w, f"{p}.1.conv", dtype, transpose_conv=True),
                "units": units,
            }
        )
    params["decoder"] = {
        "initial_conv": _conv_entry(w, "decoder.0.conv", dtype),
        "blocks": blocks,
        "out_snake": snake(f"decoder.{n_blocks + 1}"),
        "out_conv": _conv_entry(w, f"decoder.{n_blocks + 2}.conv", dtype),
    }
    return params


def _stack_tree(entries: list[dict]) -> dict:
    """Recursively stack a list of homogeneous nested dicts on a leading axis."""
    first = entries[0]
    out = {}
    for k, v in first.items():
        if isinstance(v, dict):
            out[k] = _stack_tree([e[k] for e in entries])
        else:
            out[k] = np.stack([e[k] for e in entries])
    return out
