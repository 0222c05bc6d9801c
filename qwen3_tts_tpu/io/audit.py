"""Checkpoint-layout audit: validate a real safetensors file against the
expected key/shape manifest BEFORE loading it.

Every sanitizer/layout rule in io/checkpoint.py mirrors the reference loaders
(Qwen3Talker.swift:114-270, AudioDecoder.swift:196-305,
Qwen3TTSAudioEncoder.swift:579-648, SpeakerEncoder.swift:550-603), but a
key-name typo or transposed shape would otherwise surface only as garbage
audio. The manifest is derived from the SAME serializers the test suite
round-trips (qwen3_tts_tpu.testing export_* / io.checkpoint load_*), built
over zero-cost jax.eval_shape trees, so loader and audit cannot drift apart.

Golden procedure for a real published checkpoint (no egress here):
  1. python scripts/audit_checkpoint.py <model_dir>   # layout must PASS
  2. load the pipeline, run greedy (temperature=0) on a fixed prompt, save
     the codec-token stream; compare with the reference implementation's
     greedy stream on the same prompt (bitwise for 0-temperature).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import (
    Qwen3TTSConfig,
    QuantizationSettings,
    SpeakerEncoderConfig,
    SpeechTokenizerConfig,
)


# ---------------------------------------------------------------------------
# Manifests (expected dense key -> shape)
# ---------------------------------------------------------------------------


def _zeros_like_shapes(shapes):
    import jax

    return jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)


def expected_talker_manifest(config: Qwen3TTSConfig) -> dict[str, tuple[int, ...]]:
    """Expected main-file keys (talker + code predictor) at dense shapes."""
    import jax
    import jax.numpy as jnp

    from ..models import code_predictor as cp_mod
    from ..models import talker as talker_mod
    from ..testing import export_talker_checkpoint

    shapes = jax.eval_shape(
        lambda: (
            talker_mod.init_talker_params(
                config, jax.random.PRNGKey(0), jnp.float32
            ),
            cp_mod.init_cp_params(
                config.code_predictor_config, config.hidden_size,
                jax.random.PRNGKey(1), jnp.float32,
            ),
        )
    )
    params, cp_params = _zeros_like_shapes(shapes)
    out = export_talker_checkpoint(params, cp_params, config)
    return {k: tuple(np.asarray(v).shape) for k, v in out.items()}


def expected_vocoder_manifest(
    st_config: SpeechTokenizerConfig,
) -> dict[str, tuple[int, ...]]:
    import jax
    import jax.numpy as jnp

    from ..models import vocoder as voc
    from ..testing import export_vocoder_checkpoint

    cfg = st_config.decoder_config
    shapes = jax.eval_shape(
        lambda: voc.init_vocoder_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    )
    out = export_vocoder_checkpoint(_zeros_like_shapes(shapes), cfg)
    return {k: tuple(np.asarray(v).shape) for k, v in out.items()}


def expected_audio_encoder_manifest(
    st_config: SpeechTokenizerConfig,
) -> dict[str, tuple[int, ...]]:
    import jax
    import jax.numpy as jnp

    from ..models import audio_encoder as aenc
    from ..testing import export_audio_encoder_checkpoint

    cfg = st_config.encoder_config
    if cfg is None:
        return {}
    shapes = jax.eval_shape(
        lambda: aenc.init_audio_encoder_params(cfg, jax.random.PRNGKey(0))
    )
    out = export_audio_encoder_checkpoint(_zeros_like_shapes(shapes), cfg)
    return {k: tuple(np.asarray(v).shape) for k, v in out.items()}


def expected_speaker_manifest(
    config: SpeakerEncoderConfig | None = None,
) -> dict[str, tuple[int, ...]]:
    import jax
    import jax.numpy as jnp

    from ..models import speaker_encoder as spk
    from ..testing import export_speaker_encoder_checkpoint

    cfg = config or SpeakerEncoderConfig()
    shapes = jax.eval_shape(
        lambda: spk.init_speaker_encoder_params(cfg, jax.random.PRNGKey(0))
    )
    out = export_speaker_encoder_checkpoint(_zeros_like_shapes(shapes))
    return {k: tuple(np.asarray(v).shape) for k, v in out.items()}


# ---------------------------------------------------------------------------
# Audit
# ---------------------------------------------------------------------------

_FLOAT_DTYPES = {"F64", "F32", "F16", "BF16"}


@dataclass
class AuditReport:
    missing: list[str] = field(default_factory=list)
    shape_mismatch: list[str] = field(default_factory=list)
    unexpected: list[str] = field(default_factory=list)
    quantized_keys: int = 0
    dense_keys: int = 0

    @property
    def ok(self) -> bool:
        return not (self.missing or self.shape_mismatch)

    def summary(self) -> str:
        lines = [
            f"dense keys:      {self.dense_keys}",
            f"quantized keys:  {self.quantized_keys}",
            f"missing:         {len(self.missing)}",
            f"shape mismatch:  {len(self.shape_mismatch)}",
            f"unexpected:      {len(self.unexpected)}",
        ]
        for name in self.missing[:20]:
            lines.append(f"  MISSING  {name}")
        for name in self.shape_mismatch[:20]:
            lines.append(f"  SHAPE    {name}")
        for name in self.unexpected[:20]:
            lines.append(f"  EXTRA    {name}")
        lines.append("PASS" if self.ok else "FAIL")
        return "\n".join(lines)


def _packed_shape(shape, bits, group_size):
    """Dense [.., O, K] -> (packed, scales) shapes, or None if not packable."""
    if len(shape) < 2:
        return None
    k = shape[-1]
    if k % group_size or (k * bits) % 32:
        return None
    packed = (*shape[:-1], k * bits // 32)
    scales = (*shape[:-1], k // group_size)
    return packed, scales


def audit_header(
    header: dict[str, tuple[str, tuple[int, ...]]],
    manifest: dict[str, tuple[int, ...]],
    settings: QuantizationSettings | None = None,
    ignore_prefixes: tuple[str, ...] = (),
) -> AuditReport:
    """Compare a safetensors header against a manifest. Each expected weight
    may appear dense at its manifest shape, or quantized as
    (uint32 weight, scales[, biases]) at the settings' bits/group."""
    rep = AuditReport()
    bits = settings.bits if settings and settings.enabled else 4
    gs = settings.group_size if settings and settings.enabled else 64
    consumed: set[str] = set()

    for key, shape in manifest.items():
        if key not in header:
            rep.missing.append(key)
            continue
        dtype, actual = header[key]
        consumed.add(key)
        if tuple(actual) == tuple(shape) and dtype in _FLOAT_DTYPES:
            rep.dense_keys += 1
            continue
        scales_key = key[: -len(".weight")] + ".scales" if key.endswith(
            ".weight"
        ) else None
        # mixed-bit checkpoints (the reference's own runtime scheme: 6-bit
        # embed/qkv/heads, 4-bit rest) carry DIFFERENT widths per tensor —
        # accept any valid bit width at the settings' group size
        cand_bits = [bits] + [x for x in (6, 8, 4, 3, 2) if x != bits]
        matched = False
        for cb in cand_bits:
            pk = _packed_shape(shape, cb, gs)
            if (
                pk is not None
                and dtype == "U32"
                and tuple(actual) == pk[0]
                and scales_key is not None
                and scales_key in header
                and tuple(header[scales_key][1]) == pk[1]
            ):
                matched = True
                break
        if matched:
            rep.quantized_keys += 1
            consumed.add(scales_key)
            biases_key = scales_key.replace(".scales", ".biases")
            if biases_key in header:
                consumed.add(biases_key)
            continue
        rep.shape_mismatch.append(
            f"{key}: expected {tuple(shape)} (or packed at any of "
            f"{cand_bits} bits / g{gs}), got {dtype} {tuple(actual)}"
        )

    for key in header:
        if key in consumed:
            continue
        if any(key.startswith(p) for p in ignore_prefixes):
            continue
        rep.unexpected.append(key)
    return rep
