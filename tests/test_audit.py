"""Checkpoint-layout audit tests: manifests match what the exporters write,
the audit passes on full synthetic fixtures (dense and quantized), and
injected defects (missing key, transposed shape) are caught."""

import subprocess
import sys
import tempfile

import numpy as np
import pytest

from qwen3_tts_tpu.config import QuantizationSettings, Qwen3TTSConfig
from qwen3_tts_tpu.io import audit, safetensors_io
from qwen3_tts_tpu.testing import (
    tiny_speech_tokenizer_config,
    tiny_talker_config,
    write_tiny_model_dir,
)


def _header_from(d: dict) -> dict:
    return {
        k: (safetensors_io._DTYPE_NAMES[np.asarray(v).dtype], np.asarray(v).shape)
        for k, v in d.items()
    }


def test_audit_passes_on_tiny_fixture_dir():
    d = tempfile.mkdtemp()
    cfg = write_tiny_model_dir(d, with_encoders=True)[0]
    header = safetensors_io.load_header(f"{d}/model.safetensors")
    manifest = audit.expected_talker_manifest(cfg)
    if any(k.startswith("speaker_encoder.") for k in header):
        from qwen3_tts_tpu.testing import tiny_speaker_config

        manifest.update(audit.expected_speaker_manifest(tiny_speaker_config()))
    rep = audit.audit_header(header, manifest)
    assert rep.ok, rep.summary()
    assert rep.dense_keys > 50

    import json

    from qwen3_tts_tpu.config import SpeechTokenizerConfig

    with open(f"{d}/speech_tokenizer/config.json") as f:
        st_cfg = SpeechTokenizerConfig.from_json(f.read())
    st_header = safetensors_io.load_header(
        f"{d}/speech_tokenizer/model.safetensors"
    )
    st_manifest = audit.expected_vocoder_manifest(st_cfg)
    if any(k.startswith("encoder.") for k in st_header):
        st_manifest.update(audit.expected_audio_encoder_manifest(st_cfg))
    rep = audit.audit_header(st_header, st_manifest)
    assert rep.ok, rep.summary()


def test_audit_detects_missing_and_mismatched():
    cfg = tiny_talker_config()
    manifest = audit.expected_talker_manifest(cfg)
    # fabricate a header straight from the manifest, then corrupt it
    header = {k: ("F32", tuple(s)) for k, s in manifest.items()}
    victim = "talker.model.layers.0.self_attn.q_proj.weight"
    assert victim in header
    del header[victim]
    transposed = "talker.model.codec_embedding.weight"
    header[transposed] = ("F32", tuple(reversed(header[transposed][1])))
    header["totally.unexpected.weight"] = ("F32", (3, 3))
    rep = audit.audit_header(header, manifest)
    assert not rep.ok
    assert victim in rep.missing
    assert any(transposed in m for m in rep.shape_mismatch)
    assert "totally.unexpected.weight" in rep.unexpected


def test_audit_accepts_quantized_storage():
    cfg = tiny_talker_config()
    manifest = audit.expected_talker_manifest(cfg)
    settings = QuantizationSettings(enabled=True, bits=4, group_size=64)
    header = {}
    n_quant = 0
    for k, s in manifest.items():
        pk = audit._packed_shape(s, 4, 64)
        if pk is not None and k.endswith(".weight") and len(s) == 2:
            header[k] = ("U32", pk[0])
            header[k[: -len(".weight")] + ".scales"] = ("F16", pk[1])
            header[k[: -len(".weight")] + ".biases"] = ("F16", pk[1])
            n_quant += 1
        else:
            header[k] = ("BF16", tuple(s))
    rep = audit.audit_header(header, manifest, settings)
    assert rep.ok, rep.summary()
    assert rep.quantized_keys == n_quant > 10
    assert not rep.unexpected


def test_audit_manifests_at_real_dims():
    """Manifest generation at 0.6B and 1.7B dims is cheap (eval_shape) and
    carries the full key inventory the reference loaders consume."""
    m = audit.expected_talker_manifest(Qwen3TTSConfig.standard())
    assert m["talker.model.text_embedding.weight"] == (151936, 2048)
    assert m["talker.model.layers.27.mlp.down_proj.weight"] == (1024, 3072)
    assert m["talker.code_predictor.model.layers.4.mlp.down_proj.weight"] == (
        1024, 3072,
    )
    assert m["talker.code_predictor.model.lm_head.14.weight"] == (2048, 1024)
    m17 = audit.expected_talker_manifest(Qwen3TTSConfig.standard_1_7b())
    assert m17["talker.model.layers.0.self_attn.q_proj.weight"] == (2048, 2048)
    assert m17["talker.code_predictor.model.small_to_mtp_projection.weight"] == (
        1024, 2048,
    )


def test_audit_cli_on_fixture(tmp_path):
    d = str(tmp_path)
    write_tiny_model_dir(d, with_encoders=True)
    r = subprocess.run(
        [sys.executable, "scripts/audit_checkpoint.py", d, "--skip-speaker"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert '"audit": "pass"' in r.stdout, r.stdout + r.stderr
    assert r.returncode == 0
