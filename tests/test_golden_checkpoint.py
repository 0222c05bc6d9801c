"""Convert-and-verify harness e2e (VERDICT r2 missing item 1).

Regenerates the synthetic FULL-FIDELITY reference-format checkpoint
(testing.write_golden_model_dir: pre-quantized heterogeneous-width uint32
triples, mixed dense keys, quantization config block, speaker_encoder +
encoder.* blocks, RVQ EMA stats), loads it through the real pipeline, and
diffs greedy tokens + per-stage checksums against the COMMITTED golden — the
exact procedure scripts/verify_checkpoint.py will run against real published
weights the day egress exists.
"""

import os

import numpy as np
import pytest

from qwen3_tts_tpu.io import verify
from qwen3_tts_tpu.testing import write_golden_model_dir

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "tiny_reference_format.json"
)


@pytest.fixture(scope="module")
def golden_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("golden") / "m")
    write_golden_model_dir(path)
    return path


def test_layout_quirks(golden_dir):
    """The synthetic checkpoint actually exercises the quirk list: packed
    uint32 triples at MULTIPLE widths, dense stragglers, EMA codebook stats,
    all four key namespaces, and passes the layout audit."""
    from qwen3_tts_tpu.config import Qwen3TTSConfig
    from qwen3_tts_tpu.io import safetensors_io

    with open(os.path.join(golden_dir, "config.json")) as f:
        cfg = Qwen3TTSConfig.from_json(f.read())
    assert cfg.quantization is not None and cfg.quantization.enabled

    mw = safetensors_io.load_file(os.path.join(golden_dir, "model.safetensors"))
    packed = [k for k in mw if k.endswith(".weight") and mw[k].dtype == np.uint32]
    assert len(packed) >= 8
    # heterogeneous widths: words = in_dim * bits / 32 differ for same in_dim
    widths = set()
    for k in packed:
        stem = k[: -len(".weight")]
        groups = mw[f"{stem}.scales"].shape[-1]
        in_dim = groups * cfg.quantization.group_size
        widths.add(mw[k].shape[-1] * 32 // in_dim)
    assert len(widths) >= 2, f"expected mixed widths, got {widths}"
    # dense stragglers + speaker namespace in the same file
    assert any(
        k.endswith(".weight") and mw[k].dtype != np.uint32 for k in mw
    )
    assert any(k.startswith("speaker_encoder.") for k in mw)

    st = safetensors_io.load_file(
        os.path.join(golden_dir, "speech_tokenizer", "model.safetensors")
    )
    assert any("cluster_usage" in k for k in st)  # RVQ EMA stats
    assert any("embedding_sum" in k for k in st)
    assert any(k.startswith("encoder.") or ".encoder." in k for k in st)

    # the layout audit passes on it
    import subprocess
    import sys

    r = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(__file__), "..", "scripts", "audit_checkpoint.py"
            ),
            golden_dir,
            "--skip-speaker",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_verify_matches_committed_golden(golden_dir):
    report = verify.collect_report(golden_dir)
    golden = verify.load_golden(GOLDEN)
    errs = verify.compare_reports(report, golden)
    assert not errs, "\n".join(errs)
    assert len(report["frames"]) > 0


def test_production_run_passes_bf16_tier(golden_dir):
    """The PRODUCTION configuration (bf16 + runtime int8 quantization; the
    path that actually serves) of the same checkpoint must pass the fp32
    golden at the tpu-bf16 tier — waveform checksum included — and must
    FAIL the tight cpu-fp32 tier (the tiers genuinely discriminate)."""
    report = verify.collect_report(golden_dir, production=True)
    golden = verify.load_golden(GOLDEN)
    errs = verify.compare_reports(report, golden, tier="tpu-bf16")
    assert not errs, "\n".join(errs)
    assert "wav" in golden["checksums"]  # the waveform IS pinned
    assert verify.compare_reports(report, golden, tier="cpu-fp32")


def test_corruption_fails_bf16_tier(golden_dir, tmp_path):
    """Checksum bands at the loose tier still catch a real corruption (the
    bf16 tier is not so wide it passes everything)."""
    import shutil

    from qwen3_tts_tpu.io import safetensors_io

    broken = str(tmp_path / "broken")
    shutil.copytree(golden_dir, broken)
    p = os.path.join(broken, "model.safetensors")
    w = safetensors_io.load_file(p)
    key = next(k for k in sorted(w) if k.endswith("codec_head.scales"))
    w[key] = np.asarray(w[key]) * 1.5  # wrong dequant scale
    safetensors_io.save_file(w, p)
    report = verify.collect_report(broken)
    golden = verify.load_golden(GOLDEN)
    errs = verify.compare_reports(report, golden, tier="tpu-bf16")
    assert errs, "corrupted checkpoint passed the tpu-bf16 tier"


def test_verify_detects_corruption(golden_dir):
    """A perturbed checkpoint must FAIL the golden diff (the harness actually
    discriminates, it does not just always pass)."""
    import shutil

    from qwen3_tts_tpu.io import safetensors_io

    broken = golden_dir + "_broken"
    if not os.path.exists(broken):
        shutil.copytree(golden_dir, broken)
        p = os.path.join(broken, "model.safetensors")
        w = safetensors_io.load_file(p)
        key = next(
            k for k in sorted(w)
            if k.endswith("codec_head.scales")
        )
        w[key] = np.asarray(w[key]) * 1.5  # wrong dequant scale
        safetensors_io.save_file(w, p)
    report = verify.collect_report(broken)
    golden = verify.load_golden(GOLDEN)
    errs = verify.compare_reports(report, golden)
    assert errs, "corrupted checkpoint passed the golden diff"
