"""Audit a real Qwen3-TTS checkpoint directory's layout before first use.

Usage:
    python scripts/audit_checkpoint.py <model_dir>

Validates model.safetensors (talker + code predictor [+ speaker_encoder]) and
speech_tokenizer/model.safetensors (vocoder [+ audio encoder]) against the
expected key/shape manifests derived from the loaders (io/audit.py). Dense and
quantized (packed uint32 + scales/biases) storage both pass; exits nonzero on
any missing key or shape mismatch. See io/audit.py for the golden-token
procedure that follows a PASS.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # manifests are eval_shape only

from qwen3_tts_tpu.config import Qwen3TTSConfig, SpeechTokenizerConfig
from qwen3_tts_tpu.io import audit, safetensors_io


def main(model_dir: str, skip_speaker: bool = False) -> int:
    ok = True
    cfg_path = os.path.join(model_dir, "config.json")
    with open(cfg_path, "r", encoding="utf-8") as f:
        config = Qwen3TTSConfig.from_json(f.read())
    settings = config.quantization_settings

    main_path = os.path.join(model_dir, "model.safetensors")
    header = safetensors_io.load_header(main_path)
    manifest = audit.expected_talker_manifest(config)
    has_speaker = any(k.startswith("speaker_encoder.") for k in header)
    ignore = ()
    if has_speaker and skip_speaker:
        # the ECAPA dims aren't in config.json; --skip-speaker for checkpoints
        # with non-standard speaker encoders (e.g. test fixtures)
        ignore = ("speaker_encoder.",)
    elif has_speaker:
        manifest.update(audit.expected_speaker_manifest())
    rep = audit.audit_header(header, manifest, settings, ignore_prefixes=ignore)
    print(f"== {main_path} ==")
    print(rep.summary())
    ok &= rep.ok

    st_path = os.path.join(model_dir, "speech_tokenizer", "model.safetensors")
    st_cfg_path = os.path.join(model_dir, "speech_tokenizer", "config.json")
    if os.path.exists(st_path):
        with open(st_cfg_path, "r", encoding="utf-8") as f:
            st_cfg = SpeechTokenizerConfig.from_json(f.read())
        st_header = safetensors_io.load_header(st_path)
        st_manifest = audit.expected_vocoder_manifest(st_cfg)
        if any(k.startswith("encoder.") for k in st_header):
            st_manifest.update(audit.expected_audio_encoder_manifest(st_cfg))
        rep = audit.audit_header(st_header, st_manifest, settings)
        print(f"== {st_path} ==")
        print(rep.summary())
        ok &= rep.ok

    print(json.dumps({"audit": "pass" if ok else "fail"}))
    return 0 if ok else 1


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 1:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(args[0], skip_speaker="--skip-speaker" in sys.argv))
