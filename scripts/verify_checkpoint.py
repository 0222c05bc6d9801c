"""Convert-and-verify a checkpoint directory against a golden parity file.

The single command that turns "weights became reachable" into a PASS/FAIL
parity verdict (VERDICT r2 missing item 1):

    # 1) layout audit (key/shape manifests):
    python scripts/audit_checkpoint.py <model_dir>
    # 2) golden parity (greedy tokens + per-stage checksums):
    python scripts/verify_checkpoint.py <model_dir> --golden tests/golden/tiny_reference_format.json

Producing goldens:
    python scripts/verify_checkpoint.py <model_dir> --write-golden out.json

For REAL published checkpoints, the golden "frames" field can instead be
filled with the reference implementation's greedy codec tokens (temperature 0,
same text/speaker — reference Qwen3Talker.swift:580-630 prints them under
DUPER_DEBUG_GENERATION=1); token-stream equality is the cross-framework
parity criterion (SURVEY.md §6).

Default mode runs on the CPU backend in float32 (exact greedy determinism).
`--production --backend default --tier tpu-bf16` instead validates the
PRODUCTION path (bf16, runtime int8 quantization, Pallas kernels) on the
ambient backend (the TPU chip) against the same fp32 golden: per-stage
checksums — including the vocoder waveform — compare at bf16-scale
tolerances (token equality is a cpu-fp32-tier check; see
io/verify.py TOLERANCE_TIERS for the measured rationale).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("model_dir")
ap.add_argument("--golden", help="golden JSON to compare against")
ap.add_argument("--write-golden", help="write the report as a new golden")
ap.add_argument("--text", default=None)
ap.add_argument("--speaker", default=None)
ap.add_argument("--max-tokens", type=int, default=None)
ap.add_argument("--seed", type=int, default=None)
ap.add_argument("--rtol", type=float, default=None,
                help="override the tier's per-checksum tolerances")
ap.add_argument("--tier", default="cpu-fp32",
                choices=("cpu-fp32", "tpu-bf16"))
ap.add_argument("--production", action="store_true",
                help="bf16 + runtime quantization + kernels (the serving "
                     "path) instead of the exact fp32 jnp path")
ap.add_argument("--backend", default="cpu", choices=("cpu", "default"),
                help="'cpu' forces the CPU backend (exact); 'default' keeps "
                     "the ambient backend (TPU when available)")
args = ap.parse_args()

import jax

if args.backend == "cpu":
    jax.config.update("jax_platforms", "cpu")

from qwen3_tts_tpu.io import verify


def main() -> int:
    kwargs = dict(
        text=args.text if args.text is not None else verify.GOLDEN_TEXT,
        speaker=(
            args.speaker if args.speaker is not None else verify.GOLDEN_SPEAKER
        ),
        max_tokens=(
            args.max_tokens
            if args.max_tokens is not None
            else verify.GOLDEN_MAX_TOKENS
        ),
        seed=args.seed if args.seed is not None else verify.GOLDEN_SEED,
    )
    if args.golden:
        golden = verify.load_golden(args.golden)
        # the golden's recorded settings win so reports stay comparable; a
        # hand-assembled golden (e.g. reference CLI codes slotted into the
        # frames field) may omit settings — fall back to the CLI-or-default
        # values already resolved above, never to None
        kwargs = {k: golden.get(k, kwargs[k]) for k in kwargs}
    report = verify.collect_report(
        args.model_dir, production=args.production, **kwargs
    )

    if args.write_golden:
        verify.save_golden(report, args.write_golden)
        print(f"golden written: {args.write_golden}")
        return 0
    if args.golden:
        errs = verify.compare_reports(
            report, golden, rtol=args.rtol, tier=args.tier
        )
        if errs:
            print(f"FAIL ({args.tier} tier)")
            for e in errs:
                print(f"  - {e}")
            return 1
        from qwen3_tts_tpu.io.verify import TOLERANCE_TIERS

        frames_note = (
            f"{len(report['frames'])} greedy frames and "
            if TOLERANCE_TIERS[args.tier]["compare_frames"]
            else ""
        )
        print(
            f"PASS ({args.tier} tier): {frames_note}"
            f"{len(report['checksums'])} checksums match {args.golden}"
        )
        return 0
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
