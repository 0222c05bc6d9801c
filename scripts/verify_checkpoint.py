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

Runs on the CPU backend in float32 (exact greedy determinism).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from qwen3_tts_tpu.io import verify


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("--golden", help="golden JSON to compare against")
    ap.add_argument("--write-golden", help="write the report as a new golden")
    ap.add_argument("--text", default=verify.GOLDEN_TEXT)
    ap.add_argument("--speaker", default=verify.GOLDEN_SPEAKER)
    ap.add_argument("--max-tokens", type=int, default=verify.GOLDEN_MAX_TOKENS)
    ap.add_argument("--seed", type=int, default=verify.GOLDEN_SEED)
    ap.add_argument("--rtol", type=float, default=1e-4)
    args = ap.parse_args()

    kwargs = dict(
        text=args.text, speaker=args.speaker,
        max_tokens=args.max_tokens, seed=args.seed,
    )
    if args.golden:
        golden = verify.load_golden(args.golden)
        # the golden's recorded settings win so reports stay comparable
        kwargs = dict(
            text=golden.get("text", args.text),
            speaker=golden.get("speaker", args.speaker),
            max_tokens=golden.get("max_tokens", args.max_tokens),
            seed=golden.get("seed", args.seed),
        )
    report = verify.collect_report(args.model_dir, **kwargs)

    if args.write_golden:
        verify.save_golden(report, args.write_golden)
        print(f"golden written: {args.write_golden}")
        return 0
    if args.golden:
        errs = verify.compare_reports(report, golden, rtol=args.rtol)
        if errs:
            print("FAIL")
            for e in errs:
                print(f"  - {e}")
            return 1
        print(
            f"PASS: {len(report['frames'])} greedy frames and "
            f"{len(report['checksums'])} checksums match {args.golden}"
        )
        return 0
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
