#!/usr/bin/env python3
"""Per-round accuracy artifact: end-to-end WER on the reference's REAL
speech fixtures, recorded as ``WER_r{N}.json`` next to ``BENCH_r{N}.json``
so accuracy regressions are as visible as throughput regressions
(BASELINE.md's acceptance bar is *WER-matching decode*, not just speed).

Runs the fixed-seed connected-word protocol from
``examples/real_audio_demo.py`` (VAD-segment the reference recordings
``/root/reference/test/third/data-vad.raw`` + ``test/data.raw`` into a
real-speech vocabulary, train per-word GMM-HMMs through the public CLI,
decode held-out connected utterances) and writes the full report.

JAX is pinned to CPU for this artifact: the protocol is deterministic
there (fixed seed 0), so any change in the recorded WER is a code
change, not hardware noise.

Usage: python bench_wer.py [--out WER_rNN.json]
With no --out, the round number is inferred as 1 + the highest existing
``BENCH_r{N}.json`` (the driver writes that file at the END of a round,
so during round N the highest existing one is N-1).
"""

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# pin before any jax import (the demo's CLI subprocesses inherit env)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def infer_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="output JSON path")
    args = ap.parse_args()
    out_path = args.out or os.path.join(REPO, f"WER_r{infer_round():02d}.json")

    from examples import real_audio_demo

    wer = real_audio_demo.main()
    report = dict(real_audio_demo.main.last_report)
    report["metric"] = "WER (real-audio connected-word e2e, fixed seed)"
    report["value"] = report["wer"]
    with open(out_path, "w") as fp:
        json.dump(report, fp, indent=1)
    print(f"\nwrote {out_path}")
    print(json.dumps({"metric": report["metric"], "value": wer,
                      "unit": "WER", "n_ref_words": report["n_ref_words"]}))
    return 0 if wer <= 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
