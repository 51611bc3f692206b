#!/usr/bin/env python3
"""Per-round accuracy artifact: end-to-end WER on the reference's REAL
speech fixtures, recorded as ``WER_r{N}.json`` next to ``BENCH_r{N}.json``
so accuracy regressions are as visible as throughput regressions
(BASELINE.md's acceptance bar is *WER-matching decode*, not just speed).

Runs the fixed-seed connected-word protocol v2 from
``examples/real_audio_demo.py`` (15+ word real-speech vocabulary, 20
test utterances / 100+ reference words, clean / 20 dB / 10 dB SNR
conditions) and writes the full per-condition report.

The GATE has real failure probability (round-3 verdict: the v1 bar
``wer <= 0.5`` on 10 reference words could not fail):

- RATCHET (round-5 verdict: a previous-round +0.05 tolerance chains —
  three mediocre rounds could drift 0.23 -> 0.38 without ever failing):
  against the BEST clean WER of any same-protocol previous round, FAIL
  if clean regresses more than +0.02 absolute, or the 10 dB WER more
  than +0.10 over its own best;
- otherwise (first round on this protocol) FAIL above the absolute
  bring-up bar: clean WER must be <= 0.25;
- in every case FAIL when the CLI hypothesis diverges from the
  in-process hypothesis on the same audio under the same configuration
  (``cli_check.match`` from the demo) — the round-4 artifact recorded
  exactly that divergence, ungated.

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

CLEAN_TOL = 0.02  # allowed clean-WER regression vs BEST-so-far
NOISY_TOL = 0.10  # allowed 10 dB-WER regression vs its best-so-far
BRINGUP_BAR = 0.25  # absolute clean bar when no comparable previous round


def infer_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def best_previous(this_round: int, protocol_version: int):
    """Best-so-far (clean, snr10) over ALL same-protocol WER_r{k<N}.json —
    the ratchet base. Returns None when no comparable round exists."""
    best_clean = best_noisy = None
    for p in glob.glob(os.path.join(REPO, "WER_r*.json")):
        m = re.search(r"WER_r(\d+)\.json$", p)
        if not (m and int(m.group(1)) < this_round):
            continue
        with open(p, encoding="utf-8") as fp:
            rep = json.load(fp)
        if rep.get("protocol_version") != protocol_version:
            continue
        c = rep["conditions"]["clean"]["wer"]
        n = rep["conditions"]["snr10"]["wer"]
        best_clean = c if best_clean is None else min(best_clean, c)
        best_noisy = n if best_noisy is None else min(best_noisy, n)
    if best_clean is None:
        return None
    return best_clean, best_noisy


def gate(report: dict, best) -> (bool, str):
    clean = report["conditions"]["clean"]["wer"]
    noisy = report["conditions"]["snr10"]["wer"]
    cli = report.get("cli_check", {})
    if "match" in cli and not cli["match"]:
        return False, (f"CLI hypothesis diverges from the in-process decode "
                       f"under the same configuration: CLI {cli['hyp']!r} "
                       f"vs in-process {cli['inprocess_hyp']!r}")
    if best is not None:
        bc, bn = best
        if clean > bc + CLEAN_TOL:
            return False, (f"clean WER regressed past the ratchet: "
                           f"{clean:.3f} > best-so-far {bc:.3f} + {CLEAN_TOL}")
        if noisy > bn + NOISY_TOL:
            return False, (f"10 dB WER regressed past the ratchet: "
                           f"{noisy:.3f} > best-so-far {bn:.3f} + {NOISY_TOL}")
        return True, (f"clean {clean:.3f} (best-so-far {bc:.3f}), "
                      f"10 dB {noisy:.3f} (best-so-far {bn:.3f}); "
                      f"CLI matches in-process")
    if clean > BRINGUP_BAR:
        return False, f"clean WER {clean:.3f} > bring-up bar {BRINGUP_BAR}"
    return True, f"clean {clean:.3f} <= bring-up bar {BRINGUP_BAR} (no comparable previous round)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="output JSON path")
    args = ap.parse_args()
    this_round = infer_round()
    out_path = args.out or os.path.join(REPO, f"WER_r{this_round:02d}.json")

    from examples import real_audio_demo

    real_audio_demo.main()
    report = dict(real_audio_demo.main.last_report)
    report["metric"] = ("WER (real-audio connected-word e2e, fixed seed; "
                        "clean / 20 dB / 10 dB SNR / reverb)")
    report["value"] = report["wer"]

    best = best_previous(this_round, report["protocol_version"])
    ok, why = gate(report, best)
    report["gate"] = {"pass": ok, "detail": why, "ratchet": "best-so-far",
                      "clean_tol": CLEAN_TOL, "noisy_tol": NOISY_TOL,
                      "bringup_bar": BRINGUP_BAR}
    with open(out_path, "w") as fp:
        json.dump(report, fp, indent=1)
    print(f"\nwrote {out_path}")
    print(json.dumps({
        "metric": report["metric"], "value": report["wer"], "unit": "WER",
        "conditions": {k: v["wer"] for k, v in report["conditions"].items()},
        "n_ref_words": report["n_ref_words"],
        "gate": report["gate"],
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
