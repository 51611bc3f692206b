"""The weak-scaling harness must run and report sane numbers (BASELINE.md's
scaling-efficiency bar, measured on the virtual mesh until hardware exists)."""

import json
import subprocess
import sys


def test_bench_scaling_runs(tmp_path):
    out = tmp_path / "scaling.json"
    r = subprocess.run(
        [sys.executable, "bench_scaling.py", "--devices", "1,2",
         "--batch", "2", "--t", "50", "--steps", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    report = json.loads(out.read_text())
    rows, summary = report["rows"], report["summary"]
    assert [row["devices"] for row in rows] == [1, 2]
    for row in rows:
        assert row["step_seconds"] > 0
        assert row["utterances_per_s"] > 0
        # psum payload: the stats pytree for N=5, M=8, D=39 in f32 —
        # independent of batch/frames
        assert row["psum_payload_bytes_per_device"] == rows[0][
            "psum_payload_bytes_per_device"
        ]
    assert rows[0]["weak_scaling_efficiency"] == 1.0
    assert rows[0]["ring_allreduce_bytes_per_device"] == 0
    assert rows[1]["ring_allreduce_bytes_per_device"] == rows[1][
        "psum_payload_bytes_per_device"
    ]
    assert summary["value"] == rows[-1]["weak_scaling_efficiency"]
    assert "metric" in summary and "unit" in summary
