"""Builds the native VAD self-test with AddressSanitizer + UBSan and runs
it (the native-code safety net SURVEY.md §5 calls for)."""

import os
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "lnasr_tpu", "native", "vad")


@pytest.mark.slow
def test_native_vad_under_sanitizers(tmp_path):
    exe = str(tmp_path / "vad_selftest")
    compile_cmd = [
        "g++", "-std=c++17", "-g", "-O1",
        "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
        os.path.join(NATIVE, "vad_selftest.cpp"),
        os.path.join(NATIVE, "vad_webrtc.cpp"),
        os.path.join(NATIVE, "vad_amrwb.cpp"),
        "-I", NATIVE, "-o", exe, "-lm",
    ]
    build = subprocess.run(compile_cmd, capture_output=True, text=True)
    assert build.returncode == 0, f"sanitized build failed:\n{build.stderr}"

    run = subprocess.run([exe], capture_output=True, text=True, timeout=120)
    assert run.returncode == 0, (
        f"sanitized self-test failed (rc={run.returncode}):\n{run.stderr}"
    )
    assert "OK" in run.stderr
