"""Build helper for the native library.

Compiles ``liblnasr_native.so`` with the system C++ toolchain on first use
(no pip/pybind dependency — the Python side binds via ctypes). Thread-safe
enough for test runs: concurrent builders race to an atomic rename.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_NAME = "liblnasr_native.so"
_SOURCES = [
    os.path.join("vad", "vad_amrwb.cpp"),
    os.path.join("vad", "vad_webrtc.cpp"),
    os.path.join("vad", "vad_api.cpp"),
]


def lib_path() -> str:
    return os.path.join(_NATIVE_DIR, _LIB_NAME)


def _sources_mtime() -> float:
    return max(os.path.getmtime(os.path.join(_NATIVE_DIR, s)) for s in _SOURCES)


def build(force: bool = False, sanitize: bool = False) -> str:
    """Compile (if stale) and return the shared-library path."""
    out = lib_path()
    if not force and os.path.exists(out) and os.path.getmtime(out) >= _sources_mtime():
        return out
    flags = ["-O2", "-fPIC", "-std=c++17", "-shared"]
    if sanitize:
        flags += ["-fsanitize=address,undefined", "-g"]
    with tempfile.NamedTemporaryFile(
        suffix=".so", dir=_NATIVE_DIR, delete=False
    ) as tmp:
        tmp_path = tmp.name
    try:
        cmd = (
            ["g++"] + flags + ["-I", os.path.join(_NATIVE_DIR, "vad")]
            + [os.path.join(_NATIVE_DIR, s) for s in _SOURCES]
            + ["-o", tmp_path]
        )
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp_path, out)
    except subprocess.CalledProcessError as e:
        os.unlink(tmp_path)
        raise RuntimeError(f"native build failed:\n{e.stderr}") from e
    except BaseException:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
        raise
    return out


if __name__ == "__main__":
    print(build(force=True))
