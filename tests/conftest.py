"""Test harness configuration.

Tests run on the XLA CPU backend with 8 virtual devices so multi-chip
sharding (mesh/pjit/shard_map paths) is exercised without TPU hardware,
and with x64 enabled so parity tests can compare against float64 NumPy
oracles. Must run before anything imports jax.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Some environments auto-import jax from pytest plugins before this conftest
# runs, so the env vars above may be too late; jax.config still works any
# time before the backends are first initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_AUDIO = "/root/reference/test/data.raw"
REFERENCE_VAD_AUDIO = "/root/reference/test/third/data-vad.raw"


@pytest.fixture(scope="session")
def speech_audio() -> np.ndarray:
    """~1.36 s of 16 kHz/16-bit speech; falls back to synthetic audio when
    the reference checkout is not mounted."""
    if os.path.exists(REFERENCE_AUDIO):
        with open(REFERENCE_AUDIO, "rb") as fp:
            return np.frombuffer(fp.read(), dtype="<i2")
    return synthetic_speech(22000)


@pytest.fixture(scope="session")
def vad_audio() -> np.ndarray:
    """~12.6 s fixture with speech/silence alternation for VAD tests."""
    if os.path.exists(REFERENCE_VAD_AUDIO):
        with open(REFERENCE_VAD_AUDIO, "rb") as fp:
            return np.frombuffer(fp.read(), dtype="<i2")
    return synthetic_speech(200000)


def synthetic_speech(n: int, seed: int = 0) -> np.ndarray:
    """Speech-like test signal: harmonic bursts with formant-ish AM over a
    noise floor, int16 at 16 kHz."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    envelope = np.clip(np.sin(2 * np.pi * 2.3 * t), 0.0, None) ** 2
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
    voiced = sum(
        np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi)) / k
        for k in range(1, 9)
    )
    noise = rng.normal(0.0, 0.02, n)
    x = envelope * voiced * 0.25 + noise
    return np.clip(x * 32767 / max(1e-9, np.max(np.abs(x))) * 0.5, -32768, 32767).astype(
        np.int16
    )
