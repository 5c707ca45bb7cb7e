"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax initializes its backend, hence environment variables are
set at conftest import time. Benchmarks (bench.py) run outside pytest and use
the real TPU.
"""

import os

# The shell presets JAX_PLATFORMS=axon and a site hook re-asserts it, so the
# env var alone is not enough — use jax.config before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    A full `-m ''` run compiles hundreds of XLA:CPU programs into one
    process; past ~215 tests the LLVM JIT segfaulted inside
    backend_compile_and_load (reproducible at test_speculative.py::
    test_sim_accept_round_structure, which passes standalone). Dropping the
    executable caches per module keeps within-module reuse but bounds the
    accumulated JIT state."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_wav(tmp_path):
    """Write a 2 s 440 Hz tone WAV and return its path."""
    from whisper_diarize_tpu.audio import write_wav

    sr = 16000
    t = np.arange(2 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 440.0 * t) * 32767).astype(np.int16)
    p = tmp_path / "tone.wav"
    write_wav(str(p), x)
    return str(p)
