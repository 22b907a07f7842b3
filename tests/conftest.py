"""Test environment: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run without a TPU pod (SURVEY.md §4e)."""
import os

# Force CPU regardless of any inherited JAX_PLATFORMS (the test suite must not
# depend on TPU availability); export MB_TEST_PLATFORM to override. jax may
# already be imported by a pytest plugin, so set the config directly too —
# this works as long as no backend has been initialised yet.
_platform = os.environ.get("MB_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", _platform)

# Persistent compilation cache: the suite's cost is dominated by XLA compiles
# (the Tacotron generation while_loop alone is ~50 s); repeat runs reuse them.
# Safe to share across workers (the cache is content-addressed + atomic).
if os.environ.get("MB_TEST_NO_COMPILE_CACHE") != "1":
    _cache_dir = os.environ.get(
        "MB_TEST_COMPILE_CACHE", "/tmp/mockingbird_tpu_test_xla_cache")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Bare `pytest` runs EVERYTHING; when the fast tier is explicitly
    selected (`-m 'not slow'` / `make fast`), say so loudly, so a green
    fast run is never mistaken for the full correctness suite
    (torch-equivalence, e2e, multi-process live in `-m slow`)."""
    if config.getoption("-m") == "not slow":
        terminalreporter.write_sep(
            "=", "FAST TIER ONLY: slow tests (torch-equivalence, e2e, "
            "multi-process) were deselected. Full suite: bare `pytest` "
            "(or `make test`)", yellow=True)


@pytest.fixture(scope="session")
def sample_wav():
    """The bundled reference utterance (16 kHz mono), or a synthetic harmonic
    signal if the reference mount is unavailable."""
    from mockingbird_tpu.dsp import load_wav

    path = "/root/reference/data/samples/T0055G0013S0005.wav"
    if os.path.exists(path):
        wav, sr = load_wav(path)
        return wav.astype(np.float32), sr
    sr = 16000
    t = np.arange(sr * 2) / sr
    f0 = 220 * (1 + 0.1 * np.sin(2 * np.pi * 2 * t))
    wav = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
    wav *= np.clip(np.sin(np.pi * t / t[-1]), 0, 1)
    return wav.astype(np.float32), sr
