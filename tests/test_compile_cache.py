"""Persistent compilation cache (runtime/compile_cache.py).

The reference pays no compile tax (eager torch, `src/main.py:497`); this
framework persists XLA executables so repeat invocations (sweeps,
eval-only warm starts, restarts) skip recompilation. These tests pin the
wiring semantics; the cold/warm wall-clock win on the real chip is
recorded in PERF.md.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from w2v2_speaker_tpu.runtime.compile_cache import (
    default_cache_dir,
    enable_compilation_cache,
)


@pytest.fixture
def restore_cache_config():
    """Leave the process-global cache config the way we found it."""
    prev = jax.config.jax_compilation_cache_dir
    prev_env = os.environ.get("W2V2_COMPILE_CACHE")
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    if prev_env is None:
        os.environ.pop("W2V2_COMPILE_CACHE", None)
    else:
        os.environ["W2V2_COMPILE_CACHE"] = prev_env


def test_cache_populates_on_compile(tmp_path, restore_cache_config):
    cache = tmp_path / "xla"
    got = enable_compilation_cache(cache)
    assert got == cache and cache.is_dir()

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x).sum() + 41.0

    # fresh function identity -> fresh compile -> a serialized entry
    float(f(np.zeros((32, 32), np.float32)))
    entries = list(cache.iterdir())
    assert entries, "compile produced no persistent cache entry"
    assert all(e.stat().st_size > 0 for e in entries)


def test_env_knob_disables(restore_cache_config):
    os.environ["W2V2_COMPILE_CACHE"] = "0"
    assert enable_compilation_cache() is None


def test_env_knob_redirects(tmp_path, restore_cache_config):
    target = tmp_path / "redirected"
    os.environ["W2V2_COMPILE_CACHE"] = str(target)
    got = enable_compilation_cache()
    assert got == target and target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)


def test_default_dir_under_user_cache(restore_cache_config):
    os.environ.pop("W2V2_COMPILE_CACHE", None)
    d = default_cache_dir()
    assert d.name == "xla_cache" and "w2v2_speaker_tpu" in str(d)


def test_entry_points_wire_the_cache():
    """run.py / predict.py / bench.py must enable the cache before any
    model compile (the reference-workflow cost this kills is paid before
    step 1)."""
    import pathlib

    root = pathlib.Path(__file__).parents[1]
    for script in ("run.py", "predict.py", "bench.py"):
        text = (root / script).read_text()
        assert "enable_compilation_cache" in text, script


def test_default_on_skipped_on_cpu_backend(restore_cache_config):
    """Default-on applies off-CPU only (CPU compiles are cheap; XLA:CPU
    AOT reload warns about machine-feature mismatches). Explicit dirs
    still opt CPU in — the tests above rely on that."""
    os.environ.pop("W2V2_COMPILE_CACHE", None)
    assert jax.default_backend() == "cpu"
    assert enable_compilation_cache() is None


def test_env_enable_words_are_not_directories(
    tmp_path, restore_cache_config, monkeypatch
):
    """W2V2_COMPILE_CACHE=yes is an enable word, not a cache dir named
    './yes' (and on the CPU test backend, default-on stays off)."""
    monkeypatch.chdir(tmp_path)
    os.environ["W2V2_COMPILE_CACHE"] = "yes"
    assert enable_compilation_cache() is None
    assert not (tmp_path / "yes").exists()


def test_platform_probe_reads_config_not_backend():
    """The CPU check must come from the configured platform string, not
    jax.default_backend() — backend init through the remote tunnel takes
    ~50 s and can hang on device-free paths (SLURM submit)."""
    from w2v2_speaker_tpu.runtime.compile_cache import _configured_platform

    # the test conftest pins jax_platforms=cpu
    assert _configured_platform() == "cpu"
