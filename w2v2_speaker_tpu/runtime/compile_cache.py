"""Persistent XLA compilation cache (time-to-first-step parity).

The reference starts fitting immediately — eager PyTorch pays no compile
tax (`/root/reference/src/main.py:497`). This framework, by contrast,
pays minutes of (remote) XLA compiles before step 1 on EVERY invocation
unless compiled executables are persisted: measured on the v5e tunnel, a
BASE train job spends ~12.4 min in remote compiles before the first step
(PERF.md round-4 e2e paragraph), and a tiny speech e2e pays ~12 min of
per-bucket eval compiles. JAX's persistent compilation cache keyed on
(HLO, compile options, backend version) removes that cost for every
repeat workflow the reference README sells — sweeps where only the LR
changes, eval-only warm starts, restarts, lr-find.

Wired default-on into `run.py`, `predict.py` and `bench.py`; opt out
with `W2V2_COMPILE_CACHE=0`, repoint with `W2V2_COMPILE_CACHE=/path`.
"""

from __future__ import annotations

import os
import pathlib

__all__ = ["enable_compilation_cache"]

_ENV_KNOB = "W2V2_COMPILE_CACHE"
_ENABLED = {"1", "true", "yes", "on"}
_DISABLED = {"0", "false", "no", "off"}


def _configured_platform() -> str:
    """Best-effort platform name WITHOUT initializing a backend.

    `jax.default_backend()` would trigger full backend init — through the
    remote-TPU tunnel that is ~50 s of connection setup, and on a
    device-free code path (e.g. rendering a SLURM sweep while the tunnel
    is down, CLAUDE.md trap 10) it can hang or raise. The configured
    platform string answers the only question we have (is this CPU?)
    for free; '' means auto-detect (treated as non-CPU: accelerator
    hosts are the production case, and a CPU-only auto-detect host
    merely gains a harmless warm cache)."""
    import jax

    plats = ""
    try:
        plats = str(jax.config.jax_platforms or "")
    except AttributeError:
        pass
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    return plats.split(",")[0].strip().lower()


def default_cache_dir() -> pathlib.Path:
    xdg = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    return pathlib.Path(xdg) / "w2v2_speaker_tpu" / "xla_cache"


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None):
    """Turn on JAX's persistent compilation cache. Returns the cache dir
    (a Path) or None when disabled via ``W2V2_COMPILE_CACHE=0``.

    Must run before the first compilation (anywhere before first jit
    execution is fine — the cache is consulted per-compile, not at
    backend init). Safe to call more than once; the last dir wins.

    The env knob doubles as a directory override so driver scripts and
    tests can isolate or share caches without code changes.
    """
    env = os.environ.get(_ENV_KNOB, "").strip()
    if env.lower() in _DISABLED:
        return None
    # an env value that is neither an enable word nor a disable word is a
    # directory override; bare enable words (1/true/yes/on) keep the
    # default location
    explicit = cache_dir is not None or (
        env != "" and env.lower() not in _ENABLED
    )
    if cache_dir is None:
        cache_dir = env if explicit else default_cache_dir()

    if not explicit and _configured_platform() == "cpu":
        # default-on only off-CPU: CPU compiles are cheap, and XLA:CPU AOT
        # reload logs machine-feature-mismatch errors (with a SIGILL risk
        # when the cache dir is shared across hosts). An explicit dir (arg
        # or env) still opts CPU in — the tests use that.
        return None
    cache_dir = pathlib.Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    # Cache everything: the default 1 s / 64 KB floors would skip the many
    # small-but-remote programs (per-bucket eval, init, host glue) whose
    # cost on the tunnel is round-trips, not compile seconds.
    for knob, value in (
        ("jax_persistent_cache_min_compile_time_secs", 0.0),
        ("jax_persistent_cache_min_entry_size_bytes", -1),
    ):
        try:
            jax.config.update(knob, value)
        except AttributeError:  # older/newer jax without the knob
            pass
    return cache_dir
