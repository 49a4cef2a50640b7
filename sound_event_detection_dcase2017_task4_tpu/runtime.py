"""Process-level runtime knobs (compile cache).

The training/inference CLIs call :func:`enable_compile_cache` so repeated
invocations (the reference workflow is many separate CLI processes —
SURVEY.md §1 L6) don't re-pay TPU compilation: XLA executables are
persisted under ``~/.cache/sedx_jax`` and reloaded by fingerprint. On the
hosted dev TPU, compiles go through a remote helper that can take minutes,
so this matters even more than on a local chip.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache", "honor_platform_env",
           "probe_default_backend"]


def probe_default_backend(timeout_s: float = 120.0) -> tuple[bool, str]:
    """Initialize the default JAX backend in a bounded, KILLABLE probe.

    Returns ``(True, backend_name)`` or ``(False, failure_detail)``.
    Never attempt this in-process first: when this image's TPU tunnel is
    down, backend init HANGS in an uninterruptible retry loop rather
    than raising. The single shared implementation behind bench.py's
    retrying probe and ``__graft_entry__``'s CPU fallback.
    """
    import subprocess
    import sys

    code = "import jax; print(jax.default_backend())"
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"backend init hung > {timeout_s:.0f}s"
    if proc.returncode == 0 and proc.stdout.strip():
        return True, proc.stdout.strip().splitlines()[-1]
    tail = (proc.stderr or "").strip().splitlines()[-1:] or ["rc!=0"]
    return False, tail[0][:200]


def honor_platform_env() -> None:
    """Re-assert a ``JAX_PLATFORMS=cpu`` escape request from the env.

    This image's sitecustomize imports jax at interpreter startup and
    programmatically sets ``jax_platforms="axon,cpu"`` — which silently
    OVERRIDES a ``JAX_PLATFORMS=cpu`` env var set by the launching process
    (config beats env once set). A CLI launched with the env var to avoid
    a dead TPU tunnel would still block on the axon backend. Called from
    :func:`enable_compile_cache` (i.e. by every CLI) before first backend
    use.

    Deliberately ONE-directional: only a pure-CPU request is honored.
    The TPU direction needs no help (sitecustomize selects it by
    default), and honoring it would re-break callers that forced CPU via
    ``jax.config`` while the shell env still says ``axon`` — exactly what
    happened to the pytest conftest when the first in-process CLI call
    re-asserted the env and hung the whole suite on the dead tunnel.
    """
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want == "cpu" and want != jax.config.jax_platforms:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized: too late, leave it


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    honor_platform_env()
    cache_dir = path or os.environ.get(
        "SEDX_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sedx_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only FS: caching is best-effort
