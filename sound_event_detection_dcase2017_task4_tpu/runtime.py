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

__all__ = ["enable_compile_cache"]


def enable_compile_cache(path: str | None = None) -> None:
    import jax

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
