"""Process-level JAX setup shared by all entry points."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on the persistent compilation cache.

    The ``JAX_COMPILATION_CACHE_DIR`` env var alone is NOT read by
    jax.config in this JAX version, so every entry point calls this after
    importing jax.  Safe to call repeatedly.
    """
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
