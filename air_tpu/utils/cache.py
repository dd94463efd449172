"""Persistent XLA compilation cache for the driver entry points.

Over the axon tunnel the first compile of the fused K-step training
pipeline costs minutes per *process* (observed ~16-18 min for the
harder-scenes config in the round-5 band240k campaign, vs ~1-2 min in
a warm round-4 session); chained campaign scripts launch a fresh
``python training.py`` per run and pay it every time. JAX's persistent
compilation cache amortizes that across processes: identical programs
(same shapes, flags, jaxlib) deserialize instead of recompiling.

Drivers call :func:`enable_persistent_compilation_cache` before any
jit; the library itself never mutates global JAX config on import.
Backends that cannot serialize executables just skip the cache (JAX
logs a warning and compiles normally), so this is strictly an
optimization — never load-bearing for correctness.
"""

import os


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path``.

    ``path`` defaults to ``$AIR_TPU_CACHE_DIR`` or ``.jax_cache`` next
    to this package (gitignored). Returns the directory used, or None
    if the running JAX build does not support the cache config (the
    caller proceeds uncached).
    """
    import jax

    if path is None:
        default = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        path = os.environ.get("AIR_TPU_CACHE_DIR", default)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default thresholds skip "cheap" compiles; over the tunnel even
        # those are worth caching
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return path
