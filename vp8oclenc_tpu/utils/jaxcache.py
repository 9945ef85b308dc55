"""Persistent XLA compilation cache.

Kernel compiles for a 1080p resolution take minutes through the remote-TPU
tunnel; caching executables on disk makes every process after the first
start in seconds.  Called idempotently by the kernel builders.
"""
from __future__ import annotations

import os

_done = False


def enable() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax
        cache_dir = os.environ.get(
            "VP8TPU_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
