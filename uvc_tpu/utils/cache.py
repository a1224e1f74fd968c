"""Persistent XLA compilation cache.

Remote-attached TPUs pay 20-100 s per program compile; the persistent
cache (measured on this relay: 70.5 s -> 6.1 s for a 6-matmul program)
makes restarts, resumes, and repeated bench/driver runs near-instant.
The reference has no equivalent concern (CUDA kernels are precompiled).

Enabled via ``--compilation_cache_dir`` on every CLI, or the
``UVC_COMPILE_CACHE`` env var; entries are keyed by HLO hash so stale
hits after code changes are impossible.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(directory: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compile cache at ``directory``.

    Falls back to $UVC_COMPILE_CACHE; returns the directory used, or
    None when disabled (no directory given anywhere).
    """
    directory = directory or os.environ.get("UVC_COMPILE_CACHE")
    if not directory:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", directory)
    # cache every compile that took >= 1 s (the default 60 s threshold
    # would skip most of the small eval/export programs that still cost
    # 20+ s through the relay's remote compile)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # JAX memoizes the cache-enabled decision at the first compile of the
    # process; if anything compiled before this call (a warmup probe, an
    # earlier test), the new directory would be silently ignored.  Reset
    # the singleton so enabling mid-process takes effect.
    try:
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:                    # private API drift: best effort
        pass
    return directory
