"""Runtime/platform setup helpers.

Central place for jax runtime knobs: the persistent compilation cache (new
kernel shapes compile remotely in minutes on tunneled TPU setups -- caching
them across processes makes the CLI usable) and explicit platform selection.
"""

from __future__ import annotations

import os

_CACHE_SET = False


def setup(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent)."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    import jax
    # ZOTPU_PLATFORM=cpu pins the platform even on hosts whose site setup
    # force-registers an accelerator backend and ignores JAX_PLATFORMS
    # (needed by the multi-controller CPU tests driving the real CLI).
    plat = os.environ.get("ZOTPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    cache = (cache_dir or os.environ.get("ZOTPU_JAX_CACHE")
             or os.path.expanduser("~/.cache/zotpu_jax"))
    if cache in ("off", "0", ""):
        # tests disable the persistent cache outright: cache WRITES
        # (executable serialize + zstd compress) have segfaulted flaky in
        # long CPU suite runs, and a crashed write once corrupted an entry
        # that a later process crashed deserializing. CPU compiles are
        # cheap; the cache's value is the minutes-long remote TPU compiles.
        _CACHE_SET = True
        return
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only FS: carry on uncached
    _CACHE_SET = True
