"""Persistent XLA compilation cache.

On tunneled/remote TPU backends a cold compile costs minutes; the cache
turns every subsequent process start into a disk hit. Enabled by all CLIs
and bench/driver entry points.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("CSS_TPU_CACHE_DIR",
                                  "/tmp/css_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these knobs
