"""Process-wide JAX configuration for apps/benches.

Remote-compiled TPU backends make cold compiles expensive; the persistent
compilation cache turns every rerun into a cache hit.  Called by the CLI
apps, bench.py and the driver entry points.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None):
    import jax

    cache = cache_dir or os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these options
