"""Process-wide JAX configuration for apps/benches.

Remote-compiled TPU backends make cold compiles expensive; the persistent
compilation cache turns every rerun into a cache hit.  Called by the CLI
apps, bench.py and the driver entry points.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None):
    import jax

    # honour JAX_PLATFORMS even when a plugin backend was pre-registered by
    # sitecustomize (env vars alone are ignored once the plugin is loaded)
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass
        if "cpu" in platforms:
            # CPU runs validate the f64 estimator path (the reference is
            # double-precision Ceres); TPU runs stay f32
            jax.config.update("jax_enable_x64", True)

    # TPU MXU matmuls default to bf16 inputs with f32 accumulation; the
    # estimator's normal equations (H = J^T J, Schur complement) need true
    # f32 multiplies or GN steps degrade from O(1e-6) to O(1e-2) relative
    # error and the window solver drifts (measured: synthetic EuRoC ATE
    # 4.8 m vs 0.08 m).  Descriptor Hamming matmuls opt back into bf16
    # explicitly (frontend/matcher.py) — that path is exact in bf16.
    try:
        jax.config.update("jax_default_matmul_precision", "highest")
    except Exception:
        pass

    # default to a repo-local cache so warm compiles survive /tmp wipes
    # (the unrolled 10-iteration LM program takes ~10 min to compile cold
    # on a 2-vCPU host; a cache hit loads in seconds); for non-source
    # installs where the package dir is read-only, fall back to
    # ~/.cache/okvis2x_tpu/jax so the persistent cache is never silently off
    repo_cache = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    cache = cache_dir or os.environ.get("JAX_CACHE_DIR") or repo_cache
    if cache == repo_cache and not os.access(os.path.dirname(repo_cache), os.W_OK):
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "okvis2x_tpu", "jax"
        )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these options
