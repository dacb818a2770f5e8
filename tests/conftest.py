"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment may pre-register an accelerator backend via sitecustomize
(JAX_PLATFORMS=axon); tests must not depend on it, so the platform is forced
to CPU via jax.config *after* import (env vars alone are ignored once the
plugin is registered).  XLA_FLAGS must still be set before the first backend
initialisation to get the 8 virtual host devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-bound on small CPU hosts.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# The estimator is validated at float64 on CPU (matching the reference's
# double-precision Ceres solver); production TPU path runs float32 + iterative
# refinement.  Tests that specifically exercise f32 cast explicitly.
jax.config.update("jax_enable_x64", True)
