"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere. The build box has a
single CPU core and a very slow XLA CPU compile path, so the persistent
compilation cache is essential: first runs are slow, repeats are instant.
"""
import os

# CUT3R_TEST_TPU=1 keeps the real TPU visible so the compiled-Pallas
# parity tests (test_gs_raster_pallas.py TPU section) can run; default
# is the virtual 8-device CPU mesh.
_USE_TPU = os.environ.get("CUT3R_TEST_TPU", "") == "1"

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# is authoritative and keeps tests on the virtual 8-device CPU backend.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
