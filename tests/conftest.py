"""Test configuration: run on a virtual 8-device CPU mesh.

The container pre-imports jax at interpreter startup (PYTHONPATH
sitecustomize registering the axon TPU plugin) and pins JAX_PLATFORMS=axon,
so plain env-var overrides in Python are too late.  ``jax.config.update``
still works because backend selection is lazy; XLA_FLAGS writes through to
the C env before the first backend init.

Multi-chip sharding is validated on this CPU mesh; real-TPU benchmarks run
via bench.py outside pytest.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: repeat test runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pstl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
