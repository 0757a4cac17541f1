"""pstl_tpu — a TPU-native JAX framework for diverse, controllable,
rule-compliant diffusion driving policies with parametric Signal Temporal
Logic (pSTL).

Re-implements the full capability surface of ``mengyuest/pSTL-diffusion-policy``
(RA-L 2024 / ICRA 2025) as a layered, device-resident JAX library:

- ``pstl_tpu.ops.stl``       differentiable STL robustness (soft & hard semantics)
- ``pstl_tpu.ops.dynamics``  unicycle rollout as ``lax.scan``
- ``pstl_tpu.ops.geometry``  lane-distance / car-clearance kernels
- ``pstl_tpu.specs``         driving pSTL formulas, calibration, dense batching
- ``pstl_tpu.models``        policy network (diffusion / VAE / BC + RefineNet)
- ``pstl_tpu.diffusion``     DDPM sampler with fused STL guidance (one scan)
- ``pstl_tpu.trajopt``       gradient trajectory-optimization data augmentation
- ``pstl_tpu.losses``        STL / diffusion / VAE / BC / DPP-diversity losses
- ``pstl_tpu.train``         training engine (optax + orbax, pjit over a mesh)
- ``pstl_tpu.sim``           device-resident closed-loop replanning simulator
- ``pstl_tpu.eval_openloop`` open-loop evaluation harness (Table-I metrics)
- ``pstl_tpu.metrics``       on-device diversity metrics (std/hull/entropy/area)
- ``pstl_tpu.parallel``      mesh construction and sharding helpers
- ``pstl_tpu.data``          synthetic scene generator + fixed-shape datasets

Design stance (TPU-first, not a port): static shapes everywhere, explicit PRNG
keys, ``lax.scan`` for every sequential loop, ``vmap`` over candidate axes,
``jax.sharding`` over a data mesh axis, robustness computed in float32.
"""

__version__ = "0.1.0"


def _sync_compile_cache_env():
    """Honor JAX_COMPILATION_CACHE_DIR even though the container pre-imports
    jax (sitecustomize) BEFORE user code can set the env var: jax reads the
    cache-dir env once at import, so every script/test that exported it was
    silently recompiling everything.  Write the env contract through to the
    live config here (a no-op when jax already picked it up or the caller
    configured the cache explicitly)."""
    import os

    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if d and jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes",
            int(os.environ.get("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES",
                               "-1")))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                                 "1.0")))


_sync_compile_cache_env()

from pstl_tpu.config import Config  # noqa: F401,E402
