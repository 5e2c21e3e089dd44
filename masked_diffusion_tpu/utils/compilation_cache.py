"""Persistent XLA compilation cache.

Compiles dominate iteration latency on TPU (the flagship train step and the
1000-step sampling scan take minutes to compile, and every new process pays
it again). Enabling JAX's disk cache makes re-runs of the same program — the
common case for launch scripts, benchmarks, and resumed training — start in
seconds. Opt-out with MDT_DISABLE_COMPILE_CACHE=1; override the location
with MDT_COMPILE_CACHE_DIR or JAX_COMPILATION_CACHE_DIR.

Caveat: effective on real TPU VMs and CPU; tunneled PJRT backends that cannot
serialize executables silently skip the cache for the large programs.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    """Idempotently enable the JAX compilation disk cache. Returns the cache
    directory, or None when disabled/unavailable."""
    if os.environ.get("MDT_DISABLE_COMPILE_CACHE", "").lower() in ("1", "true", "yes"):
        return None
    path = (
        os.environ.get("MDT_COMPILE_CACHE_DIR")
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "masked_diffusion_tpu", "xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took meaningful time to compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:  # cache is an optimization; never fail the run for it
        return None
