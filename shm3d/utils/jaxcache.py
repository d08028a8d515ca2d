"""Persistent XLA compilation cache wiring.

The reference pays its precompute cost in CPU factorizations each process
(/root/reference/src/signed_heat_grid_solver.cpp:32-34); the TPU analog is
XLA compilation, which over the tunnel costs minutes per fresh process
(BENCH_r01.json: 324 s cold vs 36.5 s with a warm server-side cache).  JAX's
persistent compilation cache makes fresh processes reuse compiled programs
from disk, so a cold *process* no longer implies a cold *cache*.

Called from the product entry points (CLI, bench, __graft_entry__) rather
than on package import: a library import must not create directories or
mutate global jax config as a side effect.

Env knobs:
  SHM3D_COMPILE_CACHE_DIR  override the cache location
  SHM3D_NO_COMPILE_CACHE   set to disable entirely
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache() -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory, or None when disabled/unavailable.
    """
    global _ENABLED
    if os.environ.get("SHM3D_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get("SHM3D_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "shm3d", "xla"
    )
    if _ENABLED:
        return cache_dir
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time; the default
        # (1 s) already covers the tunnel-dominated compiles we care about,
        # but small programs recompiled every process add up too
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        # accept cache entries produced by slightly different jax point
        # releases of the same backend where supported
        try:
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0
            )
        except Exception:
            pass
    except Exception:
        return None
    _ENABLED = True
    return cache_dir
