"""Process-level JAX setup: persistent compilation cache.

The render/train graphs take 30s+ to compile on TPU; caching them on disk makes repeat
CLI invocations (train -> extract -> palette -> test) start in seconds. Call
``setup_jax()`` once at CLI entry before any jit executes.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None):
    import jax

    # honor an explicit JAX_PLATFORMS env: the axon TPU plugin force-registers
    # itself and overrides the env var, so only the config update is decisive
    # (same workaround as tests/conftest.py)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    cache_dir = cache_dir or os.environ.get(
        "PALETTENERF_JAX_CACHE", os.path.join("/tmp", "palettenerf_jax_cache")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: non-fatal
