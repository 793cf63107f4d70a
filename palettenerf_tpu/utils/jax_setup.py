"""Process-level JAX setup: persistent compilation cache.

The render/train graphs take 30s+ to compile on TPU; caching them on disk makes repeat
CLI invocations (train -> extract -> palette -> test) start in seconds. Call
``setup_jax()`` once at CLI entry before any jit executes.
"""

from __future__ import annotations

import os


def _host_fingerprint() -> str:
    """Hash of the host CPU's feature flags.

    The persistent cache stores XLA:CPU AOT executables whose cache key does
    NOT include the host machine features — after a VM migration to a
    different CPU model, stale entries load with only an E-level
    ``cpu_aot_loader`` log and can produce silently WRONG results (observed:
    an eval render whose weights_sum collapsed to ~0 under a stale cache and
    was correct with a cold one). Namespacing the cache dir by the feature
    set makes a new host start cold instead."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        pass
    return hashlib.sha1((platform.machine() + feats).encode()).hexdigest()[:10]


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
        "PALETTENERF_JAX_CACHE",
        os.path.join("/tmp", f"palettenerf_jax_cache-{_host_fingerprint()}"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: non-fatal
