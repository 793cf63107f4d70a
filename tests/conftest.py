"""Test harness config: run on a virtual 8-device CPU mesh (hermetic, no TPU needed).

The axon TPU plugin (sitecustomize) force-registers itself and overrides the
JAX_PLATFORMS env var, so merely exporting JAX_PLATFORMS=cpu is NOT enough — tests
would silently run over the remote-TPU tunnel (~400 ms per dispatch). Setting the
config value AFTER jax imports wins over the plugin's env override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # best effort; the config update below is decisive

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()} — axon plugin override?"
)
