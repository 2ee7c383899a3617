"""Test configuration: hermetic CPU backend with a virtual 8-device mesh.

A pytest plugin in this environment pre-imports jax, so env vars alone are
not enough — we also set the config programmatically. Both must happen
before any jax *backend* is initialised (first device use), which holds at
conftest-collection time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert not jax._src.xla_bridge._backends, (
    "a jax backend was initialised before conftest could pin CPU")
