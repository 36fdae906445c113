"""Test configuration: force the REAL CPU backend with 8 virtual devices.

Note: this environment's sitecustomize registers an 'axon' TPU platform and
overrides JAX_PLATFORMS, so the env var alone is not enough — the config
update below must run before any backend is initialised. Tests on the axon
backend would hit a remote compile service (minutes per program) and TPU
default matmul precision.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
