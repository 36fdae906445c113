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

# The `smoke` gating tier: whole modules that finish without long XLA
# compiles (~2 min total on a 1-core host vs ~18 min for the full suite).
# Run with `pytest -m smoke` / `make test-smoke`.
_SMOKE_MODULES = {
    "test_async_writer", "test_batcher", "test_cli", "test_fasta_io",
    "test_pod5", "test_preprocess", "test_slow5", "test_slow5_goldens",
    "test_tools", "test_weights",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)
