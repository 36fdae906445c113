"""Test configuration: force CPU with 8 virtual devices for sharding tests,
and enable the persistent compilation cache (XLA-CPU compiles of
threefry-heavy programs are expensive on small hosts)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from seq2squiggle_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()
