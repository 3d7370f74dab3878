"""Test configuration: run the suite on the CPU platform with 8 virtual devices.

Multi-chip sharding code is validated on a virtual CPU mesh (the driver
separately dry-runs `__graft_entry__.dryrun_multichip`); real-TPU behavior
is covered by bench.py runs.

The TPU plugin's sitecustomize (at /root/.axon_site, on PYTHONPATH)
*imports jax and sets JAX_PLATFORMS=axon at interpreter start* — before
conftest runs — so round 1's plain env assignment was a silent no-op and
the whole suite ran serially on the one real TPU chip. jax reads
JAX_PLATFORMS into its config at import time, but the backend itself is
initialized lazily at first device use; `jax.config.update` before that
point genuinely switches the platform, and XLA parses XLA_FLAGS at first
client creation, so the virtual-device flag also still lands.
`tests/test_parallel.py::test_platform_is_cpu_with_8_devices` asserts the
result, so a regression here fails loudly instead of silently.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

if "jax" in sys.modules:
    # sitecustomize already imported jax with JAX_PLATFORMS=axon baked into
    # its config; update the live config before any backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")
