"""Test configuration: force CPU platform with 8 virtual devices.

Multi-chip sharding code is validated on a virtual CPU mesh (the driver
separately dry-runs `__graft_entry__.dryrun_multichip`); real-TPU behavior
is covered by bench.py runs.

Note: the TPU plugin's sitecustomize (on PYTHONPATH) force-sets
JAX_PLATFORMS=axon at interpreter start, so we must *assign* (not
setdefault) before the first jax import — conftest runs after
sitecustomize but before any test module imports jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
