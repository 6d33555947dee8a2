"""Test configuration: force CPU with 8 virtual devices, x64 on.

Multi-device sharding paths are exercised on a virtual CPU mesh
(SURVEY.md §4 item 4); real-TPU behavior is covered by bench.py and the
driver's compile checks.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin at interpreter start and
# forces jax_platforms="axon,cpu"; re-force CPU here so the suite runs on the
# virtual 8-device CPU mesh regardless of environment.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
