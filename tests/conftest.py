"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` so `jax.devices()` reports 8 CPU
devices and `pjit`/`shard_map` paths compile and execute for real.

Note: this environment preloads jax (sitecustomize registers the axon TPU
backend), so env vars alone don't switch platforms — we must use
``jax.config.update`` before the first device query.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# TPU test lane: `MDMM_TPU=1 python -m pytest tests/ -m tpu -q` keeps
# the preloaded axon TPU backend so the real-chip behaviors (Pallas
# non-interpret mode, bf16 MXU paths) run on silicon. Default runs pin
# the virtual 8-device CPU mesh.
if os.environ.get("MDMM_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
