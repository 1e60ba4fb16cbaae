"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver validates multi-chip sharding separately via
__graft_entry__.dryrun_multichip; tests use 8 virtual CPU devices so
sharded-vs-single-device comparisons run without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end gate tests"
    )
