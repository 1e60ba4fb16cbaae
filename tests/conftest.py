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
# Persistent compilation cache: the three-tier adaptive chunk embeds
# up to ~67 unrolled solve applications, which XLA:CPU compiles in
# minutes on this 1-core host; caching makes suite re-runs pay it
# once (same policy CLAUDE.md recommends for the TPU tunnel).
_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end gate tests"
    )
