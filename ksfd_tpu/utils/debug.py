"""Subsystem-gated debug logging.

Set the ``KSFDDEBUG`` environment variable to a colon-separated list of
subsystem names (or ``ALL``) to enable tracing for those subsystems.
Known subsystems: MAIN, RANDOM, SYM, SERIES, TS, SOLVE, GRID, LINALG,
MESH, BENCH.

Reference parity: KSFD/ksfddebug.py:1-9 (same env-var protocol; the
reference prefixes each line with the MPI rank, we prefix with the JAX
process index, which is 0 in single-controller runs).
"""

import os
import sys
import functools

__all__ = ["log", "logger", "enabled"]


@functools.lru_cache(maxsize=None)
def _systems():
    val = os.environ.get("KSFDDEBUG", "")
    return frozenset(s.strip().upper() for s in val.split(":") if s.strip())


def enabled(system="MAIN"):
    systems = _systems()
    return "ALL" in systems or system.upper() in systems


def _process_index():
    # Avoid importing jax just for logging when tracing is off.
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def log(*args, system="MAIN", **kwargs):
    """Print ``args`` if tracing is enabled for ``system``."""
    if enabled(system):
        print(
            "[{sys}:{rank}]".format(sys=system.upper(), rank=_process_index()),
            *args,
            file=sys.stderr,
            flush=True,
            **kwargs,
        )


def logger(system):
    """Return a ``log``-like callable bound to one subsystem."""

    def _log(*args, **kwargs):
        log(*args, system=system, **kwargs)

    return _log
