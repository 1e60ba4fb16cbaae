"""ksfd_tpu — TPU-native Keller-Segel finite-difference framework.

A from-scratch rebuild of the capabilities of leonavery/KSFD for TPU:

- the symbolic PDE assembly (sympy) compiles to fused XLA/Pallas
  kernels instead of runtime-generated C ufuncs;
- PETSc DMDA/TS/SNES/KSP/MUMPS is replaced by an implicit Rosenbrock-W
  stepper with matrix-free Newton-Krylov (Jacobian action via jax.jvp,
  GMRES, exact spectral preconditioning of the stiff linear part);
- MPI domain decomposition becomes jax.sharding over a device mesh
  (XLA inserts the halo collectives);
- per-rank HDF5 time series becomes a single sharded checkpoint store
  with bit-exact restart.

Importing this package enables float64 (jax_enable_x64) unless the
environment variable KSFD_TPU_X64=0: the PDE system is stiff and the
parity target vs the reference is 1e-8.
"""

import os as _os

import jax as _jax

if _os.environ.get("KSFD_TPU_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

# The hosting site config may pin jax_platforms (e.g. to a TPU tunnel)
# before env vars are consulted; KSFD_PLATFORM provides an explicit
# programmatic override (KSFD_PLATFORM=cpu KSFD_NUM_CPU_DEVICES=8 for a
# virtual mesh without hardware).
if _os.environ.get("KSFD_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["KSFD_PLATFORM"])
if _os.environ.get("KSFD_NUM_CPU_DEVICES"):
    _jax.config.update(
        "jax_num_cpu_devices", int(_os.environ["KSFD_NUM_CPU_DEVICES"])
    )

# Persistent compilation cache: the analog of the reference's
# AUTOWRAP_SCRATCH ufunc cache (ksfdsolver2.py:336-339) — the same env
# var is honored so reference workflows carry over.
_cache_dir = _os.environ.get(
    "KSFD_COMPILE_CACHE", _os.environ.get("AUTOWRAP_SCRATCH")
)
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"

from .utils import (  # noqa: E402
    KSFDException,
    Parameter,
    ParameterList,
    Parser,
    NumericsOptions,
    decode_numerics,
    default_parameters,
    find_duplicates,
    safe_sympify,
    jaxify,
    log,
)
from .models import (  # noqa: E402
    Ligand,
    LigandGroup,
    LigandGroups,
    SolutionParameters,
)
from .grid import Grid  # noqa: E402

__all__ = [
    "KSFDException",
    "Parameter",
    "ParameterList",
    "Parser",
    "NumericsOptions",
    "decode_numerics",
    "default_parameters",
    "find_duplicates",
    "safe_sympify",
    "jaxify",
    "log",
    "Ligand",
    "LigandGroup",
    "LigandGroups",
    "SolutionParameters",
    "Grid",
]
