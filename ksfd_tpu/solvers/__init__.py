from .steppers import Tableau, ROS34PW2, BEULER, get_tableau, wlte_norm
from .linalg import SpectralPreconditioner, gmres_solve, dense_solve_factory
from .gmres import gmres_fixed, richardson_solve
from .solver import (
    Solver,
    make_step_fn,
    make_multistep_fn,
    make_adaptive_chunk_fn,
    route_petsc_direct,
    print_monitor,
    history_monitor,
)
from .ensemble import EnsembleSolver, shard_members

__all__ = [
    "Tableau",
    "ROS34PW2",
    "BEULER",
    "get_tableau",
    "wlte_norm",
    "SpectralPreconditioner",
    "gmres_solve",
    "dense_solve_factory",
    "Solver",
    "make_step_fn",
    "make_multistep_fn",
    "make_adaptive_chunk_fn",
    "route_petsc_direct",
    "gmres_fixed",
    "richardson_solve",
    "print_monitor",
    "history_monitor",
    "EnsembleSolver",
    "shard_members",
]
