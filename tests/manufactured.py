"""Manufactured-solution machinery for the options92/93 workload.

The reference's convergence gate (options93nx128dt1) perturbs the
uniform unstable equilibrium rho=U=9000 with the eigenvector of the
linearized PDEs and adds a closed-form rho source that makes the
exponentially growing solution EXACT for the continuum system.  The
reference ships the source as a precomputed expression; here we derive
it symbolically from the same exact solution (d(rho)/dt - RHS applied
to the exact fields), which doubles as a check of our V/G assembly.
"""

import numpy as np
import sympy as sy

from helpers import make_clargs, OPTIONS92_PARAMS

MURHO = 9000.0
ARHO = 1.0
AUA = 0.6846227279629311
AUR = 0.088562372925828
LAMDA = 0.003974930217658144
K0 = 4.0


def exact_fields_sympy():
    """Exact rho, U1, U2 as sympy expressions of x, t."""
    x, t = sy.symbols("x t")
    phase = 2 * sy.pi * (sy.Rational(1, 4) + K0 * x)
    E = sy.exp(LAMDA * t)
    rho = MURHO + ARHO * E * sy.sin(phase)
    U1 = MURHO + ARHO * AUA * E * sy.sin(phase)
    U2 = MURHO + ARHO * AUR * E * sy.sin(phase)
    return x, t, rho, U1, U2


def rho_source_expr(ps):
    """source_rho = d(rho_e)/dt - d/dx(rho_e * d/dx G_e), continuum."""
    x, t, rho, U1, U2 = exact_fields_sympy()
    vals = ps.values0
    s2 = vals["s2"]
    G = (
        -vals["beta_1"] * sy.log(vals["alpha_1"] + U1)
        - vals["beta_2"] * sy.log(vals["alpha_2"] + U2)
        + vals["maxscale"]
        * s2
        * (sy.tanh((rho - vals["rhomax"]) / vals["cushion"]) + 1)
        + s2 * sy.log(rho)
    )
    drho_dt = sy.diff(rho, t)
    div_flux = sy.diff(rho * sy.diff(G, x), x)
    # no simplify(): the expression is huge and lambdify doesn't care
    return (drho_dt - div_flux).doit()


def exact_state(ps, grid, t):
    """Exact (3, nx) state array at time t."""
    x = np.arange(grid.nx) * float(grid.spacing[0])
    phase = 2 * np.pi * (0.25 + K0 * x)
    E = np.exp(LAMDA * t)
    rho = MURHO + ARHO * E * np.sin(phase)
    U1 = MURHO + ARHO * AUA * E * np.sin(phase)
    U2 = MURHO + ARHO * AUR * E * np.sin(phase)
    return np.stack([rho, U1, U2])


def make_problem(nx=64, extra_params=(), **clargs_kw):
    """SolutionParameters + Grid + source list for the manufactured run."""
    from ksfd_tpu import Grid, SolutionParameters
    from ksfd_tpu.ops import PDEOperators, SpatialExpression

    overrides = ["nelements=%d" % nx] + list(extra_params)
    okeys = {p.split("=", 1)[0] for p in overrides}
    params = [
        p for p in OPTIONS92_PARAMS if p.split("=", 1)[0] not in okeys
    ] + overrides
    ps = SolutionParameters(make_clargs(params=params, **clargs_kw))
    grid = Grid(
        dim=1, width=ps.width, nx=ps.nwidth, dof=ps.nligands + 1,
        order=ps.degree,
    )
    src = SpatialExpression(ps, grid, rho_source_expr(ps), name="rho_src")
    ops = PDEOperators(ps, grid, sources=[src, 0.0, 0.0])
    return ps, grid, ops
